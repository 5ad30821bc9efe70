"""int8 MXU ceiling characterization (BENCH.md round 3).

Answers two questions with the loop-slope chain_time_full instrument
(max-reduction fold-back — the scalar fold-back of chain_time lets XLA
narrow a plain conv to one output element and read ~0 ms):

1. How close is XLA's int8 conv to the v5e int8 MXU rate (2x bf16 peak)
   at the 8s-768 trunk shapes?  Measured: 0.68-0.79 of int8 peak for the
   deep conv4/conv5 shapes (1.8-1.9x over bf16), but only ~0.22/0.49 for
   conv2/conv3 (shallow 64/256-channel contractions under-fill the MXU).

2. Could a Pallas kernel beat XLA on the shallow shapes by folding the
   3x3 taps into deeper dots (im2col [M,576]x[576,128])?  No: Mosaic's
   own int8 dot_general is SLOWER than XLA's at every probed shape
   (0.146 vs 0.223 MFU at the im2col shape, 0.03 vs 0.146 at K=64), and
   XLA's int8 matmul gains nothing over bf16 at F=128 anyway.  The
   early-trunk MFU limit is a toolchain/shape ceiling, not an XLA
   inefficiency a kernel could fix.

Run solo on the chip (CPU-side load poisons the loop-slope minima).
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mscnn_tpu.utils.profiling import chain_time_full

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
PEAK_BF16 = 197e12


def probe_convs():
    rng = np.random.RandomState(0)
    shapes = [
        ("conv2_1 b4 384x1280x64->128", (4, 384, 1280, 64), (3, 3, 64, 128)),
        ("conv3_2 b4 192x640x256", (4, 192, 640, 256), (3, 3, 256, 256)),
        ("conv4_2 b4 96x320x512", (4, 96, 320, 512), (3, 3, 512, 512)),
        ("conv5_2 b4 48x160x512", (4, 48, 160, 512), (3, 3, 512, 512)),
    ]
    for name, xs, ws in shapes:
        x = rng.randn(*xs).astype(np.float32)
        w = rng.randn(*ws).astype(np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        xq = jnp.asarray(np.clip(x * 10, -127, 127).astype(np.int8))
        wq = jnp.asarray(np.clip(w * 10, -127, 127).astype(np.int8))
        fl = 2.0 * np.prod(xs[:3]) * np.prod(ws)  # N*H*W * (9*Cin*F) MACs

        def conv_bf(xc, wc=wb):
            return jax.lax.conv_general_dilated(
                xc, wc, (1, 1), "SAME", dimension_numbers=DN)

        def conv_q(xc, wc=wq):
            return jax.lax.conv_general_dilated(
                xc, wc, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32)

        t_bf = chain_time_full(conv_bf, xb)
        t_q = chain_time_full(conv_q, xq)
        print(json.dumps({
            "shape": name,
            "bf16_ms": round(t_bf, 3),
            "int8_ms": round(t_q, 3),
            "int8_speedup": round(t_bf / t_q, 2),
            "bf16_mfu": round(fl / (t_bf / 1e3) / PEAK_BF16, 3),
            "int8_mfu_of_int8peak": round(
                fl / (t_q / 1e3) / (2 * PEAK_BF16), 3),
        }), flush=True)


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tm",))
def pallas_mm_int8(x, w, tm=1024):
    m, k = x.shape
    f = w.shape[1]
    return pl.pallas_call(
        _mm_kernel, grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, f), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((tm, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, f), jnp.int32))(x, w)


def probe_matmuls():
    rng = np.random.RandomState(0)
    cases = [("im2col_conv2_1", 491520, 576, 128, 1024),
             ("tapdot_c64", 491520, 64, 128, 1024),
             ("big_control", 8192, 512, 512, 512)]
    for name, m, k, f, tm in cases:
        x = jnp.asarray(rng.randint(-127, 128, (m, k), dtype=np.int8))
        w = jnp.asarray(rng.randint(-16, 17, (k, f)).astype(np.int8))
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        fl = 2.0 * m * k * f
        res = {"name": name, "m": m, "k": k, "f": f}

        def xla_q(xc, wc=w):
            return jax.lax.dot_general(
                xc, wc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        try:
            res["pallas_bit_exact"] = bool(
                jnp.array_equal(pallas_mm_int8(x, w, tm), xla_q(x)))
            t = chain_time_full(lambda xc: pallas_mm_int8(xc, w, tm), x)
            res["pallas_int8_ms"] = round(t, 3)
            res["pallas_int8_mfu_int8peak"] = round(
                fl / (t / 1e3) / (2 * PEAK_BF16), 3)
        except Exception as e:  # Mosaic may reject the int8 dot
            res["pallas_error"] = str(e)[:150]
        t = chain_time_full(xla_q, x)
        res["xla_int8_ms"] = round(t, 3)
        res["xla_int8_mfu_int8peak"] = round(
            fl / (t / 1e3) / (2 * PEAK_BF16), 3)
        t = chain_time_full(lambda xc: xc @ wb, xb)
        res["xla_bf16_ms"] = round(t, 3)
        res["xla_bf16_mfu"] = round(fl / (t / 1e3) / PEAK_BF16, 3)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    probe_convs()
    probe_matmuls()

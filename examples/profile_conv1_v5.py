"""Conv1 kernel v5 experiments: can the 12-serial-dot structure be beaten?

Variants over the production kernel (ops/pallas/conv1_kernel.py), measured
with the loop-slope protocol (valid at this single-block scale, BENCH.md):

  v4      — production: 6+6 serial [M,128]x[128,128] dots, f32 acc
  v5-mc   — one multi-contraction dot per conv: lhs [M, 6, 128] (tap
            pieces stacked on a middle axis, no lane shifts) contracted
            against rhs [6, 128, 128] over both tap and lane dims
            (logical K=768); tests whether Mosaic pipelines one deep dot
            better than six shallow ones
  v4-bf16 — production structure with bf16 accumulation

Each variant is checked against the XLA oracle before timing.
"""

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mscnn_tpu.ops.pallas import conv1_kernel as CK
from mscnn_tpu.utils.profiling import chain_time

NEG = CK.NEG


def _kernel_v5(xp_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xbuf, sem,
               *, tile_h, tile_q, img_h, img_w, twp, mode):
    th, tq = tile_h, tile_q
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)
    step = (b * ni + i) * nj + j
    total = pl.num_programs(0) * ni * nj
    slot = jax.lax.rem(step, 2)

    def dma_for(s):
        sl = jax.lax.rem(s, 2)
        bb = s // (ni * nj)
        rem = jax.lax.rem(s, ni * nj)
        ii = rem // nj
        jj = jax.lax.rem(rem, nj)
        return pltpu.make_async_copy(
            xp_hbm.at[bb, pl.ds(ii * th, th + 4), pl.ds(jj * tq, twp), :],
            xbuf.at[sl], sem.at[sl])

    @pl.when(step == 0)
    def _():
        dma_for(0).start()

    @pl.when(step + 1 < total)
    def _():
        dma_for(step + 1).start()

    dma_for(step).wait()

    acc_t = jnp.bfloat16 if mode == "bf16" else jnp.float32

    def shifts(y, width):
        y_r = jnp.concatenate([y[:, 1:width], y[:, width - 1:width]], 1)
        y_rr = jnp.concatenate([y[:, 2:width], y[:, width - 2:width]], 1)
        return y_r, y_rr

    def tap_dots_serial(planes, w_ref, rows, width):
        acc = jnp.zeros((rows * width, 128), acc_t)
        for dy in range(3):
            for t, plane in enumerate(planes):
                lhs = plane[dy: dy + rows].reshape(rows * width, 128)
                acc += jax.lax.dot_general(
                    lhs, w_ref[2 * dy + t], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t)
        return acc.reshape(rows, width, 128)

    def tap_dots_mc(planes, w_ref, rows, width):
        # lhs [M, 6, 128]: tap pieces stacked on a middle axis
        pieces = []
        for dy in range(3):
            for plane in planes:
                pieces.append(plane[dy: dy + rows]
                              .reshape(rows * width, 1, 128))
        lhs = jnp.concatenate(pieces, axis=1)          # [M, 6, 128]
        acc = jax.lax.dot_general(
            lhs, w_ref[...], (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=acc_t)
        return acc.reshape(rows, width, 128)

    def tap_dots_flat(planes, w_ref, rows, width):
        # one [M, 768] @ [768, 128] dot: (6, 128) minor dims merged by a
        # tile-aligned reshape (128 = lane tile)
        pieces = []
        for dy in range(3):
            for plane in planes:
                pieces.append(plane[dy: dy + rows]
                              .reshape(rows * width, 1, 128))
        lhs = jnp.concatenate(pieces, axis=1).reshape(rows * width, 768)
        rhs = w_ref[...].reshape(768, 128)
        acc = jax.lax.dot_general(lhs, rhs, (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc_t)
        return acc.reshape(rows, width, 128)

    tap_dots = {"mc": tap_dots_mc, "flat": tap_dots_flat}.get(
        mode, tap_dots_serial)

    x = xbuf[slot]
    x_r, x_mix_src = shifts(x, twp)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (th + 4, twp, 128), 2) < 3
    x_mix = jnp.where(lane3, x_mix_src, x)
    y1 = tap_dots((x_r, x_mix), w1_ref, th + 2, twp)
    y1 = jnp.maximum(y1.astype(jnp.float32) + b1_ref[0], 0.0)

    on_edge = ((i == 0) | (i == ni - 1) | (j == 0)
               | ((j + 1) * tq * 2 + 2 * (twp - tq) >= img_w))

    def masked(y, rows, row0):
        g_row = (jax.lax.broadcasted_iota(jnp.int32, (rows, twp, 128), 0)
                 + row0)
        g_col = (jax.lax.broadcasted_iota(jnp.int32, (rows, twp, 128), 1)
                 * 2
                 + (jax.lax.broadcasted_iota(
                        jnp.int32, (rows, twp, 128), 2) // 64)
                 + (j * tq - 1) * 2)
        ok = ((g_row >= 0) & (g_row < img_h)
              & (g_col >= 0) & (g_col < img_w)).astype(jnp.float32)
        return y * ok

    y1 = jax.lax.cond(on_edge, lambda y: masked(y, th + 2, i * th - 1),
                      lambda y: y, y1)
    y1 = y1.astype(jnp.bfloat16)

    y1_r, y1_rr = shifts(y1, twp)
    lane_lo = (jax.lax.broadcasted_iota(jnp.int32, (th + 2, twp, 128), 2)
               < 64)
    y1_mix = jnp.where(lane_lo, y1_rr, y1)
    y2 = tap_dots((y1_r, y1_mix), w2_ref, th, twp)
    y2 = jnp.maximum(y2.astype(jnp.float32) + b2_ref[0], 0.0)

    def neg_masked(y):
        o_row = (jax.lax.broadcasted_iota(jnp.int32, (th, twp, 128), 0)
                 + i * th)
        o_col = (jax.lax.broadcasted_iota(jnp.int32, (th, twp, 128), 1) * 2
                 + (jax.lax.broadcasted_iota(
                        jnp.int32, (th, twp, 128), 2) // 64) + j * tq * 2)
        ok = ((o_row < img_h) & (o_col < img_w)).astype(jnp.float32)
        return y * ok + (1.0 - ok) * NEG

    y2 = jax.lax.cond(on_edge, neg_masked, lambda y: y, y2)

    colmax = jnp.maximum(y2[:, :, 0:64], y2[:, :, 64:128])
    colmax = colmax.reshape(th // 2, 2 * twp, 64)
    pooled = jnp.maximum(colmax[:, 0:twp], colmax[:, twp:2 * twp])
    out_ref[0] = jnp.maximum(pooled[:, 0:tq], 0.0).astype(out_ref.dtype)


def conv1_v5(x, w1, b1, w2, b2, *, tile_h=32, tile_q=128, mode="mc"):
    B, H, W, _ = x.shape
    out_h, out_w = (H + 1) // 2, (W + 1) // 2
    tw = tile_q * 2
    ph, pw = -H % tile_h, -W % tw
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = x.shape[1], x.shape[2]
    dtype = jnp.bfloat16
    xpair = CK._pair_input(x, dtype)
    ni, nj = Hp // tile_h, Wp // tw
    twp = tile_q + 4 + (-(tile_q + 4) % 16)
    need = (nj - 1) * tile_q + twp
    if xpair.shape[2] < need:
        xpair = jnp.pad(xpair, ((0, 0), (0, 0),
                                (0, need - xpair.shape[2]), (0, 0)))
    w1p = CK._tap_weights(w1, dtype, 3)
    w2p = CK._tap_weights(w2, dtype, 64)
    b1r = jnp.tile(b1.reshape(1, 64), (1, 2)).astype(jnp.float32)
    b2r = jnp.tile(b2.reshape(1, 64), (1, 2)).astype(jnp.float32)
    kernel = functools.partial(_kernel_v5, tile_h=tile_h, tile_q=tile_q,
                               img_h=H, img_w=W, twp=twp, mode=mode)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hp // 2, Wp // 2, 64), dtype),
        grid=(B, ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, 128, 128), lambda b, i, j: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda b, i, j: (0, 0)),
            pl.BlockSpec((6, 128, 128), lambda b, i, j: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h // 2, tile_q, 64),
                               lambda b, i, j: (b, i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 4, twp, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xpair, w1p, b1r, w2p, b2r)
    if (Hp // 2, Wp // 2) != (out_h, out_w):
        out = out[:, :out_h, :out_w, :]
    return out


def main():
    H, W = 768, 2560
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (1, H, W, 3), jnp.float32)
    w1 = jax.random.normal(ks[1], (3, 3, 3, 64), jnp.float32) * 0.05
    b1 = jnp.zeros((64,), jnp.float32)
    w2 = jax.random.normal(ks[2], (3, 3, 64, 64), jnp.float32) * 0.05
    b2 = jnp.zeros((64,), jnp.float32)

    ref = CK._conv1_pool_xla(x, w1, b1, w2, b2)
    ref = jax.device_get(ref).astype("float32")
    scale = float(abs(ref).max())
    res = {}
    res["v4_ms"] = chain_time(
        lambda x: CK._conv1_pool_pallas(x, w1, b1, w2, b2,
                                        tile_h=32, tile_q=128), x)
    for mode in ("flat",):
        try:
            out = jax.device_get(
                conv1_v5(x, w1, b1, w2, b2, mode=mode)).astype("float32")
            err = float(abs(out - ref).max()) / scale
            res[f"v5_{mode}_relerr"] = err
            if err < 0.05:
                res[f"v5_{mode}_ms"] = chain_time(
                    lambda x, m=mode: conv1_v5(x, w1, b1, w2, b2, mode=m),
                    x)
        except Exception as e:
            res[f"v5_{mode}"] = f"FAIL {type(e).__name__}: {e}"[:200]
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

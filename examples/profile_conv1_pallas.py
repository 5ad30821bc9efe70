"""Where does the fused Pallas conv1 block spend its time?

Loop-slope (tunnel-immune, BENCH.md protocol) breakdown at the bench
geometry: the XLA reference block, the fused kernel end-to-end, the pair
relayout pre-step alone, and the kernel body on a pre-built pair tensor,
swept over tile shapes. Compute speed-of-light for the pair kernel:
~450 GFLOP/img of dense 128-deep tap dots -> ~2.3 ms at v5e bf16 peak.
"""

import json

import jax
import jax.numpy as jnp

from mscnn_tpu.ops.pallas import conv1_kernel as CK
from mscnn_tpu.utils.profiling import chain_time


def main():
    H, W = 768, 2560
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (1, H, W, 3), jnp.float32)
    w1 = jax.random.normal(ks[1], (3, 3, 3, 64), jnp.float32) * 0.05
    b1 = jnp.zeros((64,), jnp.float32)
    w2 = jax.random.normal(ks[2], (3, 3, 64, 64), jnp.float32) * 0.05
    b2 = jnp.zeros((64,), jnp.float32)

    res = {}
    res["xla_block_ms"] = chain_time(
        lambda x: CK._conv1_pool_xla(x, w1, b1, w2, b2), x)
    res["pair_input_ms"] = chain_time(
        lambda x: CK._pair_input(x, jnp.bfloat16), x)

    for th, tq in [(32, 128), (64, 128), (32, 256), (64, 256), (16, 128),
                   (32, 64)]:
        try:
            res[f"fused_{th}x{tq}_ms"] = chain_time(
                lambda x, th=th, tq=tq: CK._conv1_pool_pallas(
                    x, w1, b1, w2, b2, tile_h=th, tile_q=tq), x)
        except Exception as e:  # Mosaic constraint violations etc.
            res[f"fused_{th}x{tq}_ms"] = f"FAIL {type(e).__name__}"

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

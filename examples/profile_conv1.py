"""Stage breakdown of the conv1 block at the bench geometry (768x2560).

Tunnel-immune protocol: each measurement jits ONE program that runs the
subgraph N times inside lax.fori_loop with a data dependence between
iterations (one element of the output is folded back into the input), so
the device must really execute N serial iterations and host/tunnel effects
(25 ms RTT, execution caching) cannot contaminate the number. Per-iter time
= slope between N=6 and N=26 runs.
"""

import json

import jax
import jax.numpy as jnp

from mscnn_tpu.utils.profiling import chain_time


def main():
    from mscnn_tpu.ops import conv as C

    H, W = 768, 2560
    ks = jax.random.split(jax.random.key(0), 8)
    x3 = jax.random.normal(ks[0], (1, H, W, 3), jnp.bfloat16)
    x64 = jax.random.normal(ks[1], (1, H, W, 64), jnp.bfloat16)
    w11 = jax.random.normal(ks[2], (3, 3, 3, 64), jnp.bfloat16) * 0.05
    b11 = jnp.zeros((64,), jnp.float32)
    w12 = jax.random.normal(ks[3], (3, 3, 64, 64), jnp.bfloat16) * 0.05
    b12 = jnp.zeros((64,), jnp.float32)
    pad1 = [(1, 1), (1, 1)]

    def conv1_1(x, w, b):
        return jax.nn.relu(C.conv2d(x, w, b, padding=pad1))

    def conv1_2(x, w, b):
        return jax.nn.relu(C.conv2d(x, w, b, padding=pad1))

    def pool1(x):
        return C.max_pool(x, 2, 2)

    def block(x, w1, b1, w2, b2):
        return pool1(conv1_2(conv1_1(x, w1, b1), w2, b2))

    res = {}
    res["conv1_1_ms"] = chain_time(conv1_1, x3, (w11, b11))
    res["conv1_2_ms"] = chain_time(conv1_2, x64, (w12, b12))
    res["pool1_ms"] = chain_time(pool1, x64, ())
    res["conv1_block_ms"] = chain_time(block, x3, (w11, b11, w12, b12))

    x64h = jax.random.normal(ks[4], (1, H // 2, W // 2, 64), jnp.bfloat16)
    w21 = jax.random.normal(ks[5], (3, 3, 64, 128), jnp.bfloat16) * 0.05
    b21 = jnp.zeros((128,), jnp.float32)
    res["conv2_1_ms"] = chain_time(conv1_2, x64h, (w21, b21))

    # 512-channel reference (near-peak MXU): 96x320x512->512
    x512 = jax.random.normal(ks[6], (1, H // 8, W // 8, 512), jnp.bfloat16)
    w44 = jax.random.normal(ks[7], (3, 3, 512, 512), jnp.bfloat16) * 0.02
    b44 = jnp.zeros((512,), jnp.float32)
    res["conv4x_ms"] = chain_time(conv1_2, x512, (w44, b44))

    px = H * W
    res["flops_conv1_1_g"] = 2 * 9 * 3 * 64 * px / 1e9
    res["flops_conv1_2_g"] = 2 * 9 * 64 * 64 * px / 1e9
    res["flops_conv4x_g"] = 2 * 9 * 512 * 512 * (px // 64) / 1e9
    res["hbm_conv1_2_mb"] = (2 * px * 64 * 2) / 1e6
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Pair-column conv experiments for the conv1 block (see BENCH.md).

A [B,H,W,64] array reshapes for free to [B,H,W/2,128] ("pair layout": two
adjacent columns stacked in channels). A 3x3/s1/C64 conv producing pair
layout is exactly a 3x4/stride(1,2)/C128 conv — full 128-lane MXU output
instead of half. This script measures XLA's lowering of those forms at the
bench geometry before committing to a Pallas kernel.
"""

import json

import jax
import jax.numpy as jnp

from mscnn_tpu.utils.profiling import chain_time


DIMS = ("NHWC", "HWIO", "NHWC")


def pair_weights(w):
    """[3,3,ci,co] -> [3,4,ci,2co] producing even|odd output columns."""
    kh, kw, ci, co = w.shape
    wp = jnp.zeros((kh, kw + 1, ci, 2 * co), w.dtype)
    wp = wp.at[:, 0:3, :, :co].set(w)
    wp = wp.at[:, 1:4, :, co:].set(w)
    return wp


def conv_pair(x, wp, b2):
    """x [B,H,W,C] -> pair layout [B,H,W/2,2C] (== [B,H,W,C] reshaped)."""
    y = lax.conv_general_dilated(
        x, wp, window_strides=(1, 2), padding=[(1, 1), (1, 2)],
        dimension_numbers=DIMS)
    return jax.nn.relu(y + b2.astype(y.dtype))


def conv_std(x, w, b):
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=DIMS)
    return jax.nn.relu(y + b.astype(y.dtype))


def pool_std(x):
    return lax.reduce_window(x, float("-inf"), lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def pool_pair(yp, co):
    """Pair layout [B,H,P,2C]: 2x2 max = row-pair max + halves max."""
    y = jnp.maximum(yp[..., :co], yp[..., co:])
    return lax.reduce_window(y, float("-inf"), lax.max, (1, 2, 1, 1),
                             (1, 2, 1, 1), "VALID")


def main():
    H, W = 768, 2560
    ks = jax.random.split(jax.random.key(0), 8)
    x3 = jax.random.normal(ks[0], (1, H, W, 3), jnp.bfloat16)
    x64 = jax.random.normal(ks[1], (1, H, W, 64), jnp.bfloat16)
    w11 = jax.random.normal(ks[2], (3, 3, 3, 64), jnp.bfloat16) * 0.05
    b11 = jnp.zeros((64,), jnp.float32)
    w12 = jax.random.normal(ks[3], (3, 3, 64, 64), jnp.bfloat16) * 0.05
    b12 = jnp.zeros((64,), jnp.float32)
    w11p = pair_weights(w11)
    b11p = jnp.concatenate([b11, b11])
    w12p = pair_weights(w12)
    b12p = jnp.concatenate([b12, b12])

    res = {}

    # correctness check on-chip (cheap shapes)
    xs = jax.random.normal(ks[4], (1, 32, 64, 64), jnp.bfloat16)
    ref = pool_std(conv_std(xs, w12, b12))
    got = pool_pair(conv_pair(xs, w12p, b12p), 64)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    res["pair_check_maxerr"] = err

    # conv1_2 alone: std vs pair
    res["conv1_2_std_ms"] = chain_time(conv_std, x64, (w12, b12))
    res["conv1_2_pair_ms"] = chain_time(conv_pair, x64, (w12p, b12p))

    # conv1_1: std vs pair (pair output reshapes free to std)
    res["conv1_1_std_ms"] = chain_time(conv_std, x3, (w11, b11))

    def conv1_1_pair(x, wp, b2):
        return conv_pair(x, wp, b2).reshape(x.shape[0], H, W, 64)

    res["conv1_1_pair_ms"] = chain_time(conv1_1_pair, x3, (w11p, b11p))

    # full block: std vs pair-everything
    def block_std(x, w1, b1, w2, b2):
        return pool_std(conv_std(conv_std(x, w1, b1), w2, b2))

    def block_pair(x, w1p, b1p, w2p, b2p):
        x1 = conv_pair(x, w1p, b1p).reshape(x.shape[0], H, W, 64)
        return pool_pair(conv_pair(x1, w2p, b2p), 64)

    res["block_std_ms"] = chain_time(block_std, x3, (w11, b11, w12, b12))
    res["block_pair_ms"] = chain_time(block_pair, x3,
                                      (w11p, b11p, w12p, b12p))

    # conv2_1 equivalent: 64->128 at half res, pair -> 256 lanes
    x64h = jax.random.normal(ks[5], (1, H // 2, W // 2, 64), jnp.bfloat16)
    w21 = jax.random.normal(ks[6], (3, 3, 64, 128), jnp.bfloat16) * 0.05
    b21 = jnp.zeros((128,), jnp.float32)
    res["conv2_1_std_ms"] = chain_time(conv_std, x64h, (w21, b21))
    res["conv2_1_pair_ms"] = chain_time(conv_pair, x64h,
                                        (pair_weights(w21),
                                         jnp.concatenate([b21, b21])))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

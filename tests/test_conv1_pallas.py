"""Fused Pallas conv1 block vs the XLA oracle (interpret mode on CPU).

The oracle is the plain ops.conv formulation (`_conv1_pool_xla`), itself
pinned to the reference VGG conv1_1/conv1_2/pool1 semantics
(/root/reference/examples/kitti_car/mscnn_deploy.prototxt, pool ceil-mode per
src/caffe/layers/pooling_layer.cpp:90-95). Both paths compute in bf16, so
differences are accumulation order only.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.ops.pallas import conv1_kernel as CK

# small tiles so interpret mode stays fast; the production defaults
# (tile_h=32, tile_q=128) are exercised on the real chip via bench.py
TILE = dict(tile_h=8, tile_q=16)


def make_inputs(rng, b, h, w, scale=0.5):
    x = jnp.asarray(rng.randn(b, h, w, 3) * scale, jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 64) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def check(rng, b, h, w):
    x, w1, b1, w2, b2 = make_inputs(rng, b, h, w)
    ref = CK._conv1_pool_xla(x, w1, b1, w2, b2)
    out = CK._conv1_pool_pallas(x, w1, b1, w2, b2, interpret=True, **TILE)
    assert out.shape == ((b, (h + 1) // 2, (w + 1) // 2, 64))
    assert out.dtype == ref.dtype
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.02 * scale)


def test_tile_aligned(rng):
    check(rng, 1, 16, 64)


def test_batch_and_tile_padding(rng):
    """H, W not multiples of the tile: padded internally, junk sliced off."""
    check(rng, 2, 20, 40)


def test_odd_sizes_ceil_mode_pool(rng):
    """Odd H and W exercise ceil-mode pooling plus the edge masks."""
    check(rng, 1, 19, 37)


def test_zero_padding_ring(rng):
    """All-ones input makes conv1_2's zero-padding ring the only structure:
    any mask slip shows up as a wrong border value."""
    x = jnp.ones((1, 16, 32, 3), jnp.float32)
    w1 = jnp.ones((3, 3, 3, 64), jnp.float32) * 0.1
    b1 = jnp.zeros(64, jnp.float32)
    w2 = jnp.ones((3, 3, 64, 64), jnp.float32) * 0.01
    b2 = jnp.zeros(64, jnp.float32)
    ref = CK._conv1_pool_xla(x, w1, b1, w2, b2)
    out = CK._conv1_pool_pallas(x, w1, b1, w2, b2, interpret=True, **TILE)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=0.02)


def test_custom_vjp_matches_oracle_grad(rng):
    """Backward is the exact VJP of the XLA formulation."""
    x, w1, b1, w2, b2 = make_inputs(rng, 1, 12, 16)

    def f_fused(x, w1, b1, w2, b2):
        return jnp.sum(CK.conv1_pool_fused(x, w1, b1, w2, b2) ** 2)

    def f_ref(x, w1, b1, w2, b2):
        return jnp.sum(CK._conv1_pool_xla(x, w1, b1, w2, b2) ** 2)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 3))(x, w1, b1, w2, b2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 3))(x, w1, b1, w2, b2)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-5)


def test_trunk_pallas_conv1_wiring(rng):
    """Model-level: trunk(pallas_conv1=True) == plain trunk from pool1 on.
    On CPU conv1_pool_fused falls back to the XLA formulation, so this pins
    the wiring (conv1 blocks consumed, feats dict) rather than the kernel."""
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    plain = M.trunk(params, x, dataclasses.replace(cfg, pallas_conv1=False))
    fused = M.trunk(params, x, dataclasses.replace(cfg, pallas_conv1=True))
    assert "conv1_1" not in fused and "conv1_2" not in fused
    for k in plain:
        if k in ("conv1_1", "conv1_2"):
            continue
        p = np.asarray(plain[k], np.float32)
        f = np.asarray(fused[k], np.float32)
        atol = 0.03 * max(np.abs(p).max(), 1e-3)
        np.testing.assert_allclose(f, p, atol=atol,
                                   err_msg=f"feature {k} diverged")

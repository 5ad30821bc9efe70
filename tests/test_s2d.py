"""Space-to-depth conv1 path: exact equivalence with the plain path."""

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.ops import conv as C
from mscnn_tpu.ops import s2d


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 12, 5), jnp.float32)
    np.testing.assert_array_equal(s2d.depth_to_space(s2d.space_to_depth(x)),
                                  np.asarray(x))


def test_s2d_conv_matches_plain(rng):
    x = jnp.asarray(rng.randn(1, 16, 20, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 6) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(6), jnp.float32)
    plain = C.conv2d(x, w, b, padding=1)
    fast = s2d.depth_to_space(
        C.conv2d(s2d.space_to_depth(x), s2d.s2d_conv_kernel(w),
                 s2d.s2d_bias(b), padding=1))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain),
                               atol=1e-4)


def test_phase_max_equals_pool(rng):
    x = jnp.asarray(rng.randn(2, 10, 14, 7), jnp.float32)
    pooled = C.max_pool(x, 2, 2)
    np.testing.assert_allclose(
        np.asarray(s2d.phase_max(s2d.space_to_depth(x))),
        np.asarray(pooled), atol=1e-6)


def test_conv1_block_s2d_matches_plain(rng):
    x = jnp.asarray(rng.randn(2, 24, 32, 3), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 16) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)

    y = jax.nn.relu(C.conv2d(x, w1, b1, padding=1))
    y = jax.nn.relu(C.conv2d(y, w2, b2, padding=1))
    plain = C.max_pool(y, 2, 2)

    fast = s2d.conv1_block_s2d(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain),
                               atol=2e-4)


def test_trunk_s2d_matches_plain(rng):
    """Model-level: trunk with s2d conv1 == plain trunk (pool1 onward)."""
    import dataclasses
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    plain = M.trunk(params, x, dataclasses.replace(cfg, s2d_conv1=False))
    fast = M.trunk(params, x, dataclasses.replace(cfg, s2d_conv1=True))
    for k in ("pool1", "conv4_3", "conv5_3", "pool6", "loss1_conv1"):
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(plain[k]),
                                   atol=3e-3,
                                   err_msg=f"feature {k} diverged")

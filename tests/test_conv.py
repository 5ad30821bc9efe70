"""Conv/pool/deconv primitive tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mscnn_tpu.ops import conv as C


def test_conv2d_shapes(rng):
    x = jnp.asarray(rng.randn(2, 16, 24, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32) * 0.1)
    b = jnp.zeros(8)
    y = C.conv2d(x, w, b, padding=1)
    assert y.shape == (2, 16, 24, 8)
    y2 = C.conv2d(x, w, b, padding="VALID")
    assert y2.shape == (2, 14, 22, 8)


def test_conv2d_matches_numpy(rng):
    x = rng.randn(1, 5, 5, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 4).astype(np.float32)
    got = np.asarray(C.conv2d(jnp.asarray(x), jnp.asarray(w), padding="VALID"))
    want = np.zeros((1, 3, 3, 4), np.float32)
    for i in range(3):
        for j in range(3):
            patch = x[0, i:i + 3, j:j + 3, :]  # [3,3,2]
            want[0, i, j] = np.tensordot(patch, w, axes=([0, 1, 2], [0, 1, 2]))
    assert np.allclose(got, want, atol=1e-4)


def test_max_pool_even_and_ceil(rng):
    x = jnp.asarray(rng.randn(1, 18, 30, 4).astype(np.float32))
    y = C.max_pool(x, 2, 2)
    assert y.shape == (1, 9, 15, 4)
    # caffe ceil mode: 9 -> ceil((9-2)/2)+1 = 5
    y2 = C.max_pool(C.max_pool(x, 2, 2), 2, 2)
    assert y2.shape == (1, 5, 8, 4)
    # oracle on a small case
    x3 = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    y3 = np.asarray(C.max_pool(x3, 2, 2))
    assert np.allclose(y3[0, :, :, 0], [[5, 7], [13, 15]])


def test_vgg_stride_chain():
    """768x576 input must produce the reference's per-branch grid sizes."""
    h, w = 576, 768
    for _ in range(3):
        h, w = -(-h // 2), -(-w // 2)
    assert (h, w) == (72, 96)  # conv4_3: stride 8
    h2, w2 = -(-h // 2), -(-w // 2)
    assert (h2, w2) == (36, 48)  # conv5_3: stride 16
    h3, w3 = -(-h2 // 2), -(-w2 // 2)
    assert (h3, w3) == (18, 24)  # conv6_1: stride 32
    h4, w4 = -(-h3 // 2), -(-w3 // 2)
    assert (h4, w4) == (9, 12)  # pool6: stride 64


def test_bilinear_upsample_2x_constant():
    """2x bilinear upsample of a constant map is constant (interior)."""
    x = jnp.ones((1, 8, 8, 4), jnp.float32) * 3.0
    y = np.asarray(C.upsample2x_bilinear(x))
    assert y.shape == (1, 16, 16, 4)
    assert np.allclose(y[0, 2:-2, 2:-2], 3.0, atol=1e-5)


def test_bilinear_upsample_linear_ramp():
    """Bilinear upsample preserves a linear ramp in the interior."""
    v = np.arange(8, dtype=np.float32)
    x = jnp.asarray(np.tile(v[None, None, :, None], (1, 8, 1, 1)))
    y = np.asarray(C.upsample2x_bilinear(x))[0, 8, :, 0]
    diffs = np.diff(y[2:-2])
    assert np.allclose(diffs, 0.5, atol=1e-5)


def test_dense_and_dropout(rng):
    import jax
    x = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    y = C.dense(x, w)
    assert np.allclose(np.asarray(y), np.asarray(x) @ np.asarray(w), atol=1e-4)
    key = jax.random.PRNGKey(0)
    d_eval = C.dropout(y, 0.5, key, train=False)
    assert np.allclose(np.asarray(d_eval), np.asarray(y))
    d_train = np.asarray(C.dropout(jnp.ones((1000,)), 0.5, key, train=True))
    # inverted dropout: mean preserved, ~half zeros
    assert abs(d_train.mean() - 1.0) < 0.15
    assert 0.35 < (d_train == 0).mean() < 0.65

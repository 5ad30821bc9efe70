"""Finite-difference gradient checks for the hand-semantics ops (the
reference validates every layer this way; detection layers had no tests
there at all — closing that gap here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.ops import conv as C
from mscnn_tpu.ops import layers as LY
from mscnn_tpu.ops import losses as L
from mscnn_tpu.ops import roi as roi_ops
from tests.gradient_check import check_gradient


def test_smooth_l1_gradient(rng):
    pred = jnp.asarray(rng.randn(8, 4), jnp.float32)
    target = jnp.asarray(rng.randn(8, 4), jnp.float32)
    iw = jnp.ones((8, 4))
    ow = jnp.asarray(rng.rand(8, 4), jnp.float32)
    # kink at |d| = 1/sigma^2
    check_gradient(lambda p: L.smooth_l1_loss(p, target, iw, ow, sigma=1.0),
                   pred, kink=None, stepsize=1e-3)


def test_softmax_ce_gradient(rng):
    logits = jnp.asarray(rng.randn(6, 5), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, 6))
    valid = jnp.asarray([True, True, False, True, True, True])
    check_gradient(lambda x: L.softmax_ce_loss(x, labels, valid=valid),
                   logits)


def test_detection_loss_gradient(rng):
    """Joint proposal loss: CE + clamped smooth-L1 through the head output."""
    spec = L.DetectionLossSpec(cls_num=3, field_w=16.0, field_h=16.0,
                               stride=8, sample_mode="all")
    h, w = 4, 6
    head = jnp.asarray(rng.randn(1, h, w, 7) * 0.5, jnp.float32)
    lab = np.zeros((1, h, w, 6), np.float32)
    lab[0, 1, 2] = [1, 20.0, 12.0, 18.0, 14.0, 0.8]   # one positive cell
    lab[0, 3, 4, 5] = 1.0                             # one ignored cell
    labels = jnp.asarray(lab)
    # clamp boundaries are kinks; keep raw outputs small so x stays inside
    check_gradient(lambda x: L.detection_loss(x, labels, spec)[0], head,
                   stepsize=1e-3, threshold=2e-2)


def test_roi_pool_gradient(rng):
    feat = jnp.asarray(rng.randn(1, 12, 16, 4), jnp.float32)
    bidx = jnp.zeros(2, jnp.int32)
    rois = jnp.asarray([[8.0, 8.0, 40.0, 36.0], [0.0, 0.0, 60.0, 44.0]])
    valid = jnp.ones(2, bool)

    def f(x):
        o = roi_ops.roi_max_pool(x, bidx, rois, valid, spatial_scale=0.25,
                                 pad_ratio=0.25, pooled=3, samples=4)
        return jnp.sum(o * o)

    # max-pool gradients have kinks at ties; random floats make ties
    # measure-zero, but keep the threshold loose
    check_gradient(f, feat, stepsize=1e-3, threshold=2e-2)


def test_roi_align_gradient(rng):
    feat = jnp.asarray(rng.randn(1, 10, 12, 3), jnp.float32)
    bidx = jnp.zeros(1, jnp.int32)
    rois = jnp.asarray([[4.0, 4.0, 32.0, 28.0]])
    valid = jnp.ones(1, bool)

    def f(x):
        o = roi_ops.roi_align(x, bidx, rois, valid, spatial_scale=0.25,
                              pad_ratio=0.0, pooled=3)
        return jnp.sum(o * o)

    check_gradient(f, feat, stepsize=1e-3)


def _proj(shape, seed=7):
    """Fixed random +-1 projection: a linear functional keeps the central
    difference well-conditioned in f32 (sums of squares drown the step in
    a large constant offset)."""
    r = np.random.RandomState(seed)
    return jnp.asarray(np.sign(r.randn(*shape)), jnp.float32)


def test_conv_deconv_dense_gradients(rng):
    x = jnp.asarray(rng.randn(1, 6, 8, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4) * 0.3, jnp.float32)
    pc = _proj((1, 6, 8, 4))
    check_gradient(lambda v: jnp.sum(C.conv2d(x, v) * pc), w)
    check_gradient(lambda v: jnp.sum(C.conv2d(v, w) * pc), x)

    wd = jnp.asarray(rng.randn(4, 4, 1, 3) * 0.3, jnp.float32)
    pd = _proj((1, 12, 16, 3))
    check_gradient(
        lambda v: jnp.sum(C.deconv2d(v, wd, stride=2, pad=1, groups=3) * pd),
        x)

    xf = jnp.asarray(rng.randn(5, 7), jnp.float32)
    wf = jnp.asarray(rng.randn(7, 3) * 0.3, jnp.float32)
    pf = _proj((5, 3))
    check_gradient(lambda v: jnp.sum(C.dense(xf, v) * pf), wf)


@pytest.mark.parametrize("name,builder", [
    ("lrn", lambda x: jnp.sum(LY.lrn(x) ** 2)),
    ("bnll", lambda x: jnp.sum(LY.bnll(x))),
    ("elu", lambda x: jnp.sum(LY.elu(x) ** 2)),
    # NB not sum(mvn^2): that is constant by construction (variance
    # normalization), so probe with a fixed random projection instead
    ("mvn", lambda x: jnp.sum(LY.mvn(x) * jnp.sin(
        jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape))),
])
def test_layer_gradients(rng, name, builder):
    x = jnp.asarray(rng.randn(2, 4, 4, 6) * 0.7 + 0.1, jnp.float32)
    check_gradient(builder, x, stepsize=1e-3, threshold=2e-2)


def test_hinge_and_contrastive_gradients(rng):
    scores = jnp.asarray(rng.randn(6, 4), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 4, 6))
    # margins kink at 0; exclude near-kink positions via threshold slack
    check_gradient(lambda s: LY.hinge_loss(s, labels, norm="L2"), scores,
                   threshold=3e-2)
    a = jnp.asarray(rng.randn(5, 3), jnp.float32)
    b = jnp.asarray(rng.randn(5, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 2, 5).astype(np.float32))
    check_gradient(lambda v: LY.contrastive_loss(v, b, y), a, threshold=3e-2)

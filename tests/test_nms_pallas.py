"""Pallas NMS kernel vs the jnp oracle (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.ops import nms as nms_ops
from mscnn_tpu.ops.pallas import nms_kernel


def random_candidates(rng, n=300, img=200.0):
    x = rng.uniform(0, img * 0.8, n)
    y = rng.uniform(0, img * 0.8, n)
    w = rng.uniform(5, img * 0.4, n)
    h = rng.uniform(5, img * 0.4, n)
    boxes = jnp.asarray(np.stack([x, y, w, h], -1), jnp.float32)
    scores = jnp.asarray(rng.randn(n), jnp.float32)
    valid = jnp.asarray(rng.rand(n) > 0.2)
    return boxes, scores, valid


@pytest.mark.parametrize("mode", ["iou", "iomu", "iofu"])
def test_pallas_matches_oracle(rng, mode):
    boxes, scores, valid = random_candidates(rng)
    kw = dict(iou_thr=0.5, mode=mode, max_out=64)
    ob, os_, ov = nms_ops.nms_xywh(boxes, scores, valid, use_pallas=False,
                                   **kw)
    pb, ps, pv = nms_kernel.nms_pallas(boxes, scores, valid, interpret=True,
                                       **kw)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(pv))
    np.testing.assert_allclose(np.asarray(ob), np.asarray(pb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(os_), np.asarray(ps), atol=1e-5)


def test_pallas_unpadded_sizes(rng):
    """Non-multiple-of-128 N is padded internally with invalid entries."""
    boxes, scores, valid = random_candidates(rng, n=77)
    ob, os_, ov = nms_ops.nms_xywh(boxes, scores, valid, iou_thr=0.65,
                                   max_out=32, use_pallas=False)
    pb, ps, pv = nms_kernel.nms_pallas(boxes, scores, valid, iou_thr=0.65,
                                       max_out=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(pv))
    np.testing.assert_allclose(np.asarray(ob), np.asarray(pb), atol=1e-5)


def test_pallas_all_invalid(rng):
    boxes, scores, _ = random_candidates(rng, n=50)
    valid = jnp.zeros(50, bool)
    pb, ps, pv = nms_kernel.nms_pallas(boxes, scores, valid, iou_thr=0.5,
                                       max_out=16, interpret=True)
    assert not np.asarray(pv).any()
    assert np.abs(np.asarray(pb)).sum() == 0.0


def test_pallas_survivor_order_and_suppression(rng):
    """Three overlapping clusters: one survivor each, score-ordered."""
    boxes = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 10.0, 10.0],
        [50.0, 0.0, 10.0, 10.0], [51.0, 0.0, 10.0, 10.0],
        [0.0, 50.0, 10.0, 10.0],
    ])
    scores = jnp.asarray([0.9, 0.95, 0.8, 0.7, 0.5])
    valid = jnp.ones(5, bool)
    pb, ps, pv = nms_kernel.nms_pallas(boxes, scores, valid, iou_thr=0.5,
                                       max_out=4, interpret=True)
    assert np.asarray(pv).tolist() == [True, True, True, False]
    np.testing.assert_allclose(np.asarray(ps[:3]), [0.95, 0.8, 0.5])
    np.testing.assert_allclose(np.asarray(pb[0]), [1, 1, 10, 10])

"""NMS tests against an independent numpy greedy oracle."""

import numpy as np
import jax.numpy as jnp

from mscnn_tpu.ops import nms as N
from tests.test_boxes import np_iou_xywh


def np_greedy_nms(boxes, scores, thr, mode="iou"):
    """Oracle: sort desc, greedy-suppress later overlapping boxes."""
    order = np.argsort(-scores, kind="stable")
    boxes = boxes[order]
    scores = scores[order]
    n = len(boxes)
    keep = np.ones(n, bool)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if keep[j] and np_iou_xywh(boxes[i], boxes[j], mode) > thr:
                keep[j] = False
    return boxes[keep], scores[keep]


def random_boxes(rng, n, span=100.0):
    b = np.zeros((n, 4), np.float32)
    b[:, :2] = rng.uniform(0, span, (n, 2))
    b[:, 2:] = rng.uniform(5, 40, (n, 2))
    return b


def test_nms_matches_oracle(rng):
    for trial in range(5):
        n = 64
        boxes = random_boxes(rng, n)
        scores = rng.uniform(-5, 5, n).astype(np.float32)
        for mode in ("iou", "iomu"):
            want_b, want_s = np_greedy_nms(boxes, scores, 0.5, mode)
            ob, os_, ov = N.nms_xywh(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
                iou_thr=0.5, mode=mode, max_out=n,
            )
            ob, os_, ov = map(np.asarray, (ob, os_, ov))
            k = ov.sum()
            assert k == len(want_b), (trial, mode)
            assert np.allclose(os_[:k], want_s, atol=1e-5)
            assert np.allclose(ob[:k], want_b, atol=1e-4)
            assert not ov[k:].any()


def test_nms_invalid_boxes_dropped(rng):
    n = 16
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:4] = True
    ob, os_, ov = N.nms_xywh(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_thr=0.9, mode="iou", max_out=8,
    )
    assert np.asarray(ov).sum() <= 4


def test_nms_max_out_truncates(rng):
    n = 32
    # non-overlapping boxes: all survive, truncated to max_out by score
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = np.arange(n) * 100.0
    boxes[:, 2:] = 10.0
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ob, os_, ov = N.nms_xywh(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
        iou_thr=0.5, mode="iou", max_out=5,
    )
    assert np.asarray(ov).all()
    top5 = np.sort(scores)[::-1][:5]
    assert np.allclose(np.sort(np.asarray(os_))[::-1], top5, atol=1e-6)


def test_topk_candidates(rng):
    n = 20
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.rand(n) > 0.5
    b, s, v = N.topk_candidates(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 8)
    s, v = np.asarray(s), np.asarray(v)
    want = np.sort(scores[valid])[::-1][:8]
    assert v.sum() == min(8, valid.sum())
    assert np.allclose(s[v], want[: v.sum()], atol=1e-6)

"""Box math golden tests against independent numpy oracles."""

import numpy as np
import jax.numpy as jnp

from mscnn_tpu.ops import boxes as B


def np_iou_xywh(a, b, mode):
    """Scalar oracle mirroring math_functions.cpp:13-35 semantics."""
    x1, y1, w1, h1 = a
    x2, y2, w2, h2 = b
    if w1 <= 0 or h1 <= 0 or w2 <= 0 or h2 <= 0:
        return 0.0
    tlx, tly = max(x1, x2), max(y1, y2)
    brx, bry = min(x1 + w1, x2 + w2), min(y1 + h1, y2 + h2)
    over = 0.0 if (tlx >= brx or tly >= bry) else (brx - tlx) * (bry - tly)
    if mode == "iomu":
        u = min(w1 * h1, w2 * h2)
    elif mode == "iofu":
        u = w1 * h1
    else:
        u = w1 * h1 + w2 * h2 - over
    return over / u


def test_iou_matches_oracle(rng):
    a = rng.uniform(-5, 50, size=(13, 4)).astype(np.float32)
    b = rng.uniform(-5, 50, size=(7, 4)).astype(np.float32)
    # mix in degenerate boxes
    a[0, 2] = -1.0
    b[0, 3] = 0.0
    for mode in B.IOU_MODES:
        got = np.asarray(B.iou_xywh(jnp.asarray(a), jnp.asarray(b), mode))
        for i in range(13):
            for j in range(7):
                want = np_iou_xywh(a[i], b[j], mode)
                assert abs(got[i, j] - want) < 1e-5, (mode, i, j)


def test_iou_identity():
    box = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    for mode in B.IOU_MODES:
        assert np.allclose(B.iou_xywh(box, box, mode), 1.0)


def test_corner_roundtrip(rng):
    b = rng.uniform(0, 100, size=(5, 4)).astype(np.float32)
    c = B.xywh_to_corners(jnp.asarray(b))
    back = B.corners_to_xywh(c)
    assert np.allclose(np.asarray(back), b, atol=1e-5)
    inc = B.corners_to_xywh(c, inclusive=True)
    assert np.allclose(np.asarray(inc)[:, 2], b[:, 2] + 1, atol=1e-5)


def test_decode_anchor_field_center_box():
    """Zero offsets decode to the anchor field box centered at each cell."""
    h, w, c = 4, 6, 5
    scores = np.zeros((h, w, c), np.float32)
    scores[1, 2, 3] = 4.0  # fg_score at cell (1,2) = 4 - 0 = 4
    coords = np.zeros((h, w, 4), np.float32)
    boxes, fg, valid = B.decode_anchor_field(
        jnp.asarray(scores), jnp.asarray(coords),
        field_w=60.0, field_h=60.0, stride=8,
    )
    fg = np.asarray(fg).reshape(h, w)
    assert abs(fg[1, 2] - 4.0) < 1e-5
    bx = np.asarray(boxes).reshape(h, w, 4)
    # cell (1,2): center ((2+.5)*8, (1+.5)*8) = (20, 12); 60x60 box clipped to
    # image (48x32): x1 = max(20-30, 0) = 0, y1 = 0, w = min(60, 48) = 48.
    assert np.allclose(bx[1, 2], [0.0, 0.0, 48.0, 32.0], atol=1e-4)
    assert np.asarray(valid).all()


def test_decode_anchor_field_clamps():
    """Offsets beyond the field ratios are clamped before decoding."""
    h, w = 2, 2
    scores = np.zeros((h, w, 2), np.float32)
    coords = np.full((h, w, 4), 10.0, np.float32)  # way beyond limits
    boxes, _, _ = B.decode_anchor_field(
        jnp.asarray(scores), jnp.asarray(coords),
        field_w=16.0, field_h=16.0, stride=8,
        field_whr=2.0, field_xyr=2.0,
    )
    bx = np.asarray(boxes).reshape(h, w, 4)
    # tx clamped to 0.5 -> cx = 0.5*16 + 4 = 12; tw clamped to log(2) -> bw = 32.
    # x1 = max(12 - 16, 0) = 0, then bw clipped to img_w - x1 = 16.
    assert np.allclose(bx[0, 0], [0.0, 0.0, 16.0, 16.0], atol=1e-4)


def test_encode_decode_roundtrip_anchor_field(rng):
    """decode(encode(gt)) == gt when offsets are within the clamp range."""
    h, w = 6, 8
    stride, fw, fh = 16, 120.0, 120.0
    centers = np.asarray(B.cell_centers(h, w, stride))
    # gts near each cell center with sizes near the field size
    gt_cx = centers[..., 0] + rng.uniform(-20, 20, (h, w))
    gt_cy = centers[..., 1] + rng.uniform(-20, 20, (h, w))
    gt_w = fw * np.exp(rng.uniform(-0.3, 0.3, (h, w)))
    gt_h = fh * np.exp(rng.uniform(-0.3, 0.3, (h, w)))
    t = B.encode_anchor_field_targets(
        jnp.asarray(gt_cx, jnp.float32), jnp.asarray(gt_cy, jnp.float32),
        jnp.asarray(gt_w, jnp.float32), jnp.asarray(gt_h, jnp.float32),
        field_w=fw, field_h=fh, stride=stride,
    )
    t = np.asarray(t)
    cx = t[..., 0] * fw + centers[..., 0]
    cy = t[..., 1] * fh + centers[..., 1]
    bw = fw * np.exp(t[..., 2])
    bh = fh * np.exp(t[..., 3])
    assert np.allclose(cx, gt_cx, atol=1e-3)
    assert np.allclose(cy, gt_cy, atol=1e-3)
    assert np.allclose(bw, gt_w, rtol=1e-4)
    assert np.allclose(bh, gt_h, rtol=1e-4)


def test_encode_roi_targets_normalization(rng):
    rois = rng.uniform(0, 100, (10, 4)).astype(np.float32)
    rois[:, 2:] = rng.uniform(10, 50, (10, 2))
    gts = rois.copy()
    gts[:, 0] += 5.0
    mean = [0.0, 0.0, 0.0, 0.0]
    std = [0.1, 0.1, 0.2, 0.2]
    t = np.asarray(B.encode_roi_targets(jnp.asarray(rois), jnp.asarray(gts), mean, std))
    # identical sizes -> dw = dh = 0; dx = 5/w / 0.1
    assert np.allclose(t[:, 2:], 0.0, atol=1e-5)
    assert np.allclose(t[:, 0], 5.0 / rois[:, 2] / 0.1, atol=1e-4)


def test_decode_with_prior_inverts_encode(rng):
    """decode_with_prior inverts the roi-target encoding (inclusive sizes)."""
    n = 8
    priors = np.zeros((n, 4), np.float32)
    priors[:, 0] = rng.uniform(0, 50, n)
    priors[:, 1] = rng.uniform(0, 50, n)
    priors[:, 2] = priors[:, 0] + rng.uniform(20, 60, n)
    priors[:, 3] = priors[:, 1] + rng.uniform(20, 60, n)
    gts = priors + rng.uniform(-5, 5, (n, 4)).astype(np.float32)
    # encode with inclusive w/h as the reference's proposal_target does
    pri_xywh = np.stack([priors[:, 0], priors[:, 1],
                         priors[:, 2] - priors[:, 0] + 1,
                         priors[:, 3] - priors[:, 1] + 1], axis=-1)
    gt_xywh = np.stack([gts[:, 0], gts[:, 1],
                        gts[:, 2] - gts[:, 0] + 1,
                        gts[:, 3] - gts[:, 1] + 1], axis=-1)
    t = B.encode_roi_targets(jnp.asarray(pri_xywh), jnp.asarray(gt_xywh))
    dec = np.asarray(B.decode_with_prior(t, jnp.asarray(priors)))
    # centers differ by half-pixel conventions; check sizes match exactly
    assert np.allclose(dec[:, 2] - dec[:, 0] + 1, gt_xywh[:, 2], rtol=1e-4)
    assert np.allclose(dec[:, 3] - dec[:, 1] + 1, gt_xywh[:, 3], rtol=1e-4)

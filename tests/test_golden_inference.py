"""Golden end-to-end inference fixtures.

Pins the proposal decode -> NMS -> ROI-head decode -> rescale -> KITTI-txt
chain against INDEPENDENT numpy implementations of the reference's formulas
(box_output_layer.cpp:118-233 for the anchor-field decode + greedy NMS;
run_mscnn_detection.m:75-120 for the final per-class decode/rescale/clip;
writeDetForEval.m + devkit writeLabels for the txt layout) and a frozen
expected label file (tests/assets/golden_000042.txt) checked byte-for-byte.
This is the strongest AP-parity proxy available without pretrained weights
or KITTI data in the container (see PARITY.md).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu import inference as I
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


# ---------------------------------------------------------------------------
# Independent numpy implementations of the reference formulas
# ---------------------------------------------------------------------------

def np_decode_scale(scores, coords, *, field_w, field_h, stride,
                    field_whr=2.0, field_xyr=2.0, min_size=0.0):
    """box_output_layer.cpp:118-161: per-cell decode around the anchor
    field, written independently (plain loops) for cross-checking."""
    h, w, c = scores.shape
    boxes, fg, valid = [], [], []
    for i in range(h):
        for j in range(w):
            bg = scores[i, j, 0]
            pos = scores[i, j, 1:].max()
            fg.append(pos - bg)
            tx, ty, tw, th = coords[i, j]
            tx = min(max(tx, -1.0 / field_xyr), 1.0 / field_xyr)
            ty = min(max(ty, -1.0 / field_xyr), 1.0 / field_xyr)
            tw = min(max(tw, -np.log(field_whr)), np.log(field_whr))
            th = min(max(th, -np.log(field_whr)), np.log(field_whr))
            cx = tx * field_w + (j + 0.5) * stride
            cy = ty * field_h + (i + 0.5) * stride
            bw = field_w * np.exp(tw)
            bh = field_h * np.exp(th)
            x1 = max(cx - bw / 2.0, 0.0)
            y1 = max(cy - bh / 2.0, 0.0)
            bw = min(bw, w * stride - x1)
            bh = min(bh, h * stride - y1)
            boxes.append([x1, y1, bw, bh])
            valid.append(bw >= min_size and bh >= min_size)
    return (np.asarray(boxes, np.float64), np.asarray(fg, np.float64),
            np.asarray(valid, bool))


def np_iou_xywh(a, b):
    """Union-denominator IoU for (x1, y1, w, h) boxes."""
    tlx = max(a[0], b[0])
    tly = max(a[1], b[1])
    brx = min(a[0] + a[2], b[0] + b[2])
    bry = min(a[1] + a[3], b[1] + b[3])
    over = max(brx - tlx, 0.0) * max(bry - tly, 0.0)
    union = a[2] * a[3] + b[2] * b[3] - over
    return over / union if union > 0 else 0.0


def np_greedy_nms(boxes, scores, valid, *, iou_thr, max_out):
    """Greedy score-descending NMS (box_output_layer.cpp:181-233 /
    bbNms.m 'maxg'): returns indices kept, at most max_out."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for idx in order:
        if not valid[idx] or len(keep) >= max_out:
            continue
        if any(np_iou_xywh(boxes[idx], boxes[k]) > iou_thr for k in keep):
            continue
        keep.append(int(idx))
    return keep


# ---------------------------------------------------------------------------
# propose(): head outputs -> proposals, vs the numpy oracle
# ---------------------------------------------------------------------------

def _hot_head_outputs(cfg):
    """Per-scale head tensors, background everywhere except hand-placed hot
    cells (scores chosen away from ties so ordering is unambiguous)."""
    h, w = cfg.input_hw
    outs = []
    c = cfg.num_classes
    for bi, br in enumerate(cfg.branches):
        hh, ww = h // br.stride, w // br.stride
        t = np.zeros((1, hh, ww, c + 4), np.float32)
        t[..., 0] = 10.0  # strong background -> fg score -10 < fg_thr -8
        outs.append(t)
    # scale 0 (stride 8, field 24): two overlapping hot cells -> NMS kills one
    outs[0][0, 2, 3, 0] = 0.0
    outs[0][0, 2, 3, 1] = 6.0                       # fg = 6
    outs[0][0, 2, 3, c:] = [0.1, -0.05, 0.2, 0.1]   # modest offsets
    outs[0][0, 2, 4, 0] = 0.0
    outs[0][0, 2, 4, 1] = 4.5                       # fg = 4.5, overlaps above
    outs[0][0, 2, 4, c:] = [-0.3, 0.0, 0.15, 0.0]
    # far-away cell, different class channel
    outs[0][0, 5, 8, 0] = 0.0
    outs[0][0, 5, 8, 2] = 3.25                      # fg = 3.25
    outs[0][0, 5, 8, c:] = [0.0, 0.0, -0.4, 0.3]
    # scale 1 (stride 16, field 48): one hot cell with clamped offsets
    outs[1][0, 1, 2, 0] = 0.0
    outs[1][0, 1, 2, 1] = 5.0                       # fg = 5
    outs[1][0, 1, 2, c:] = [2.0, -3.0, 1.5, -2.5]   # all beyond clamp limits
    return [jnp.asarray(t) for t in outs]


def test_propose_golden():
    cfg = zoo.tiny_test_config()
    head_outs = _hot_head_outputs(cfg)
    prop = M.propose(head_outs, cfg)

    # numpy oracle over the same tensors
    p = cfg.proposal
    all_b, all_s, all_v = [], [], []
    for br, t in zip(cfg.branches, head_outs):
        t = np.asarray(t)[0]
        b, s, v = np_decode_scale(
            t[..., : cfg.num_classes], t[..., cfg.num_classes:],
            field_w=br.field_w, field_h=br.field_h, stride=br.stride,
            min_size=p.min_size)
        all_b.append(b)
        all_s.append(s)
        all_v.append(v)
    boxes = np.concatenate(all_b)
    scores = np.concatenate(all_s)
    valid = np.concatenate(all_v) & (scores >= p.fg_thr)
    keep = np_greedy_nms(boxes, scores, valid, iou_thr=p.iou_thr,
                         max_out=p.max_out)

    # the oracle found exactly the 3 surviving hand-placed detections
    assert len(keep) == 3
    exp_boxes = boxes[keep]
    exp_scores = scores[keep]

    got_v = np.asarray(prop["valid"][0])
    got_b = np.asarray(prop["boxes"][0])[got_v]      # corners
    got_s = np.asarray(prop["scores"][0])[got_v]
    assert got_b.shape[0] == 3
    # propose returns corners; oracle has xywh — compare in corner space,
    # both score-sorted
    exp_corners = np.stack([exp_boxes[:, 0], exp_boxes[:, 1],
                            exp_boxes[:, 0] + exp_boxes[:, 2],
                            exp_boxes[:, 1] + exp_boxes[:, 3]], -1)
    order_e = np.argsort(-exp_scores)
    order_g = np.argsort(-got_s)
    np.testing.assert_allclose(got_s[order_g], exp_scores[order_e],
                               rtol=1e-5)
    np.testing.assert_allclose(got_b[order_g], exp_corners[order_e],
                               rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# postprocess(): deploy outputs -> per-class detections, vs the numpy oracle,
# then -> KITTI label file, byte-for-byte vs the frozen asset
# ---------------------------------------------------------------------------

def _golden_outputs(cfg):
    """Hand-written ROI-head outputs exercising every postprocess rule:
    proposal-threshold filter, zero-size filter, invalid slot, class-NMS
    suppression, multi-class routing, bbox de-normalization, clipping."""
    rois = np.asarray([
        [64.0, 40.0, 160.0, 104.0],     # A: kept, class 1
        [66.0, 42.0, 162.0, 106.0],     # B: overlaps A, lower score -> NMS'd
        [300.0, 80.0, 420.0, 152.0],    # C: kept, class 2
        [500.0, 100.0, 500.0, 180.0],   # D: zero width -> filtered
        [40.0, 20.0, 120.0, 60.0],      # E: low proposal score -> filtered
        [200.0, 30.0, 280.0, 90.0],     # F: invalid slot
        [600.0, 10.0, 760.0, 120.0],    # G: kept, class 1, clips at edge
        [10.0, 10.0, 50.0, 40.0],       # H: background-dominant -> low score
    ], np.float32)
    cls_pred = np.asarray([
        [0.0, 4.0, 0.0],
        [0.0, 3.0, 0.5],
        [0.5, 0.0, 5.0],
        [0.0, 4.0, 0.0],
        [0.0, 4.0, 0.0],
        [0.0, 4.0, 0.0],
        [0.0, 2.5, 0.0],
        [6.0, 0.0, 0.0],
    ], np.float32)
    bbox_pred = np.zeros((8, 12), np.float32)
    bbox_pred[0, 4:8] = [0.5, -0.25, 0.5, 0.25]     # class-1 deltas for A
    bbox_pred[2, 8:12] = [0.0, 0.0, -1.0, 0.5]      # class-2 deltas for C
    bbox_pred[6, 4:8] = [2.0, 0.0, 3.0, 0.0]        # G: big shift -> clip
    roi_scores = np.asarray([1.0, 1.0, 2.0, 1.0, -20.0, 1.0, 0.5, 1.0],
                            np.float32)
    roi_valid = np.asarray([1, 1, 1, 1, 1, 0, 1, 1], bool)
    return {"rois": jnp.asarray(rois), "cls_pred": jnp.asarray(cls_pred),
            "bbox_pred": jnp.asarray(bbox_pred),
            "roi_scores": jnp.asarray(roi_scores),
            "roi_valid": jnp.asarray(roi_valid)}


def _np_postprocess(outputs, ratios, orig_wh, cfg, spec):
    """run_mscnn_detection.m:75-120 decode/rescale/clip + bbNms 'maxg',
    independently in numpy. Returns {cls: [(x, y, w, h, score), ...]}."""
    rois = np.asarray(outputs["rois"], np.float64)
    cls_pred = np.asarray(outputs["cls_pred"], np.float64)
    bbox_pred = np.asarray(outputs["bbox_pred"], np.float64)
    pscore = np.asarray(outputs["roi_scores"], np.float64)
    valid = np.asarray(outputs["roi_valid"], bool).copy()

    pw = rois[:, 2] - rois[:, 0]
    ph = rois[:, 3] - rois[:, 1]
    valid &= (pscore >= spec.proposal_thr) & (pw != 0) & (ph != 0)
    e = np.exp(cls_pred - cls_pred.max(axis=1, keepdims=True))
    prob = e / e.sum(axis=1, keepdims=True)
    ratio_h, ratio_w = float(ratios[0]), float(ratios[1])
    orig_w, orig_h = float(orig_wh[0]), float(orig_wh[1])

    out = {}
    for k in range(1, cfg.num_classes):
        boxes, scores = [], []
        for r in range(rois.shape[0]):
            bp = bbox_pred[r, 4 * k: 4 * k + 4] * np.asarray(cfg.bbox_std) \
                + np.asarray(cfg.bbox_mean)
            cx = rois[r, 0] + 0.5 * pw[r] + bp[0] * pw[r]
            cy = rois[r, 1] + 0.5 * ph[r] + bp[1] * ph[r]
            bw = pw[r] * np.exp(bp[2])
            bh = ph[r] * np.exp(bp[3])
            x = max((cx - bw / 2.0) / ratio_w, 0.0)
            y = max((cy - bh / 2.0) / ratio_h, 0.0)
            w_ = min(bw / ratio_w, orig_w - x)
            h_ = min(bh / ratio_h, orig_h - y)
            boxes.append([x, y, w_, h_])
            scores.append(prob[r, k] if valid[r] else 0.0)
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        keep = np_greedy_nms(boxes, scores, valid,
                             iou_thr=spec.nms_overlap,
                             max_out=spec.max_per_class)
        out[k] = [(boxes[i][0], boxes[i][1], boxes[i][2], boxes[i][3],
                   scores[i]) for i in keep]
    return out


def test_postprocess_golden_vs_numpy(tmp_path):
    cfg = zoo.tiny_test_config()
    spec = I.DetectSpec(proposal_thr=-10.0, nms_overlap=0.5,
                        max_per_class=10, score_thr=0.01)
    outputs = _golden_outputs(cfg)
    # net input 768x1280 downscaled from a 1536x2560 original
    ratios = jnp.asarray([0.5, 0.5], jnp.float32)
    orig_wh = jnp.asarray([2560.0, 1536.0], jnp.float32)

    boxes, scores, valid = I.postprocess(outputs, ratios, orig_wh, cfg, spec)
    exp = _np_postprocess(outputs, [0.5, 0.5], [2560.0, 1536.0], cfg, spec)

    for k in range(1, cfg.num_classes):
        row = k - 1
        got_v = np.asarray(valid[row])
        got_b = np.asarray(boxes[row])[got_v]
        got_s = np.asarray(scores[row])[got_v]
        exp_rows = [r for r in exp[k] if r[4] >= spec.score_thr]
        assert got_b.shape[0] == len(exp_rows), f"class {k}"
        order_g = np.argsort(-got_s)
        exp_rows = sorted(exp_rows, key=lambda r: -r[4])
        for gi, er in zip(order_g, exp_rows):
            np.testing.assert_allclose(got_b[gi], er[:4], rtol=1e-4,
                                       atol=1e-2)
            np.testing.assert_allclose(got_s[gi], er[4], rtol=1e-4)

    # exercised every rule? class 1: A, G (B suppressed by A); class 2:
    # C plus the low-prob class-2 views of B and G (A's suppressed by B's)
    surv = {k: [r for r in exp[k] if r[4] >= spec.score_thr] for k in exp}
    assert len(surv[1]) == 2 and len(surv[2]) == 3


def test_kitti_txt_golden(tmp_path):
    """Full chain to disk: postprocess -> detections_to_kitti ->
    write_kitti_labels must reproduce the frozen asset byte-for-byte."""
    cfg = zoo.tiny_test_config()
    spec = I.DetectSpec(proposal_thr=-10.0, nms_overlap=0.5,
                        max_per_class=10, score_thr=0.01)
    outputs = _golden_outputs(cfg)
    ratios = jnp.asarray([0.5, 0.5], jnp.float32)
    orig_wh = jnp.asarray([2560.0, 1536.0], jnp.float32)
    boxes, scores, valid = I.postprocess(outputs, ratios, orig_wh, cfg, spec)
    det = {"boxes": np.asarray(boxes), "scores": np.asarray(scores),
           "valid": np.asarray(valid)}
    objs = I.detections_to_kitti(det, ("bg", "Car", "Pedestrian"))
    I.write_kitti_labels(objs, str(tmp_path), 42)

    got = open(os.path.join(str(tmp_path), "000042.txt"), "rb").read()
    exp = open(os.path.join(ASSETS, "golden_000042.txt"), "rb").read()
    assert got == exp, (f"KITTI txt drifted from the frozen fixture:\n"
                        f"got:\n{got.decode()}\nexpected:\n{exp.decode()}")

"""Detection losses and metrics as pure, fixed-shape functions.

TPU-native re-formulation of the reference's loss layers:
  * detection_loss  -- DetectionLoss (detection_loss_layer.cpp:115-471): joint
    per-scale softmax CE with hard-negative bootstrapping + clamped coordinate
    regression. The reference builds its bootstrap keep-map on the host every
    iteration (detection_loss_layer.cu:129-190); here the sampling is rank- and
    scatter-based jnp so the whole loss stays on device.
  * smooth_l1_loss  -- SmoothL1Loss (smooth_L1_loss_layer.cu).
  * softmax_ce_loss -- SoftmaxWithLoss with optional per-sample weights.
  * detection_accuracy / bbox_accuracy -- metric twins (emit -1 when a batch
    has no valid samples, which the solver's Test() skips when averaging).

Label maps are [B, H, W, 6] channel-last: (label, cx, cy, w, h, iou).
Gradients match the reference's hand-written backward passes: the coordinate
clamps use a straight-through estimator because the reference applies the
clamp in the forward but propagates the raw (clipped-diff) gradient.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mscnn_tpu.ops import boxes as box_ops


def st_clip(x, lo, hi):
    """Clip with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


@dataclasses.dataclass(frozen=True)
class DetectionLossSpec:
    """DetectionLossParameter (caffe.proto:1277-1296)."""
    cls_num: int
    field_w: float
    field_h: float
    stride: int
    lambda_: float = 1.0
    field_whr: float = 2.0
    field_xyr: float = 2.0
    bb_smooth: bool = True
    bg_threshold: float = 0.2
    bg_multiple: float = 2.0
    sample_mode: str = "bootstrap"   # random | bootstrap | mixture | all
    objectness: bool = False
    iou_weighted: bool = False
    pos_neg_weighted: bool = False
    bbox_mean: Optional[tuple] = None
    bbox_std: Optional[tuple] = None


def _rank_desc(x):
    """rank[j] = position of element j in a descending sort of x."""
    order = jnp.argsort(-x)
    n = x.shape[0]
    return jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))


def _bootstrap_keep_map(scores_flat, label_flat, bg_eligible, spec, ratio):
    """Per-class top-k hard negative mining (detection_loss_layer.cpp:176-199).

    scores_flat: [S, C] raw class scores; returns bool [S] keep map over
    background cells.
    """
    keep = jnp.zeros(bg_eligible.shape, bool)
    n_eligible = bg_eligible.sum()
    for k in range(1, spec.cls_num):
        n_k = (label_flat == k).sum()
        sort_num = jnp.maximum(4, (n_k * spec.bg_multiple * ratio).astype(jnp.int32))
        sort_num = jnp.minimum(sort_num, n_eligible)
        s_k = jnp.where(bg_eligible, scores_flat[:, k], -jnp.inf)
        rank = _rank_desc(s_k)
        keep = keep | (bg_eligible & (rank < sort_num))
    return keep


def _random_keep_map(key, label_flat, bg_eligible, spec, ratio, positive_num):
    """Random background sampling with replacement (cpp:161-174)."""
    s = label_flat.shape[0]
    n_draw = jnp.maximum(
        (positive_num * spec.bg_multiple * ratio).astype(jnp.int32),
        4 * (spec.cls_num - 1))
    draws = jax.random.randint(key, (s,), 0, s)  # static cap: spatial_dim draws
    active = jnp.arange(s) < n_draw
    hit = (active & bg_eligible[draws]).astype(jnp.int32)
    return jnp.zeros(s, jnp.int32).at[draws].max(hit) > 0


def detection_loss(head_out, labels, spec: DetectionLossSpec,
                   key: Optional[jax.Array] = None):
    """Joint proposal loss for one scale.

    head_out: [B, H, W, C+4] raw head output; labels: [B, H, W, 6].
    Returns (total_loss, aux) where aux carries (cls_loss, coord_loss,
    cls_count, coord_count) for logging; total = cls + lambda * coord, each
    normalized by its global (batch-wide) count, mirroring the reference's
    top [loss, lambda*coord_loss] at detection_loss_layer.cpp:381-382.
    """
    b, h, w, _ = head_out.shape
    c = spec.cls_num
    s = h * w
    scores = head_out[..., :c].reshape(b, s, c)
    coords = head_out[..., c:].reshape(b, s, 4)
    lab = labels.reshape(b, s, 6)
    label_value = lab[..., 0].astype(jnp.int32)
    if spec.objectness:
        label_value = jnp.minimum(label_value, 1)
    iou_ch = lab[..., 5]

    is_pos = label_value != 0
    bg_eligible = (label_value == 0) & (iou_ch < spec.bg_threshold)
    positive_num = is_pos.sum(axis=1)

    # --- bootstrap / random keep map over background cells ------------------
    mode = spec.sample_mode
    ratio = 0.5 if mode == "mixture" else 1.0
    keep = jnp.zeros((b, s), bool)
    if mode in ("random", "mixture"):
        if key is None:
            raise ValueError("sample_mode 'random'/'mixture' needs a PRNG key")
        keys = jax.random.split(key, b)
        keep |= jax.vmap(
            lambda k, lv, el, pn: _random_keep_map(k, lv, el, spec, ratio, pn)
        )(keys, label_value, bg_eligible, positive_num)
    if mode in ("bootstrap", "mixture"):
        keep |= jax.vmap(
            lambda sc, lv, el: _bootstrap_keep_map(sc, lv, el, spec, ratio)
        )(jax.lax.stop_gradient(scores), label_value, bg_eligible)
    if mode not in ("random", "bootstrap", "mixture"):
        keep = bg_eligible

    keep_num = keep.sum()
    total_pos = positive_num.sum()

    # --- weight map ---------------------------------------------------------
    weight = jnp.ones((b, s), jnp.float32)
    if spec.iou_weighted:
        weight = jnp.where(is_pos, iou_ch, weight)
    if spec.pos_neg_weighted:
        pos_wsum = jnp.where(is_pos, weight, 0.0).sum()
        neg_wsum = jnp.where(keep, weight, 0.0).sum()
        fg_w = 1.0 / (1.0 + spec.bg_multiple)
        sample_num = (keep_num + total_pos).astype(jnp.float32)
        pos_scale = jnp.where(pos_wsum != 0, fg_w * sample_num / jnp.where(pos_wsum != 0, pos_wsum, 1.0), 1.0)
        neg_scale = jnp.where(pos_wsum != 0, (1 - fg_w) * sample_num / jnp.where(neg_wsum != 0, neg_wsum, 1.0), 1.0)
        weight = weight * jnp.where(is_pos, pos_scale, neg_scale)
    weight = jax.lax.stop_gradient(weight)

    # --- classification loss ------------------------------------------------
    in_loss = is_pos | keep
    logp = jax.nn.log_softmax(scores, axis=-1)
    picked = jnp.take_along_axis(logp, label_value[..., None], axis=-1)[..., 0]
    cls_count = in_loss.sum()
    cls_loss = -(jnp.where(in_loss, picked * weight, 0.0)).sum()
    cls_loss = jnp.where(cls_count > 0, cls_loss / cls_count, 0.0)

    # --- coordinate loss ----------------------------------------------------
    mean = spec.bbox_mean
    std = spec.bbox_std
    targets = box_ops.encode_anchor_field_targets(
        lab[..., 1].reshape(b, h, w), lab[..., 2].reshape(b, h, w),
        lab[..., 3].reshape(b, h, w), lab[..., 4].reshape(b, h, w),
        field_w=spec.field_w, field_h=spec.field_h, stride=spec.stride,
        bbox_mean=mean, bbox_std=std,
    ).reshape(b, s, 4)

    mean_a = jnp.asarray(mean if mean is not None else (0.0,) * 4)
    std_a = jnp.asarray(std if std is not None else (1.0,) * 4)
    xyr_mean = (mean_a[0] + mean_a[1]) / 2.0
    whr_mean = (mean_a[2] + mean_a[3]) / 2.0
    xyr_std = jnp.sqrt(std_a[0] * std_a[1])
    whr_std = jnp.sqrt(std_a[2] * std_a[3])
    max_xyr = (1.0 / spec.field_xyr - xyr_mean) / xyr_std
    min_xyr = (-1.0 / spec.field_xyr - xyr_mean) / xyr_std
    max_whr = (jnp.log(spec.field_whr) - whr_mean) / whr_std
    min_whr = (jnp.log(1.0 / spec.field_whr) - whr_mean) / whr_std

    t = coords
    t = jnp.stack([
        st_clip(t[..., 0], min_xyr, max_xyr),
        st_clip(t[..., 1], min_xyr, max_xyr),
        st_clip(t[..., 2], min_whr, max_whr),
        st_clip(t[..., 3], min_whr, max_whr),
    ], axis=-1)
    diff = t - jax.lax.stop_gradient(targets)
    if spec.bb_smooth:
        ad = jnp.abs(diff)
        per = jnp.where(ad < 1.0, 0.5 * diff * diff, ad - 0.5)
    else:
        per = 0.5 * diff * diff
    pos_mask = is_pos[..., None]
    coord_count = 4 * total_pos
    coord_loss = jnp.where(pos_mask, per, 0.0).sum()
    coord_loss = jnp.where(coord_count > 0, coord_loss / coord_count, 0.0)

    total = cls_loss + spec.lambda_ * coord_loss
    aux = {
        "cls_loss": cls_loss,
        "coord_loss": spec.lambda_ * coord_loss,
        "cls_count": cls_count,
        "coord_count": coord_count,
        "keep_num": keep_num,
        "pos_num": total_pos,
    }
    return total, aux


def detection_accuracy(head_out, labels, spec: DetectionLossSpec, top_k: int = 1):
    """Metric twin of detection_loss (detection_accuracy_layer.cpp:86-197).

    Returns dict(accuracy, fore_accuracy, boxiou); each is -1 when its count
    is zero, matching the reference's Test-skip convention.
    """
    b, h, w, _ = head_out.shape
    c = spec.cls_num
    s = h * w
    scores = head_out[..., :c].reshape(b, s, c)
    coords = head_out[..., c:]
    lab = labels.reshape(b, s, 6)
    label_value = lab[..., 0].astype(jnp.int32)
    if spec.objectness:
        label_value = jnp.minimum(label_value, 1)
    is_pos = label_value != 0
    considered = is_pos | ((label_value == 0) & (lab[..., 5] < spec.bg_threshold))

    # top-k accuracy: label's score rank among classes < top_k
    label_score = jnp.take_along_axis(scores, label_value[..., None], -1)[..., 0]
    rank = (scores > label_score[..., None]).sum(-1)
    correct = rank < top_k
    acc_count = considered.sum()
    fore_count = is_pos.sum()
    accuracy = jnp.where(
        acc_count > 0, jnp.where(considered, correct, False).sum() / acc_count, -1.0)
    fore_acc = jnp.where(
        fore_count > 0, jnp.where(is_pos, correct, False).sum() / fore_count, -1.0)

    # decoded-box IoU vs gt on positive cells. Unlike BoxOutput, the accuracy
    # layer does NOT clip boxes to the image (detection_accuracy_layer.cpp:
    # 164-177), so decode inline rather than via decode_anchor_field.
    t = coords.reshape(b, s, 4)
    if spec.bbox_mean is not None and spec.bbox_std is not None:
        t = t * jnp.asarray(spec.bbox_std) + jnp.asarray(spec.bbox_mean)
    max_xyr = 1.0 / spec.field_xyr
    max_whr = jnp.log(spec.field_whr)
    centers = box_ops.cell_centers(h, w, float(spec.stride)).reshape(s, 2)
    tx = jnp.clip(t[..., 0], -max_xyr, max_xyr) * spec.field_w + centers[None, :, 0]
    ty = jnp.clip(t[..., 1], -max_xyr, max_xyr) * spec.field_h + centers[None, :, 1]
    tw = spec.field_w * jnp.exp(jnp.clip(t[..., 2], -max_whr, max_whr))
    th = spec.field_h * jnp.exp(jnp.clip(t[..., 3], -max_whr, max_whr))
    dec = jnp.stack([tx - tw / 2.0, ty - th / 2.0, tw, th], axis=-1)
    gt = jnp.stack([
        lab[..., 1] - lab[..., 3] / 2.0,
        lab[..., 2] - lab[..., 4] / 2.0,
        lab[..., 3], lab[..., 4],
    ], axis=-1)
    iou = box_ops.iou_aligned_xywh(dec, gt)
    boxiou = jnp.where(
        fore_count > 0, jnp.where(is_pos, iou, 0.0).sum() / fore_count, -1.0)
    return {"accuracy": accuracy, "fore_accuracy": fore_acc, "boxiou": boxiou}


def smooth_l1_loss(pred, target, inside_w, outside_w, sigma: float = 1.0):
    """SmoothL1Loss with sigma^2 kink (smooth_L1_loss_layer.cu:19-65).

    All inputs [N, D]; returns sum(outside_w * f(inside_w * (pred - target))) / N.
    """
    sigma2 = sigma * sigma
    d = inside_w * (pred - target)
    ad = jnp.abs(d)
    per = jnp.where(ad < 1.0 / sigma2, 0.5 * d * d * sigma2, ad - 0.5 / sigma2)
    return (outside_w * per).sum() / pred.shape[0]


def softmax_ce_loss(logits, labels, sample_weight=None, valid=None):
    """SoftmaxWithLoss over rois; optional per-sample weights and validity.

    logits: [N, C]; labels: [N] int. Normalizes by the number of valid rois.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
    w = jnp.ones_like(picked) if sample_weight is None else sample_weight
    if valid is not None:
        w = jnp.where(valid, w, 0.0)
        n = jnp.maximum(valid.sum(), 1)
    else:
        n = picked.shape[0]
    return -(w * picked).sum() / n


def roi_accuracy(logits, labels, valid=None):
    """Accuracy layer over roi classifications."""
    correct = jnp.argmax(logits, -1) == labels
    if valid is None:
        return correct.mean()
    n = valid.sum()
    return jnp.where(n > 0, jnp.where(valid, correct, False).sum() / n, -1.0)


def bbox_accuracy(bbox_pred, rois_corners, match_gt, valid=None,
                  bbox_mean=None, bbox_std=None, cls_aware: bool = True):
    """BboxAccuracy (bbox_accuracy_layer.cpp:37-129): mean IoU of decoded
    boxes vs matched gts, before and after regression.

    bbox_pred: [N, 4K]; rois_corners: [N, 4]; match_gt: [N, 6]
    (label, x1, y1, x2, y2, overlap). Returns (post_iou, pre_iou), -1 if no
    countable fg. Rows whose match overlap exceeds 0.975 — the gt rows
    ProposalTarget appends as rois — are excluded from both numerator and
    denominator (gt_flags, bbox_accuracy_layer.cpp:73-77,:108); pinned
    against reference-executed fixtures in tests/test_golden_ref.py.
    """
    labels = match_gt[:, 0].astype(jnp.int32)
    fg = (labels > 0) & (match_gt[:, 5] <= 0.975)
    if valid is not None:
        fg = fg & valid
    dec = box_ops.decode_with_prior(bbox_pred, rois_corners, bbox_mean, bbox_std)
    k = bbox_pred.shape[-1] // 4
    cls_slot = jnp.where(cls_aware, jnp.minimum(labels, k - 1), 1)
    idx = cls_slot[:, None] * 4 + jnp.arange(4)[None, :]
    picked = jnp.take_along_axis(dec, idx, axis=-1)  # [N, 4] corners

    gt = match_gt[:, 1:5]
    pre = box_ops.iou_corners(rois_corners[:, None, :], gt[:, None, :],
                              inclusive=True)[:, 0, 0]
    post = box_ops.iou_corners(picked[:, None, :], gt[:, None, :],
                               inclusive=True)[:, 0, 0]
    n = fg.sum()
    pre_iou = jnp.where(n > 0, jnp.where(fg, pre, 0.0).sum() / n, -1.0)
    post_iou = jnp.where(n > 0, jnp.where(fg, post, 0.0).sum() / n, -1.0)
    return post_iou, pre_iou

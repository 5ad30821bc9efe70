"""Fast-R-CNN proposal-target sampling, fixed-shape and on-device.

Re-formulation of ProposalTargetLayer
(/root/reference/src/caffe/layers/proposal_target_layer.cpp:67-366): append
gts to the proposals, match every candidate to its best gt by IoU, split into
foreground / background / discard pools, then sample a fixed-size roi batch
at the given fg fraction. The reference's sequential shuffle + refill +
synthesize-random-background control flow becomes a single priority-based
top-k per pool:

  fg pool:      priority = U(0,1)            (random subset when oversubscribed)
  bg pool:      priority = 2 + U(0,1)        (random subset first)
  discard pool: priority = 1 - i*eps         (refill in original order)
  synthesized:  priority = 0.5 - i*eps       (last resort, random >=32px boxes
                                              with max-gt-IoU < fg_thr)

selecting the top (batch - n_fg) background slots reproduces the reference's
fill order exactly: random bgs, then discards front-first, then synth boxes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mscnn_tpu.ops import boxes as box_ops

NEG = jnp.float32(-1e30)


@dataclasses.dataclass(frozen=True)
class ProposalTargetSpec:
    """ProposalTargetParameter (caffe.proto:1332-1343) + bbox_reg_param."""
    cls_num: int
    batch_size: int = 256          # fixed output roi count (-1 -> keep-all
    fg_fraction: float = 0.25      # handled by keep_all=True)
    fg_thr: float = 0.5
    bg_thr_hg: float = 0.49
    bg_thr_lw: float = 0.1
    num_img_per_batch: int = 4
    img_width: int = 768
    img_height: int = 576
    iou_weighted: bool = False
    cls_aware: bool = True         # bbox_reg_param.cls_aware
    bbox_mean: Optional[tuple] = (0.0, 0.0, 0.0, 0.0)
    bbox_std: Optional[tuple] = (0.1, 0.1, 0.2, 0.2)
    keep_all: bool = False         # batch_size == -1 mode (cascade stages)

    @property
    def target_dim(self) -> int:
        return 4 * self.cls_num if self.cls_aware else 8


def _rank_desc(x):
    order = jnp.argsort(-x)
    n = x.shape[0]
    return jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))


def proposal_target_keep_all(roi_batch_idx, roi_boxes, roi_valid,
                             gt_boxes, gt_valid, spec: ProposalTargetSpec):
    """batch_size == -1 mode (cascade later stages): keep every candidate
    (proposals + gts), no sampling, no synthesized backgrounds. Output row
    count is fixed at N + G; candidates falling outside both the fg and bg
    ranges are masked invalid (with bg range [0, fg_thr) nothing is).
    """
    n = roi_boxes.shape[0]
    g = gt_boxes.shape[0]

    gt_xywh = jnp.stack([
        gt_boxes[:, 1], gt_boxes[:, 2],
        gt_boxes[:, 3] - gt_boxes[:, 1] + 1.0,
        gt_boxes[:, 4] - gt_boxes[:, 2] + 1.0,
    ], axis=-1)
    gt_img = gt_boxes[:, 0].astype(jnp.int32)
    gt_label = gt_boxes[:, 5]
    gt_ignored = gt_boxes[:, 6] != 0

    roi_xywh = jnp.stack([
        roi_boxes[:, 0], roi_boxes[:, 1],
        roi_boxes[:, 2] - roi_boxes[:, 0] + 1.0,
        roi_boxes[:, 3] - roi_boxes[:, 1] + 1.0,
    ], axis=-1)

    cand_xywh = jnp.concatenate([roi_xywh, gt_xywh], 0)
    cand_img = jnp.concatenate([roi_batch_idx, gt_img], 0)
    cand_valid = jnp.concatenate([roi_valid, gt_valid & ~gt_ignored], 0)
    R = n + g

    iou = box_ops.iou_xywh(cand_xywh, gt_xywh)
    same_img = cand_img[:, None] == gt_img[None, :]
    iou = jnp.where(same_img & gt_valid[None, :], iou, -1.0)
    max_ov = jnp.max(iou, axis=1)
    max_gt = jnp.argmax(iou, axis=1)
    has_gt = max_ov >= 0.0
    max_ov = jnp.maximum(max_ov, 0.0)
    matched_ignored = jnp.where(has_gt, gt_ignored[max_gt], False)

    is_fg = cand_valid & (max_ov >= spec.fg_thr) & ~matched_ignored
    is_bg = cand_valid & (max_ov >= spec.bg_thr_lw) & \
        (max_ov < spec.bg_thr_hg) & ~is_fg
    keep = is_fg | is_bg
    labels = jnp.where(is_fg, gt_label[max_gt].astype(jnp.int32), 0)

    tgt_raw = box_ops.encode_roi_targets(
        cand_xywh, gt_xywh[max_gt], spec.bbox_mean, spec.bbox_std)
    tgt_valid = is_fg & has_gt

    D = spec.target_dim
    cls_slot = jnp.where(
        jnp.asarray(spec.cls_aware), labels, jnp.minimum(labels, 1))
    col = cls_slot[:, None] * 4 + jnp.arange(4)[None, :]
    row = jnp.arange(R)[:, None]
    bbox_targets = jnp.zeros((R, D)).at[row, col].set(
        jnp.where(tgt_valid[:, None], tgt_raw, 0.0))
    w_on = jnp.where(tgt_valid & (labels > 0), 1.0, 0.0)
    inside_w = jnp.zeros((R, D)).at[row, col].set(
        jnp.broadcast_to(w_on[:, None], (R, 4)))

    fg_row = (labels > 0) & has_gt
    mg = jnp.stack([
        labels.astype(jnp.float32),
        gt_boxes[max_gt, 1], gt_boxes[max_gt, 2],
        gt_boxes[max_gt, 3], gt_boxes[max_gt, 4],
        max_ov,
    ], axis=-1)
    match_gt = jnp.where(fg_row[:, None], mg, 0.0)

    rois = jnp.stack([
        cand_xywh[:, 0], cand_xywh[:, 1],
        cand_xywh[:, 0] + cand_xywh[:, 2] - 1.0,
        cand_xywh[:, 1] + cand_xywh[:, 3] - 1.0,
    ], axis=-1)

    return {
        "batch_idx": cand_img,
        "rois": rois,
        "labels": labels,
        "bbox_targets": bbox_targets,
        "inside_w": inside_w,
        "outside_w": inside_w,
        "match_gt": match_gt,
        "sample_weight": jnp.ones(R),
        "valid": keep,
        "n_fg": is_fg.sum(),
    }


def proposal_target(key, roi_batch_idx, roi_boxes, roi_valid,
                    gt_boxes, gt_valid, spec: ProposalTargetSpec):
    """Sample the detection-subnet roi batch.

    roi_batch_idx: [N] int; roi_boxes: [N, 4] corners (x2 = x1 + w, the
    BoxOutput convention); roi_valid: [N] bool.
    gt_boxes: [G, 7] (img_id, x1, y1, x2, y2, label, ignored); gt_valid: [G].

    Returns dict with fixed R = spec.batch_size rows:
      batch_idx [R], rois [R, 4] (corners, x2 = x1 + w - 1 inclusive, as the
      reference emits), labels [R], bbox_targets [R, D], inside_w [R, D],
      outside_w [R, D], match_gt [R, 6] (label, x1, y1, x2, y2, overlap),
      sample_weight [R], valid [R].
    """
    n = roi_boxes.shape[0]
    g = gt_boxes.shape[0]
    R = spec.batch_size

    k_fg, k_bg, k_synth_box, k_synth_img = jax.random.split(key, 4)

    # --- candidate set: proposals + gts (cpp:107-130) -----------------------
    gt_xywh = jnp.stack([
        gt_boxes[:, 1], gt_boxes[:, 2],
        gt_boxes[:, 3] - gt_boxes[:, 1] + 1.0,
        gt_boxes[:, 4] - gt_boxes[:, 2] + 1.0,
    ], axis=-1)
    gt_img = gt_boxes[:, 0].astype(jnp.int32)
    gt_label = gt_boxes[:, 5]
    gt_ignored = gt_boxes[:, 6] != 0

    roi_xywh = jnp.stack([
        roi_boxes[:, 0], roi_boxes[:, 1],
        roi_boxes[:, 2] - roi_boxes[:, 0] + 1.0,
        roi_boxes[:, 3] - roi_boxes[:, 1] + 1.0,
    ], axis=-1)

    # synthesized random background boxes (cpp:203-234), pool of R candidates
    sw = jax.random.randint(k_synth_box, (R,), 0, max(spec.img_width - 32, 1))
    sh = jax.random.randint(jax.random.fold_in(k_synth_box, 1), (R,), 0,
                            max(spec.img_height - 32, 1))
    swd = jax.random.randint(jax.random.fold_in(k_synth_box, 2), (R,), 32,
                             spec.img_width + 1) % jnp.maximum(spec.img_width - sw, 1)
    shd = jax.random.randint(jax.random.fold_in(k_synth_box, 3), (R,), 32,
                             spec.img_height + 1) % jnp.maximum(spec.img_height - sh, 1)
    swd = jnp.maximum(swd, 32)
    shd = jnp.maximum(shd, 32)
    synth_img = jax.random.randint(k_synth_img, (R,), 0, spec.num_img_per_batch)
    synth_xywh = jnp.stack([sw, sh, swd, shd], -1).astype(jnp.float32)

    cand_xywh = jnp.concatenate([roi_xywh, gt_xywh, synth_xywh], 0)
    cand_img = jnp.concatenate([roi_batch_idx, gt_img, synth_img], 0)
    cand_valid = jnp.concatenate(
        [roi_valid, gt_valid, jnp.ones(R, bool)], 0)
    is_synth = jnp.concatenate(
        [jnp.zeros(n + g, bool), jnp.ones(R, bool)], 0)
    total = n + g + R

    # --- match candidates to gts (cpp:132-150) ------------------------------
    iou = box_ops.iou_xywh(cand_xywh, gt_xywh)  # [total, G]
    same_img = cand_img[:, None] == gt_img[None, :]
    iou = jnp.where(same_img & gt_valid[None, :], iou, -1.0)
    max_ov = jnp.max(iou, axis=1)
    max_gt = jnp.argmax(iou, axis=1)
    has_gt = max_ov >= 0.0
    max_ov = jnp.maximum(max_ov, 0.0)  # no gt in image -> overlap 0

    matched_ignored = jnp.where(has_gt, gt_ignored[max_gt], False)

    # --- pools (cpp:152-165) -----------------------------------------------
    is_fg = cand_valid & ~is_synth & (max_ov >= spec.fg_thr) & ~matched_ignored
    is_bg = cand_valid & ~is_synth & (max_ov >= spec.bg_thr_lw) & \
        (max_ov < spec.bg_thr_hg)
    is_discard = cand_valid & ~is_synth & ~is_fg & ~is_bg
    synth_ok = is_synth & (max_ov < spec.fg_thr)

    n_fg_cand = is_fg.sum()
    fg_per_batch = int(round(spec.fg_fraction * R))
    n_fg = jnp.minimum(n_fg_cand, fg_per_batch)

    # --- fg selection: random subset via priority top-k ---------------------
    u_fg = jax.random.uniform(k_fg, (total,))
    fg_pri = jnp.where(is_fg, u_fg, NEG)
    fg_rank = _rank_desc(fg_pri)
    fg_order = jnp.argsort(-fg_pri)          # candidate indices best-first

    # --- bg selection: bg pool > discard pool > synth pool ------------------
    u_bg = jax.random.uniform(k_bg, (total,))
    eps = 1e-6
    pos_idx = jnp.arange(total, dtype=jnp.float32)
    bg_pri = jnp.where(is_bg, 2.0 + u_bg,
             jnp.where(is_discard, 1.0 - eps * pos_idx,
             jnp.where(synth_ok, 0.5 - eps * pos_idx, NEG)))
    bg_order = jnp.argsort(-bg_pri)

    # --- compose the fixed roi batch: fg slots then bg slots ----------------
    slot = jnp.arange(R)
    slot_is_fg = slot < n_fg
    fg_take = fg_order[jnp.minimum(slot, total - 1)]
    bg_take = bg_order[jnp.clip(slot - n_fg, 0, total - 1)]
    take = jnp.where(slot_is_fg, fg_take, bg_take)

    sel_xywh = cand_xywh[take]
    sel_img = cand_img[take]
    sel_gt = max_gt[take]
    sel_ov = max_ov[take]
    sel_has_gt = has_gt[take]
    labels = jnp.where(slot_is_fg, gt_label[sel_gt].astype(jnp.int32), 0)

    # --- regression targets (cpp:249-291) -----------------------------------
    tgt_raw = box_ops.encode_roi_targets(
        sel_xywh, gt_xywh[sel_gt], spec.bbox_mean, spec.bbox_std)
    tgt_valid = sel_has_gt & slot_is_fg

    D = spec.target_dim
    cls_slot = jnp.where(
        jnp.asarray(spec.cls_aware), labels, jnp.minimum(labels, 1))
    col = cls_slot[:, None] * 4 + jnp.arange(4)[None, :]  # [R, 4]
    row = jnp.arange(R)[:, None]
    bbox_targets = jnp.zeros((R, D)).at[row, col].set(
        jnp.where(tgt_valid[:, None], tgt_raw, 0.0))
    w_on = jnp.where(tgt_valid & (labels > 0), 1.0, 0.0)
    inside_w = jnp.zeros((R, D)).at[row, col].set(
        jnp.broadcast_to(w_on[:, None], (R, 4)))
    outside_w = inside_w

    # --- matched gt boxes for BboxAccuracy (label, x1, y1, x2, y2, overlap) --
    fg_row = (labels > 0) & sel_has_gt
    mg = jnp.stack([
        labels.astype(jnp.float32),
        gt_boxes[sel_gt, 1], gt_boxes[sel_gt, 2],
        gt_boxes[sel_gt, 3], gt_boxes[sel_gt, 4],
        sel_ov,
    ], axis=-1)
    match_gt = jnp.where(fg_row[:, None], mg, 0.0)

    # --- sample weights (cpp:317-340) ---------------------------------------
    sample_w = jnp.ones(R)
    if spec.iou_weighted:
        sample_w = jnp.where(labels > 0, sel_ov, 1.0)
    pos_wsum = jnp.where(labels > 0, sample_w, 0.0).sum()
    neg_wsum = jnp.where(labels == 0, sample_w, 0.0).sum()
    pos_scale = jnp.where(pos_wsum != 0,
                          spec.fg_fraction * R / jnp.where(pos_wsum != 0, pos_wsum, 1.0), 1.0)
    neg_scale = jnp.where(pos_wsum != 0,
                          (1 - spec.fg_fraction) * R / jnp.where(neg_wsum != 0, neg_wsum, 1.0), 1.0)
    sample_w = sample_w * jnp.where(labels > 0, pos_scale, neg_scale)

    rois = jnp.stack([
        sel_xywh[:, 0], sel_xywh[:, 1],
        sel_xywh[:, 0] + sel_xywh[:, 2] - 1.0,
        sel_xywh[:, 1] + sel_xywh[:, 3] - 1.0,
    ], axis=-1)

    return {
        "batch_idx": sel_img,
        "rois": rois,
        "labels": labels,
        "bbox_targets": bbox_targets,
        "inside_w": inside_w,
        "outside_w": outside_w,
        "match_gt": match_gt,
        "sample_weight": sample_w,
        "valid": jnp.ones(R, bool),
        "n_fg": n_fg,
    }

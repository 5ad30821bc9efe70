"""Cascade-MSCNN: iterative ROI-head refinement (Cascade R-CNN machinery).

Mirrors the reference's cascade model family
(/root/reference/examples/kitti_car/cascade-mscnn-7s-576-2x/
trainval_2nd.prototxt:1009-1857 and widerface/cascade-mscnn-12s-align): after
the shared trunk + BoxOutput proposals, K ROI-head stages run with rising
IoU thresholds (0.5 / 0.6 / 0.7); between stages a DecodeBBox step turns the
previous stage's class-agnostic bbox_pred into the next stage's proposals.
Stage k has its own head weights (suffix `_2nd`, `_3rd`), tighter bbox
normalization stds, loss weight 1 / 0.5 / 0.25, and lr multipliers x1/x2/x4.
All stages use cls_aware=false regression (bbox_pred is 8-wide) so the
decode chain stays class-agnostic. Stage 1 samples a fixed 256-roi batch;
later stages keep all candidates (batch_size: -1).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.ops import boxes as box_ops
from mscnn_tpu.ops import losses as L
from mscnn_tpu.ops import proposal_target as PT


@dataclasses.dataclass(frozen=True)
class CascadeStageSpec:
    """One refinement stage (ProposalTarget + head + losses)."""
    suffix: str                    # "", "_2nd", "_3rd"
    fg_thr: float
    bg_thr_hg: float
    bg_thr_lw: float
    bbox_std: Tuple[float, float, float, float]
    loss_weight: float
    lr_mult: float                 # x2/x4 for later stages
    keep_all: bool                 # batch_size -1


def default_stages() -> Tuple[CascadeStageSpec, ...]:
    """The 3-stage 0.5/0.6/0.7 cascade (cascade trainval_2nd.prototxt)."""
    return (
        CascadeStageSpec("", 0.5, 0.5, 0.1, (0.1, 0.1, 0.2, 0.2),
                         1.0, 1.0, False),
        CascadeStageSpec("_2nd", 0.6, 0.6, 0.0, (0.05, 0.05, 0.1, 0.1),
                         0.5, 2.0, True),
        CascadeStageSpec("_3rd", 0.7, 0.7, 0.0, (0.033, 0.033, 0.067, 0.067),
                         0.25, 4.0, True),
    )


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    base: M.MSCNNConfig
    stages: Tuple[CascadeStageSpec, ...] = dataclasses.field(
        default_factory=default_stages)
    gt_iou_thr: float = 0.95       # DecodeBBoxParameter default
    # Deploy scoring: False = softmax of the LAST stage's logits (the
    # KITTI cascade demo reads plain cls_prob_3rd,
    # kitti_car run_cascademscnn.m:46); True = every stage head re-scored
    # on the FINAL proposals and averaged — the reference's
    # cls_prob_3rd_avg Eltwise over cls_prob_{1st,2nd}_3rd
    # (citypersons/widerface cascade mscnn_deploy.prototxt:1230-1236,
    # their run_cascademscnn.m:46).
    ensemble_avg: bool = False


def init_params(key, ccfg: CascadeConfig):
    """Base params (with class-AGNOSTIC 8-wide bbox_pred) + per-stage heads."""
    cfg = ccfg.base
    params = M.init_params(key, cfg)
    keys = iter(jax.random.split(jax.random.fold_in(key, 1), 64))
    for st in ccfg.stages:
        params.update(M.init_roi_head_params(keys, cfg, suffix=st.suffix,
                                             bbox_out=8))
    return params


def param_lr_multipliers(params, ccfg: CascadeConfig):
    """Base multipliers plus the stage-k head scaling (x2 stage 2, x4
    stage 3; biases double on top, cascade trainval param blocks)."""
    mults = M.param_lr_multipliers(params, ccfg.base)
    for st in ccfg.stages:
        for base_name in ("roi_c1", "fc6", "cls_pred", "bbox_pred"):
            name = base_name + st.suffix
            if name in mults:
                mults[name] = {"w": st.lr_mult, "b": 2.0 * st.lr_mult}
    return mults


def _stage_pt_spec(cfg: M.MSCNNConfig, st: CascadeStageSpec,
                   roi_batch: int, num_img: int) -> PT.ProposalTargetSpec:
    h, w = cfg.input_hw
    return PT.ProposalTargetSpec(
        cls_num=cfg.num_classes,
        batch_size=roi_batch,
        fg_thr=st.fg_thr, bg_thr_hg=st.bg_thr_hg, bg_thr_lw=st.bg_thr_lw,
        num_img_per_batch=num_img, img_width=w, img_height=h,
        cls_aware=False,
        bbox_mean=(0.0,) * 4, bbox_std=st.bbox_std,
        keep_all=st.keep_all,
    )


def cascade_losses(params, feats, prop, batch, ccfg: CascadeConfig,
                   key, *, roi_batch: int = 256, train: bool = True,
                   with_metrics: bool = True):
    """All cascade-stage losses given trunk feats + BoxOutput proposals.

    Returns (total_loss, metrics). batch carries gt_boxes [B, G, 7] +
    gt_valid (flattened internally).
    """
    cfg = ccfg.base
    b, g, _ = batch["gt_boxes"].shape
    img = jnp.repeat(jnp.arange(b, dtype=jnp.float32), g)
    gt_flat = batch["gt_boxes"].reshape(b * g, 7).at[:, 0].set(img)
    gt_valid_flat = batch["gt_valid"].reshape(b * g)

    batch_idx, boxes, _, valid = M.flatten_proposals(prop)
    boxes = boxes.at[:, 2:].add(-1.0)  # inclusive convention
    boxes = jax.lax.stop_gradient(boxes)

    feat2x = M.upsampled_roi_feature(params, feats["conv4_3"], cfg)
    total = 0.0
    metrics = {}
    k_pt, k_drop = jax.random.split(key)
    cur_idx, cur_boxes, cur_valid = batch_idx, boxes, valid

    for si, st in enumerate(ccfg.stages):
        pts = _stage_pt_spec(cfg, st, roi_batch, b)
        if st.keep_all:
            sample = PT.proposal_target_keep_all(
                cur_idx, cur_boxes, cur_valid, gt_flat, gt_valid_flat, pts)
        else:
            sample = PT.proposal_target(
                jax.random.fold_in(k_pt, si), cur_idx, cur_boxes, cur_valid,
                gt_flat, gt_valid_flat, pts)

        cls_pred, bbox_pred = M.roi_head(
            params, feats["conv4_3"], sample["batch_idx"], sample["rois"],
            sample["valid"], cfg, train=train,
            dropout_key=jax.random.fold_in(k_drop, si),
            suffix=st.suffix, feat=feat2x)

        cls_loss = L.softmax_ce_loss(cls_pred, sample["labels"],
                                     valid=sample["valid"])
        n_valid = jnp.maximum(sample["valid"].sum(), 1)
        inside = jnp.where(sample["valid"][:, None], sample["inside_w"], 0.0)
        outside = jnp.where(sample["valid"][:, None], sample["outside_w"], 0.0)
        d = inside * (bbox_pred - sample["bbox_targets"])
        ad = jnp.abs(d)
        per = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
        bbox_loss = (outside * per).sum() / n_valid

        total = total + st.loss_weight * (cls_loss + bbox_loss)
        tag = st.suffix or "_1st"
        metrics[f"loss_cls{tag}"] = cls_loss
        metrics[f"loss_bbox{tag}"] = bbox_loss
        if with_metrics:
            metrics[f"cls_accuracy{tag}"] = L.roi_accuracy(
                cls_pred, sample["labels"], sample["valid"])
            post, pre = L.bbox_accuracy(
                bbox_pred, sample["rois"], sample["match_gt"],
                sample["valid"], bbox_mean=(0.0,) * 4, bbox_std=st.bbox_std,
                cls_aware=False)
            metrics[f"bbox_iou{tag}"] = post
            metrics[f"bbox_iou_pre{tag}"] = pre

        if si + 1 < len(ccfg.stages):
            cur_boxes, cur_valid = box_ops.decode_bbox(
                bbox_pred, sample["rois"], sample["valid"],
                bbox_mean=(0.0,) * 4, bbox_std=st.bbox_std,
                match_overlap=sample["match_gt"][:, 5],
                gt_iou_thr=ccfg.gt_iou_thr, train=True)
            cur_idx = sample["batch_idx"]

    return total, metrics


def loss_fn(params, batch, key, ccfg: CascadeConfig, tspec,
            *, roi_batch: int = 256):
    """Full cascade training loss: per-scale detection losses + staged ROI
    refinement. Drop-in replacement for train_step.loss_fn at stage >= 2."""
    from mscnn_tpu.train import train_step as T

    cfg = ccfg.base
    specs = T.branch_loss_specs(cfg, tspec)
    k_det, k_stages = jax.random.split(key)

    labels = batch.get("labels")
    if labels is None:
        labels = T.rasterize_batch(batch, cfg, tspec)

    feats = M.trunk(params, batch["image"], cfg)
    outs = M.heads(params, feats, cfg)

    total = 0.0
    metrics = {}
    det_keys = jax.random.split(k_det, len(outs))
    for i, (out, lab, spec) in enumerate(zip(outs, labels, specs)):
        li, _ = L.detection_loss(out, lab, spec, key=det_keys[i])
        total = total + tspec.branch_loss_weight * li
        metrics[f"det_loss_{i}"] = li

    # BoxOutput never backprops (propagate_down: 0 in the reference)
    prop = M.propose(jax.tree.map(jax.lax.stop_gradient, outs), cfg)
    stage_total, stage_metrics = cascade_losses(
        params, feats, prop, batch, ccfg, k_stages, roi_batch=roi_batch,
        with_metrics=tspec.with_metrics)
    total = total + stage_total
    metrics.update(stage_metrics)
    metrics["loss"] = total
    return total, metrics


def deploy_forward(params, images, ccfg: CascadeConfig, *, captures=None):
    """Cascade inference: trunk -> proposals -> staged refinement. Returns
    the 3rd-stage outputs (proposals_3rd / cls_pred_3rd / bbox_pred_3rd,
    the blobs run_cascademscnn.m reads) plus `cls_prob_avg`, every stage's
    head re-scored on the FINAL proposals and averaged — the reference's
    cls_prob_3rd_avg blob (Eltwise mean of cls_prob_{1st,2nd}_3rd, e.g.
    citypersons cascade mscnn_deploy.prototxt:1230-1236).  Scoring choice
    is ccfg.ensemble_avg: the KITTI cascade reads plain cls_prob_3rd, the
    citypersons/widerface cascades read the average."""
    cfg = ccfg.base
    feats = M.trunk(params, images, cfg)
    outs = M.heads(params, feats, cfg)
    prop = M.propose(outs, cfg)
    batch_idx, boxes, scores, valid = M.flatten_proposals(prop)
    boxes = boxes.at[:, 2:].add(-1.0)

    feat2x = M.upsampled_roi_feature(params, feats["conv4_3"], cfg)
    cur_boxes, cur_valid = boxes, valid
    cls_pred = bbox_pred = None
    for si, st in enumerate(ccfg.stages):
        cls_pred, bbox_pred = M.roi_head(
            params, feats["conv4_3"], batch_idx, cur_boxes, cur_valid, cfg,
            train=False, suffix=st.suffix, feat=feat2x, image_major=True,
            captures=captures)
        if si + 1 < len(ccfg.stages):
            cur_boxes, cur_valid = box_ops.decode_bbox(
                bbox_pred, cur_boxes, cur_valid,
                bbox_mean=(0.0,) * 4, bbox_std=st.bbox_std, train=False)

    # ensemble: earlier heads re-scored on the final-stage proposals
    # (cls_pred_{1st,2nd}_3rd in the reference deploys); the last stage's
    # own logits already describe the final boxes
    cls_probs = [jax.nn.softmax(cls_pred, axis=-1)]
    for st in ccfg.stages[:-1]:
        cp, _ = M.roi_head(
            params, feats["conv4_3"], batch_idx, cur_boxes, cur_valid, cfg,
            train=False, suffix=st.suffix, feat=feat2x, image_major=True,
            captures=captures)
        cls_probs.append(jax.nn.softmax(cp, axis=-1))

    return {
        "proposals": prop,
        "batch_idx": batch_idx,
        "rois": cur_boxes,              # 3rd-stage proposals
        "roi_scores": scores,
        "roi_valid": cur_valid,
        "cls_pred": cls_pred,           # last-stage logits
        "bbox_pred": bbox_pred,
        "cls_prob_avg": sum(cls_probs) / len(cls_probs),
    }

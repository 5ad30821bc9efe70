"""Deploy-time detection: post-processing + KITTI-format output.

On-device, fixed-shape re-formulation of the reference's MATLAB driver
(/root/reference/examples/kitti_car/run_mscnn_detection.m:59-162): proposal
filtering, per-class softmax scoring, bbox de-normalization and decode around
the proposal, rescale to the original image, clip, greedy per-class NMS
(utils/bbNms.m type 'maxg', union overlap), then KITTI txt writers
(examples/kitti_result/writeDetForEval.m). Everything through NMS runs under
one jit; only the final text I/O touches the host.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.ops import nms as nms_ops

KITTI_CLASS_NAMES = {
    "kitti_car": ("bg", "Car", "Van", "Truck", "Tram"),
    "kitti_ped_cyc": ("bg", "Pedestrian", "Cyclist"),
}


@dataclasses.dataclass(frozen=True)
class DetectSpec:
    """Post-processing parameters (run_mscnn_detection.m:42-52)."""
    proposal_thr: float = -10.0
    nms_overlap: float = 0.5
    nms_mode: str = "iou"          # 'union' denominator
    max_per_class: int = 100       # fixed per-class output capacity
    score_thr: float = 0.0         # final report threshold (0 = keep all)


@partial(jax.jit, static_argnames=("cfg", "spec"))
def postprocess(outputs, ratios, orig_wh, cfg: M.MSCNNConfig,
                spec: DetectSpec):
    """Decode + per-class NMS for one image's deploy_forward outputs.

    outputs: dict from M.deploy_forward for a single image (R rois).
    ratios: [2] (ratio_h, ratio_w) = net_input / original.
    orig_wh: [2] (orig_w, orig_h) floats.
    Returns (boxes [C-1, K, 4] xywh in ORIGINAL image coords, scores
    [C-1, K], valid [C-1, K]).
    """
    rois = outputs["rois"]             # [R, 4] corners, net-input coords
    cls_pred = outputs["cls_pred"]     # [R, C]
    bbox_pred = outputs["bbox_pred"]   # [R, 4C]
    pscore = outputs["roi_scores"]
    valid = outputs["roi_valid"]

    pw = rois[:, 2] - rois[:, 0]
    ph = rois[:, 3] - rois[:, 1]
    # bad-proposal filter (zero size or low objectness, .m:81-83)
    valid = valid & (pscore >= spec.proposal_thr) & (pw != 0) & (ph != 0)

    # cascade deploys may supply pre-averaged stage probabilities
    # (cls_prob_3rd_avg); plain models score with the head's own softmax
    prob = outputs.get("cls_prob")
    if prob is None:
        prob = jax.nn.softmax(cls_pred, axis=-1)
    mean = jnp.asarray(cfg.bbox_mean)
    std = jnp.asarray(cfg.bbox_std)
    ctr_x = rois[:, 0] + 0.5 * pw
    ctr_y = rois[:, 1] + 0.5 * ph

    ratio_h, ratio_w = ratios[0], ratios[1]
    orig_w, orig_h = orig_wh[0], orig_wh[1]

    def one_class(k):
        bp = jax.lax.dynamic_slice_in_dim(bbox_pred, 4 * k, 4, axis=1)
        bp = bp * std + mean
        tx = bp[:, 0] * pw + ctr_x
        ty = bp[:, 1] * ph + ctr_y
        tw = pw * jnp.exp(bp[:, 2])
        th = ph * jnp.exp(bp[:, 3])
        tx = (tx - tw / 2.0) / ratio_w
        ty = (ty - th / 2.0) / ratio_h
        tw = tw / ratio_w
        th = th / ratio_h
        tx = jnp.maximum(tx, 0.0)
        ty = jnp.maximum(ty, 0.0)
        tw = jnp.minimum(tw, orig_w - tx)
        th = jnp.minimum(th, orig_h - ty)
        boxes = jnp.stack([tx, ty, tw, th], -1)
        scores = prob[:, k]
        b, s, v = nms_ops.nms_xywh(
            boxes, jnp.where(valid, scores, 0.0), valid,
            iou_thr=spec.nms_overlap, mode=spec.nms_mode,
            max_out=spec.max_per_class)
        v = v & (s >= spec.score_thr) if spec.score_thr > 0 else v
        return b, s, v

    results = [one_class(k) for k in range(1, cfg.num_classes)]
    boxes = jnp.stack([r[0] for r in results])
    scores = jnp.stack([r[1] for r in results])
    valid_out = jnp.stack([r[2] for r in results])
    return boxes, scores, valid_out


def make_e2e_forward(params, cfg: M.MSCNNConfig,
                     spec: DetectSpec = DetectSpec(), *,
                     mean_values=(104.0, 117.0, 123.0)):
    """ONE jitted graph from uint8 net-size image to final detections.

    Serving fast path: the image crosses host->device as uint8 (4x less
    traffic than f32; mean-subtract runs on device) and decode/per-class
    NMS run in-graph, so each image costs a single dispatch returning
    small arrays — the eager per-op postprocess dominated the CLI's
    steady state on dispatch-latency-bound links (BENCH.md round 2).
    Returned callable: f(params, img_u8 [H,W,3], ratios [2],
    orig_wh [2]) -> detect()-shaped dict of device arrays."""
    mean = jnp.asarray(mean_values, jnp.float32)

    def fwd(p, img_u8, ratios, orig_wh):
        x = img_u8.astype(jnp.float32) - mean
        outputs = M.deploy_forward(p, x[None], cfg)
        boxes, scores, valid = postprocess(outputs, ratios, orig_wh,
                                           cfg, spec)
        return {
            "boxes": boxes, "scores": scores, "valid": valid,
            "rois": outputs["rois"],
            "roi_scores": outputs["roi_scores"],
            "roi_valid": outputs["roi_valid"],
        }

    return jax.jit(fwd)


def detect(params, image_bgr: np.ndarray, cfg: M.MSCNNConfig,
           spec: DetectSpec = DetectSpec(), *,
           mean_values=(104.0, 117.0, 123.0), fwd=None, e2e_fwd=None):
    """Single-image detection: resize -> mean-sub -> deploy graph -> decode.

    image_bgr: HWC uint8 BGR (cv2.imread layout). Returns dict with
    per-class fixed-shape detections in original image coordinates plus the
    rescaled proposals. Pass e2e_fwd=make_e2e_forward(...) for the
    single-dispatch serving path (identical outputs).
    """
    import cv2

    orig_h, orig_w = image_bgr.shape[:2]
    net_h, net_w = cfg.input_hw
    resized = cv2.resize(image_bgr, (net_w, net_h),
                         interpolation=cv2.INTER_LINEAR)
    ratios = jnp.asarray([net_h / orig_h, net_w / orig_w], jnp.float32)
    orig_wh = jnp.asarray([orig_w, orig_h], jnp.float32)

    if e2e_fwd is not None:
        out = e2e_fwd(params, jnp.asarray(resized.astype(np.uint8)),
                      ratios, orig_wh)
        boxes, scores, valid = out["boxes"], out["scores"], out["valid"]
        rois, rscores, rvalid = (out["rois"], out["roi_scores"],
                                 out["roi_valid"])
    else:
        x = resized.astype(np.float32) - np.asarray(mean_values,
                                                    np.float32)
        if fwd is None:
            fwd = jax.jit(lambda p, im: M.deploy_forward(p, im, cfg))
        outputs = fwd(params, jnp.asarray(x)[None])
        boxes, scores, valid = postprocess(outputs, ratios, orig_wh,
                                           cfg, spec)
        rois, rscores, rvalid = (outputs["rois"], outputs["roi_scores"],
                                 outputs["roi_valid"])

    props = np.asarray(rois, np.float64)
    props[:, [0, 2]] /= float(ratios[1])
    props[:, [1, 3]] /= float(ratios[0])
    return {
        "boxes": np.asarray(boxes),
        "scores": np.asarray(scores),
        "valid": np.asarray(valid),
        "proposals": props,
        "proposal_scores": np.asarray(rscores),
        "proposal_valid": np.asarray(rvalid),
    }


def make_forward(params, cfg: M.MSCNNConfig, mesh=None):
    """Pre-jitted deploy forward for batch loops over many images.

    With `mesh` (a 1-D "data" jax.sharding.Mesh), the image batch is
    sharded over the mesh and params are replicated — synchronous
    data-parallel serving over ICI, the inference analog of the P2PSync
    training tree (the reference has no multi-GPU inference path; this is
    a strict superset)."""
    if mesh is None:
        return jax.jit(lambda p, im: M.deploy_forward(p, im, cfg))
    from jax.sharding import NamedSharding, PartitionSpec as PS

    rep = NamedSharding(mesh, PS())
    shard = NamedSharding(mesh, PS("data"))
    return jax.jit(lambda p, im: M.deploy_forward(p, im, cfg),
                   in_shardings=(rep, shard))


def detect_batch(params, images_bgr: Sequence[np.ndarray],
                 cfg: M.MSCNNConfig, spec: DetectSpec = DetectSpec(), *,
                 mean_values=(104.0, 117.0, 123.0), fwd=None,
                 mesh=None, cascade=None) -> list:
    """Batched detection: one deploy-graph call for N images (optionally
    sharded over a device mesh), then per-image decode. Returns one
    `detect()`-shaped dict per input image. Pass the CascadeConfig as
    `cascade` for staged models (then `cfg` must be `cascade.base`).

    The deploy graph emits proposals in image-major order (R =
    cfg.proposal.max_out rows per image), so per-image outputs are static
    slices — no host-side gathers."""
    import cv2

    net_h, net_w = cfg.input_hw
    xs, metas = [], []
    for img in images_bgr:
        oh, ow = img.shape[:2]
        resized = cv2.resize(img, (net_w, net_h),
                             interpolation=cv2.INTER_LINEAR)
        xs.append(resized.astype(np.float32)
                  - np.asarray(mean_values, np.float32))
        metas.append((oh, ow))
    x = jnp.asarray(np.stack(xs))
    if fwd is None:
        fwd = make_cascade_forward(params, cascade, mesh=mesh) \
            if cascade is not None else make_forward(params, cfg, mesh=mesh)
    outputs = fwd(params, x)

    post_cfg = cfg
    if cascade is not None:
        post_cfg = cascade_post_cfg(cascade)
        outputs = expand_cascade_bbox(outputs, cfg.num_classes)

    R = cfg.proposal.max_out
    results = []
    for i, (oh, ow) in enumerate(metas):
        sub = {
            "rois": outputs["rois"][i * R:(i + 1) * R],
            "roi_scores": outputs["roi_scores"][i * R:(i + 1) * R],
            "roi_valid": outputs["roi_valid"][i * R:(i + 1) * R],
            "cls_pred": outputs["cls_pred"][i * R:(i + 1) * R],
            "bbox_pred": outputs["bbox_pred"][i * R:(i + 1) * R],
        }
        if "cls_prob" in outputs:
            sub["cls_prob"] = outputs["cls_prob"][i * R:(i + 1) * R]
        ratios = jnp.asarray([net_h / oh, net_w / ow], jnp.float32)
        orig_wh = jnp.asarray([ow, oh], jnp.float32)
        boxes, scores, valid = postprocess(sub, ratios, orig_wh,
                                           post_cfg, spec)
        props = np.asarray(sub["rois"], np.float64)
        props[:, [0, 2]] /= float(ratios[1])
        props[:, [1, 3]] /= float(ratios[0])
        results.append({
            "boxes": np.asarray(boxes),
            "scores": np.asarray(scores),
            "valid": np.asarray(valid),
            "proposals": props,
            "proposal_scores": np.asarray(sub["roi_scores"]),
            "proposal_valid": np.asarray(sub["roi_valid"]),
        })
    return results


def cascade_deploy_outputs(params, images, ccfg):
    """Cascade deploy forward with the scoring choice applied: per
    ccfg.ensemble_avg either the last head's own softmax (cls_prob_3rd,
    the KITTI cascade) or every head re-scored on the final proposals
    and averaged (cls_prob_3rd_avg, citypersons/widerface).  Shared by
    make_cascade_forward and the AOT export (io/aot.py) so the scoring
    semantics live in ONE place."""
    from mscnn_tpu.models import cascade as CC

    out = dict(CC.deploy_forward(params, images, ccfg))
    if ccfg.ensemble_avg:
        out["cls_prob"] = out.pop("cls_prob_avg")
    else:
        out.pop("cls_prob_avg")
    return out


def cascade_post_cfg(ccfg):
    """Decode config for cascade final outputs: the final refinement
    decodes with the LAST stage's tight bbox std and zero mean
    (run_cascademscnn.m:42-48)."""
    import dataclasses as _dc

    return _dc.replace(ccfg.base, bbox_mean=(0.0,) * 4,
                       bbox_std=ccfg.stages[-1].bbox_std)


def expand_cascade_bbox(outputs, num_classes):
    """Cascade bbox_pred is class-agnostic 8-wide (decode_bbox_layer.cpp
    channels==8); postprocess slices per class, so broadcast the fg slot
    to every class column."""
    outputs = dict(outputs)
    outputs["bbox_pred"] = jnp.tile(outputs["bbox_pred"][:, 4:8],
                                    (1, num_classes))
    return outputs


def make_cascade_forward(params, ccfg, mesh=None):
    """Cascade deploy forward (run_cascademscnn.m reads the 3rd-stage
    blobs): emits the last-stage rois plus cascade_deploy_outputs'
    scoring.  `mesh` shards the image batch as in make_forward."""

    def fwd(p, im):
        return cascade_deploy_outputs(p, im, ccfg)

    if mesh is None:
        return jax.jit(fwd)
    from jax.sharding import NamedSharding, PartitionSpec as PS

    return jax.jit(fwd, in_shardings=(NamedSharding(mesh, PS()),
                                      NamedSharding(mesh, PS("data"))))


def detect_cascade(params, image_bgr: np.ndarray, ccfg,
                   spec: DetectSpec = DetectSpec(), *,
                   mean_values=(104.0, 117.0, 123.0), fwd=None):
    """Cascade detection: staged refinement, class-agnostic final
    regression.  Scores follow ccfg.ensemble_avg: last-stage softmax
    (KITTI cascade, cls_prob_3rd) or all heads re-scored on the final
    proposals and averaged (citypersons/widerface, cls_prob_3rd_avg)."""
    if fwd is None:
        fwd = make_cascade_forward(params, ccfg)
    cfg = ccfg.base

    import cv2

    orig_h, orig_w = image_bgr.shape[:2]
    net_h, net_w = cfg.input_hw
    resized = cv2.resize(image_bgr, (net_w, net_h),
                         interpolation=cv2.INTER_LINEAR)
    x = resized.astype(np.float32) - np.asarray(mean_values, np.float32)
    outputs = expand_cascade_bbox(fwd(params, jnp.asarray(x)[None]),
                                  cfg.num_classes)
    ratios = jnp.asarray([net_h / orig_h, net_w / orig_w], jnp.float32)
    orig_wh = jnp.asarray([orig_w, orig_h], jnp.float32)
    boxes, scores, valid = postprocess(outputs, ratios, orig_wh,
                                       cascade_post_cfg(ccfg), spec)
    return {"boxes": np.asarray(boxes), "scores": np.asarray(scores),
            "valid": np.asarray(valid)}


# ---------------------------------------------------------------------------
# KITTI output files
# ---------------------------------------------------------------------------

def write_detections_txt(path: str, rows: Sequence[tuple]):
    """Per-class detection dump: rows of (img_idx, x, y, w, h, score) —
    the final_detect_boxes format (run_mscnn_detection.m:150-160)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(f"{v:.6g}" for v in r) + "\n")


def write_kitti_labels(objects: Sequence[dict], out_dir: str, img_idx: int,
                       score_scale: float = 1000.0):
    """One KITTI devkit label file: `type trunc occ alpha x1 y1 x2 y2 h w l
    X Y Z ry score` with -1/-10 placeholders for 2-D detections
    (writeDetForEval.m + devkit writeLabels)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{img_idx:06d}.txt"), "w") as f:
        for obj in objects:
            f.write(f"{obj['type']} -1 -1 -10 "
                    f"{obj['x1']:.2f} {obj['y1']:.2f} "
                    f"{obj['x2']:.2f} {obj['y2']:.2f} "
                    f"-1 -1 -1 -1000 -1000 -1000 -10 "
                    f"{obj['score'] * score_scale:.2f}\n")


def detections_to_xywh(det: dict, cls_id: int = 1) -> np.ndarray:
    """One class of a detect() result as an [N,5] {x,y,w,h,score} array —
    the row format of the reference's caltech/widerface writers
    (run_mscnn_detection.m bbset = [tx ty tw th prob])."""
    row = cls_id - 1
    keep = np.asarray(det["valid"][row], dtype=bool)
    boxes = np.asarray(det["boxes"][row], dtype=np.float64)[keep]
    scores = np.asarray(det["scores"][row], dtype=np.float64)[keep]
    return np.concatenate([boxes.reshape(-1, 4),
                           scores.reshape(-1, 1)], axis=1)


def detections_to_kitti(det: dict, class_names: Sequence[str],
                        cls_ids: Optional[Sequence[int]] = None):
    """Convert a detect() result to KITTI label-object dicts."""
    objects = []
    ids = cls_ids if cls_ids is not None else range(1, len(class_names))
    for k in ids:
        row = k - 1
        for b, s, v in zip(det["boxes"][row], det["scores"][row],
                           det["valid"][row]):
            if not v:
                continue
            objects.append({
                "type": class_names[k],
                "x1": float(b[0]), "y1": float(b[1]),
                "x2": float(b[0] + b[2]), "y2": float(b[1] + b[3]),
                "score": float(s),
            })
    return objects

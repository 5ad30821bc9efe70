"""Fixed-shape box math for the multi-scale anchor-field detector.

All functions are pure jnp, fully vectorized, and safe under jit: no
data-dependent shapes; invalid boxes are carried through with masks.

Box conventions used in this module:
  * ``xywh``  -- (x1, y1, w, h): top-left corner plus continuous width/height.
  * ``corners`` -- (x1, y1, x2, y2).
Where the reference uses an inclusive-pixel convention (w = x2 - x1 + 1) the
caller converts explicitly; nothing here adds hidden +1s.

Reference semantics mirrored here (for parity checking):
  * IoU modes: /root/reference/src/caffe/util/math_functions.cpp:13-35
  * anchor-field decode: /root/reference/src/caffe/layers/box_output_layer.cpp:118-161
  * anchor-field target encode: /root/reference/src/caffe/layers/detection_loss_layer.cpp:304-355
  * roi-to-gt target encode: /root/reference/src/caffe/layers/proposal_target_layer.cpp:251-278
  * prior-box decode (cascade): /root/reference/src/caffe/util/math_functions.cpp:46-75
"""

from __future__ import annotations

import jax.numpy as jnp

# IoU denominators: "iou" = union, "iomu" = min area, "iofu" = first box area.
IOU_MODES = ("iou", "iomu", "iofu")


def iou_xywh(a, b, mode: str = "iou"):
    """Pairwise IoU between two sets of (x, y, w, h) boxes.

    a: [..., N, 4], b: [..., M, 4] -> [..., N, M].
    Boxes with non-positive width or height score 0 against everything.
    """
    if mode not in IOU_MODES:
        raise ValueError(f"unknown IoU mode {mode!r}; expected one of {IOU_MODES}")
    ax, ay, aw, ah = jnp.split(a[..., :, None, :4], 4, axis=-1)
    bx, by, bw, bh = jnp.split(b[..., None, :, :4], 4, axis=-1)
    tlx = jnp.maximum(ax, bx)
    tly = jnp.maximum(ay, by)
    brx = jnp.minimum(ax + aw, bx + bw)
    bry = jnp.minimum(ay + ah, by + bh)
    over = jnp.maximum(brx - tlx, 0.0) * jnp.maximum(bry - tly, 0.0)
    area_a = aw * ah
    area_b = bw * bh
    if mode == "iomu":
        denom = jnp.minimum(area_a, area_b)
    elif mode == "iofu":
        denom = area_a
    else:
        denom = area_a + area_b - over
    valid = (aw > 0) & (ah > 0) & (bw > 0) & (bh > 0)
    iou = jnp.where(valid & (denom > 0), over / jnp.where(denom > 0, denom, 1.0), 0.0)
    return iou[..., 0]


def iou_aligned_xywh(a, b, mode: str = "iou"):
    """Element-wise IoU between aligned (x, y, w, h) box arrays [..., 4]."""
    tlx = jnp.maximum(a[..., 0], b[..., 0])
    tly = jnp.maximum(a[..., 1], b[..., 1])
    brx = jnp.minimum(a[..., 0] + a[..., 2], b[..., 0] + b[..., 2])
    bry = jnp.minimum(a[..., 1] + a[..., 3], b[..., 1] + b[..., 3])
    over = jnp.maximum(brx - tlx, 0.0) * jnp.maximum(bry - tly, 0.0)
    area_a = a[..., 2] * a[..., 3]
    area_b = b[..., 2] * b[..., 3]
    if mode == "iomu":
        denom = jnp.minimum(area_a, area_b)
    elif mode == "iofu":
        denom = area_a
    else:
        denom = area_a + area_b - over
    valid = (a[..., 2] > 0) & (a[..., 3] > 0) & (b[..., 2] > 0) & (b[..., 3] > 0)
    return jnp.where(valid & (denom > 0), over / jnp.where(denom > 0, denom, 1.0), 0.0)


def iou_corners(a, b, mode: str = "iou", inclusive: bool = False):
    """Pairwise IoU for (x1, y1, x2, y2) boxes; inclusive adds +1 to w/h."""
    off = 1.0 if inclusive else 0.0
    aw = a[..., 2] - a[..., 0] + off
    ah = a[..., 3] - a[..., 1] + off
    bw = b[..., 2] - b[..., 0] + off
    bh = b[..., 3] - b[..., 1] + off
    a_xywh = jnp.stack([a[..., 0], a[..., 1], aw, ah], axis=-1)
    b_xywh = jnp.stack([b[..., 0], b[..., 1], bw, bh], axis=-1)
    return iou_xywh(a_xywh, b_xywh, mode)


def xywh_to_corners(b):
    """(x1, y1, w, h) -> (x1, y1, x2, y2) with x2 = x1 + w (continuous)."""
    return jnp.stack(
        [b[..., 0], b[..., 1], b[..., 0] + b[..., 2], b[..., 1] + b[..., 3]], axis=-1
    )


def corners_to_xywh(b, inclusive: bool = False):
    off = 1.0 if inclusive else 0.0
    return jnp.stack(
        [b[..., 0], b[..., 1], b[..., 2] - b[..., 0] + off, b[..., 3] - b[..., 1] + off],
        axis=-1,
    )


def cell_centers(height: int, width: int, stride: float, dtype=jnp.float32):
    """Anchor-field cell centers ((w+0.5)*stride, (h+0.5)*stride) -> [H, W, 2] (cx, cy)."""
    cy = (jnp.arange(height, dtype=dtype) + 0.5) * stride
    cx = (jnp.arange(width, dtype=dtype) + 0.5) * stride
    return jnp.stack(jnp.broadcast_arrays(cx[None, :], cy[:, None]), axis=-1)


def decode_anchor_field(
    scores,
    coords,
    *,
    field_w: float,
    field_h: float,
    stride: int,
    field_whr: float = 2.0,
    field_xyr: float = 2.0,
    bbox_mean=None,
    bbox_std=None,
    min_size: float = 0.0,
):
    """Decode one scale's head output into image-space proposals.

    scores: [H, W, C] raw class scores (channel 0 = background).
    coords: [H, W, 4] raw (tx, ty, tw, th) offsets.
    Returns (boxes_xywh [H*W, 4], fg_score [H*W], valid [H*W]).

    fg_score = max over positive classes - background score; offsets are
    de-normalized by (bbox_mean, bbox_std), clamped to the field ratio limits,
    then decoded around the cell center with the anchor field size as prior.
    Boxes are clipped to the image (W*stride, H*stride) and marked invalid if
    either side ends up below ``min_size``.
    """
    h, w, c = scores.shape
    fg = jnp.max(scores[..., 1:], axis=-1) - scores[..., 0]

    tx, ty, tw, th = [coords[..., i] for i in range(4)]
    if bbox_mean is not None and bbox_std is not None:
        mean = jnp.asarray(bbox_mean, scores.dtype)
        std = jnp.asarray(bbox_std, scores.dtype)
        tx = tx * std[0] + mean[0]
        ty = ty * std[1] + mean[1]
        tw = tw * std[2] + mean[2]
        th = th * std[3] + mean[3]

    max_xyr = 1.0 / field_xyr
    max_whr = jnp.log(jnp.asarray(field_whr, scores.dtype))
    tx = jnp.clip(tx, -max_xyr, max_xyr)
    ty = jnp.clip(ty, -max_xyr, max_xyr)
    tw = jnp.clip(tw, -max_whr, max_whr)
    th = jnp.clip(th, -max_whr, max_whr)

    centers = cell_centers(h, w, float(stride), scores.dtype)
    cx = tx * field_w + centers[..., 0]
    cy = ty * field_h + centers[..., 1]
    bw = field_w * jnp.exp(tw)
    bh = field_h * jnp.exp(th)
    x1 = jnp.maximum(cx - bw / 2.0, 0.0)
    y1 = jnp.maximum(cy - bh / 2.0, 0.0)
    img_w, img_h = w * stride, h * stride
    bw = jnp.minimum(bw, img_w - x1)
    bh = jnp.minimum(bh, img_h - y1)

    boxes = jnp.stack([x1, y1, bw, bh], axis=-1).reshape(-1, 4)
    valid = ((bw >= min_size) & (bh >= min_size)).reshape(-1)
    return boxes, fg.reshape(-1), valid


def encode_anchor_field_targets(
    gt_cx,
    gt_cy,
    gt_w,
    gt_h,
    *,
    field_w: float,
    field_h: float,
    stride: int,
    bbox_mean=None,
    bbox_std=None,
):
    """Per-cell regression targets for the proposal sub-network loss.

    Inputs are [..., H, W] maps of the matched gt's center/size (garbage
    where no match -- the loss masks those cells). Returns [..., H, W, 4]
    targets (gx, gy, gw, gh), normalized by (bbox_mean, bbox_std) when given.
    Sizes are floored at 2 px before the log, matching the reference.
    """
    h, w = gt_cx.shape[-2], gt_cx.shape[-1]
    centers = cell_centers(h, w, float(stride), gt_cx.dtype)
    gx = (gt_cx - centers[..., 0]) / field_w
    gy = (gt_cy - centers[..., 1]) / field_h
    gw = jnp.log(jnp.maximum(gt_w, 2.0) / field_w)
    gh = jnp.log(jnp.maximum(gt_h, 2.0) / field_h)
    t = jnp.stack([gx, gy, gw, gh], axis=-1)
    if bbox_mean is not None and bbox_std is not None:
        t = (t - jnp.asarray(bbox_mean, t.dtype)) / jnp.asarray(bbox_std, t.dtype)
    return t


def encode_roi_targets(rois_xywh, gts_xywh, bbox_mean=None, bbox_std=None):
    """Fast-R-CNN (dx, dy, dw, dh) targets from rois to matched gts.

    rois_xywh, gts_xywh: [..., 4] aligned pairs in (x1, y1, w, h).
    """
    rw, rh = rois_xywh[..., 2], rois_xywh[..., 3]
    rcx = rois_xywh[..., 0] + 0.5 * rw
    rcy = rois_xywh[..., 1] + 0.5 * rh
    gw, gh = gts_xywh[..., 2], gts_xywh[..., 3]
    gcx = gts_xywh[..., 0] + 0.5 * gw
    gcy = gts_xywh[..., 1] + 0.5 * gh
    safe_rw = jnp.where(rw > 0, rw, 1.0)
    safe_rh = jnp.where(rh > 0, rh, 1.0)
    dx = (gcx - rcx) / safe_rw
    dy = (gcy - rcy) / safe_rh
    dw = jnp.log(jnp.where(gw > 0, gw, 1.0) / safe_rw)
    dh = jnp.log(jnp.where(gh > 0, gh, 1.0) / safe_rh)
    t = jnp.stack([dx, dy, dw, dh], axis=-1)
    if bbox_mean is not None and bbox_std is not None:
        t = (t - jnp.asarray(bbox_mean, t.dtype)) / jnp.asarray(bbox_std, t.dtype)
    return t


def decode_bbox(bbox_pred, rois_corners, valid, *, bbox_mean=None,
                bbox_std=None, match_overlap=None, gt_iou_thr: float = 0.95,
                train: bool = True):
    """DecodeBBox layer (cascade): stage-k bbox_pred -> stage-k+1 proposals.

    bbox_pred: [R, 8] class-agnostic two-slot deltas (the layer CHECKs
    channels == 8, decode_bbox_layer.cpp:47); rois_corners: [R, 4] inclusive
    corners; valid: [R]. In TRAIN mode malformed boxes (x1 > x2) and boxes
    already >= gt_iou_thr overlap with their matched gt are masked invalid
    instead of dropped (the reference emits variable row counts,
    decode_bbox_layer.cpp:79-101; fixed capacity + mask here).
    Returns (new_rois_corners [R, 4], new_valid [R]).
    """
    dec = decode_with_prior(bbox_pred, rois_corners, bbox_mean, bbox_std)
    new = dec[:, 4:8]  # fg slot
    out_valid = valid
    if train:
        ok = (new[:, 0] <= new[:, 2]) & (new[:, 1] <= new[:, 3])
        out_valid = out_valid & ok
        if match_overlap is not None:
            out_valid = out_valid & (match_overlap < gt_iou_thr)
    return new, out_valid


def decode_with_prior(deltas, priors_corners, bbox_mean=None, bbox_std=None):
    """Decode per-class box deltas around prior boxes (second stage / cascade).

    deltas: [N, 4*K] (dx, dy, dw, dh) per class; priors_corners: [N, 4]
    (x1, y1, x2, y2) with inclusive-pixel size (pw = x2 - x1 + 1).
    Returns [N, 4*K] decoded corners, x2 = x1 + w - 1.
    """
    n = deltas.shape[0]
    k = deltas.shape[-1] // 4
    d = deltas.reshape(n, k, 4)
    if bbox_mean is not None and bbox_std is not None:
        d = d * jnp.asarray(bbox_std, d.dtype) + jnp.asarray(bbox_mean, d.dtype)
    pw = priors_corners[:, 2] - priors_corners[:, 0] + 1.0
    ph = priors_corners[:, 3] - priors_corners[:, 1] + 1.0
    pcx = 0.5 * (priors_corners[:, 0] + priors_corners[:, 2])
    pcy = 0.5 * (priors_corners[:, 1] + priors_corners[:, 3])
    cx = d[..., 0] * pw[:, None] + pcx[:, None]
    cy = d[..., 1] * ph[:, None] + pcy[:, None]
    bw = pw[:, None] * jnp.exp(d[..., 2])
    bh = ph[:, None] * jnp.exp(d[..., 3])
    x1 = cx - (bw - 1.0) / 2.0
    y1 = cy - (bh - 1.0) / 2.0
    out = jnp.stack([x1, y1, x1 + bw - 1.0, y1 + bh - 1.0], axis=-1)
    return out.reshape(n, 4 * k)

"""Anchor-field label rasterization, vectorized for the device.

Device-side equivalent of the label-map generation inside ImageGtDataLayer
(/root/reference/src/caffe/layers/image_gt_data_layer.cpp:640-744): for each
output scale a [h, w, 6] map of (label, cx, cy, bw, bh, iou) where a cell is
positive when the anchor-field box centered at the cell overlaps a gt above
fg_threshold. RONI cells and cells outside the augmentation copy-region get
iou = 1 (=> ignored by the loss); gts that match no cell anywhere are
force-assigned to the center cell of their best-matching scale when their
best IoU is >= 0.2.

The reference runs this as a per-cell C++ loop on the prefetch thread; here
it is a handful of [cells x G] IoU matrices, so it can run under jit on
device (or vectorized numpy on host workers).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mscnn_tpu.ops import boxes as box_ops


@dataclasses.dataclass(frozen=True)
class RasterSpec:
    """Per-scale grid geometry: image template size + per-branch fields."""
    template_hw: tuple            # (H, W) of the network input
    strides: tuple                # per-scale downsample rates
    field_ws: tuple
    field_hs: tuple
    fg_threshold: float = 0.5
    roni_threshold: float = 0.4
    force_assign_iou: float = 0.2

    def grid_hw(self, i: int):
        h, w = self.template_hw
        return (round(h / self.strides[i]), round(w / self.strides[i]))


def _cell_boxes(h, w, stride, field_w, field_h):
    """[h*w, 4] xywh anchor-field boxes centered on the grid cells."""
    centers = box_ops.cell_centers(h, w, float(stride)).reshape(-1, 2)
    x = centers[:, 0] - field_w / 2.0
    y = centers[:, 1] - field_h / 2.0
    return jnp.stack(
        [x, y, jnp.full_like(x, field_w), jnp.full_like(y, field_h)], -1)


def rasterize_labels(gts, gt_valid, ronis, roni_valid, spec: RasterSpec,
                     copy_region=None):
    """Rasterize one image's labels across all scales.

    gts: [G, 6] (x1, y1, x2, y2, label, ignore); gt_valid: [G] bool.
    ronis: [Rn, 4] corners; roni_valid: [Rn] bool.
    copy_region: optional (x0, y0, w, h) of the valid image area in template
    pixels (the augmentation's copy window); cells outside are ignored.

    Returns a list of [h_s, w_s, 6] maps, channels (label, cx, cy, bw, bh, iou).
    """
    num_scales = len(spec.strides)
    G = gts.shape[0]

    gt_xywh = jnp.stack([
        gts[:, 0], gts[:, 1],
        gts[:, 2] - gts[:, 0], gts[:, 3] - gts[:, 1],
    ], -1)
    gt_cx = (gts[:, 0] + gts[:, 2]) / 2.0
    gt_cy = (gts[:, 1] + gts[:, 3]) / 2.0
    gt_label = gts[:, 4]
    gt_ignore = gts[:, 5] != 0

    roni_xywh = jnp.stack([
        ronis[:, 0], ronis[:, 1],
        ronis[:, 2] - ronis[:, 0], ronis[:, 3] - ronis[:, 1],
    ], -1)

    maps = []
    per_scale_best = []   # per gt: best cell iou at this scale (masked cells excluded)
    per_scale_cell = []   # per gt: flat index of that cell
    match_count = jnp.zeros(G, jnp.int32)

    for si in range(num_scales):
        h, w = spec.grid_hw(si)
        ds = spec.strides[si]
        cells = _cell_boxes(h, w, ds, spec.field_ws[si], spec.field_hs[si])
        s = h * w

        # copy-region mask (cells outside the pasted image area are ignored).
        # The reference quantizes with C round() = half away from zero
        # (image_gt_data_layer.cpp:645-648) — floor(x+0.5) for these
        # non-negative quotients; jnp.round would banker's-round 0.5 down
        # and shift the ignored border by one cell (caught by
        # tests/test_golden_ref_data.py's zoom scenario).
        if copy_region is not None:
            x0, y0, cw, ch = copy_region
            lo_x = jnp.floor(x0 / ds + 0.5).astype(jnp.int32)
            lo_y = jnp.floor(y0 / ds + 0.5).astype(jnp.int32)
            n_x = jnp.floor(cw / ds + 0.5).astype(jnp.int32)
            n_y = jnp.floor(ch / ds + 0.5).astype(jnp.int32)
            wi = jnp.arange(s, dtype=jnp.int32) % w
            hi = jnp.arange(s, dtype=jnp.int32) // w
            outside = (wi < lo_x) | (wi >= lo_x + n_x) | \
                      (hi < lo_y) | (hi >= lo_y + n_y)
        else:
            outside = jnp.zeros(s, bool)

        # RONI: sum of IOFU(cell, roni) >= threshold
        iofu = box_ops.iou_xywh(cells, roni_xywh, "iofu")
        iofu = jnp.where(roni_valid[None, :], iofu, 0.0)
        in_roni = iofu.sum(axis=1) >= spec.roni_threshold

        masked = outside | in_roni

        # match cells to gts (gt first arg: IoU is symmetric but keep order)
        iou = box_ops.iou_xywh(gt_xywh, cells)          # [G, s]
        iou = jnp.where(gt_valid[:, None], iou, 0.0)
        iou_cells = jnp.where(masked[None, :], 0.0, iou)
        best_iou = jnp.max(iou_cells, axis=0)           # [s]
        best_gt = jnp.argmax(iou_cells, axis=0)
        pos = (best_iou > spec.fg_threshold) & ~masked

        lab = jnp.where(
            pos, jnp.where(gt_ignore[best_gt], 0.0, gt_label[best_gt]), 0.0)
        cx = jnp.where(pos, gt_cx[best_gt], 0.0)
        cy = jnp.where(pos, gt_cy[best_gt], 0.0)
        bw = jnp.where(pos, gt_xywh[best_gt, 2], 0.0)
        bh = jnp.where(pos, gt_xywh[best_gt, 3], 0.0)
        iou_ch = jnp.where(masked, 1.0, best_iou)

        maps.append(jnp.stack([lab, cx, cy, bw, bh, iou_ch], -1).reshape(h, w, 6))

        # bookkeeping for force-assignment
        hits = pos[None, :] & (best_gt[None, :] == jnp.arange(G)[:, None])
        match_count = match_count + hits.sum(axis=1).astype(jnp.int32)
        gt_best_here = jnp.max(iou_cells, axis=1)       # [G]
        per_scale_best.append(gt_best_here)
        per_scale_cell.append(si)  # placeholder; center cell is recomputed

    # --- force-assign unmatched gts (cpp:713-744) ---------------------------
    best_per_scale = jnp.stack(per_scale_best, 0)       # [S, G]
    best_scale = jnp.argmax(best_per_scale, axis=0)     # [G]
    best_iou_all = jnp.max(best_per_scale, axis=0)
    needs = gt_valid & ~gt_ignore & (match_count == 0) & \
        (best_iou_all >= spec.force_assign_iou)

    for si in range(num_scales):
        h, w = spec.grid_hw(si)
        ds = spec.strides[si]
        wc = jnp.clip(jnp.floor(gt_cx / ds).astype(jnp.int32), 0, w - 1)
        hc = jnp.clip(jnp.floor(gt_cy / ds).astype(jnp.int32), 0, h - 1)
        assign_here = needs & (best_scale == si)
        m = maps[si]

        def body(gi, m):
            def write(m):
                row = jnp.stack([
                    gt_label[gi], gt_cx[gi], gt_cy[gi],
                    gt_xywh[gi, 2], gt_xywh[gi, 3], m[hc[gi], wc[gi], 5],
                ])
                return m.at[hc[gi], wc[gi], :].set(row)
            occupied = m[hc[gi], wc[gi], 0] > 0
            return jax.lax.cond(assign_here[gi] & ~occupied, write,
                                lambda mm: mm, m)

        maps[si] = jax.lax.fori_loop(0, G, body, m)

    return maps


def raster_spec_from_config(cfg, fg_threshold: float = 0.5) -> RasterSpec:
    """Build a RasterSpec from an MSCNNConfig's branches."""
    return RasterSpec(
        template_hw=cfg.input_hw,
        strides=tuple(br.stride for br in cfg.branches),
        field_ws=tuple(br.field_w for br in cfg.branches),
        field_hs=tuple(br.field_h for br in cfg.branches),
        fg_threshold=fg_threshold,
    )

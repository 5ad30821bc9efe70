"""Label rasterization tests against a numpy oracle of the reference loop."""

import numpy as np
import jax.numpy as jnp

from mscnn_tpu.data import rasterize as RZ
from tests.test_boxes import np_iou_xywh


def np_rasterize(gts, ronis, spec):
    """Oracle mirroring image_gt_data_layer.cpp:640-744 (no copy-region)."""
    S = len(spec.strides)
    maps = []
    G = len(gts)
    match_times = np.zeros(G, int)
    max_bb_iou = np.zeros(G)
    max_bb_scale = np.zeros(G, int)
    H, W = spec.template_hw
    for si in range(S):
        ds = spec.strides[si]
        h, w = round(H / ds), round(W / ds)
        fw, fh = spec.field_ws[si], spec.field_hs[si]
        m = np.zeros((h, w, 6), np.float32)
        for hh in range(h):
            for ww in range(w):
                xx1 = (ww + 0.5) * ds - fw / 2
                yy1 = (hh + 0.5) * ds - fh / 2
                cell = (xx1, yy1, fw, fh)
                sum_iou = sum(
                    np_iou_xywh(cell, (r[0], r[1], r[2] - r[0], r[3] - r[1]),
                                "iofu") for r in ronis)
                if sum_iou >= 0.4:
                    m[hh, ww, 5] = 1.0
                    continue
                flag, match_idx, max_iou = False, -1, 0.0
                for gi, g in enumerate(gts):
                    gbox = (g[0], g[1], g[2] - g[0], g[3] - g[1])
                    iou = np_iou_xywh(gbox, cell, "iou")
                    if iou > max_iou:
                        flag, match_idx, max_iou = True, gi, iou
                    if iou > max_bb_iou[gi]:
                        max_bb_iou[gi] = iou
                        max_bb_scale[gi] = si
                if flag and max_iou > spec.fg_threshold:
                    g = gts[match_idx]
                    m[hh, ww, 0] = 0.0 if g[5] else g[4]
                    m[hh, ww, 1] = (g[0] + g[2]) / 2
                    m[hh, ww, 2] = (g[1] + g[3]) / 2
                    m[hh, ww, 3] = g[2] - g[0]
                    m[hh, ww, 4] = g[3] - g[1]
                    match_times[match_idx] += 1
                m[hh, ww, 5] = max_iou
        maps.append(m)
    # force assign
    for gi, g in enumerate(gts):
        if g[5] == 0 and match_times[gi] <= 0 and max_bb_iou[gi] >= 0.2:
            si = max_bb_scale[gi]
            ds = spec.strides[si]
            h, w = round(H / ds), round(W / ds)
            xc, yc = (g[0] + g[2]) / 2, (g[1] + g[3]) / 2
            hc = min(max(int(np.floor(yc / ds)), 0), h - 1)
            wc = min(max(int(np.floor(xc / ds)), 0), w - 1)
            if maps[si][hc, wc, 0] > 0:
                continue
            maps[si][hc, wc, 0] = g[4]
            maps[si][hc, wc, 1] = xc
            maps[si][hc, wc, 2] = yc
            maps[si][hc, wc, 3] = g[2] - g[0]
            maps[si][hc, wc, 4] = g[3] - g[1]
    return maps


def small_spec():
    return RZ.RasterSpec(
        template_hw=(64, 96),
        strides=(8, 16),
        field_ws=(24.0, 48.0),
        field_hs=(24.0, 48.0),
        fg_threshold=0.5,
    )


def run_both(gts_np, ronis_np, spec):
    G, Rn = 8, 4
    gts = np.zeros((G, 6), np.float32)
    gt_valid = np.zeros(G, bool)
    gts[:len(gts_np)] = gts_np
    gt_valid[:len(gts_np)] = True
    ronis = np.zeros((Rn, 4), np.float32)
    roni_valid = np.zeros(Rn, bool)
    if len(ronis_np):
        ronis[:len(ronis_np)] = ronis_np
        roni_valid[:len(ronis_np)] = True
    got = RZ.rasterize_labels(
        jnp.asarray(gts), jnp.asarray(gt_valid),
        jnp.asarray(ronis), jnp.asarray(roni_valid), spec)
    want = np_rasterize(np.asarray(gts_np, np.float32).reshape(-1, 6),
                        np.asarray(ronis_np, np.float32).reshape(-1, 4), spec)
    return [np.asarray(g) for g in got], want


def test_rasterize_matches_oracle_basic():
    spec = small_spec()
    # one gt matching the small field, one matching the large field
    gts = [
        [20.0, 20.0, 44.0, 44.0, 1.0, 0.0],   # 24x24 at center (32,32)
        [50.0, 10.0, 94.0, 58.0, 2.0, 0.0],   # 44x48 -> large field
    ]
    got, want = run_both(gts, [], spec)
    for g, w in zip(got, want):
        assert np.allclose(g, w, atol=1e-4), (g[..., 0] - w[..., 0])


def test_rasterize_roni_ignored():
    spec = small_spec()
    gts = [[20.0, 20.0, 44.0, 44.0, 1.0, 0.0]]
    ronis = [[0.0, 0.0, 96.0, 30.0]]
    got, want = run_both(gts, ronis, spec)
    for g, w in zip(got, want):
        assert np.allclose(g, w, atol=1e-4)
    # cells wholly inside the roni have iou channel == 1
    assert (got[0][0, :, 5] == 1.0).all()


def test_rasterize_ignored_gt_label_zero():
    spec = small_spec()
    gts = [[20.0, 20.0, 44.0, 44.0, 1.0, 1.0]]  # ignored
    got, want = run_both(gts, [], spec)
    for g, w in zip(got, want):
        assert np.allclose(g, w, atol=1e-4)
    assert (got[0][..., 0] == 0).all()


def test_rasterize_force_assign_small_gt():
    spec = small_spec()
    # tiny gt (12x12): IoU with 24x24 field peaks at 0.25 < fg_thr but >= 0.2
    gts = [[26.0, 26.0, 38.0, 38.0, 3.0, 0.0]]
    got, want = run_both(gts, [], spec)
    for g, w in zip(got, want):
        assert np.allclose(g, w, atol=1e-4)
    assert (got[0][..., 0] == 3.0).sum() == 1  # exactly the center cell


def test_rasterize_no_gt():
    spec = small_spec()
    got, want = run_both(np.zeros((0, 6)), [], spec)
    for g, w in zip(got, want):
        assert np.allclose(g, w, atol=1e-4)
        assert (g[..., 0] == 0).all()

"""Pin the label rasterizer against the REFERENCE'S OWN ImageGtDataLayer.

Every expected array here was produced by executing the reference's
unmodified image_gt_data_layer.cpp (compiled straight out of
/root/reference by native/oracle/gen_data_fixtures.cc). Regenerate with:

    cmake -S native/oracle -B native/oracle/build -G Ninja
    cmake --build native/oracle/build --target gen_data_fixtures
    ./native/oracle/build/gen_data_fixtures tests/assets/golden_ref_data

The layer's gt_boxes top carries the crop-space windows with their final
ignore flags (image_gt_data_layer.cpp:820-839) — exactly the rasterizer's
input — so each scenario replays that top through rasterize_labels and
compares the 6-channel maps cell-for-cell:

  datalayer_identity  identity geometry + RONI regions (iou=1 cells,
                      image_gt_data_layer.cpp:668-677) + a zero-gt image
  datalayer_aug       mirror+resize+crop chain, full copy region
  datalayer_zoom      octave zoom / aspect jitter; zoom-out yields a
                      partial copy region whose out-of-region cells get
                      iou=1 (cpp:655-659); the copy rect is recovered from
                      the strictly-positive data canvas
"""

import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.data import rasterize as RZ

DIR = pathlib.Path(__file__).parent / "assets" / "golden_ref_data"
MANIFEST = json.loads((DIR / "manifest.json").read_text())

SCENARIOS = ["datalayer_identity", "datalayer_aug", "datalayer_zoom"]


def L(name):
    return np.load(DIR / f"{name}.npy")


def _spec(p):
    return RZ.RasterSpec(
        template_hw=(p["template_h"], p["template_w"]),
        strides=tuple(p["downsample_rate"]),
        field_ws=tuple(p["field_w"]),
        field_hs=tuple(p["field_h"]),
        fg_threshold=p["fg_threshold"],
    )


def _copy_region(data_item, p, scale):
    """Recover (x0, y0, w, h) of the augmentation copy rect from the zero
    border of the data canvas. Fixture images are strictly positive and the
    no-mean scenarios keep them positive after (pixel - 0) * scale."""
    mask = (data_item > 0).any(axis=0)
    ys, xs = np.nonzero(mask)
    assert len(xs), "empty data canvas"
    return (float(xs.min()), float(ys.min()),
            float(xs.max() + 1 - xs.min()), float(ys.max() + 1 - ys.min()))


def _ronis_for(scenario, item):
    path = DIR / f"{scenario}.ronis.npy"
    if not path.exists():
        return np.zeros((1, 4), np.float32), np.zeros(1, bool)
    table = np.load(path)
    rows = table[table[:, 0] == item][:, 1:5]
    if len(rows) == 0:
        return np.zeros((1, 4), np.float32), np.zeros(1, bool)
    return rows.astype(np.float32), np.ones(len(rows), bool)


@pytest.mark.parametrize("scenario", SCENARIOS)
def test_rasterizer_matches_reference_layer(scenario):
    p = MANIFEST[scenario]
    spec = _spec(p)
    data = L(f"{scenario}.data")
    gt_boxes = L(f"{scenario}.gt_boxes").reshape(-1, 7)
    n_scales = len(p["downsample_rate"])
    want = [L(f"{scenario}.label{nn}") for nn in range(n_scales)]

    checked_pos = 0
    for item in range(p["batch_size"]):
        rows = gt_boxes[gt_boxes[:, 0] == item]
        if len(rows) == 0:
            gts = np.zeros((1, 6), np.float32)
            gt_valid = np.zeros(1, bool)
        else:
            # [x1, y1, x2, y2, label, ignore]
            gts = rows[:, [1, 2, 3, 4, 5, 6]].astype(np.float32)
            gt_valid = np.ones(len(rows), bool)
        ronis, roni_valid = _ronis_for(scenario, item)
        region = _copy_region(data[item], p, p["scale"])

        maps = RZ.rasterize_labels(
            jnp.asarray(gts), jnp.asarray(gt_valid), jnp.asarray(ronis),
            jnp.asarray(roni_valid), spec, copy_region=region)

        for nn in range(n_scales):
            got = np.asarray(maps[nn])                    # [h, w, 6]
            ref = np.transpose(want[nn][item], (1, 2, 0))  # [6,h,w]->[h,w,6]
            np.testing.assert_array_equal(
                got[:, :, 0], ref[:, :, 0],
                err_msg=f"{scenario} item {item} scale {nn} label channel")
            np.testing.assert_allclose(
                got[:, :, 1:5], ref[:, :, 1:5], rtol=1e-5, atol=1e-4,
                err_msg=f"{scenario} item {item} scale {nn} box channels")
            np.testing.assert_allclose(
                got[:, :, 5], ref[:, :, 5], rtol=1e-5, atol=1e-5,
                err_msg=f"{scenario} item {item} scale {nn} iou channel")
            checked_pos += int((ref[:, :, 0] > 0).sum())
    assert checked_pos > 0, "scenario has no positive cells to pin"


def test_fixtures_exercise_all_raster_paths():
    """The committed fixtures must keep covering the interesting paths:
    positives at every scale, iou=1 RONI/out-of-region cells, ignored gts,
    and at least one partial copy region (zoom-out)."""
    per_scale_pos = np.zeros(4, np.int64)
    any_iou1 = 0
    partial_region = 0
    ignored = 0
    for scenario in SCENARIOS:
        p = MANIFEST[scenario]
        gt = L(f"{scenario}.gt_boxes").reshape(-1, 7)
        ignored += int((gt[:, 6] != 0).sum())
        data = L(f"{scenario}.data")
        for nn in range(4):
            lm = L(f"{scenario}.label{nn}")
            per_scale_pos[nn] += int((lm[:, 0] > 0).sum())
            any_iou1 += int((lm[:, 5] == 1.0).sum())
        for item in range(p["batch_size"]):
            x0, y0, w, h = _copy_region(data[item], p, p["scale"])
            if (w, h) != (p["template_w"], p["template_h"]):
                partial_region += 1
    assert (per_scale_pos > 0).all(), per_scale_pos
    assert any_iou1 > 0
    assert partial_region > 0
    assert ignored > 0

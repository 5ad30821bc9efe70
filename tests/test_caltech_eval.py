"""Caltech MR-2 evaluator: protocol semantics on hand-computed cases.

The protocol is Piotr Dollar's toolbox (bbGt.evalRes matching, dbEval
'Reasonable' filter, log-average miss rate over 9 FPPI points); the
detection file format is the reference's caltech writer
(/root/reference/examples/caltech/run_mscnn_detection.m:159-167).
"""

import numpy as np
import pytest

from mscnn_tpu.evaluation import caltech_eval as CE


def _gt(x, y, w, h, **kw):
    return CE.GtBox(label=kw.pop("label", "person"), bb=(x, y, w, h), **kw)


# ------------------------------------------------------------------ bbGt IO

def test_parse_bbgt(tmp_path):
    p = tmp_path / "I00000.txt"
    p.write_text(
        "% bbGt version=3\n"
        "person 10 20 30 80 0 0 0 0 0 0 0\n"
        "person 5 5 20 40 1 5 5 10 40 0 0\n"
        "people 0 0 100 100 0 0 0 0 0 1 0\n")
    boxes = CE.parse_bbgt(str(p))
    assert len(boxes) == 3
    assert boxes[0].bb == (10, 20, 30, 80) and not boxes[0].occluded
    assert boxes[1].occluded and boxes[1].visibility == pytest.approx(0.5)
    assert boxes[2].ignore and boxes[2].label == "people"


def test_parse_bbgt_requires_header(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("person 1 2 3 4\n")
    with pytest.raises(ValueError):
        CE.parse_bbgt(str(p))


def test_detection_file_round_trip(tmp_path):
    dets = [np.array([[1.0, 2.0, 3.0, 4.0, 0.9]]),
            np.zeros((0, 5)),
            np.array([[5.0, 6.0, 7.0, 8.0, 0.1],
                      [9.0, 10.0, 11.0, 12.0, 0.2]])]
    f = tmp_path / "dets.txt"
    CE.write_detections(str(f), dets)
    # reference format: 1-based image index, comma separated
    first = f.read_text().splitlines()[0]
    assert first == "1,1,2,3,4,0.9"
    back = CE.read_detections(str(f), 3)
    for a, b in zip(dets, back):
        np.testing.assert_allclose(a, b)


# ------------------------------------------------------------ gt filtering

def test_reasonable_setting_gates():
    gts = [
        _gt(100, 100, 25, 60),                       # kept
        _gt(100, 100, 20, 30),                       # too short -> ignore
        _gt(100, 100, 40, 100, occluded=True,
            vbb=(100, 100, 40, 30)),                 # vis 0.3 -> ignore
        _gt(100, 100, 40, 100, label="people"),      # ignore class
        _gt(0, 100, 25, 60),                         # x < 5 margin -> ignore
        _gt(100, 100, 40, 100, ignore=True),         # annotated ignore
    ]
    out = CE.apply_setting(gts, CE.REASONABLE)
    assert out[:, 4].tolist() == [0, 1, 1, 1, 1, 1]
    # kept gt squarified to aspect 0.41, center preserved
    x, y, w, h = out[0, :4]
    assert w == pytest.approx(60 * 0.41)
    assert x + w / 2 == pytest.approx(100 + 25 / 2)
    assert (y, h) == (100, 60)


def test_setting_without_squarify_keeps_box():
    s = CE.Setting("raw", squarify=None, x_rng=None, y_rng=None)
    out = CE.apply_setting([_gt(1, 2, 30, 80)], s)
    np.testing.assert_allclose(out[0], [1, 2, 30, 80, 0])


# ---------------------------------------------------------------- matching

def test_eval_image_tp_fp_and_greedy_order():
    gt = np.array([[10, 10, 20, 50, 0.0]])
    dt = np.array([
        [11, 11, 20, 50, 0.5],   # lower score, same gt
        [10, 10, 20, 50, 0.9],   # higher score claims the gt
    ])
    gf, df = CE.eval_image(gt, dt)
    assert gf.tolist() == [1]
    # rows are returned sorted by descending score
    assert df[:, 0].tolist() == [0.9, 0.5]
    assert df[:, 1].tolist() == [1.0, 0.0]  # TP then duplicate FP


def test_eval_image_ignore_region_absorbs():
    # detection fully inside an ignore region: inter/area(dt) = 1
    gt = np.array([[0, 0, 100, 100, 1.0]])
    dt = np.array([[40, 40, 10, 10, 0.8]])
    gf, df = CE.eval_image(gt, dt)
    assert gf.tolist() == [-1]
    assert df[0, 1] == -1  # neither TP nor FP
    # but IoU vs a NORMAL gt of that size would fail the 0.5 threshold
    gt2 = np.array([[0, 0, 100, 100, 0.0]])
    gf2, df2 = CE.eval_image(gt2, dt)
    assert gf2.tolist() == [0] and df2[0, 1] == 0


def test_eval_image_prefers_normal_over_ignore():
    gt = np.array([[10, 10, 20, 50, 0.0],
                   [10, 10, 20, 50, 1.0]])
    dt = np.array([[10, 10, 20, 50, 0.9]])
    gf, df = CE.eval_image(gt, dt)
    assert sorted(gf.tolist()) == [-1, 1]
    assert df[0, 1] == 1


# ------------------------------------------------------------------- curve

def test_mr2_hand_case():
    # 2 images, 1 gt each; det A = TP @0.9, det B = FP @0.8
    gfs = [np.array([1]), np.array([0])]
    dfs = [np.array([[0.9, 1.0]]), np.array([[0.8, 0.0]])]
    _, fppi, miss = CE.mr_curve(gfs, dfs, n_images=2)
    np.testing.assert_allclose(fppi, [0.0, 0.5])
    np.testing.assert_allclose(miss, [0.5, 0.5])
    # every reference FPPI point samples miss 0.5
    assert CE.log_avg_miss_rate(fppi, miss) == pytest.approx(0.5)


def test_mr2_no_detections_is_one():
    assert CE.log_avg_miss_rate(np.zeros(0), np.zeros(0)) == 1.0


def test_mr2_perfect_is_zero():
    # single det, TP, no FP: curve reaches miss 0 at fppi 0
    assert CE.log_avg_miss_rate(np.array([0.0]),
                                np.array([0.0])) == pytest.approx(0.0, abs=1e-9)


# ------------------------------------------------------------------- e2e

def test_evaluate_dirs_end_to_end(tmp_path):
    gt_dir = tmp_path / "annotations"
    gt_dir.mkdir()
    (gt_dir / "I0.txt").write_text(
        "% bbGt version=3\nperson 100 100 25 60 0 0 0 0 0 0 0\n")
    (gt_dir / "I1.txt").write_text(
        "% bbGt version=3\nperson 200 50 30 70 0 0 0 0 0 0 0\n")
    # perfect detections in ORIGINAL (un-squarified) coordinates still
    # clear IoU 0.5 against the squarified gt (aspect 25/60=0.42 ~ 0.41)
    det_file = tmp_path / "comp_ped.txt"
    CE.write_detections(str(det_file), [
        np.array([[100, 100, 25, 60, 0.95]]),
        np.array([[200, 50, 30, 70, 0.90]]),
    ])
    out = CE.evaluate_dirs(str(gt_dir), str(det_file))
    assert out["n_images"] == 2 and out["n_pos"] == 2
    assert out["mr2"] == pytest.approx(0.0, abs=1e-9)
    # drop one detection -> one gt always missed -> MR-2 = 0.5
    CE.write_detections(str(det_file), [
        np.array([[100, 100, 25, 60, 0.95]]),
        np.zeros((0, 5)),
    ])
    out2 = CE.evaluate_dirs(str(gt_dir), str(det_file))
    assert out2["mr2"] == pytest.approx(0.5)


def test_cli_eval_caltech(tmp_path, capsys):
    import json

    from mscnn_tpu import cli

    gt_dir = tmp_path / "annotations"
    gt_dir.mkdir()
    (gt_dir / "I0.txt").write_text(
        "% bbGt version=3\nperson 100 100 25 60 0 0 0 0 0 0 0\n")
    det_file = tmp_path / "comp_ped.txt"
    CE.write_detections(str(det_file), [np.array([[100, 100, 25, 60, 0.95]])])
    rc = cli.main(["eval", "--dataset", "caltech",
                   "--gt-dir", str(gt_dir),
                   "--result-file", str(det_file)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mr2"] == pytest.approx(0.0, abs=1e-4)
    assert out["n_pos"] == 1


def test_cli_eval_missing_args():
    from mscnn_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["eval", "--dataset", "caltech"])


def test_citypersons_setting():
    # same h/vis gates as reasonable, but no squarify and no border margin
    gts = [_gt(0, 100, 25, 60),          # at x=0: kept (no margin gate)
           _gt(100, 100, 20, 30)]        # too short -> ignore
    out = CE.apply_setting(gts, CE.CITYPERSONS)
    assert out[:, 4].tolist() == [0, 1]
    np.testing.assert_allclose(out[0, :4], [0, 100, 25, 60])  # unsquarified


# ----------------------------------------------------------------- vbb

def _vbb_fixture(path):
    """savemat a struct mirroring the real vbb layout: A.nFrame,
    A.objLists (per-frame struct arrays with id/pos/posv/occl),
    A.objLbl (id -> label)."""
    from scipy.io import savemat

    def objs(items):
        a = np.empty((1, len(items)), dtype=object) if items else \
            np.empty((1, 0), dtype=object)
        for i, v in enumerate(items):
            a[0, i] = v
        return a

    def obj(oid, pos, posv=(0, 0, 0, 0), occl=0):
        return {"id": oid, "pos": np.asarray(pos, float),
                "posv": np.asarray(posv, float), "occl": occl,
                "lock": 0}

    frames = np.empty((1, 3), dtype=object)
    frames[0, 0] = objs([obj(1, [11, 21, 30, 80]),
                         obj(2, [1, 1, 50, 50])])
    frames[0, 1] = objs([])                       # empty frame
    frames[0, 2] = objs([obj(1, [6, 6, 20, 40], posv=[6, 6, 10, 40],
                             occl=1)])
    lbl = np.empty((1, 2), dtype=object)
    lbl[0, 0] = "person"
    lbl[0, 1] = "people"
    savemat(path, {"A": {"nFrame": 3, "objLists": frames, "objLbl": lbl,
                         "maxObj": 2, "log": np.zeros((1, 0)),
                         "logLen": 0, "altered": 0}})


def test_load_vbb(tmp_path):
    p = tmp_path / "V000.vbb"
    _vbb_fixture(str(p))
    frames = CE.load_vbb(str(p))
    assert [len(f) for f in frames] == [2, 0, 1]
    a, b = frames[0]
    # MATLAB 1-based -> 0-based shift on positions
    assert a.label == "person" and a.bb == (10, 20, 30, 80)
    assert b.label == "people" and b.bb == (0, 0, 50, 50)
    c = frames[2][0]
    assert c.occluded and c.vbb == (5, 5, 10, 40)
    assert c.visibility == pytest.approx(0.5)


def test_write_bbgt_round_trip(tmp_path):
    boxes = [CE.GtBox("person", (10, 20, 30, 80)),
             CE.GtBox("people", (0, 0, 50, 50), ignore=True),
             CE.GtBox("person", (5, 5, 20, 40), occluded=True,
                      vbb=(5, 5, 10, 40))]
    p = tmp_path / "I00029.txt"
    CE.write_bbgt(str(p), boxes)
    back = CE.parse_bbgt(str(p))
    assert [b.label for b in back] == ["person", "people", "person"]
    assert back[0].bb == (10, 20, 30, 80)
    assert back[1].ignore
    assert back[2].occluded and back[2].visibility == pytest.approx(0.5)


def test_cli_vbb2bbgt(tmp_path, capsys):
    from mscnn_tpu import cli

    vdir = tmp_path / "set00"
    vdir.mkdir()
    _vbb_fixture(str(vdir / "V000.vbb"))
    out = tmp_path / "ann"
    rc = cli.main(["vbb2bbgt", str(tmp_path), "--output-dir", str(out),
                   "--stride", "2", "--offset", "0"])
    assert rc == 0
    assert "Wrote 2 bbGt files" in capsys.readouterr().out
    names = sorted(p.name for p in out.iterdir())
    # setXX parent dir becomes the devkit-style prefix
    assert names == ["set00_V000_I00000.txt", "set00_V000_I00002.txt"]
    f0 = CE.parse_bbgt(str(out / "set00_V000_I00000.txt"))
    assert len(f0) == 2 and f0[0].bb == (10, 20, 30, 80)

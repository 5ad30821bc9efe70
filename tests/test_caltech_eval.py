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

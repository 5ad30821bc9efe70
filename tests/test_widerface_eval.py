"""WIDER FACE AP evaluator: official-protocol semantics on hand cases.

File formats follow the reference's widerface writer
(/root/reference/examples/widerface/run_mscnn_detection.m:173-199) and the
official wider_face_*_bbx_gt.txt; the scoring algorithm is the official
eval toolbox (norm_score / image_eval / img_pr_info / voc_ap).
"""

import numpy as np
import pytest

from mscnn_tpu.evaluation import widerface_eval as WE


# --------------------------------------------------------------------- IO

def test_parse_gt_blocks(tmp_path):
    p = tmp_path / "wider_face_val_bbx_gt.txt"
    p.write_text(
        "0--Parade/0_Parade_marchingband_1_465.jpg\n"
        "2\n"
        "345 211 4 4 2 0 0 0 2 0\n"
        "331 100 40 47 0 0 0 0 0 0\n"
        "1--Handshaking/1_Handshaking_Handshaking_1_35.jpg\n"
        "0\n"
        "0 0 0 0 0 0 0 0 0 0\n")
    gt = WE.parse_gt(str(p))
    assert len(gt) == 2
    a = gt["0--Parade/0_Parade_marchingband_1_465.jpg"]
    assert a.shape == (2, 10)
    np.testing.assert_allclose(a[0, :4], [345, 211, 4, 4])
    assert gt["1--Handshaking/1_Handshaking_Handshaking_1_35.jpg"].shape \
        == (0, 10)


def test_detection_tree_round_trip(tmp_path):
    events = {
        "0--Parade": {
            "0_Parade_1": np.array([[10.4, 20.6, 30.0, 40.0, 0.875]]),
            "0_Parade_2": np.zeros((0, 5)),
        },
        "1--Handshaking": {
            "1_Hand_1": np.array([[1, 2, 3, 4, 0.5], [5, 6, 7, 8, 0.25]]),
        },
    }
    WE.write_detections(str(tmp_path), "comp", events)
    txt = (tmp_path / "comp" / "0--Parade" / "0_Parade_1.txt").read_text()
    # reference format: name line, count line, rounded int coords + score
    assert txt.splitlines()[0] == "0_Parade_1"
    assert txt.splitlines()[1] == "1"
    assert txt.splitlines()[2] == "10 21 30 40 0.875000"
    back = WE.read_detections(str(tmp_path), "comp")
    assert set(back) == set(events)
    np.testing.assert_allclose(back["0--Parade"]["0_Parade_1"],
                               [[10, 21, 30, 40, 0.875]])
    assert back["0--Parade"]["0_Parade_2"].shape == (0, 5)


# ------------------------------------------------------------- keep masks

def test_keep_valid_and_height():
    gt = np.zeros((3, 10))
    gt[0, :4] = [0, 0, 10, 30]
    gt[1, :4] = [0, 0, 10, 5]
    gt[2, :4] = [0, 0, 10, 50]
    gt[2, 7] = 1  # invalid flag
    np.testing.assert_array_equal(WE.keep_valid(gt), [True, True, False])
    np.testing.assert_array_equal(WE.keep_by_height(gt, 10.0),
                                  [True, False, False])


# -------------------------------------------------------------- image_eval

def test_image_eval_claims_each_gt_once():
    gt = np.array([[0, 0, 10, 10], [100, 0, 10, 10]], dtype=float)
    keep = np.array([True, True])
    pred = np.array([
        [0, 0, 10, 10, 1.0],
        [1, 0, 10, 10, 0.9],    # same gt, already claimed
        [100, 0, 10, 10, 0.8],
    ])
    recall, flag = WE.image_eval(pred, gt, keep)
    assert recall.tolist() == [1, 1, 2]
    assert flag.tolist() == [1, 1, 1]  # duplicate still counts as proposal


def test_image_eval_non_kept_gt_excludes_detection():
    gt = np.array([[0, 0, 10, 10]], dtype=float)
    pred = np.array([[0, 0, 10, 10, 0.9]])
    recall, flag = WE.image_eval(pred, gt, np.array([False]))
    assert recall.tolist() == [0]
    assert flag.tolist() == [-1]


# --------------------------------------------------------------- evaluate

def _one_image(dets):
    return {"0--Parade": {"img": np.asarray(dets, dtype=float)}}


def _gt_rows(boxes, invalid=None):
    gt = np.zeros((len(boxes), 10))
    gt[:, :4] = boxes
    if invalid:
        for i in invalid:
            gt[i, 7] = 1
    return {"0--Parade/img.jpg": gt}


def test_evaluate_perfect_ap_one():
    dets = _one_image([[0, 0, 10, 10, 0.9], [50, 0, 12, 12, 0.7]])
    gts = _gt_rows([[0, 0, 10, 10], [50, 0, 12, 12]])
    out = WE.evaluate(dets, gts)
    assert out["n_gt"] == 2
    assert out["ap"] == pytest.approx(1.0, abs=1e-6)


def test_evaluate_hand_computed_ap():
    # TP @1.0, FP @0.5, TP @0.25 over 2 kept gts:
    # P/R points (by threshold): (1, .5), (.5, .5), (2/3, 1)
    # envelope AP = .5*1 + .5*(2/3) = 5/6
    dets = _one_image([[0, 0, 10, 10, 1.0],
                       [200, 200, 5, 5, 0.5],
                       [50, 0, 12, 12, 0.25]])
    gts = _gt_rows([[0, 0, 10, 10], [50, 0, 12, 12]])
    out = WE.evaluate(dets, gts)
    assert out["ap"] == pytest.approx(5.0 / 6.0, abs=1e-3)


def test_evaluate_invalid_gt_ignored():
    # second det matches an invalid-flagged gt: excluded, AP stays 1
    dets = _one_image([[0, 0, 10, 10, 1.0], [50, 0, 12, 12, 0.9]])
    gts = _gt_rows([[0, 0, 10, 10], [50, 0, 12, 12]], invalid=[1])
    out = WE.evaluate(dets, gts)
    assert out["n_gt"] == 1
    assert out["ap"] == pytest.approx(1.0, abs=1e-6)


def test_evaluate_with_difficulty_keep_mask():
    # curated keep list: only the big face counts; the small-face det
    # matches a non-kept gt and is excluded rather than an FP
    dets = _one_image([[0, 0, 40, 40, 1.0], [100, 0, 4, 4, 0.9]])
    gts = _gt_rows([[0, 0, 40, 40], [100, 0, 4, 4]])
    keep = {"0--Parade/img.jpg": np.array([True, False])}
    out = WE.evaluate(dets, gts, keep=keep)
    assert out["n_gt"] == 1
    assert out["ap"] == pytest.approx(1.0, abs=1e-6)


def test_voc_ap_envelope():
    rec = np.array([0.5, 0.5, 1.0])
    prec = np.array([1.0, 0.5, 2.0 / 3.0])
    assert WE.voc_ap(rec, prec) == pytest.approx(5.0 / 6.0)


def test_cli_eval_widerface(tmp_path, capsys):
    import json

    from mscnn_tpu import cli

    gt_file = tmp_path / "gt.txt"
    gt_file.write_text("0--Parade/img.jpg\n1\n10 10 40 40 0 0 0 0 0 0\n")
    WE.write_detections(str(tmp_path / "dets"), "comp", {
        "0--Parade": {"img": np.array([[10, 10, 40, 40, 0.9]])}})
    rc = cli.main(["eval", "--dataset", "widerface",
                   "--gt-file", str(gt_file),
                   "--result-dir", str(tmp_path / "dets" / "comp")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ap"] == pytest.approx(1.0, abs=1e-4)
    assert out["n_gt"] == 1


def _official_mat_fixture(tmp_path):
    """savemat a structure with the official devkit nesting: event_list /
    file_list / face_bbx_list cells in wider_face_val.mat; gt_list
    (1-based kept-face indices) in the difficulty file."""
    from scipy.io import savemat

    def cell(items):
        a = np.empty((len(items), 1), dtype=object)
        for i, v in enumerate(items):
            a[i, 0] = v
        return a

    events = cell([np.array(["0--Parade"]), np.array(["1--Handshaking"])])
    files = cell([cell([np.array(["p0"]), np.array(["p1"])]),
                  cell([np.array(["h0"])])])
    bbx = cell([cell([np.array([[0, 0, 10, 10], [50, 0, 12, 12]], float),
                      np.array([[5, 5, 20, 20]], float)]),
                cell([np.array([[7, 7, 30, 30]], float)])])
    gt_mat = tmp_path / "wider_face_val.mat"
    savemat(str(gt_mat), {"event_list": events, "file_list": files,
                          "face_bbx_list": bbx})
    # hard list: p0 keeps only face 2; p1 keeps its face; h0 keeps none
    gtl = cell([cell([np.array([[2]], float), np.array([[1]], float)]),
                cell([np.zeros((0, 1), float)])])
    hard_mat = tmp_path / "wider_hard_val.mat"
    savemat(str(hard_mat), {"gt_list": gtl})
    return gt_mat, hard_mat


def test_load_split_mat_official_layout(tmp_path):
    gt_mat, hard_mat = _official_mat_fixture(tmp_path)
    gts, keep = WE.load_split_mat(str(gt_mat), str(hard_mat))
    assert set(gts) == {"0--Parade/p0.jpg", "0--Parade/p1.jpg",
                        "1--Handshaking/h0.jpg"}
    np.testing.assert_allclose(gts["0--Parade/p0.jpg"][:, :4],
                               [[0, 0, 10, 10], [50, 0, 12, 12]])
    assert gts["0--Parade/p0.jpg"].shape == (2, 10)
    np.testing.assert_array_equal(keep["0--Parade/p0.jpg"], [False, True])
    np.testing.assert_array_equal(keep["0--Parade/p1.jpg"], [True])
    np.testing.assert_array_equal(keep["1--Handshaking/h0.jpg"], [False])
    # without a difficulty file: keep_valid defaults (all valid here)
    gts2, keep2 = WE.load_split_mat(str(gt_mat))
    np.testing.assert_array_equal(keep2["0--Parade/p0.jpg"], [True, True])


def test_evaluate_with_official_mats(tmp_path):
    gt_mat, hard_mat = _official_mat_fixture(tmp_path)
    gts, keep = WE.load_split_mat(str(gt_mat), str(hard_mat))
    # perfect detections on exactly the kept faces
    dets = {"0--Parade": {"p0": np.array([[50, 0, 12, 12, 0.9]]),
                          "p1": np.array([[5, 5, 20, 20, 0.8]])},
            "1--Handshaking": {"h0": np.zeros((0, 5))}}
    out = WE.evaluate(dets, gts, keep=keep)
    assert out["n_gt"] == 2
    assert out["ap"] == pytest.approx(1.0, abs=1e-6)


def test_cli_eval_widerface_mat(tmp_path, capsys):
    import json

    from mscnn_tpu import cli

    gt_mat, hard_mat = _official_mat_fixture(tmp_path)
    WE.write_detections(str(tmp_path / "dets"), "comp", {
        "0--Parade": {"p0": np.array([[50, 0, 12, 12, 0.9]]),
                      "p1": np.array([[5, 5, 20, 20, 0.8]])},
        "1--Handshaking": {"h0": np.zeros((0, 5))}})
    rc = cli.main(["eval", "--dataset", "widerface",
                   "--gt-mat", str(gt_mat),
                   "--difficulty-mat", str(hard_mat),
                   "--result-dir", str(tmp_path / "dets" / "comp")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ap"] == pytest.approx(1.0, abs=1e-4)
    assert out["n_gt"] == 2

"""KITTI AP evaluator protocol tests: difficulty gating, neighbor-class and
DontCare ignore rules, PR assignment, AP values on constructed scenes.

The 41-recall-point discretization needs a realistic ground-truth population
(the reference evaluator behaves degenerately below ~41 gts by construction),
so scenes here carry 50+ well-separated objects.
"""

import numpy as np

from mscnn_tpu.evaluation import kitti_eval as KE


def gt(type="car", x1=0, y1=0, x2=60, y2=60, occ=0, trunc=0.0):
    return KE.KittiObject(type, trunc, occ, x1, y1, x2, y2)


def det(type="car", x1=0, y1=0, x2=60, y2=60, score=1.0):
    return KE.KittiObject(type, -1, -1, x1, y1, x2, y2, score=score)


def grid_scene(n_img=5, per_img=10, detect_frac=1.0, score0=0.99):
    """Well-separated gt grid with matching detections for a fraction."""
    gts, dets = [], []
    s = 0
    for i in range(n_img):
        g_row, d_row = [], []
        for k in range(per_img):
            x = 100 * k
            g_row.append(gt(x1=x, y1=0, x2=x + 60, y2=60))
            if k < per_img * detect_frac:
                d_row.append(det(x1=x, y1=0, x2=x + 60, y2=60,
                                 score=score0 - 0.0001 * s))
                s += 1
        gts.append(g_row)
        dets.append(d_row)
    return gts, dets


def test_perfect_detections_ap_100():
    gts, dets = grid_scene()
    for d in range(3):
        _, ap = KE.eval_class(gts, dets, "car", d)
        assert ap == 100.0, (d, ap)


def test_missed_detections_lower_ap():
    gts, dets = grid_scene(detect_frac=0.6)
    _, ap = KE.eval_class(gts, dets, "car", 1)
    assert 40.0 < ap < 80.0


def test_false_positives_lower_ap():
    gts, dets = grid_scene()
    # high-scoring FPs far from any gt
    for row in dets:
        row.append(det(x1=5000, y1=0, x2=5060, y2=60, score=0.999))
    _, ap = KE.eval_class(gts, dets, "car", 1)
    assert ap < 100.0


def test_difficulty_gating_by_occlusion():
    gts = [gt(occ=2)]
    for d, expect_counted in ((0, False), (1, False), (2, True)):
        ig, _, _, n_gt = KE.clean_data("car", gts, [], d)
        assert (n_gt == 1) == expect_counted
        assert ig[0] == (0 if expect_counted else 1)


def test_difficulty_gating_by_height():
    small = gt(y1=0, y2=30)  # height 30: easy needs 40, mod/hard need 25
    ig_easy, _, _, n_easy = KE.clean_data("car", [small], [], 0)
    ig_mod, _, _, n_mod = KE.clean_data("car", [small], [], 1)
    assert n_easy == 0 and ig_easy[0] == 1
    assert n_mod == 1 and ig_mod[0] == 0


def test_van_ignored_for_car():
    gts, dets = grid_scene()
    # a van gt plus a detection on it: assigned to ignored gt => not FP;
    # the van gt itself => not FN. AP must stay 100.
    gts[0].append(gt(type="van", x1=2000, y1=0, x2=2060, y2=60))
    dets[0].append(det(x1=2000, y1=0, x2=2060, y2=60, score=0.999))
    _, ap = KE.eval_class(gts, dets, "car", 1)
    assert ap == 100.0


def test_unrelated_class_gt_is_not_fn():
    ig, _, _, n_gt = KE.clean_data(
        "car", [gt(type="cyclist", x1=0, y1=0, x2=50, y2=50)], [], 1)
    assert ig[0] == -1 and n_gt == 0


def test_dontcare_absorbs_unmatched_detections():
    gts, dets = grid_scene()
    gts[0].append(gt(type="dontcare", x1=3000, y1=0, x2=3060, y2=60,
                     occ=-1, trunc=-1))
    dets[0].append(det(x1=3005, y1=5, x2=3055, y2=55, score=0.999))
    _, ap = KE.eval_class(gts, dets, "car", 1)
    assert ap == 100.0


def test_overlap_threshold_car_07_vs_ped_05():
    # IoU ~0.56 for a shifted box: counts for pedestrian (0.5), not car (0.7)
    def scene(cls):
        gts, dets = [], []
        for i in range(5):
            g_row, d_row = [], []
            for k in range(10):
                x = 100 * k
                g_row.append(gt(type=cls, x1=x, y1=0, x2=x + 60, y2=60))
                d_row.append(det(type=cls, x1=x + 20, y1=0, x2=x + 62,
                                 y2=60, score=0.99 - 0.0001 * (10 * i + k)))
            gts.append(g_row)
            dets.append(d_row)
        return gts, dets

    g, d = scene("car")
    _, ap_car = KE.eval_class(g, d, "car", 1)
    assert ap_car == 0.0
    g, d = scene("pedestrian")
    _, ap_ped = KE.eval_class(g, d, "pedestrian", 1)
    assert ap_ped == 100.0


def test_half_recall_ap():
    gts, dets = grid_scene(detect_frac=0.5)
    prec, ap = KE.eval_class(gts, dets, "car", 1)
    # perfect precision up to recall 0.5, nothing beyond
    assert 40.0 < ap < 60.0


def test_evaluate_directories(tmp_path):
    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res"
    gt_dir.mkdir()
    res_dir.mkdir()
    for i in range(5):
        g_lines, r_lines = [], []
        for k in range(10):
            x = 100 * k
            g_lines.append(f"Car 0.0 0 -10 {x} 10 {x + 70} 80 "
                           f"-1 -1 -1 -1000 -1000 -1000 -10")
            r_lines.append(f"Car -1 -1 -10 {x} 10 {x + 70} 80 "
                           f"-1 -1 -1 -1000 -1000 -1000 -10 "
                           f"{950 - i * 10 - k}")
        (gt_dir / f"{i:06d}.txt").write_text("\n".join(g_lines) + "\n")
        (res_dir / f"{i:06d}.txt").write_text("\n".join(r_lines) + "\n")
    out = KE.evaluate(str(gt_dir), str(res_dir), list(range(5)),
                      classes=("car",))
    assert out["car"]["moderate"] == 100.0
    assert out["car"]["easy"] == 100.0
    assert out["car"]["hard"] == 100.0


def _write_scene(tmp_path, gts, dets):
    import os
    gt_dir = str(tmp_path / "gt")
    res_dir = str(tmp_path / "res")
    os.makedirs(gt_dir)
    os.makedirs(res_dir)
    ids = list(range(len(gts)))
    for i in ids:
        with open(os.path.join(gt_dir, f"{i:06d}.txt"), "w") as f:
            for o in gts[i]:
                f.write(f"Car {o.truncation} {o.occlusion} -10 "
                        f"{o.x1} {o.y1} {o.x2} {o.y2} "
                        f"-1 -1 -1 -1000 -1000 -1000 -10\n")
        with open(os.path.join(res_dir, f"{i:06d}.txt"), "w") as f:
            for o in dets[i]:
                f.write(f"Car -1 -1 -10 {o.x1} {o.y1} {o.x2} {o.y2} "
                        f"-1 -1 -1 -1000 -1000 -1000 -10 {o.score}\n")
    return gt_dir, res_dir, ids


def test_evaluate_reports_11pt_and_41pt(tmp_path):
    gts, dets = grid_scene(n_img=6, per_img=10, detect_frac=1.0)
    gt_dir, res_dir, ids = _write_scene(tmp_path, gts, dets)
    out = KE.evaluate(gt_dir, res_dir, ids)
    for name in KE.DIFFICULTIES:
        assert out["car"][name] == 100.0
        assert out["car"][f"{name}_41pt"] == 100.0

    # at partial recall the two samplings diverge but stay close
    gts, dets = grid_scene(n_img=6, per_img=10, detect_frac=0.5)
    gt_dir, res_dir, ids = _write_scene(tmp_path / "half", gts, dets)
    out = KE.evaluate(gt_dir, res_dir, ids)
    m11 = out["car"]["moderate"]
    m41 = out["car"]["moderate_41pt"]
    assert 0 < m41 < 100 and 0 < m11 < 100
    assert m11 != m41
    assert abs(m11 - m41) < 10


def test_write_stats_devkit_layout(tmp_path):
    """stats_<cls>_detection.txt: 3 lines x 41 '%f '-formatted precision
    values + plot data (evaluate_object.cpp:168-176, 575-578)."""
    import os
    gts, dets = grid_scene(n_img=6, per_img=10, detect_frac=1.0)
    gt_dir, res_dir, ids = _write_scene(tmp_path, gts, dets)
    stats = str(tmp_path / "stats")
    KE.evaluate(gt_dir, res_dir, ids, stats_dir=stats)
    path = os.path.join(stats, "stats_car_detection.txt")
    lines = open(path).read().splitlines()
    assert len(lines) == 3
    for line in lines:
        assert line.endswith(" ")          # devkit prints "%f " per value
        vals = line.split()
        assert len(vals) == KE.N_SAMPLE_PTS
        assert all(v == "1.000000" for v in vals)  # perfect detections
    plot = os.path.join(stats, "plot", "car_detection.txt")
    rows = [l.split() for l in open(plot).read().splitlines()]
    assert len(rows) == KE.N_SAMPLE_PTS and len(rows[0]) == 4
    assert rows[0][0] == "0.000000" and rows[-1][0] == "1.000000"

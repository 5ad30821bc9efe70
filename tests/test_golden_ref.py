"""Pin ops/ against fixtures produced by the REFERENCE'S OWN C++ code.

Unlike tests/test_golden_inference.py (which compares against independent
numpy re-implementations), every expected array here was produced by
executing the reference's unmodified layer sources — compiled straight out
of /root/reference by native/oracle/ (see native/oracle/CMakeLists.txt).
Regenerate with:

    cmake -S native -B native/build -G Ninja
    cmake --build native/build --target gen_fixtures
    ./native/build/oracle/gen_fixtures tests/assets/golden_ref

Covered reference code paths (file:line refer to /root/reference):
  BoxIOU 3 modes                src/caffe/util/math_functions.cpp:13-35
  DecodeBBoxesWithPrior         src/caffe/util/math_functions.cpp:45-75
  BoxOutput forward (full)      src/caffe/layers/box_output_layer.cpp:39-233
  ROIPooling forward            src/caffe/layers/roi_pooling_layer.cpp:49-141
  ROIAlign forward              src/caffe/layers/roi_align_layer.cpp:49-152
  DecodeBBox forward            src/caffe/layers/decode_bbox_layer.cpp:54-127
  DetectionLoss fwd + bwd       src/caffe/layers/detection_loss_layer.cpp:114-470
  DetectionAccuracy forward     src/caffe/layers/detection_accuracy_layer.cpp:52-197
  BboxAccuracy forward          src/caffe/layers/bbox_accuracy_layer.cpp:37-129
  Softmax forward               src/caffe/layers/softmax_layer.cpp
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.models import mscnn
from mscnn_tpu.ops import boxes as box_ops
from mscnn_tpu.ops import losses
from mscnn_tpu.ops import roi as roi_ops

DIR = pathlib.Path(__file__).parent / "assets" / "golden_ref"
MANIFEST = json.loads((DIR / "manifest.json").read_text())

MEANS = (0.0, 0.0, 0.0, 0.0)
STDS = (0.1, 0.1, 0.2, 0.2)


def L(name):
    return np.load(DIR / f"{name}.npy")


def nchw_to_nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


# --------------------------------------------------------------------- box math

@pytest.mark.parametrize("mode", ["iou", "iomu", "iofu"])
def test_box_iou_modes(mode):
    a, b = L("box_iou.a"), L("box_iou.b")
    want = L(f"box_iou.{mode}")
    got = np.asarray(box_ops.iou_aligned_xywh(jnp.asarray(a), jnp.asarray(b), mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_decode_with_prior():
    priors = L("decode_with_prior.priors")
    deltas = L("decode_with_prior.deltas")
    want = L("decode_with_prior.pred")
    got = np.asarray(box_ops.decode_with_prior(
        jnp.asarray(deltas), jnp.asarray(priors), MEANS, STDS))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


# ------------------------------------------------------------------- BoxOutput

BO_BRANCHES = tuple(
    mscnn.BranchSpec(f"b{i}", "x", 3, stride, f, f)
    for i, (stride, f) in enumerate(zip((8, 8, 16, 32), (60, 84, 120, 240)))
)


def _run_box_output(scenario, max_out):
    p = MANIFEST[scenario]
    heads = [jnp.asarray(nchw_to_nhwc(L(f"{scenario}.head{j}"))) for j in range(4)]
    cfg = mscnn.MSCNNConfig(
        num_classes=p["cls_num"],
        branches=BO_BRANCHES,
        proposal=mscnn.ProposalSpec(
            fg_thr=p["fg_thr"], iou_thr=p["iou_thr"],
            nms_mode=p["nms_type"].lower(),
            max_nms_num=p["max_nms_num"],
            max_out=max_out, min_size=p["min_size"],
            field_whr=p["field_whr"], field_xyr=p["field_xyr"]),
        bbox_mean=MEANS, bbox_std=STDS,
    )
    prop = mscnn.propose(heads, cfg, apply_bbox_norm=p["bbox_norm"])
    return prop, L(f"{scenario}.rois").reshape(-1, 5), \
        L(f"{scenario}.proposals_score").reshape(-1, 6)


@pytest.mark.parametrize("scenario,max_out", [
    ("box_output_deploy", 512),
    ("box_output_caps", 20),
])
def test_box_output(scenario, max_out):
    prop, ref_rois, ref_scored = _run_box_output(scenario, max_out)
    boxes = np.asarray(prop["boxes"])
    scores = np.asarray(prop["scores"])
    valid = np.asarray(prop["valid"])
    for img in range(2):
        ref_rows = ref_scored[ref_scored[:, 0] == img]
        n = int(valid[img].sum())
        assert n == len(ref_rows), (
            f"{scenario} img {img}: {n} survivors vs reference {len(ref_rows)}")
        got_boxes = boxes[img][valid[img]]
        got_scores = scores[img][valid[img]]
        # Both sides emit survivors in descending-score order; coordinates are
        # image-scale (<=320 px) so compare with a small absolute tolerance.
        np.testing.assert_allclose(got_scores, ref_rows[:, 5], rtol=1e-4,
                                   atol=1e-5, err_msg=f"{scenario} img {img} scores")
        np.testing.assert_allclose(got_boxes, ref_rows[:, 1:5], rtol=1e-4,
                                   atol=5e-3, err_msg=f"{scenario} img {img} boxes")
    # rois top and scored top carry the same boxes
    np.testing.assert_allclose(ref_rois[:, 1:], ref_scored[:, 1:5], atol=1e-5)


def test_box_output_empty_dummy_box():
    """Nothing passes fg_thr: the reference fabricates a (1,1,10,10) dummy roi
    and an all-zero score row (box_output_layer.cpp:195-211, 214-218); our
    fixed-capacity formulation reports zero valid slots instead."""
    prop, ref_rois, ref_scored = _run_box_output("box_output_empty", 16)
    assert int(np.asarray(prop["valid"]).sum()) == 0
    np.testing.assert_array_equal(ref_rois.ravel(), [0.0, 1.0, 1.0, 10.0, 10.0])
    np.testing.assert_array_equal(ref_scored.ravel(), np.zeros(6))


# ----------------------------------------------------------------- ROI pooling

@pytest.mark.parametrize("pad_key,pad_ratio", [("out_pad0", 0.0),
                                               ("out_pad025", 0.25)])
def test_roi_pooling(pad_key, pad_ratio):
    feat = nchw_to_nhwc(L("roi_pooling.feat"))
    rois = L("roi_pooling.rois")
    want = L(f"roi_pooling.{pad_key}")
    got = roi_ops.roi_max_pool(
        jnp.asarray(feat), jnp.asarray(rois[:, 0], jnp.int32),
        jnp.asarray(rois[:, 1:]), jnp.ones(len(rois), bool),
        spatial_scale=0.125, pad_ratio=pad_ratio, pooled=7, samples=8)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("pad_key,pad_ratio", [("out_pad0", 0.0),
                                               ("out_pad025", 0.25)])
def test_roi_align(pad_key, pad_ratio):
    feat = nchw_to_nhwc(L("roi_align.feat"))
    rois = L("roi_align.rois")
    want = L(f"roi_align.{pad_key}")
    got = roi_ops.roi_align(
        jnp.asarray(feat), jnp.asarray(rois[:, 0], jnp.int32),
        jnp.asarray(rois[:, 1:]), jnp.ones(len(rois), bool),
        spatial_scale=0.125, pad_ratio=pad_ratio, pooled=7)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------------ DecodeBBox

@pytest.mark.parametrize("scenario,train", [("decode_bbox_train", True),
                                            ("decode_bbox_test", False)])
def test_decode_bbox(scenario, train):
    pred = L(f"{scenario}.bbox_pred").reshape(-1, 8)
    priors = L(f"{scenario}.priors").reshape(-1, 5)
    gts = L(f"{scenario}.gts").reshape(-1, 6)
    want = L(f"{scenario}.decoded").reshape(-1, 5)
    thr = MANIFEST[scenario]["gt_iou_thr"]
    new, valid = box_ops.decode_bbox(
        jnp.asarray(pred), jnp.asarray(priors[:, 1:]),
        jnp.ones(len(pred), bool), bbox_mean=MEANS, bbox_std=STDS,
        match_overlap=jnp.asarray(gts[:, 5]) if train else None,
        gt_iou_thr=thr, train=train)
    new, valid = np.asarray(new), np.asarray(valid)
    assert int(valid.sum()) == len(want)
    # The reference keeps surviving rows in original order; so does our mask.
    np.testing.assert_array_equal(priors[valid, 0], want[:, 0])
    np.testing.assert_allclose(new[valid], want[:, 1:], rtol=1e-4, atol=2e-3)


# --------------------------------------------------------------- DetectionLoss

def _det_spec(p):
    return losses.DetectionLossSpec(
        cls_num=p["cls_num"], field_w=p["field"], field_h=p["field"],
        stride=p["downsample_rate"], lambda_=p["lambda"],
        field_whr=p["field_whr"], field_xyr=p["field_xyr"],
        bb_smooth=p["bb_smooth"], bg_threshold=p["bg_threshold"],
        bg_multiple=p["bg_multiple"], sample_mode=p["sample_mode"],
        objectness=p["objectness"], iou_weighted=p["iou_weighted"],
        pos_neg_weighted=p["pos_neg_weighted"],
        bbox_mean=tuple(p["means"]), bbox_std=tuple(p["stds"]))


DET_LOSS_SCENARIOS = ["detection_loss_bootstrap", "detection_loss_iouw",
                      "detection_loss_objectness"]


@pytest.mark.parametrize("scenario", DET_LOSS_SCENARIOS)
def test_detection_loss_forward(scenario):
    p = MANIFEST[scenario]
    spec = _det_spec(p)
    head = jnp.asarray(nchw_to_nhwc(L(f"{scenario}.bottom0")))
    labels = jnp.asarray(nchw_to_nhwc(L(f"{scenario}.label")))
    want = L(f"{scenario}.loss").ravel()  # [total, lambda*coord]
    total, aux = losses.detection_loss(head, labels, spec)
    np.testing.assert_allclose(float(total), want[0], rtol=1e-4)
    np.testing.assert_allclose(float(aux["coord_loss"]), want[1], rtol=1e-4)


@pytest.mark.parametrize("scenario", DET_LOSS_SCENARIOS)
def test_detection_loss_backward(scenario):
    """jax.grad of our loss == the reference's hand-written Backward_cpu
    (scaled by the prototxt loss_weight, as Caffe's top diff carries it)."""
    p = MANIFEST[scenario]
    spec = _det_spec(p)
    head = jnp.asarray(nchw_to_nhwc(L(f"{scenario}.bottom0")))
    labels = jnp.asarray(nchw_to_nhwc(L(f"{scenario}.label")))
    want = L(f"{scenario}.grad")

    def objective(x):
        return p["loss_weight"] * losses.detection_loss(x, labels, spec)[0]

    got = np.transpose(np.asarray(jax.grad(objective)(head)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("scenario,top_k", [("detection_accuracy_top1", 1),
                                            ("detection_accuracy_top2", 2)])
def test_detection_accuracy(scenario, top_k):
    p = MANIFEST[scenario]
    spec = _det_spec({**p, "lambda": 1.0, "bg_multiple": 2,
                      "sample_mode": "bootstrap", "objectness": False,
                      "iou_weighted": False, "pos_neg_weighted": False,
                      "bb_smooth": True})
    head = jnp.asarray(nchw_to_nhwc(L(f"{scenario}.bottom0")))
    labels = jnp.asarray(nchw_to_nhwc(L(f"{scenario}.label")))
    want_acc = L(f"{scenario}.acc").ravel()
    want_iou = L(f"{scenario}.iou").ravel()
    got = losses.detection_accuracy(head, labels, spec, top_k=top_k)
    np.testing.assert_allclose(float(got["accuracy"]), want_acc[0], rtol=1e-5)
    np.testing.assert_allclose(float(got["fore_accuracy"]), want_acc[1], rtol=1e-5)
    np.testing.assert_allclose(float(got["boxiou"]), want_iou[0], rtol=1e-4)


# --------------------------------------------------------------------- Softmax

def test_softmax():
    x = nchw_to_nhwc(L("softmax.in"))
    want = nchw_to_nhwc(L("softmax.out"))
    got = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ------------------------------------------------- ProposalTarget (keep-all)

@pytest.mark.parametrize("scenario,cls_aware", [
    ("proposal_target_keepall_clsaware", True),
    ("proposal_target_keepall_agnostic", False),
])
def test_proposal_target_keep_all(scenario, cls_aware):
    """batch_size == -1 (proposal_target_layer.cpp:166-180, the cascade
    later-stage mode) is content-deterministic: every fg and in-range bg
    candidate survives, in input order, with no RNG consumed. Compare our
    fixed-capacity masked keep-all against the reference's variable-length
    output order-insensitively (our candidate order interleaves where the
    reference groups fg-then-bg)."""
    from mscnn_tpu.ops import proposal_target as PT

    p = MANIFEST[scenario]
    rois = L(f"{scenario}.rois").reshape(-1, 5)
    gts = L(f"{scenario}.gts").reshape(-1, 7)
    spec = PT.ProposalTargetSpec(
        cls_num=p["cls_num"], batch_size=-1, fg_thr=p["fg_thr"],
        bg_thr_hg=p["bg_thr_hg"], bg_thr_lw=p["bg_thr_lw"],
        num_img_per_batch=p["num_img"], img_width=p["img_width"],
        img_height=p["img_height"], cls_aware=cls_aware,
        bbox_mean=MEANS, bbox_std=STDS, keep_all=True)
    out = PT.proposal_target_keep_all(
        jnp.asarray(rois[:, 0].astype(np.int32)), jnp.asarray(rois[:, 1:5]),
        jnp.ones(rois.shape[0], bool), jnp.asarray(gts),
        jnp.ones(gts.shape[0], bool), spec)
    keep = np.asarray(out["valid"])

    def rows(kind):
        if kind == "ours":
            r = np.concatenate([
                np.asarray(out["batch_idx"], np.float32)[keep, None],
                np.asarray(out["rois"])[keep],
                np.asarray(out["labels"], np.float32)[keep, None],
                np.asarray(out["bbox_targets"])[keep],
                np.asarray(out["inside_w"])[keep],
                np.asarray(out["outside_w"])[keep],
                np.asarray(out["match_gt"])[keep],
            ], -1)
        else:
            r = np.concatenate([
                L(f"{scenario}.out_rois").reshape(-1, 5),
                L(f"{scenario}.out_labels").reshape(-1, 1),
                L(f"{scenario}.out_targets").reshape(
                    -1, 4 * p["cls_num"] if cls_aware else 8),
                L(f"{scenario}.out_inside_w").reshape(
                    -1, 4 * p["cls_num"] if cls_aware else 8),
                L(f"{scenario}.out_outside_w").reshape(
                    -1, 4 * p["cls_num"] if cls_aware else 8),
                L(f"{scenario}.out_match_gt").reshape(-1, 6),
            ], -1)
        # order-insensitive: sort rows lexicographically
        return r[np.lexsort(r.T[::-1])]

    ours, ref = rows("ours"), rows("ref")
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


# ------------------------------------------------------------ BboxAccuracy

@pytest.mark.parametrize("scenario,cls_aware", [
    ("bbox_accuracy_clsaware", True),
    ("bbox_accuracy_agnostic", False),
    ("bbox_accuracy_nonorm", True),
    ("bbox_accuracy_empty", True),
])
def test_bbox_accuracy(scenario, cls_aware):
    """bbox_accuracy_layer.cpp:37-129 — incl. the gt_flags rule (:73-77):
    rows whose match overlap exceeds 0.975 (the gt rows ProposalTarget
    appends) leave both the numerator and the fg_count denominator, and
    the fixtures carry one row at exactly 0.98 to pin the threshold. The
    reference always reads prediction slot label*4 (:86); in its agnostic
    zoo configs labels are binary so that IS the class-agnostic slot,
    which is what our cls_aware=False path selects."""
    p = MANIFEST[scenario]
    preds = L(f"{scenario}.preds").reshape(p["num"], -1)
    rois = L(f"{scenario}.rois").reshape(p["num"], 5)[:, 1:5]
    gts = L(f"{scenario}.gts").reshape(p["num"], 6)
    mean, std = (MEANS, STDS) if p["do_norm"] else (None, None)
    post, pre = losses.bbox_accuracy(
        jnp.asarray(preds), jnp.asarray(rois), jnp.asarray(gts),
        bbox_mean=mean, bbox_std=std, cls_aware=cls_aware)
    np.testing.assert_allclose(
        float(post), float(L(f"{scenario}.post").ravel()[0]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(pre), float(L(f"{scenario}.pre").ravel()[0]),
        rtol=1e-5, atol=1e-5)

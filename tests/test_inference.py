"""Deploy post-processing: per-class decode/rescale/clip/NMS semantics
(run_mscnn_detection.m parity) and the KITTI writers."""

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu import inference as I
from mscnn_tpu.evaluation import kitti_eval as KE
from mscnn_tpu.models import zoo


def synth_outputs(cfg, rois, cls_logits, bbox_pred=None, scores=None):
    r = rois.shape[0]
    if bbox_pred is None:
        bbox_pred = np.zeros((r, 4 * cfg.num_classes), np.float32)
    return {
        "rois": jnp.asarray(rois, jnp.float32),
        "cls_pred": jnp.asarray(cls_logits, jnp.float32),
        "bbox_pred": jnp.asarray(bbox_pred, jnp.float32),
        "roi_scores": jnp.asarray(
            scores if scores is not None else np.ones(r), jnp.float32),
        "roi_valid": jnp.ones(r, bool),
    }


def test_postprocess_identity_decode_and_rescale():
    cfg = zoo.tiny_test_config(num_classes=3)
    spec = I.DetectSpec(max_per_class=8)
    # one roi; class-1 logit dominant; zero deltas => decoded box == roi
    rois = np.array([[20.0, 10.0, 60.0, 40.0]])
    logits = np.array([[0.0, 5.0, 0.0]])
    ratios = jnp.asarray([2.0, 2.0])   # net input = 2x original
    orig_wh = jnp.asarray([200.0, 100.0])
    boxes, scores, valid = I.postprocess(
        synth_outputs(cfg, rois, logits), ratios, orig_wh, cfg, spec)
    # both classes emit the roi (bbNms keeps everything at thr=-inf); the
    # class-1 softmax dominates
    assert bool(valid[0, 0])
    assert float(scores[0, 0]) > 0.9 > float(scores[1, 0])
    # roi (20,10)-(60,40) at ratio 2 -> (10,5) size (20,15) in original coords
    np.testing.assert_allclose(np.asarray(boxes[0, 0]), [10, 5, 20, 15],
                               atol=1e-4)
    prob = np.exp(5.0) / (2 + np.exp(5.0))
    assert float(scores[0, 0]) == np.float32(prob)


def test_postprocess_clips_to_original_image():
    cfg = zoo.tiny_test_config(num_classes=2)
    spec = I.DetectSpec(max_per_class=4)
    rois = np.array([[80.0, 50.0, 140.0, 90.0]])  # runs past the image
    logits = np.array([[0.0, 4.0]])
    boxes, _, valid = I.postprocess(
        synth_outputs(cfg, rois, logits), jnp.asarray([1.0, 1.0]),
        jnp.asarray([96.0, 64.0]), cfg, spec)
    x, y, w, h = np.asarray(boxes[0, 0])
    assert bool(valid[0, 0])
    assert x + w <= 96.0 + 1e-4 and y + h <= 64.0 + 1e-4


def test_postprocess_per_class_nms_suppresses():
    cfg = zoo.tiny_test_config(num_classes=2)
    spec = I.DetectSpec(max_per_class=4, nms_overlap=0.5)
    rois = np.array([[10.0, 10.0, 50.0, 50.0],
                     [12.0, 12.0, 52.0, 52.0],     # heavy overlap
                     [70.0, 10.0, 90.0, 30.0]])    # separate
    logits = np.array([[0.0, 3.0], [0.0, 2.0], [0.0, 1.0]])
    _, scores, valid = I.postprocess(
        synth_outputs(cfg, rois, logits), jnp.asarray([1.0, 1.0]),
        jnp.asarray([100.0, 100.0]), cfg, spec)
    assert int(valid[0].sum()) == 2  # overlapping pair collapsed


def test_postprocess_filters_bad_proposals():
    cfg = zoo.tiny_test_config(num_classes=2)
    spec = I.DetectSpec(max_per_class=4, proposal_thr=-10.0)
    rois = np.array([[10.0, 10.0, 10.0, 40.0],    # zero width
                     [10.0, 10.0, 40.0, 40.0]])
    logits = np.array([[0.0, 3.0], [0.0, 3.0]])
    scores = np.array([1.0, -20.0])               # second below proposal_thr
    _, _, valid = I.postprocess(
        synth_outputs(cfg, rois, logits, scores=scores),
        jnp.asarray([1.0, 1.0]), jnp.asarray([100.0, 100.0]), cfg, spec)
    assert int(valid.sum()) == 0


def test_detect_end_to_end_shapes(rng):
    from mscnn_tpu.models import mscnn as M
    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    img = rng.randint(0, 255, (80, 120, 3)).astype(np.uint8)
    det = I.detect(params, img, cfg, I.DetectSpec(max_per_class=16))
    c = cfg.num_classes - 1
    assert det["boxes"].shape == (c, 16, 4)
    assert det["scores"].shape == (c, 16)
    assert det["valid"].shape == (c, 16)
    # valid boxes live inside the ORIGINAL image
    for k in range(c):
        for b, v in zip(det["boxes"][k], det["valid"][k]):
            if v:
                assert b[0] >= 0 and b[1] >= 0
                assert b[0] + b[2] <= 120 + 1e-3
                assert b[1] + b[3] <= 80 + 1e-3


def test_kitti_writers_roundtrip(tmp_path):
    det = {
        "boxes": np.array([[[10.0, 20.0, 30.0, 40.0]]]),
        "scores": np.array([[0.9]]),
        "valid": np.array([[True]]),
    }
    objects = I.detections_to_kitti(det, ("bg", "Car"))
    assert objects == [{"type": "Car", "x1": 10.0, "y1": 20.0,
                        "x2": 40.0, "y2": 60.0, "score": 0.9}]
    I.write_kitti_labels(objects, str(tmp_path), 7)
    parsed = KE.parse_label_file(str(tmp_path / "000007.txt"))
    assert len(parsed) == 1
    o = parsed[0]
    assert o.type == "car"
    assert (o.x1, o.y1, o.x2, o.y2) == (10.0, 20.0, 40.0, 60.0)
    assert o.score == 900.0  # score_scale 1000

    I.write_detections_txt(str(tmp_path / "d.txt"),
                           [(1, 10, 20, 30, 40, 0.9)])
    line = open(tmp_path / "d.txt").read().strip()
    assert line == "1,10,20,30,40,0.9"


def test_detect_batch_matches_single(rng):
    """detect_batch == per-image detect, with and without a device mesh
    (the data-parallel serving path)."""
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.parallel import data_parallel_mesh

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    spec = I.DetectSpec(max_per_class=8)
    imgs = [rng.randint(0, 255, (70 + 10 * i, 100, 3)).astype(np.uint8)
            for i in range(8)]

    singles = [I.detect(params, im, cfg, spec) for im in imgs]
    batched = I.detect_batch(params, imgs, cfg, spec)
    mesh = data_parallel_mesh(8)
    sharded = I.detect_batch(params, imgs, cfg, spec, mesh=mesh)

    assert len(batched) == len(sharded) == 8
    for s, b, m in zip(singles, batched, sharded):
        for k in ("boxes", "scores", "valid", "proposals"):
            np.testing.assert_allclose(b[k], s[k], rtol=1e-4, atol=1e-3,
                                       err_msg=f"batched {k}")
            np.testing.assert_allclose(m[k], s[k], rtol=1e-4, atol=1e-3,
                                       err_msg=f"sharded {k}")


def test_e2e_forward_matches_detect(rng):
    """The single-dispatch serving graph (uint8 in, in-graph postprocess)
    produces identical results to the eager detect path."""
    from mscnn_tpu.models import mscnn as M

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    spec = I.DetectSpec(max_per_class=8)
    e2e = I.make_e2e_forward(params, cfg, spec)
    for shape in ((80, 120, 3), (64, 96, 3)):
        img = rng.randint(0, 255, shape).astype(np.uint8)
        a = I.detect(params, img, cfg, spec)
        b = I.detect(params, img, cfg, spec, e2e_fwd=e2e)
        for k in ("boxes", "scores", "valid", "proposals",
                  "proposal_scores", "proposal_valid"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-5, atol=1e-5,
                                       err_msg=f"e2e {k} diverged")

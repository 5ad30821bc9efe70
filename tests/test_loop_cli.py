"""Training-loop mechanics (display, test-eval -1 skipping, snapshots,
signals) and the full CLI surface driven end-to-end on a tiny prototxt-
defined model with a real on-disk dataset."""

import os
import signal

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.io import checkpoint as CKPT
from mscnn_tpu.train import loop as LP


# ---------------------------------------------------------------------------
# loop mechanics with a stub step function
# ---------------------------------------------------------------------------

def fake_state(it=0):
    return {"params": {"w": jnp.zeros(2)},
            "solver": {"it": jnp.asarray(it, jnp.int32),
                       "h1": {"w": jnp.zeros(2)}}}


def fake_step(state, batch, key):
    it = state["solver"]["it"]
    new = {"params": state["params"],
           "solver": {"it": it + 1, "h1": state["solver"]["h1"]}}
    return new, {"loss": 10.0 / (1.0 + it), "lr": jnp.asarray(0.1)}


def test_solve_runs_and_snapshots(tmp_path):
    logs = []
    spec = LP.LoopSpec(max_iter=5, display=1, snapshot=2,
                       snapshot_prefix=str(tmp_path / "snap"))
    state = LP.solve(fake_step, fake_state(), lambda: {}, spec,
                     log=logs.append)
    assert int(state["solver"]["it"]) == 5
    # periodic snapshots at 2, 4 and the final one at 5
    for it in (2, 4, 5):
        assert os.path.isdir(str(tmp_path / f"snap_iter_{it}"))
    assert any("Iteration 0" in l for l in logs)
    assert any("loss" in l for l in logs)


def test_solve_resumes_from_state_iter(tmp_path):
    spec = LP.LoopSpec(max_iter=4, display=0,
                       snapshot_prefix=str(tmp_path / "s"))
    calls = []

    def step(state, batch, key):
        calls.append(int(state["solver"]["it"]))
        return fake_step(state, batch, key)

    LP.solve(step, fake_state(it=2), lambda: {}, spec)
    assert calls == [2, 3]


def test_solve_sigint_stops(tmp_path):
    spec = LP.LoopSpec(max_iter=100, display=0, sigint_effect="stop",
                       snapshot_prefix=str(tmp_path / "sig"))
    hits = []

    def step(state, batch, key):
        hits.append(1)
        if len(hits) == 3:
            os.kill(os.getpid(), signal.SIGINT)
        return fake_step(state, batch, key)

    state = LP.solve(step, fake_state(), lambda: {}, spec)
    assert len(hits) == 3
    assert int(state["solver"]["it"]) == 3


def test_test_eval_skips_negative_metrics():
    outs = iter([
        {"accuracy": jnp.asarray(-1.0), "loss": jnp.asarray(2.0)},
        {"accuracy": jnp.asarray(0.5), "loss": jnp.asarray(4.0)},
    ])

    def eval_step(params, batch, key):
        return next(outs)

    out = LP.test_eval(eval_step, {}, [{}, {}], jax.random.key(0))
    assert out["accuracy"] == pytest.approx(0.5)   # -1 excluded from mean
    assert out["loss"] == pytest.approx(3.0)       # losses always averaged


# ---------------------------------------------------------------------------
# CLI end-to-end on a tiny prototxt model + on-disk dataset
# ---------------------------------------------------------------------------

TINY_TRAINVAL = """
name: "tiny"
layer {{
  name: "data" type: "ImageGtData"
  include {{ phase: TRAIN }}
  transform_param {{ mirror: true mean_value: 104 mean_value: 117 mean_value: 123 }}
  image_gt_data_param {{
    source: "{source}"
    batch_size: 2
    crop_width: 96 crop_height: 64
    downsample_rate: 8 downsample_rate: 16
    field_w: 24 field_w: 48
    field_h: 24 field_h: 48
    fg_threshold: 0.5
    shuffle: true
  }}
}}
layer {{ name: "LFCN_1_5x5" type: "Convolution" bottom: "conv4_3"
  convolution_param {{ kernel_size: 5 num_output: 7 }} }}
layer {{ name: "LFCN_2_5x5" type: "Convolution" bottom: "conv5_3"
  convolution_param {{ kernel_size: 5 num_output: 7 }} }}
layer {{ name: "det_loss_1" type: "DetectionLoss" bottom: "LFCN_1_5x5"
  loss_weight: 0.9
  detection_loss_param {{
    cls_num: 3 bg_threshold: 0.2 bg_multiple: 2
    sample_mode: "bootstrap" pos_neg_weighted: true
  }} }}
layer {{ name: "proposals" type: "BoxOutput"
  bottom: "LFCN_1_5x5" bottom: "LFCN_2_5x5"
  box_output_param {{
    fg_thr: -8 iou_thr: 0.65 nms_type: "IOU" max_nms_num: 64
    field_w: 24 field_w: 48 field_h: 24 field_h: 48
    downsample_rate: 8 downsample_rate: 16
  }} }}
layer {{ name: "proposal_info" type: "ProposalTarget"
  include {{ phase: TRAIN }}
  proposal_target_param {{
    cls_num: 3 batch_size: 16 fg_fraction: 0.25
    fg_thr: 0.5 bg_thr_hg: 0.49 bg_thr_lw: 0.1
    img_width: 96 img_height: 64
  }}
  bbox_reg_param {{
    bbox_mean: 0 bbox_mean: 0 bbox_mean: 0 bbox_mean: 0
    bbox_std: 0.1 bbox_std: 0.1 bbox_std: 0.2 bbox_std: 0.2
  }} }}
"""

TINY_SOLVER = """
net: "{net}"
base_lr: 0.00005
lr_policy: "step"
gamma: 0.1
stepsize: 100
display: 1
max_iter: 2
momentum: 0.9
weight_decay: 0.0005
snapshot_prefix: "{prefix}"
random_seed: 7
"""


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from mscnn_tpu.data import window_file as W
    root = tmp_path_factory.mktemp("cli_data")
    rng = np.random.RandomState(0)
    images = []
    for i in range(4):
        img = rng.randint(0, 120, (64, 96, 3)).astype(np.uint8)
        img[20:44, 30:58] = 240
        path = str(root / f"im_{i}.png")
        assert cv2.imwrite(path, img)
        gts = np.array([[1, 0, 30, 20, 58, 44]], np.float32)
        images.append(W.WindowImage(path, 3, 64, 96, gts,
                                    np.zeros((0, 4), np.float32)))
    wf = str(root / "windows.txt")
    W.write_window_file(wf, images)
    net = str(root / "trainval.prototxt")
    with open(net, "w") as f:
        f.write(TINY_TRAINVAL.format(source=wf))
    return root, net, wf


def test_cli_train_end_to_end(tiny_dataset, tmp_path):
    from mscnn_tpu import cli
    root, net, wf = tiny_dataset
    prefix = str(tmp_path / "cli_snap")
    solver = str(tmp_path / "solver.prototxt")
    with open(solver, "w") as f:
        f.write(TINY_SOLVER.format(net=net.replace("\\", "/"), prefix=prefix))

    rc = cli.main(["train", "--solver", solver,
                   "--snapshot-prefix", prefix])
    assert rc == 0
    final = CKPT.latest_snapshot(prefix)
    assert final is not None and final.endswith("_iter_2")


def test_cli_device_query(capsys):
    from mscnn_tpu import cli
    assert cli.main(["device_query"]) == 0
    out = capsys.readouterr().out
    assert "Device 0" in out


def test_cli_test_subcommand(tiny_dataset, tmp_path, capsys):
    """`mscnn test`: forward-only metric averaging over N batches."""
    import json
    from mscnn_tpu import cli
    root, net, wf = tiny_dataset
    solver = str(tmp_path / "solver_t.prototxt")
    with open(solver, "w") as f:
        f.write(TINY_SOLVER.format(net=net.replace("\\", "/"),
                                   prefix=str(tmp_path / "tsnap")))
    rc = cli.main(["test", "--solver", solver, "--iterations", "2",
                   "--phase", "TRAIN"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "loss" in out and np.isfinite(out["loss"])
    assert "cls_accuracy" in out


def test_cli_export_caffemodel(tiny_dataset, tmp_path, capsys):
    """`mscnn export`: train 2 iters, export the orbax snapshot to a
    .caffemodel, and verify the wire file parses with the net's layers."""
    from mscnn_tpu import cli
    from mscnn_tpu.io import caffemodel as CM
    root, net, wf = tiny_dataset
    prefix = str(tmp_path / "exp_snap")
    solver = str(tmp_path / "solver.prototxt")
    with open(solver, "w") as f:
        f.write(TINY_SOLVER.format(net=net.replace("\\", "/"), prefix=prefix))
    assert cli.main(["train", "--solver", solver,
                     "--snapshot-prefix", prefix]) == 0
    snap = CKPT.latest_snapshot(prefix)
    out = str(tmp_path / "exported.caffemodel")
    rc = cli.main(["export", "--model", net, "--weights", snap, "-o", out])
    assert rc == 0
    blobs = CM.parse_caffemodel(out)
    assert "LFCN_1_5x5" in blobs and "conv1_1" in blobs


def test_cli_detect_end_to_end(tmp_path, capsys):
    """`mscnn detect`: image dir -> KITTI label files, with the prefetching
    loader (decode threads overlap device compute)."""
    import cv2
    from mscnn_tpu import cli

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "out"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
    rc = cli.main(["detect", "--image-dir", str(img_dir),
                   "--output-dir", str(out_dir), "--zoo", "tiny-test",
                   "--class-names", "bg,car,van", "--loader-threads", "2"])
    assert rc == 0
    assert "Done: 3 images" in capsys.readouterr().out
    for i in range(3):
        path = out_dir / f"{i:06d}.txt"
        assert path.exists()
        for line in path.read_text().splitlines():
            f = line.split()
            assert len(f) == 16 and f[0] in ("car", "van")
            float(f[15])  # trailing score column parses


def test_cli_detect_sharded(tmp_path, capsys):
    """`mscnn detect --devices 8`: sharded batched serving path, padded
    tail batch; output identical in form to the per-image path."""
    import cv2
    from mscnn_tpu import cli

    img_dir = tmp_path / "imgs"
    out1 = tmp_path / "out1"
    out8 = tmp_path / "out8"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    for i in range(3):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
    base = ["--image-dir", str(img_dir), "--zoo", "tiny-test",
            "--class-names", "bg,car,van"]
    assert cli.main(["detect", "--output-dir", str(out1)] + base) == 0
    assert cli.main(["detect", "--output-dir", str(out8),
                     "--devices", "8"] + base) == 0
    capsys.readouterr()
    for i in range(3):
        a = (out1 / f"{i:06d}.txt").read_text()
        b = (out8 / f"{i:06d}.txt").read_text()
        assert a == b, f"sharded output diverged for image {i}"


def test_apply_conv1_resolution():
    """--conv1 resolution: auto -> plain off-TPU; explicit pallas at f32
    is rejected instead of silently degrading precision."""
    import argparse
    from mscnn_tpu import cli
    from mscnn_tpu.models import zoo

    cfg = zoo.tiny_test_config()
    auto = cli._apply_conv1(cfg, argparse.Namespace(conv1="auto"))
    assert not auto.pallas_conv1 and not auto.s2d_conv1  # CPU backend
    with pytest.raises(SystemExit):
        cli._apply_conv1(cfg, argparse.Namespace(conv1="pallas"))
    import dataclasses
    bf = dataclasses.replace(cfg, compute_dtype="bfloat16")
    on = cli._apply_conv1(bf, argparse.Namespace(conv1="pallas"))
    assert on.pallas_conv1
    s2d = cli._apply_conv1(cfg, argparse.Namespace(conv1="s2d"))
    assert s2d.s2d_conv1 and not s2d.pallas_conv1


def test_cli_time_layers(tmp_path, capsys):
    """`mscnn time --layers`: per-layer fwd/bwd table (caffe time parity)
    for a generic prototxt net."""
    net = tmp_path / "lenet.prototxt"
    net.write_text("""
name: "tiny_lenet"
layer { name: "data" type: "Input" top: "data"
        input_param { shape { dim: 2 dim: 1 dim: 12 dim: 12 } } }
layer { name: "label" type: "Input" top: "label"
        input_param { shape { dim: 2 } } }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
        convolution_param { num_output: 4 kernel_size: 3 pad: 1
                            weight_filler { type: "xavier" } } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
        pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "ip1" type: "InnerProduct" bottom: "pool1" top: "ip1"
        inner_product_param { num_output: 3
                              weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip1" bottom: "label"
        top: "loss" }
""")
    from mscnn_tpu import cli
    rc = cli.main(["time", "--layers", "--model", str(net),
                   "--iterations", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    for token in ("fwd ms", "bwd ms", "conv1", "pool1", "ip1", "loss",
                  "TOTAL"):
        assert token in out, out


def test_cli_parity_end_to_end(tmp_path, capsys):
    """`mscnn parity`: fake .caffemodel weights + 3 KITTI-layout images ->
    detect -> AP -> verdict, the one-shot harness to run when real
    weights/data land (run_mscnn_detection.m + evaluate_object flow)."""
    import cv2
    import jax
    from mscnn_tpu import cli
    from mscnn_tpu.io import caffemodel as CM
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    root = tmp_path / "kitti"
    img_dir = root / "training" / "image_2"
    gt_dir = root / "training" / "label_2"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
        gt_dir.joinpath(f"{i:06d}.txt").write_text(
            "Car 0.00 0 0.0 30.0 20.0 58.0 44.0 1.5 1.6 3.9 0.0 1.7 8.4 "
            "0.0\n")

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    weights = str(tmp_path / "fake.caffemodel")
    CM.save_caffemodel(params, weights)

    out_dir = tmp_path / "dets"
    rc = cli.main(["parity", "--weights", weights,
                   "--kitti-root", str(root), "--zoo", "tiny-test",
                   "--class-names", "bg,car,van",
                   "--output-dir", str(out_dir), "--expected-ap", "0"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert '"verdict": "PASS"' in out
    assert "moderate AP" in out
    assert sorted(p.name for p in out_dir.glob("*.txt")) == \
        ["000000.txt", "000001.txt", "000002.txt"]


def test_cli_detect_int8(tmp_path, capsys):
    """`mscnn detect --int8`: calibrated int8 trunk produces the same
    label-file surface as the float path."""
    import cv2
    from mscnn_tpu import cli

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "out"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    for i in range(2):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        img[20:44, 30:58] = 240
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
    rc = cli.main(["detect", "--image-dir", str(img_dir),
                   "--output-dir", str(out_dir), "--zoo", "tiny-test",
                   "--class-names", "bg,car,van", "--int8",
                   "--calib-images", "2"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "int8 trunk: calibrated" in out
    for i in range(2):
        path = out_dir / f"{i:06d}.txt"
        assert path.exists()
        for line in path.read_text().splitlines():
            f = line.split()
            assert len(f) == 16 and f[0] in ("car", "van")


def test_snapshot_format_hdf5(tmp_path):
    """solver `snapshot_format: HDF5` -> .caffemodel.h5/.solverstate.h5
    pair in the reference's Net::ToHDF5 layout."""
    import jax
    import jax.numpy as jnp
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    from mscnn_tpu.train import loop as LP
    from mscnn_tpu.train import solver as S

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    sspec = S.SolverSpec(momentum=0.9)
    state = {"params": params, "solver": S.init_state(params, sspec)}
    lspec = LP.LoopSpec(max_iter=5, snapshot_format="hdf5",
                        snapshot_prefix=str(tmp_path / "snap"))
    path = LP._snapshot(lspec, state, 5)
    assert path.endswith("_iter_5.caffemodel.h5")
    import os
    assert os.path.exists(path)
    assert os.path.exists(str(tmp_path / "snap_iter_5.solverstate.h5"))


def test_snapshot_after_train_false(tmp_path):
    """solver.cpp:294-299: snapshot_after_train := false suppresses the
    final exit snapshot (periodic ones still fire)."""
    spec = LP.LoopSpec(max_iter=5, display=0, snapshot=2,
                       snapshot_prefix=str(tmp_path / "s"),
                       snapshot_after_train=False)
    LP.solve(fake_step, fake_state(), lambda: {}, spec)
    assert os.path.isdir(str(tmp_path / "s_iter_2"))
    assert os.path.isdir(str(tmp_path / "s_iter_4"))
    assert not os.path.isdir(str(tmp_path / "s_iter_5"))


def test_loop_spec_reads_snapshot_after_train():
    fields = {"max_iter": 3, "snapshot_after_train": "false"}
    assert LP.loop_spec_from_solver_fields(fields).snapshot_after_train \
        is False
    assert LP.loop_spec_from_solver_fields(
        {"max_iter": 3}).snapshot_after_train is True


def test_cli_train2_two_step_schedule(tiny_dataset, tmp_path):
    """The reference's canonical workflow (train_mscnn.sh + CopyLayers,
    tools/caffe.cpp:151-161): stage 1 trains the proposal sub-net, stage 2
    warm-starts from stage 1's final snapshot. Asserts the warm-started
    stage-2 params actually came from stage 1 (shared trunk/head layers
    bit-equal to the stage-1 snapshot, and NOT equal to a fresh
    random init with the same seed)."""
    from mscnn_tpu import cli
    from mscnn_tpu.io import checkpoint as CKPT

    root, net2, wf = tiny_dataset
    # stage-1 prototxt = stage-2 minus the BoxOutput/ProposalTarget tail
    # (the reference's trainval_1st has only ImageGtData + trunk +
    # DetectionLoss heads)
    full = TINY_TRAINVAL.format(source=wf)
    cut = full.index('layer {\n  name: "proposals"') if \
        'layer {\n  name: "proposals"' in full else \
        full.index('layer { name: "proposals"')
    net1 = str(tmp_path / "trainval_1st.prototxt")
    with open(net1, "w") as f:
        f.write(full[:cut])

    prefix1 = str(tmp_path / "s1")
    prefix2 = str(tmp_path / "s2")
    solver1 = str(tmp_path / "solver_1st.prototxt")
    solver2 = str(tmp_path / "solver_2nd.prototxt")
    with open(solver1, "w") as f:
        f.write(TINY_SOLVER.format(net=net1.replace("\\", "/"),
                                   prefix=prefix1))
    with open(solver2, "w") as f:
        # max_iter 0: stage 2 snapshots its warm-started params untouched,
        # so warm-start provenance is a bit-exact assertion
        f.write(TINY_SOLVER.format(net=net2.replace("\\", "/"),
                                   prefix=prefix2).replace(
                                       "max_iter: 2", "max_iter: 0"))

    rc = cli.main(["train2", "--solver1", solver1, "--solver2", solver2])
    assert rc == 0

    s1 = CKPT.latest_snapshot(prefix1)
    s2 = CKPT.latest_snapshot(prefix2)
    assert s1 is not None and s1.endswith("_iter_2")
    assert s2 is not None and s2.endswith("_iter_0")

    import orbax.checkpoint as ocp
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        p1 = ckptr.restore(s1)["params"]
        p2 = ckptr.restore(s2)["params"]

    # fresh random init of the stage-2 model with the solver's seed
    from mscnn_tpu.config import zoo_import as Z
    from mscnn_tpu.models import mscnn as M
    cfg2, *_ = Z.model_from_prototxt(net2)
    fresh = jax.device_get(M.init_params(jax.random.key(7), cfg2))

    shared = sorted(set(p1) & set(p2))
    assert shared, "stage-1 and stage-2 share no layers"
    copied_differs_from_fresh = False
    for name in shared:
        a, b = jax.tree.leaves(p1[name]), jax.tree.leaves(p2[name])
        for la, lb in zip(a, b):
            np.testing.assert_array_equal(la, lb, err_msg=name)
        if name in fresh:
            fl = jax.tree.leaves(fresh[name])
            if any(not np.array_equal(x, y) for x, y in zip(a, fl)):
                copied_differs_from_fresh = True
    assert copied_differs_from_fresh, \
        "warm-started params indistinguishable from random init"
    # stage-2-only layers exist and kept their fresh init
    only2 = sorted(set(p2) - set(p1))
    assert only2, "stage 2 adds no layers over stage 1"


def test_cli_detect_caltech_and_widerface_formats(tmp_path, capsys):
    """`mscnn detect --format caltech|widerface` writes the reference's
    whole-set layouts (run_mscnn_detection.m caltech:159-167 /
    widerface:173-199) and `mscnn eval --dataset ...` consumes them."""
    import cv2
    from mscnn_tpu import cli
    from mscnn_tpu.evaluation import caltech_eval as CE
    from mscnn_tpu.evaluation import widerface_eval as WE

    img_dir = tmp_path / "imgs"
    (img_dir / "0--Parade").mkdir(parents=True)
    rng = np.random.RandomState(3)
    for i in range(2):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
        cv2.imwrite(str(img_dir / "0--Parade" / f"f{i}.png"), img)

    cal_out = tmp_path / "cal"
    rc = cli.main(["detect", "--image-dir", str(img_dir),
                   "--output-dir", str(cal_out), "--zoo", "tiny-test",
                   "--class-names", "bg,car,van", "--format", "caltech",
                   "--comp-id", "tinycomp"])
    assert rc == 0
    capsys.readouterr()
    per_cls = sorted(p.name for p in cal_out.iterdir())
    assert per_cls == ["tinycomp_car.txt", "tinycomp_van.txt"]
    # the flat files parse back with one slot per image
    back = CE.read_detections(str(cal_out / "tinycomp_car.txt"), 2)
    assert len(back) == 2 and all(b.shape[1] == 5 for b in back)

    wf_out = tmp_path / "wf"
    rc = cli.main(["detect", "--image-dir", str(img_dir),
                   "--output-dir", str(wf_out), "--zoo", "tiny-test",
                   "--class-names", "bg,car,van", "--format", "widerface",
                   "--comp-id", "tinycomp"])
    assert rc == 0
    capsys.readouterr()
    tree = WE.read_detections(str(wf_out), "tinycomp")
    # nested event dir + the flat images under the synthetic "event0"
    assert set(tree) == {"0--Parade", "event0"}
    assert set(tree["0--Parade"]) == {"f0", "f1"}
    assert set(tree["event0"]) == {"000000", "000001"}
    for imgs in tree.values():
        for d in imgs.values():
            assert d.ndim == 2 and d.shape[1] == 5

"""Generic (non-MSCNN) prototxt training — the `caffe train`-accepts-any-
NetParameter capability (reference tools/caffe.cpp:103-233).  A LeNet-
style classification net defined purely in prototxt trains end-to-end
through train/generic.py and the `mscnn train`/`test` CLI."""

import os

import jax
import numpy as np
import pytest

from mscnn_tpu.train import generic as G
from mscnn_tpu.train import solver as S

LENET_ISH = """
name: "tiny_lenet"
layer {{ name: "data" type: "DummyData" top: "data" top: "label"
  dummy_data_param {{
    shape {{ dim: 8 dim: 1 dim: 12 dim: 12 }}
    shape {{ dim: 8 }}
    data_filler {{ type: "gaussian" std: 1.0 }}
    data_filler {{ type: "constant" value: 1 }}
  }} }}
layer {{ name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  param {{ lr_mult: {conv_lr} }} param {{ lr_mult: {conv_lr} }}
  convolution_param {{ num_output: 4 kernel_size: 3
    weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param {{ pool: MAX kernel_size: 2 stride: 2 }} }}
layer {{ name: "relu1" type: "ReLU" bottom: "pool1" top: "pool1" }}
layer {{ name: "ip1" type: "InnerProduct" bottom: "pool1" top: "ip1"
  inner_product_param {{ num_output: 3
    weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip1" bottom: "label"
  top: "loss" }}
layer {{ name: "acc" type: "Accuracy" bottom: "ip1" bottom: "label"
  top: "acc" }}
"""


def _write_net(tmp_path, conv_lr=1.0):
    p = tmp_path / "net.prototxt"
    p.write_text(LENET_ISH.format(conv_lr=conv_lr))
    return str(p)


def test_generic_dummydata_trains(tmp_path):
    net_path = _write_net(tmp_path)
    sspec = S.SolverSpec(base_lr=0.05, lr_policy="fixed", momentum=0.9)
    state, step, batch_source, net = G.setup(net_path, sspec)

    losses, accs = [], []
    key = jax.random.key(0)
    for it in range(25):
        state, metrics = step(state, batch_source(),
                              jax.random.fold_in(key, it))
        m = jax.device_get(metrics)
        losses.append(float(m["loss"]))
        accs.append(float(m["acc"]))
    # constant-1 labels are learnable: loss falls, accuracy rises to 1
    assert losses[-1] < losses[0] * 0.5, losses[::6]
    assert accs[-1] == 1.0
    assert np.isfinite(losses).all()


def test_generic_lr_mult_zero_freezes(tmp_path):
    net_path = _write_net(tmp_path, conv_lr=0.0)
    sspec = S.SolverSpec(base_lr=0.05, lr_policy="fixed")
    state, step, batch_source, net = G.setup(net_path, sspec)
    w0 = np.asarray(jax.device_get(state["params"]["conv1"]["w"]))
    key = jax.random.key(0)
    for it in range(5):
        state, _ = step(state, batch_source(), jax.random.fold_in(key, it))
    w5 = np.asarray(jax.device_get(state["params"]["conv1"]["w"]))
    ip0 = np.asarray(jax.device_get(state["params"]["ip1"]["w"]))
    np.testing.assert_array_equal(w0, w5)      # frozen (lr_mult 0 pruned)
    assert np.abs(ip0).sum() > 0               # while ip1 still trains


def test_generic_hdf5_via_cli(tmp_path, capsys):
    """`mscnn train` + `mscnn test` on a pure-prototxt HDF5 net — the
    caffe train/test flow for classic nets."""
    from mscnn_tpu import cli
    from mscnn_tpu.data import sources as SRC

    rng = np.random.RandomState(0)
    n = 32
    data = rng.randn(n, 1, 8, 8).astype(np.float32)   # NCHW on disk
    label = (data.mean(axis=(1, 2, 3)) > 0).astype(np.float32)
    h5 = str(tmp_path / "d.h5")
    SRC.write_hdf5(h5, {"data": data, "label": label})
    listing = tmp_path / "files.txt"
    listing.write_text(h5 + "\n")

    net = tmp_path / "net.prototxt"
    net.write_text(f"""
name: "h5net"
layer {{ name: "data" type: "HDF5Data" top: "data" top: "label"
  hdf5_data_param {{ source: "{listing}" batch_size: 8 }} }}
layer {{ name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
  inner_product_param {{ num_output: 2
    weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
  top: "loss" }}
layer {{ name: "acc" type: "Accuracy" bottom: "ip" bottom: "label"
  top: "acc" }}
""")
    solver = tmp_path / "solver.prototxt"
    prefix = str(tmp_path / "snap")
    solver.write_text(f"""
net: "{net}"
base_lr: 0.1
lr_policy: "fixed"
momentum: 0.9
max_iter: 30
display: 10
snapshot_prefix: "{prefix}"
""")
    rc = cli.main(["train", "--solver", str(solver)])
    assert rc == 0
    assert os.path.isdir(prefix + "_iter_30")

    rc = cli.main(["test", "--solver", str(solver), "--iterations", "4",
                   "--weights", prefix + "_iter_30"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"acc"' in out and '"loss"' in out


def test_generic_dp_over_mesh(tmp_path):
    """P2PSync-style DP for generic nets: same net trains on the 8-device
    CPU mesh with pmean grads; loss decreases and states stay replicated."""
    from mscnn_tpu.parallel import data_parallel_mesh

    net_path = _write_net(tmp_path)
    sspec = S.SolverSpec(base_lr=0.05, lr_policy="fixed", momentum=0.9)
    mesh = data_parallel_mesh(8)
    state, step, batch_source, net = G.setup(net_path, sspec, mesh=mesh)

    key = jax.random.key(0)
    losses = []
    for it in range(12):
        state, metrics = step(state, batch_source(),
                              jax.random.fold_in(key, it))
        losses.append(float(jax.device_get(metrics["loss"])))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    # params stay replicated (every device shard identical)
    w = state["params"]["ip1"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_generic_cli_devices(tmp_path):
    from mscnn_tpu import cli

    net_path = _write_net(tmp_path)
    solver = tmp_path / "solver.prototxt"
    prefix = str(tmp_path / "dp_snap")
    solver.write_text(f"""
net: "{net_path}"
base_lr: 0.05
lr_policy: "fixed"
max_iter: 6
display: 0
snapshot_prefix: "{prefix}"
""")
    rc = cli.main(["train", "--solver", str(solver), "--devices", "8"])
    assert rc == 0
    assert os.path.isdir(prefix + "_iter_6")


def test_siamese_contrastive_trains(tmp_path):
    """The reference siamese flow end-to-end (examples/siamese/
    mnist_siamese_train_test.prototxt): two branches with param{name}-
    shared weights + ContrastiveLoss, trained through train/generic.py.
    All pairs are similar (sim=1), so the optimum pulls the
    shared embedding together and the loss falls monotonically."""
    net = tmp_path / "siamese.prototxt"
    net.write_text("""
name: "tiny_siamese"
layer { name: "data" type: "DummyData" top: "a" top: "b" top: "sim"
  dummy_data_param {
    shape { dim: 8 dim: 1 dim: 8 dim: 8 }
    shape { dim: 8 dim: 1 dim: 8 dim: 8 }
    shape { dim: 8 }
    data_filler { type: "gaussian" std: 1.0 }
    data_filler { type: "gaussian" std: 1.0 }
    data_filler { type: "constant" value: 1 }
  } }
layer { name: "ip1" type: "InnerProduct" bottom: "a" top: "feat"
  param { name: "ip1_w" } param { name: "ip1_b" }
  inner_product_param { num_output: 4
    weight_filler { type: "xavier" } } }
layer { name: "ip1_p" type: "InnerProduct" bottom: "b" top: "feat_p"
  param { name: "ip1_w" } param { name: "ip1_b" }
  inner_product_param { num_output: 4
    weight_filler { type: "xavier" } } }
layer { name: "loss" type: "ContrastiveLoss"
  bottom: "feat" bottom: "feat_p" bottom: "sim" top: "loss"
  contrastive_loss_param { margin: 1.0 } }
""")
    sspec = S.SolverSpec(base_lr=0.01, lr_policy="fixed")
    state, step, batch_source, built = G.setup(str(net), sspec)
    # the branch weights are one shared leaf
    assert "w" in state["params"]["ip1"]
    assert "w" not in state["params"].get("ip1_p", {})
    key = jax.random.key(0)
    losses = []
    for it in range(20):
        state, metrics = step(state, batch_source(),
                              jax.random.fold_in(key, it))
        losses.append(float(jax.device_get(metrics["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_window_data_source(tmp_path):
    """WindowData as a generic batch source: R-CNN crop-warp sampling
    (window_data_layer.cpp) feeding a classification head."""
    import cv2

    from mscnn_tpu.models.netbuilder import Net

    rng = np.random.RandomState(0)
    img_path = str(tmp_path / "im.png")
    cv2.imwrite(img_path, rng.randint(0, 255, (48, 64, 3), np.uint8))
    wf = tmp_path / "windows.txt"
    # window-file gts: (label, overlap-in-ignore-slot, x1, y1, x2, y2)
    wf.write_text(f"""# 0
{img_path}
3
48
64
3
1 1.0 4 4 30 30
2 0.8 10 8 40 40
0 0.1 34 30 60 44
0
""")
    net_text = f"""
layer {{ name: "data" type: "WindowData" top: "data" top: "label"
  window_data_param {{ source: "{wf}" batch_size: 6 fg_threshold: 0.5
    context_pad: 2 }}
  transform_param {{ crop_size: 21 mean_value: 128 }} }}
layer {{ name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
  inner_product_param {{ num_output: 3
    weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
  top: "loss" }}
"""
    net_file = tmp_path / "wnet.prototxt"
    net_file.write_text(net_text)
    sspec = S.SolverSpec(base_lr=0.01, lr_policy="fixed")
    state, step, batch_source, net = G.setup(str(net_file), sspec)
    b = jax.device_get(batch_source())
    assert b["data"].shape == (6, 21, 21, 3)
    assert set(np.asarray(b["label"]).astype(int)) <= {0, 1, 2}
    state, metrics = step(state, batch_source(), jax.random.key(0))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


def test_param_multipliers_positional_with_sharing(tmp_path):
    """ParamSpecs pair with blob POSITIONS: when a non-owner layer's
    weight blob is shared away, the second spec must still land on the
    bias (not shift onto it)."""
    net = tmp_path / "n.prototxt"
    net.write_text("""
layer { name: "a" type: "Input" top: "a"
  input_param { shape { dim: 1 dim: 3 dim: 6 dim: 6 } } }
layer { name: "ca" type: "Convolution" bottom: "a" top: "ca"
  param { name: "sh_w" lr_mult: 1 } param { lr_mult: 7 decay_mult: 0 }
  convolution_param { num_output: 2 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } } }
layer { name: "cb" type: "Convolution" bottom: "ca" top: "cb"
  param { name: "sh_w2" lr_mult: 1 } param { lr_mult: 9 decay_mult: 0 }
  convolution_param { num_output: 2 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } } }
""")
    from mscnn_tpu.models.netbuilder import Net
    built = Net(str(net), input_shapes={"a": (1, 6, 6, 3)})
    params = built.init(jax.random.key(0))
    lr, dk = G.param_multipliers(built, params)
    # bias specs are position 1 in both layers
    assert lr["ca"]["b"] == 7.0 and dk["ca"]["b"] == 0.0
    assert lr["cb"]["b"] == 9.0 and dk["cb"]["b"] == 0.0


def test_generic_cli_batch_size_override(tmp_path):
    net_path = _write_net(tmp_path)
    sspec = S.SolverSpec(base_lr=0.01, lr_policy="fixed")
    state, step, batch_source, net = G.setup(net_path, sspec, batch_size=16)
    b = jax.device_get(batch_source())
    assert b["data"].shape[0] == 16 and b["label"].shape[0] == 16
    state, metrics = step(state, batch_source(), jax.random.key(0))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))

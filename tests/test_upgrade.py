"""Legacy prototxt schema migration (upgrade_proto.cpp equivalent).

Pins the V0 -> V1 -> V2 chain against hand-built fixtures shaped like
historical Caffe nets (V0 per src/caffe/util/upgrade_proto.cpp:199-560,
padding merge :141-197, V1 :925-1000, input :1037-1095, solver :1102-1145),
then runs an upgraded V0 net end-to-end through the generic netbuilder.
"""

import jax
import jax.numpy as jnp

from mscnn_tpu.config import prototxt as PB
from mscnn_tpu.config import upgrade as UP

# AlexNet-era V0: nested `layer` message, flat fields, a standalone
# padding layer feeding conv2, inline transform fields on the data layer.
V0_NET = """
name: "v0net"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 16 input_dim: 16
layers {
  layer {
    name: "conv1" type: "conv"
    num_output: 4 kernelsize: 3 stride: 1
    weight_filler { type: "gaussian" std: 0.01 }
    biasterm: true
    blobs_lr: 1.0 blobs_lr: 2.0
    weight_decay: 1.0 weight_decay: 0.0
  }
  bottom: "data" top: "conv1"
}
layers {
  layer { name: "relu1" type: "relu" }
  bottom: "conv1" top: "conv1"
}
layers {
  layer { name: "pad2" type: "padding" pad: 2 }
  bottom: "conv1" top: "pad2"
}
layers {
  layer {
    name: "conv2" type: "conv"
    num_output: 4 kernelsize: 5
  }
  bottom: "pad2" top: "conv2"
}
layers {
  layer { name: "pool2" type: "pool" pool: MAX kernelsize: 2 stride: 2 }
  bottom: "conv2" top: "pool2"
}
layers {
  layer { name: "fc" type: "innerproduct" num_output: 10 }
  bottom: "pool2" top: "fc"
}
"""


def test_v0_full_chain():
    net = UP.upgrade_net(PB.parse_prototxt(V0_NET))
    assert "layers" not in net and "input" not in net
    layers = PB.layers(net)
    names = [l["name"] for l in layers]
    # padding layer merged away, Input layer prepended
    assert names == ["input", "conv1", "relu1", "conv2", "pool2", "fc"]
    inp = layers[0]
    assert inp["type"] == "Input"
    assert inp["input_param"]["shape"][0]["dim"] == [1, 3, 16, 16]

    conv1 = layers[1]
    assert conv1["type"] == "Convolution"
    cp = conv1["convolution_param"]
    assert cp["num_output"] == 4 and cp["kernel_size"] == 3
    assert cp["bias_term"] is True
    assert cp["weight_filler"] == {"type": "gaussian", "std": 0.01}
    # blobs_lr / weight_decay -> param specs
    assert conv1["param"] == [{"lr_mult": 1.0, "decay_mult": 1.0},
                              {"lr_mult": 2.0, "decay_mult": 0.0}]

    relu = layers[2]
    assert relu["type"] == "ReLU"
    assert relu["bottom"] == ["conv1"] and relu["top"] == ["conv1"]

    # conv2 absorbed the padding layer: pad 2, bottom rewired to conv1
    conv2 = layers[3]
    assert conv2["convolution_param"]["pad"] == 2
    assert conv2["bottom"] == ["conv1"]

    pool = layers[4]
    assert pool["type"] == "Pooling"
    assert pool["pooling_param"] == {"pool": "MAX", "kernel_size": 2,
                                     "stride": 2}
    assert layers[5]["type"] == "InnerProduct"
    assert layers[5]["inner_product_param"]["num_output"] == 10


def test_v0_net_runs_in_netbuilder():
    """Upgraded V0 text executes through the generic Net."""
    from mscnn_tpu.models.netbuilder import Net

    net = Net(V0_NET, phase="TRAIN")
    params = net.init(jax.random.key(0))
    assert params["conv1"]["w"].shape == (3, 3, 3, 4)
    assert params["conv2"]["w"].shape == (5, 5, 4, 4)
    blobs = net.apply(params, {"data": jnp.zeros((1, 16, 16, 3))})
    # conv1 14x14 (no pad) -> conv2 pad2 k5 -> 14x14 -> pool2 -> 7x7
    assert blobs["conv2"].shape == (1, 14, 14, 4)
    assert blobs["fc"].shape == (1, 10)


def test_v0_data_layer_transform_fields():
    text = """
layers {
  layer {
    name: "d" type: "data" source: "db" batchsize: 8
    scale: 0.00390625 cropsize: 4 mirror: true meanfile: "m.binaryproto"
    rand_skip: 2
  }
  top: "data" top: "label"
}
"""
    net = UP.upgrade_net(PB.parse_prototxt(text))
    (d,) = PB.layers(net)
    assert d["type"] == "Data"
    assert d["data_param"] == {"source": "db", "batch_size": 8,
                               "rand_skip": 2}
    assert d["transform_param"] == {"scale": 0.00390625, "crop_size": 4,
                                    "mirror": True,
                                    "mean_file": "m.binaryproto"}


def test_v1_enum_types_and_data_upgrade():
    text = """
layers {
  name: "d" type: WINDOW_DATA
  window_data_param { source: "w.txt" batch_size: 2 scale: 0.5 mirror: true }
  top: "data"
}
layers {
  name: "ip" type: INNER_PRODUCT bottom: "data" top: "ip"
  inner_product_param { num_output: 3 }
  blobs_lr: 10.0
}
layers { name: "loss" type: SOFTMAX_LOSS bottom: "ip" top: "loss" }
"""
    net = UP.upgrade_net(PB.parse_prototxt(text))
    d, ip, loss = PB.layers(net)
    assert d["type"] == "WindowData"
    assert d["window_data_param"] == {"source": "w.txt", "batch_size": 2}
    assert d["transform_param"] == {"scale": 0.5, "mirror": True}
    assert ip["type"] == "InnerProduct"
    assert ip["param"] == [{"lr_mult": 10.0}]
    assert loss["type"] == "SoftmaxWithLoss"


def test_batchnorm_param_clearing():
    text = """
layer {
  name: "bn" type: "BatchNorm" bottom: "x" top: "x"
  param { lr_mult: 0 } param { lr_mult: 0 } param { lr_mult: 0 }
}
"""
    net = UP.upgrade_net(PB.parse_prototxt(text))
    assert "param" not in PB.layers(net)[0]


def test_upgrade_idempotent_on_modern_text(tmp_path):
    """upgrade_net is the identity on every reference zoo prototxt."""
    import glob
    protos = sorted(glob.glob(
        "/root/reference/examples/*/*/trainval_2nd.prototxt"))[:3]
    for p in protos:
        msg = PB.parse_prototxt_file(p)
        assert UP.upgrade_net(msg) == msg


def test_solver_type_upgrade():
    assert UP.upgrade_solver({"solver_type": "ADAGRAD", "base_lr": 0.1}) \
        == {"type": "AdaGrad", "base_lr": 0.1}
    # modern form untouched
    modern = {"type": "SGD", "base_lr": 0.1}
    assert UP.upgrade_solver(modern) == modern


def test_cli_upgrade_net_proto(tmp_path, capsys):
    from mscnn_tpu import cli
    from mscnn_tpu.models.netbuilder import Net

    src = tmp_path / "v0.prototxt"
    src.write_text(V0_NET)
    dst = tmp_path / "v2.prototxt"
    assert cli.main(["upgrade_net_proto", str(src), str(dst)]) == 0
    capsys.readouterr()
    # upgraded text is modern: loads with no further migration and runs
    upgraded = PB.parse_prototxt_file(str(dst))
    assert upgraded == UP.upgrade_net(upgraded)
    net = Net(str(dst), phase="TRAIN")
    params = net.init(jax.random.key(0))
    blobs = net.apply(params, {"data": jnp.zeros((1, 16, 16, 3))})
    assert blobs["fc"].shape == (1, 10)


def test_cli_upgrade_solver_proto(tmp_path, capsys):
    from mscnn_tpu import cli

    src = tmp_path / "s.prototxt"
    src.write_text("base_lr: 0.01\nlr_policy: \"fixed\"\n"
                   "solver_type: ADAM\n")
    assert cli.main(["upgrade_solver_proto", str(src)]) == 0
    out = capsys.readouterr().out
    assert 'type: "Adam"' in out and "solver_type" not in out


def test_solver_from_prototxt_legacy_enum(tmp_path):
    from mscnn_tpu.config import zoo_import as Z

    p = tmp_path / "solver.prototxt"
    p.write_text('net: "x.prototxt"\nbase_lr: 0.01\nlr_policy: "fixed"\n'
                 "solver_type: NESTEROV\n")
    spec = Z.solver_from_prototxt(str(p))
    assert spec.type.lower() == "nesterov"
    assert spec.base_lr == 0.01

"""NetSpec DSL, prototxt emitter round-trip, and draw_net.

Covers the pycaffe net-authoring surface
(/root/reference/python/caffe/net_spec.py, python/caffe/draw.py): nets
written in Python serialize to prototxt that the generic netbuilder — and
the reference itself — can execute.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from mscnn_tpu.config import prototxt as PB
from mscnn_tpu.models import netspec
from mscnn_tpu.utils import draw as DR

L = netspec.layers
P = netspec.params

REF_PROTOS = sorted(glob.glob("/root/reference/examples/*/*/*.prototxt"))


def lenet(batch=2):
    """The classic LeNet shape, written in the DSL."""
    n = netspec.NetSpec()
    n.data = L.Input(input_param=dict(shape=dict(dim=[batch, 1, 28, 28])))
    n.conv1 = L.Convolution(n.data, kernel_size=5, num_output=20,
                            weight_filler=dict(type="xavier"))
    n.pool1 = L.Pooling(n.conv1, kernel_size=2, stride=2,
                        pool=P.Pooling.MAX)
    n.conv2 = L.Convolution(n.pool1, kernel_size=5, num_output=50,
                            weight_filler=dict(type="xavier"))
    n.pool2 = L.Pooling(n.conv2, kernel_size=2, stride=2,
                        pool=P.Pooling.MAX)
    n.ip1 = L.InnerProduct(n.pool2, num_output=500,
                           weight_filler=dict(type="xavier"))
    n.relu1 = L.ReLU(n.ip1, in_place=True)
    n.ip2 = L.InnerProduct(n.relu1, num_output=10,
                           weight_filler=dict(type="xavier"))
    return n


def test_netspec_structure():
    msg = lenet().to_proto()
    layers = PB.layers(msg)
    names = [l["name"] for l in layers]
    assert names == ["data", "conv1", "pool1", "conv2", "pool2", "ip1",
                     "relu1", "ip2"]
    conv1 = layers[1]
    assert conv1["type"] == "Convolution"
    assert conv1["bottom"] == ["data"]
    assert conv1["top"] == ["conv1"]
    # kwargs routed into the type's param message
    assert conv1["convolution_param"]["kernel_size"] == 5
    assert conv1["convolution_param"]["num_output"] == 20
    assert conv1["convolution_param"]["weight_filler"]["type"] == "xavier"
    # in-place ReLU: top == bottom == ip1
    relu = layers[6]
    assert relu["bottom"] == ["ip1"] and relu["top"] == ["ip1"]
    # pooling enum from the params pseudo-module
    assert layers[2]["pooling_param"]["pool"] == "MAX"


def test_netspec_autonaming_to_proto():
    """Unassigned intermediates get TypeN names (net_spec.py:103-115)."""
    x = L.Input(input_param=dict(shape=dict(dim=[1, 1, 8, 8])))
    h = L.Convolution(x, kernel_size=3, num_output=4)
    y = L.Pooling(h, kernel_size=2, stride=2)
    msg = netspec.to_proto(y)
    names = [l["name"] for l in PB.layers(msg)]
    assert names == ["Input1", "Convolution1", "Pooling1"]
    assert PB.layers(msg)[2]["bottom"] == ["Convolution1"]


def test_netspec_ntop_and_layer_fields():
    n = netspec.NetSpec()
    n.data, n.label = L.DummyData(ntop=2,
                                  shape=[dict(dim=[4, 3, 8, 8]),
                                         dict(dim=[4])])
    n.conv = L.Convolution(n.data, kernel_size=3, num_output=2,
                           param=[dict(lr_mult=1), dict(lr_mult=2)],
                           loss_weight=0.5)
    msg = n.to_proto()
    dummy, conv = PB.layers(msg)
    assert dummy["top"] == ["data", "label"]
    assert dummy["dummy_data_param"]["shape"][0]["dim"] == [4, 3, 8, 8]
    # layer-level fields stay on the layer, not in convolution_param
    assert conv["loss_weight"] == 0.5
    assert conv["param"][1]["lr_mult"] == 2
    assert "loss_weight" not in conv["convolution_param"]


def test_netspec_runs_in_netbuilder():
    """DSL -> prototxt -> generic Net: init + forward shapes."""
    from mscnn_tpu.models.netbuilder import Net

    text = lenet(batch=2).to_prototxt(name="lenet")
    net = Net(text, phase="TRAIN")
    params = net.init(jax.random.key(0))
    assert set(params) == {"conv1", "conv2", "ip1", "ip2"}
    assert params["conv1"]["w"].shape == (5, 5, 1, 20)
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    blobs = net.apply(params, {"data": x})
    assert blobs["ip2"].shape == (2, 10)


def test_emit_value_forms():
    assert PB.emit_prototxt({"a": True, "b": 3, "c": 0.5}) == \
        "a: true\nb: 3\nc: 0.5"
    # enum atoms bare, strings quoted
    assert PB.emit_prototxt({"pool": "MAX"}) == "pool: MAX"
    assert PB.emit_prototxt({"type": "Convolution"}) == \
        'type: "Convolution"'
    # repeated + nested
    assert PB.emit_prototxt({"dim": [1, 2]}) == "dim: 1\ndim: 2"
    assert PB.emit_prototxt({"p": {"k": 1}}) == "p {\n  k: 1\n}"


@pytest.mark.skipif(not REF_PROTOS, reason="reference repo not mounted")
def test_emit_roundtrip_all_reference_protos():
    """parse(emit(parse(text))) == parse(text) over the whole zoo
    (net + solver prototxts, 100+ files)."""
    assert len(REF_PROTOS) > 50
    for path in REF_PROTOS:
        msg = PB.parse_prototxt_file(path)
        again = PB.parse_prototxt(PB.emit_prototxt(msg))
        assert again == msg, f"round-trip diverged for {path}"


def test_draw_dot_output(tmp_path):
    text = lenet().to_prototxt(name="lenet")
    net = PB.parse_prototxt(text)
    dot = DR.to_dot(net)
    assert dot.startswith('digraph "lenet"')
    assert '"layer_conv1"' in dot and '"blob_conv1"' in dot
    assert '"blob_data" -> "layer_conv1";' in dot
    assert 'label="20"' in dot          # conv num_output edge label
    assert "kernel: 5" in dot
    # in-place ReLU collapsed onto its blob
    assert '"layer_relu1"' not in dot and 'label="ReLU"' in dot
    out = str(tmp_path / "net.dot")
    DR.draw_net_to_file(net, out, rankdir="TB")
    assert "rankdir=TB" in open(out).read()


def test_draw_phase_filter():
    n = netspec.NetSpec()
    n.data = L.Input(input_param=dict(shape=dict(dim=[1, 1, 4, 4])),
                     include=dict(phase="TRAIN"))
    n.data_test = L.Input(input_param=dict(shape=dict(dim=[1, 1, 4, 4])),
                          include=dict(phase="TEST"))
    net = PB.parse_prototxt(n.to_prototxt())
    train_dot = DR.to_dot(net, phase="TRAIN")
    assert "layer_data" in train_dot and "layer_data_test" not in train_dot


def test_cli_draw(tmp_path):
    from mscnn_tpu import cli

    proto = tmp_path / "net.prototxt"
    proto.write_text(lenet().to_prototxt(name="lenet"))
    out = tmp_path / "net.dot"
    rc = cli.main(["draw", "--net", str(proto), "--out", str(out)])
    assert rc == 0
    assert out.read_text().startswith("digraph")


def test_cli_summary(tmp_path, capsys):
    from mscnn_tpu import cli

    proto = tmp_path / "net.prototxt"
    proto.write_text(lenet().to_prototxt(name="lenet"))
    assert cli.main(["summary", "--net", str(proto)]) == 0
    out = capsys.readouterr().out
    assert "conv1" in out and "Convolution" in out
    # conv1: 5x5x1x20 + 20 bias = 520 params; shape after conv 24x24x20
    assert "520" in out
    assert "(2, 24, 24, 20)" in out
    assert "TOTAL" in out


def test_emit_quotes_allcaps_string_fields():
    """String-typed fields stay quoted even when ALL_CAPS, so the
    reference's TextFormat parser accepts emitted files."""
    assert PB.emit_prototxt({"name": "MSCNN"}) == 'name: "MSCNN"'
    assert PB.emit_prototxt({"lr_policy": "STEP"}) == 'lr_policy: "STEP"'
    # enum-typed fields stay bare
    assert PB.emit_prototxt({"phase": "TRAIN"}) == "phase: TRAIN"
    # round-trip still holds
    msg = {"name": "CONV1", "layer": [{"name": "A", "type": "ReLU",
                                       "phase": "TEST"}]}
    back = PB.parse_prototxt(PB.emit_prototxt(msg))
    assert back["name"] == "CONV1"
    assert PB.layers(back) == msg["layer"]

"""Extended generic-netbuilder layer coverage: the classic-Caffe types
beyond the LeNet/CaffeNet core (Deconvolution, PReLU, BatchNorm, Bias,
MVN, Slice, Reshape, Crop, ArgMax, Tile, Reduction, extra losses). Nets
are authored with the NetSpec DSL and executed through netbuilder.Net —
the same path a prototxt file takes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.models import netspec
from mscnn_tpu.models.netbuilder import Net

L = netspec.layers
P = netspec.params


def build(n, phase="TRAIN"):
    return Net(n.to_prototxt(name="t"), phase=phase)


def data_spec(dims):
    n = netspec.NetSpec()
    n.data = L.Input(input_param=dict(shape=dict(dim=dims)))
    return n


def run(n, x, phase="TRAIN", train=False, key=None):
    net = build(n, phase)
    params = net.init(jax.random.key(0))
    return net, params, net.apply(params, {"data": jnp.asarray(x)},
                                  train=train, key=key)


def test_deconvolution_upsamples():
    n = data_spec([1, 3, 8, 8])
    n.up = L.Deconvolution(n.data, convolution_param=dict(
        num_output=5, kernel_size=4, stride=2, pad=1,
        weight_filler=dict(type="xavier")))
    net, params, blobs = run(n, np.ones((1, 8, 8, 3), np.float32))
    assert params["up"]["w"].shape == (4, 4, 3, 5)
    assert blobs["up"].shape == (1, 16, 16, 5)
    assert net.shapes["up"] == (1, 16, 16, 5)


def test_prelu_learned_slope():
    n = data_spec([1, 2, 4, 4])
    n.act = L.PReLU(n.data)
    x = np.full((1, 4, 4, 2), -2.0, np.float32)
    net, params, blobs = run(n, x)
    assert params["act"]["slope"].shape == (2,)
    np.testing.assert_allclose(np.asarray(blobs["act"]), -2.0 * 0.25)


def test_batchnorm_global_vs_batch_stats():
    n = data_spec([4, 3, 2, 2])
    n.bn = L.BatchNorm(n.data)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 2, 2, 3).astype(np.float32) * 3 + 1
    # TEST phase -> running stats (init: mean 0, var 1) = identity-ish
    net = build(n, "TRAIN")
    params = net.init(jax.random.key(0))
    test_out = net.apply(params, {"data": jnp.asarray(x)}, train=False)
    np.testing.assert_allclose(np.asarray(test_out["bn"]), x, atol=1e-4)
    # TRAIN -> batch statistics: normalized output
    train_out = net.apply(params, {"data": jnp.asarray(x)}, train=True)
    y = np.asarray(train_out["bn"])
    assert abs(y.mean()) < 1e-4 and abs(y.std() - 1.0) < 0.1


def test_bias_and_mvn():
    n = data_spec([1, 3, 2, 2])
    n.b = L.Bias(n.data)
    n.m = L.MVN(n.b)
    x = np.random.RandomState(1).randn(1, 2, 2, 3).astype(np.float32)
    _, params, blobs = run(n, x)
    assert params["b"]["b"].shape == (3,)
    y = np.asarray(blobs["m"])
    np.testing.assert_allclose(y.mean((1, 2)), 0.0, atol=1e-5)


def test_slice_multi_top():
    n = data_spec([1, 6, 4, 4])
    n.a, n.b2 = L.Slice(n.data, ntop=2, slice_param=dict(
        axis=1, slice_point=[2]))
    x = np.random.RandomState(2).randn(1, 4, 4, 6).astype(np.float32)
    net, params, blobs = run(n, x)
    assert blobs["a"].shape == (1, 4, 4, 2)
    assert blobs["b2"].shape == (1, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(blobs["a"]), x[..., :2])
    assert net.shapes["b2"] == (1, 4, 4, 4)


def test_reshape_nchw_semantics():
    n = data_spec([2, 3, 4, 5])
    n.r = L.Reshape(n.data, reshape_param=dict(
        shape=dict(dim=[0, -1, 2, 5])))
    x = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 4, 5, 3)
    net, params, blobs = run(n, x)
    # NCHW [2,3,4,5] -> [0,-1,2,5] = [2,6,2,5]; back to NHWC [2,2,5,6]
    assert blobs["r"].shape == (2, 2, 5, 6)
    # values follow the NCHW reshape, not a raw NHWC reshape
    nchw = x.transpose(0, 3, 1, 2).reshape(2, 6, 2, 5)
    np.testing.assert_array_equal(np.asarray(blobs["r"]),
                                  nchw.transpose(0, 2, 3, 1))


def test_crop_with_offsets():
    n = data_spec([1, 2, 8, 8])
    n.ref = L.Input(input_param=dict(shape=dict(dim=[1, 2, 5, 4])))
    n.c = L.Crop(n.data, n.ref, crop_param=dict(axis=2, offset=[1, 2]))
    x = np.arange(2 * 64, dtype=np.float32).reshape(1, 8, 8, 2)
    net = build(n)
    params = net.init(jax.random.key(0))
    blobs = net.apply(params, {
        "data": jnp.asarray(x),
        "ref": jnp.zeros((1, 5, 4, 2), jnp.float32)})
    assert blobs["c"].shape == (1, 5, 4, 2)
    np.testing.assert_array_equal(np.asarray(blobs["c"]),
                                  x[:, 1:6, 2:6, :])
    assert net.shapes["c"] == (1, 5, 4, 2)


def test_argmax_and_tile():
    n = data_spec([2, 5, 1, 1])
    n.am = L.ArgMax(n.data, argmax_param=dict(top_k=2))
    n.t = L.Tile(n.data, tile_param=dict(axis=1, tiles=3))
    x = np.random.RandomState(3).randn(2, 1, 1, 5).astype(np.float32)
    _, params, blobs = run(n, x)
    assert blobs["am"].shape == (2, 2)
    assert int(blobs["am"][0, 0]) == int(x[0].reshape(-1).argmax())
    assert blobs["t"].shape == (2, 1, 1, 15)


def test_reduction_and_extra_losses():
    n = data_spec([4, 3, 1, 1])
    n.label = L.Input(input_param=dict(shape=dict(dim=[4])))
    n.red = L.Reduction(n.data, reduction_param=dict(operation="MEAN",
                                                     axis=1))
    n.flat = L.Flatten(n.data)
    n.hinge = L.HingeLoss(n.flat, n.label, loss_weight=2.0)
    x = np.random.RandomState(4).randn(4, 1, 1, 3).astype(np.float32)
    net = build(n)
    params = net.init(jax.random.key(0))
    blobs = net.apply(params, {
        "data": jnp.asarray(x),
        "label": jnp.asarray([0, 1, 2, 0], jnp.int32)})
    assert blobs["red"].shape == (4,)
    np.testing.assert_allclose(np.asarray(blobs["red"]),
                               x.reshape(4, 3).mean(1), rtol=1e-6)
    assert np.isfinite(float(blobs["hinge"]))
    np.testing.assert_allclose(float(blobs["loss"]),
                               2.0 * float(blobs["hinge"]), rtol=1e-6)


def test_sigmoid_ce_loss():
    n = data_spec([3, 4, 1, 1])
    n.tgt = L.Input(input_param=dict(shape=dict(dim=[3, 4, 1, 1])))
    n.flat = L.Flatten(n.data)
    n.tflat = L.Flatten(n.tgt)
    n.l = L.SigmoidCrossEntropyLoss(n.flat, n.tflat)
    rng = np.random.RandomState(5)
    net = build(n)
    params = net.init(jax.random.key(0))
    blobs = net.apply(params, {
        "data": jnp.asarray(rng.randn(3, 1, 1, 4), jnp.float32),
        "tgt": jnp.asarray(rng.rand(3, 1, 1, 4), jnp.float32)})
    assert np.isfinite(float(blobs["l"]))
    assert float(blobs["loss"]) == pytest.approx(float(blobs["l"]))


def test_input_shapes_ctor_override():
    """Explicit input_shapes win over the Input layer's declared dims."""
    n = data_spec([1, 3, 8, 8])
    n.conv = L.Convolution(n.data, kernel_size=3, num_output=4, pad=1)
    net = Net(n.to_prototxt(), input_shapes={"data": (2, 16, 16, 3)})
    params = net.init(jax.random.key(0))
    assert net.shapes["conv"] == (2, 16, 16, 4)
    assert net.inputs()["data"] == (2, 16, 16, 3)


def test_input_layer_without_shape_needs_ctor_dims():
    text = 'layer { name: "input" type: "Input" top: "data" }\n' \
           'layer { name: "c" type: "Convolution" bottom: "data" ' \
           'top: "c" convolution_param { num_output: 2 kernel_size: 3 } }'
    with pytest.raises(ValueError, match="declares no shape"):
        Net(text).init(jax.random.key(0))
    net = Net(text, input_shapes={"data": (1, 8, 8, 3)})
    params = net.init(jax.random.key(0))
    assert params["c"]["w"].shape == (3, 3, 3, 2)


def test_argmax_out_max_val_shape():
    n = data_spec([2, 5, 1, 1])
    n.am = L.ArgMax(n.data, argmax_param=dict(top_k=3, out_max_val=True))
    x = np.random.RandomState(1).randn(2, 1, 1, 5).astype(np.float32)
    net, params, blobs = run(n, x)
    assert blobs["am"].shape == (2, 2, 3)
    assert net.shapes["am"] == (2, 2, 3)


def test_python_layer_registered_and_trains():
    """PythonLayer hook (python_layer.hpp:1-54): a registered user layer
    runs inside a prototxt net, its output shape propagates, and training
    backprops through it via autodiff."""
    from mscnn_tpu.models import netbuilder as NB

    @NB.register_python_layer("test_py_mod", "ScaledTanh")
    class ScaledTanh:
        def __init__(self, param_str=""):
            self.scale = float(param_str or 1.0)

        def setup(self, bottom_shapes):
            return bottom_shapes[0]

        def forward(self, x):
            return jnp.tanh(x) * self.scale

    text = """
name: "pynet"
layer { name: "data" type: "Input" top: "data"
        input_param { shape { dim: 4 dim: 1 dim: 6 dim: 6 } } }
layer { name: "label" type: "Input" top: "label"
        input_param { shape { dim: 4 } } }
layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
        convolution_param { num_output: 4 kernel_size: 3 pad: 1
                            weight_filler { type: "xavier" } } }
layer { name: "act" type: "Python" bottom: "conv" top: "act"
        python_param { module: "test_py_mod" layer: "ScaledTanh"
                       param_str: "2.0" } }
layer { name: "ip" type: "InnerProduct" bottom: "act" top: "ip"
        inner_product_param { num_output: 2
                              weight_filler { type: "xavier" } } }
layer { name: "out" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
        top: "out" }
"""
    net = Net(text)
    params = net.init(jax.random.key(0))
    assert net.shapes["act"] == net.shapes["conv"]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 6, 6, 1), jnp.float32)
    lab = jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32)

    blobs = net.apply(params, {"data": x, "label": lab})
    np.testing.assert_allclose(np.asarray(blobs["act"]),
                               2.0 * np.tanh(np.asarray(blobs["conv"])),
                               atol=1e-6)

    def loss(p):
        return net.apply(p, {"data": x, "label": lab})["loss"]

    step = jax.jit(lambda p: jax.tree.map(
        lambda w, g: w - 0.5 * g, p, jax.grad(loss)(p)))
    l0 = float(loss(params))
    g0 = jax.grad(loss)(params)
    assert float(jnp.abs(g0["conv"]["w"]).sum()) > 0   # grad flows through
    for _ in range(5):
        params = step(params)
    assert float(loss(params)) < l0


def test_python_layer_unresolvable_raises():
    text = ('layer { name: "i" type: "Input" top: "d" '
            'input_param { shape { dim: 1 dim: 1 dim: 2 dim: 2 } } }\n'
            'layer { name: "p" type: "Python" bottom: "d" top: "p" '
            'python_param { module: "no_such_mod_xyz" layer: "Nope" } }')
    with pytest.raises(ValueError, match="neither registered"):
        Net(text).init(jax.random.key(0))


def _siamese_spec(k2=3):
    """Two conv branches over two inputs sharing weights via param{name}
    (reference net.cpp:449-501 AppendParam / examples/siamese)."""
    n = netspec.NetSpec()
    n.a = L.Input(input_param=dict(shape=dict(dim=[1, 3, 8, 8])))
    n.b = L.Input(input_param=dict(shape=dict(dim=[1, 3, 8, 8])))
    shared = [dict(name="feat_w", lr_mult=1), dict(name="feat_b", lr_mult=2)]
    n.fa = L.Convolution(n.a, param=shared, convolution_param=dict(
        num_output=4, kernel_size=3, pad=1,
        weight_filler=dict(type="xavier")))
    n.fb = L.Convolution(n.b, param=shared, convolution_param=dict(
        num_output=4, kernel_size=k2, pad=k2 // 2,
        weight_filler=dict(type="xavier")))
    return n


def test_param_sharing_siamese():
    net = build(_siamese_spec())
    params = net.init(jax.random.key(0))
    # the shared blobs live ONCE, under the owner layer
    assert "w" in params["fa"] and "b" in params["fa"]
    assert "w" not in params.get("fb", {}) and "b" not in params.get("fb", {})

    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3),
                    jnp.float32)
    blobs = net.apply(params, {"a": x, "b": x})
    # same weights + same input => identical branch outputs
    np.testing.assert_allclose(np.asarray(blobs["fa"]),
                               np.asarray(blobs["fb"]), rtol=1e-6)

    # gradient accumulates BOTH uses into the single owner leaf
    # (net.cpp:956 accumulate-then-update semantics)
    def s_all(p):
        bl = net.apply(p, {"a": x, "b": 2.0 * x})
        return (bl["fa"] ** 2).sum() + (bl["fb"] ** 2).sum()

    def s_fa(p):
        return (net.apply(p, {"a": x, "b": 2.0 * x})["fa"] ** 2).sum()

    def s_fb(p):
        return (net.apply(p, {"a": x, "b": 2.0 * x})["fb"] ** 2).sum()

    g_all = jax.grad(s_all)(params)["fa"]["w"]
    g_sum = jax.grad(s_fa)(params)["fa"]["w"] \
        + jax.grad(s_fb)(params)["fa"]["w"]
    np.testing.assert_allclose(np.asarray(g_all), np.asarray(g_sum),
                               rtol=1e-5, atol=1e-6)


def test_param_sharing_shape_mismatch_raises():
    net = build(_siamese_spec(k2=5))   # owner 3x3 vs sharer 5x5
    with pytest.raises(ValueError, match="shared param"):
        net.init(jax.random.key(0))


def test_param_sharing_unsupported_type_raises():
    n = data_spec([1, 3, 4, 4])
    n.p = L.Pooling(n.data, param=[dict(name="nope")],
                    pooling_param=dict(kernel_size=2, stride=2))
    with pytest.raises(ValueError, match="not supported"):
        build(n)


def test_infogain_loss_from_blobproto_source(tmp_path):
    """InfogainLoss H from an infogain_loss_param.source binaryproto
    (infogain_loss_layer.cpp:22-32); identity H reduces to the
    multinomial logistic loss."""
    from mscnn_tpu.io.caffemodel import array_to_blobproto
    from mscnn_tpu.ops import layers as LY

    k = 4
    hpath = tmp_path / "H.binaryproto"
    hpath.write_bytes(array_to_blobproto(
        np.eye(k, dtype=np.float32)[None, None]))

    text = f'''
layer {{ name: "i" type: "Input" top: "p"
  input_param {{ shape {{ dim: 6 dim: {k} }} }} }}
layer {{ name: "i2" type: "Input" top: "label"
  input_param {{ shape {{ dim: 6 }} }} }}
layer {{ name: "loss" type: "InfogainLoss" bottom: "p" bottom: "label"
  top: "loss" infogain_loss_param {{ source: "{hpath}" }} }}
'''
    net = Net(text)
    params = net.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    p = rng.dirichlet(np.ones(k), 6).astype(np.float32)
    lab = rng.randint(0, k, 6).astype(np.int32)
    blobs = net.apply(params, {"p": jnp.asarray(p), "label": jnp.asarray(lab)})
    expect = float(LY.multinomial_logistic_loss(jnp.asarray(p),
                                                jnp.asarray(lab)))
    np.testing.assert_allclose(float(blobs["loss"]), expect, rtol=1e-5)


def test_infogain_loss_missing_source_raises():
    text = '''
layer { name: "i" type: "Input" top: "p"
  input_param { shape { dim: 2 dim: 3 } } }
layer { name: "i2" type: "Input" top: "label"
  input_param { shape { dim: 2 } } }
layer { name: "loss" type: "InfogainLoss" bottom: "p" bottom: "label"
  top: "loss" }
'''
    net = Net(text)
    params = net.init(jax.random.key(0))
    with pytest.raises(ValueError, match="third bottom"):
        net.apply(params, {"p": jnp.ones((2, 3)) / 3.0,
                           "label": jnp.zeros(2, jnp.int32)})


def test_embed_and_batch_reindex():
    """Embed lookup (embed_layer.cpp) and BatchReindex row gather
    (batch_reindex_layer.cpp) through the generic builder."""
    text = '''
layer { name: "i" type: "Input" top: "ids"
  input_param { shape { dim: 5 } } }
layer { name: "perm" type: "Input" top: "perm"
  input_param { shape { dim: 3 } } }
layer { name: "emb" type: "Embed" bottom: "ids" top: "emb"
  embed_param { input_dim: 7 num_output: 4
    weight_filler { type: "uniform" min: -1 max: 1 } } }
layer { name: "re" type: "BatchReindex" bottom: "emb" bottom: "perm"
  top: "re" }
'''
    net = Net(text)
    params = net.init(jax.random.key(0))
    assert params["emb"]["w"].shape == (7, 4)
    ids = jnp.asarray([0, 3, 6, 3, 1], jnp.int32)
    perm = jnp.asarray([4, 0, 2], jnp.int32)
    blobs = net.apply(params, {"ids": ids, "perm": perm})
    table = np.asarray(params["emb"]["w"]) + np.asarray(params["emb"]["b"])
    np.testing.assert_allclose(np.asarray(blobs["emb"]),
                               table[np.asarray(ids)], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(blobs["re"]),
                               np.asarray(blobs["emb"])[[4, 0, 2]],
                               rtol=1e-6)


def test_parameter_layer_trains():
    """Parameter layer (parameter_layer.hpp): a learnable standalone blob
    emitted as a top; fitting it to a target through EuclideanLoss."""
    text = '''
layer { name: "t" type: "Input" top: "target"
  input_param { shape { dim: 2 dim: 3 } } }
layer { name: "p" type: "Parameter" top: "p"
  parameter_param { shape { dim: 2 dim: 3 } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "p" bottom: "target"
  top: "loss" }
'''
    net = Net(text)
    params = net.init(jax.random.key(0))
    assert params["p"]["w"].shape == (2, 3)
    target = jnp.asarray(np.random.RandomState(0).randn(2, 3),
                         jnp.float32)

    def loss(prm):
        return net.apply(prm, {"target": target})["loss"]

    for _ in range(60):
        g = jax.grad(loss)(params)
        params = jax.tree.map(lambda w, d: w - 0.3 * d, params, g)
    np.testing.assert_allclose(np.asarray(params["p"]["w"]),
                               np.asarray(target), atol=1e-2)


def test_lstm_layer_with_cont_reset():
    """LSTM through the generic builder with the RecurrentLayer cont
    bottom (recurrent_layer.hpp:28-52): cont=0 at step t resets the
    carried state, so a packed pair of sequences matches running them
    separately."""
    from mscnn_tpu.ops import layers as LY

    text = '''
layer { name: "x" type: "Input" top: "x"
  input_param { shape { dim: 6 dim: 2 dim: 3 } } }
layer { name: "cont" type: "Input" top: "cont"
  input_param { shape { dim: 6 dim: 2 } } }
layer { name: "lstm" type: "LSTM" bottom: "x" bottom: "cont" top: "h"
  recurrent_param { num_output: 4
    weight_filler { type: "uniform" min: -0.5 max: 0.5 } } }
'''
    net = Net(text)
    params = net.init(jax.random.key(1))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6, 2, 3), jnp.float32)
    # two packed 3-step sequences: cont 0 at t=0 and t=3
    cont = jnp.asarray(np.array([[0, 0], [1, 1], [1, 1],
                                 [0, 0], [1, 1], [1, 1]], np.float32))
    h = net.apply(params, {"x": x, "cont": cont})["h"]
    assert h.shape == (6, 2, 4)
    # reference: run the two halves independently (fresh state each)
    h1, _ = LY.lstm(x[:3], params["lstm"])
    h2, _ = LY.lstm(x[3:], params["lstm"])
    np.testing.assert_allclose(np.asarray(h[:3]), np.asarray(h1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h[3:]), np.asarray(h2),
                               rtol=1e-5, atol=1e-6)


def test_rnn_layer_trains():
    """Tanh RNN through the builder trains on a fit-the-mean task."""
    text = '''
layer { name: "x" type: "Input" top: "x"
  input_param { shape { dim: 4 dim: 2 dim: 3 } } }
layer { name: "t" type: "Input" top: "target"
  input_param { shape { dim: 4 dim: 2 dim: 2 } } }
layer { name: "rnn" type: "RNN" bottom: "x" top: "h"
  recurrent_param { num_output: 2
    weight_filler { type: "uniform" min: -0.5 max: 0.5 } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "h" bottom: "target"
  top: "loss" }
'''
    net = Net(text)
    params = net.init(jax.random.key(0))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 2, 3), jnp.float32)
    target = jnp.asarray(np.tanh(rng.randn(4, 2, 2)), jnp.float32)

    def loss(prm):
        return net.apply(prm, {"x": x, "target": target})["loss"]

    l0 = float(loss(params))
    step = jax.jit(lambda p: jax.tree.map(
        lambda w, g: w - 0.2 * g, p, jax.grad(loss)(p)))
    for _ in range(150):
        params = step(params)
    assert float(loss(params)) < l0 * 0.5

"""Generic net builder: a LeNet-style prototxt inits, forwards, and trains
end-to-end under the standard solver."""

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.models.netbuilder import Net
from mscnn_tpu.train import solver as S

LENET = """
name: "lenet-ish"
layer { name: "data" type: "Input" top: "data"
  input_param { shape { dim: 8 dim: 1 dim: 28 dim: 28 } } }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 5
    weight_filler { type: "xavier" } bias_filler { type: "constant" } } }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "relu1" type: "ReLU" bottom: "pool1" top: "pool1" }
layer { name: "conv2" type: "Convolution" bottom: "pool1" top: "conv2"
  convolution_param { num_output: 16 kernel_size: 5
    weight_filler { type: "msra" } } }
layer { name: "pool2" type: "Pooling" bottom: "conv2" top: "pool2"
  pooling_param { pool: AVE kernel_size: 2 stride: 2 } }
layer { name: "ip1" type: "InnerProduct" bottom: "pool2" top: "ip1"
  inner_product_param { num_output: 32
    weight_filler { type: "gaussian" std: 0.05 } } }
layer { name: "relu2" type: "ReLU" bottom: "ip1" top: "ip1" }
layer { name: "drop1" type: "Dropout" bottom: "ip1" top: "ip1"
  dropout_param { dropout_ratio: 0.25 } }
layer { name: "ip2" type: "InnerProduct" bottom: "ip1" top: "ip2"
  inner_product_param { num_output: 4
    weight_filler { type: "gaussian" std: 0.05 } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip2" bottom: "label"
  top: "loss_out" include { phase: TRAIN } }
layer { name: "acc" type: "Accuracy" bottom: "ip2" bottom: "label"
  top: "acc" include { phase: TRAIN } }
layer { name: "prob" type: "Softmax" bottom: "ip2" top: "prob"
  include { phase: TEST } }
"""


def make_data(rng, n=8):
    """Linearly separable-ish synthetic digits: class = brightest quadrant."""
    x = rng.rand(n, 28, 28, 1).astype(np.float32) * 0.2
    y = rng.randint(0, 4, n)
    for i, c in enumerate(y):
        r, cq = divmod(int(c), 2)
        x[i, r * 14:(r + 1) * 14, cq * 14:(cq + 1) * 14] += 0.8
    return jnp.asarray(x), jnp.asarray(y)


def test_build_init_shapes(rng):
    net = Net(LENET, phase="TRAIN")
    params = net.init(jax.random.key(0))
    assert params["conv1"]["w"].shape == (5, 5, 1, 8)
    assert params["conv2"]["w"].shape == (5, 5, 8, 16)
    # 28 -> conv5 -> 24 -> pool2 -> 12 -> conv5 -> 8 -> pool2 -> 4
    assert params["ip1"]["w"].shape == (4 * 4 * 16, 32)
    assert params["ip2"]["w"].shape == (32, 4)
    assert net.shapes["pool2"] == (8, 4, 4, 16)


def test_forward_train_and_test_phases(rng):
    x, y = make_data(rng)
    net = Net(LENET, phase="TRAIN")
    params = net.init(jax.random.key(0))
    blobs = net.apply(params, {"data": x, "label": y}, train=True,
                      key=jax.random.key(1))
    assert np.isfinite(float(blobs["loss"]))
    assert 0.0 <= float(blobs["acc"]) <= 1.0

    tnet = Net(LENET, phase="TEST")
    tparams = tnet.init(jax.random.key(0))
    tb = tnet.apply(tparams, {"data": x}, train=False)
    assert tb["prob"].shape == (8, 4)
    np.testing.assert_allclose(np.asarray(tb["prob"]).sum(-1), 1.0,
                               atol=1e-5)
    assert float(tb["loss"]) == 0.0   # no loss layers in TEST phase


def test_trains_under_solver(rng):
    x, y = make_data(rng, n=32)
    net = Net(LENET, phase="TRAIN")
    params = net.init(jax.random.key(0))
    sspec = S.SolverSpec(type="sgd", base_lr=0.05, lr_policy="fixed",
                         momentum=0.9, weight_decay=1e-4)
    state = S.init_state(params, sspec)

    @jax.jit
    def step(params, state, key):
        def loss(p):
            blobs = net.apply(p, {"data": x, "label": y}, train=True, key=key)
            return blobs["loss"]
        l, g = jax.value_and_grad(loss)(params)
        params, state, _ = S.apply_update(params, g, state, sspec)
        return params, state, l

    losses = []
    for i in range(30):
        params, state, l = step(params, state, jax.random.key(i))
        losses.append(float(l))
    assert losses[-1] < 0.5 * losses[0], losses[:3] + losses[-3:]

    blobs = net.apply(params, {"data": x, "label": y}, train=False)
    assert float(blobs["acc"]) > 0.8


def test_unsupported_layer_raises():
    bad = 'layer { name: "x" type: "SPPMagic" bottom: "data" top: "x" }'
    net = Net(f'layer {{ name: "data" type: "Input" top: "data" '
              f'input_param {{ shape {{ dim: 1 dim: 1 dim: 4 dim: 4 }} }} }}'
              f'\n{bad}', phase="TRAIN")
    net.init(jax.random.key(0))
    try:
        net.apply({}, {"data": jnp.zeros((1, 4, 4, 1))})
        assert False, "expected NotImplementedError"
    except NotImplementedError as e:
        assert "SPPMagic" in str(e)

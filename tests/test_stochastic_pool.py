"""Stochastic pooling (Caffe STOCHASTIC mode, pooling_layer.cu:83-154).

Test mode is deterministic (sum(x^2)/(FLT_MIN+sum(x))) and checked against
a direct numpy loop; train mode's sampling distribution, gradient routing
(StoPoolBackward :300-334), and netbuilder dispatch are checked here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.ops import conv as C
from mscnn_tpu.models.netbuilder import Net


def _ref_test_mode(x, k, s):
    """Direct loop over StoPoolForwardTest semantics (no padding)."""
    n, h, w, c = x.shape
    oh = int(np.ceil((h - k) / s)) + 1
    ow = int(np.ceil((w - k) / s)) + 1
    out = np.zeros((n, oh, ow, c), np.float32)
    tiny = np.finfo(np.float32).tiny
    for ph in range(oh):
        for pw in range(ow):
            hs, ws = ph * s, pw * s
            win = x[:, hs:min(hs + k, h), ws:min(ws + k, w), :]
            out[:, ph, pw, :] = (win ** 2).sum(axis=(1, 2)) / \
                (tiny + win.sum(axis=(1, 2)))
    return out


@pytest.mark.parametrize("h,w,k,s", [(6, 6, 2, 2), (7, 5, 3, 2), (5, 5, 3, 3)])
def test_test_mode_matches_reference_loop(rng, h, w, k, s):
    x = rng.rand(2, h, w, 3).astype(np.float32)
    got = np.asarray(C.stochastic_pool(jnp.asarray(x), k, s, train=False))
    np.testing.assert_allclose(got, _ref_test_mode(x, k, s), rtol=1e-5)


def test_test_mode_zero_window_is_zero():
    x = jnp.zeros((1, 4, 4, 1), jnp.float32)
    out = C.stochastic_pool(x, 2, 2, train=False)
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_train_single_hot_window_always_selected(rng):
    """A window with one nonzero cell must always output that cell."""
    x = np.zeros((1, 4, 4, 1), np.float32)
    x[0, 1, 0, 0] = 3.0  # only nonzero in the top-left 2x2 window
    x[0, 2, 3, 0] = 5.0  # only nonzero in the bottom-right window
    for seed in range(5):
        out = np.asarray(C.stochastic_pool(
            jnp.asarray(x), 2, 2, train=True, key=jax.random.key(seed)))
        assert out[0, 0, 0, 0] == 3.0
        assert out[0, 1, 1, 0] == 5.0


def test_train_sampling_proportional_to_activation():
    """Cell picked with probability activation/sum: 1:3 odds within 5%."""
    x = jnp.tile(jnp.asarray([[1.0, 3.0], [0.0, 0.0]], jnp.float32)
                 .reshape(1, 2, 2, 1), (4096, 1, 1, 1))
    out = np.asarray(C.stochastic_pool(x, 2, 2, train=True,
                                       key=jax.random.key(7)))
    frac3 = (out == 3.0).mean()
    assert abs(frac3 - 0.75) < 0.05
    assert set(np.unique(out)) <= {1.0, 3.0}


def test_train_all_zero_window_outputs_zero():
    x = jnp.zeros((2, 4, 4, 2), jnp.float32)
    out = C.stochastic_pool(x, 2, 2, train=True, key=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_train_gradient_routes_to_sampled_cell(rng):
    """d(sum(out))/dx is a one-hot per window at the sampled cell
    (StoPoolBackward routes top_diff to rand_idx only)."""
    x = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32)) + 0.1
    key = jax.random.key(3)

    def f(x):
        return C.stochastic_pool(x, 2, 2, train=True, key=key).sum()

    g = np.asarray(jax.grad(f)(x))
    out = np.asarray(C.stochastic_pool(x, 2, 2, train=True, key=key))
    # one unit of gradient per window, landing on the sampled cell
    assert g.sum() == pytest.approx(4 * 2)  # 2x2 windows x 2 channels
    per_win = g.reshape(1, 2, 2, 2, 2, 2).sum(axis=(2, 4))
    np.testing.assert_array_equal(per_win, 1.0)
    # the cell carrying the gradient holds the sampled value
    xs = np.asarray(x)
    for ph in range(2):
        for pw in range(2):
            for c in range(2):
                win_g = g[0, ph * 2:ph * 2 + 2, pw * 2:pw * 2 + 2, c]
                win_x = xs[0, ph * 2:ph * 2 + 2, pw * 2:pw * 2 + 2, c]
                assert win_x[win_g > 0][0] == out[0, ph, pw, c]


def test_edge_clipped_windows(rng):
    """Ceil-mode output with the last window clipped at the input edge."""
    x = rng.rand(1, 7, 7, 1).astype(np.float32)
    got = np.asarray(C.stochastic_pool(jnp.asarray(x), 3, 2, train=False))
    ref = _ref_test_mode(x, 3, 2)
    assert got.shape == ref.shape == (1, 3, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # train mode never samples out-of-bounds (masked cells are zero and
    # cannot push the cumsum over the threshold)
    out = np.asarray(C.stochastic_pool(jnp.asarray(x), 3, 2, train=True,
                                       key=jax.random.key(1)))
    vals = set(np.round(out.ravel(), 6))
    assert vals <= set(np.round(x.ravel(), 6))


STO_NET = """
name: "sto"
layer { name: "data" type: "Input" top: "data"
  input_param { shape { dim: 2 dim: 1 dim: 8 dim: 8 } } }
layer { name: "relu" type: "ReLU" bottom: "data" top: "relu" }
layer { name: "pool" type: "Pooling" bottom: "relu" top: "pool"
  pooling_param { pool: STOCHASTIC kernel_size: 2 stride: 2 } }
"""


def test_netbuilder_dispatches_stochastic(rng):
    net = Net(STO_NET, phase="TEST")
    params = net.init(jax.random.key(0))
    x = jnp.asarray(rng.rand(2, 8, 8, 1).astype(np.float32))
    # TEST phase: deterministic weighted average, no key needed
    blobs = net.apply(params, {"data": x})
    ref = _ref_test_mode(np.maximum(np.asarray(x), 0), 2, 2)
    np.testing.assert_allclose(np.asarray(blobs["pool"]), ref, rtol=1e-5)
    # TRAIN phase: samples from the window using the supplied key
    blobs = net.apply(params, {"data": x}, train=True, key=jax.random.key(1))
    out = np.asarray(blobs["pool"])
    assert out.shape == (2, 4, 4, 1)
    assert set(np.round(out.ravel(), 6)) <= \
        set(np.round(np.maximum(np.asarray(x), 0).ravel(), 6)) | {0.0}


def test_netbuilder_rejects_stochastic_pad_and_unknown_mode():
    bad_pad = STO_NET.replace("kernel_size: 2 stride: 2",
                              "kernel_size: 2 stride: 2 pad: 1")
    net = Net(bad_pad, phase="TEST")
    params = net.init(jax.random.key(0))
    x = jnp.zeros((2, 8, 8, 1), jnp.float32)
    with pytest.raises(ValueError, match="STOCHASTIC pooling forbids pad"):
        net.apply(params, {"data": x})

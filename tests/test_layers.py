"""Standard op library: Caffe-semantic checks, with torch as an independent
oracle where the op exists there."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.ops import layers as L


def test_activations(rng):
    x = jnp.asarray(rng.randn(4, 5), jnp.float32)
    np.testing.assert_allclose(L.relu(x), np.maximum(np.asarray(x), 0))
    np.testing.assert_allclose(L.relu(x, 0.1),
                               np.where(np.asarray(x) > 0, np.asarray(x),
                                        0.1 * np.asarray(x)), rtol=1e-6)
    np.testing.assert_allclose(L.absval(x), np.abs(np.asarray(x)))
    np.testing.assert_allclose(L.threshold(x, 0.5),
                               (np.asarray(x) > 0.5).astype(np.float32))
    # BNLL == log(1 + e^x), stable at extremes
    big = jnp.asarray([100.0, -100.0, 0.0])
    out = np.asarray(L.bnll(big))
    np.testing.assert_allclose(out, [100.0, 0.0, np.log(2)], atol=1e-6)
    np.testing.assert_allclose(L.power(x, 2.0, 3.0, 1.0),
                               (1 + 3 * np.asarray(x)) ** 2, rtol=1e-5)


def test_prelu_per_channel(rng):
    x = jnp.asarray(rng.randn(2, 3, 3, 4), jnp.float32)
    a = jnp.asarray([0.0, 0.1, 0.2, 0.3])
    y = np.asarray(L.prelu(x, a))
    xn = np.asarray(x)
    expect = np.maximum(xn, 0) + np.asarray(a) * np.minimum(xn, 0)
    np.testing.assert_allclose(y, expect, rtol=1e-6)


def test_lrn_matches_torch(rng):
    import torch
    x = rng.randn(2, 6, 5, 7).astype(np.float32)  # NCHW for torch
    t = torch.nn.LocalResponseNorm(size=5, alpha=1e-4, beta=0.75, k=1.0)
    ref = t(torch.from_numpy(x)).numpy()
    y = L.lrn(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
              local_size=5, alpha=1e-4, beta=0.75, k=1.0)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)),
                               ref, atol=1e-5)


def test_batch_norm_and_scale(rng):
    x = jnp.asarray(rng.randn(8, 4, 4, 3), jnp.float32)
    y, m, v = L.batch_norm(x, use_global_stats=False)
    np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 1, 2)), 0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(axis=(0, 1, 2)), 1,
                               atol=1e-3)
    # global-stats mode uses the provided moments
    y2, _, _ = L.batch_norm(x, m, v, use_global_stats=True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-5)

    s = jnp.asarray([2.0, 3.0, 4.0])
    b = jnp.asarray([1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(L.scale(x, s, b)),
                               np.asarray(x) * np.asarray(s) + 1.0, rtol=1e-6)


def test_mvn(rng):
    x = jnp.asarray(rng.randn(2, 6, 6, 3) * 5 + 2, jnp.float32)
    y = np.asarray(L.mvn(x))
    np.testing.assert_allclose(y.mean(axis=(1, 2)), 0, atol=1e-4)
    np.testing.assert_allclose((y ** 2).mean(axis=(1, 2)), 1, atol=1e-3)


def test_structural(rng):
    x = jnp.asarray(rng.randn(4, 6), jnp.float32)
    a, b = L.slice_(x, [2], axis=-1)
    assert a.shape == (4, 2) and b.shape == (4, 4)
    np.testing.assert_allclose(L.concat([a, b], -1), x)
    assert len(L.split(x, 3)) == 3
    assert L.flatten(jnp.zeros((2, 3, 4))).shape == (2, 12)
    np.testing.assert_allclose(
        L.eltwise([x, x], "sum", coeffs=[2.0, -1.0]), x, rtol=1e-6)
    np.testing.assert_allclose(L.eltwise([x, 2 * x], "max"),
                               np.maximum(np.asarray(x), 2 * np.asarray(x)))
    assert L.tile(x, 3, axis=0).shape == (12, 6)
    assert L.argmax(x, top_k=2).shape == (4, 2)
    np.testing.assert_allclose(L.batch_reindex(x, jnp.asarray([1, 0])),
                               np.asarray(x)[[1, 0]])
    np.testing.assert_allclose(L.reduction(x, "asum", axis=1),
                               np.abs(np.asarray(x)).sum(1), rtol=1e-6)
    assert L.silence(x) is None


def test_crop():
    x = jnp.arange(2 * 5 * 6).reshape(2, 5, 6).astype(jnp.float32)
    y = L.crop(x, (2, 3, 4), (1, 2), axis=1)
    np.testing.assert_allclose(y, np.asarray(x)[:, 1:4, 2:6])


def test_filter_compacts(rng):
    x = jnp.asarray(rng.randn(5, 3), jnp.float32)
    sel = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0])
    (out,), keep = L.filter_([x], sel)
    assert keep.tolist() == [True, True, True, False, False]
    np.testing.assert_allclose(out[:3], np.asarray(x)[[0, 2, 4]])


def test_embed(rng):
    table = jnp.asarray(rng.randn(10, 4), jnp.float32)
    ids = jnp.asarray([3, 7, 0])
    np.testing.assert_allclose(L.embed(ids, table),
                               np.asarray(table)[[3, 7, 0]])


def test_spp_shapes(rng):
    x = jnp.asarray(rng.randn(2, 13, 9, 5), jnp.float32)
    y = L.spp(x, pyramid_height=3)
    assert y.shape == (2, (1 + 4 + 16) * 5)


def test_losses(rng):
    a = jnp.asarray(rng.randn(6, 4), jnp.float32)
    b = jnp.asarray(rng.randn(6, 4), jnp.float32)
    np.testing.assert_allclose(
        L.euclidean_loss(a, b),
        ((np.asarray(a) - np.asarray(b)) ** 2).sum() / 12.0, rtol=1e-5)

    import torch
    logits = rng.randn(5, 3).astype(np.float32)
    targets = (rng.rand(5, 3) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets),
        reduction="sum").numpy() / 5
    np.testing.assert_allclose(
        L.sigmoid_cross_entropy_loss(jnp.asarray(logits),
                                     jnp.asarray(targets)), ref, rtol=1e-5)

    probs = jax.nn.softmax(jnp.asarray(rng.randn(5, 3), jnp.float32))
    labels = jnp.asarray([0, 1, 2, 1, 0])
    ml = L.multinomial_logistic_loss(probs, labels)
    # infogain with identity matrix == multinomial logistic
    ig = L.infogain_loss(probs, labels, jnp.eye(3))
    np.testing.assert_allclose(ml, ig, rtol=1e-6)

    # contrastive: identical pairs with y=1 give zero loss
    z = L.contrastive_loss(a, a, jnp.ones(6))
    assert float(z) == 0.0
    # dissimilar identical pairs hit full margin
    far = L.contrastive_loss(a, a, jnp.zeros(6), margin=2.0)
    np.testing.assert_allclose(far, 6 * 4.0 / 12.0, rtol=1e-6)


def test_hinge_loss_simple():
    # 2 samples, 2 classes; perfectly separated with margin > 1 -> loss 0
    scores = jnp.asarray([[5.0, -5.0], [-5.0, 5.0]])
    labels = jnp.asarray([0, 1])
    assert float(L.hinge_loss(scores, labels)) == 0.0
    # violating sample contributes
    scores2 = jnp.asarray([[0.0, 0.0]])
    assert float(L.hinge_loss(scores2, jnp.asarray([0]))) == 2.0 / 1


def test_accuracy_with_ignore():
    scores = jnp.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    labels = jnp.asarray([0, 0, 1])
    np.testing.assert_allclose(L.accuracy(scores, labels), 1.0 / 3)
    np.testing.assert_allclose(
        L.accuracy(scores, labels, ignore_label=1), 0.5)


def test_lstm_and_rnn_shapes(rng):
    T, N, D, H = 4, 2, 3, 5
    x = jnp.asarray(rng.randn(T, N, D), jnp.float32)
    lp = {"wx": jnp.asarray(rng.randn(D, 4 * H), jnp.float32) * 0.1,
          "wh": jnp.asarray(rng.randn(H, 4 * H), jnp.float32) * 0.1,
          "b": jnp.zeros(4 * H)}
    hs, (hT, cT) = L.lstm(x, lp)
    assert hs.shape == (T, N, H) and hT.shape == (N, H)
    np.testing.assert_allclose(hs[-1], hT)

    rp = {"wx": jnp.asarray(rng.randn(D, H), jnp.float32) * 0.1,
          "wh": jnp.asarray(rng.randn(H, H), jnp.float32) * 0.1,
          "b": jnp.zeros(H)}
    hs2, hT2 = L.rnn(x, rp)
    assert hs2.shape == (T, N, H)
    np.testing.assert_allclose(hs2[-1], hT2)


def test_lstm_matches_torch(rng):
    import torch
    T, N, D, H = 3, 2, 4, 5
    x = rng.randn(T, N, D).astype(np.float32)
    cell = torch.nn.LSTM(D, H)
    with torch.no_grad():
        w_ih = cell.weight_ih_l0.numpy()   # [4H, D] order i, f, g, o
        w_hh = cell.weight_hh_l0.numpy()
        b = (cell.bias_ih_l0 + cell.bias_hh_l0).numpy()
    ref, _ = cell(torch.from_numpy(x))
    ref = ref.detach().numpy()

    # torch gate order (i, f, g, o) -> ours (i, f, o, g)
    def reorder(w):
        i, f, g, o = np.split(w, 4, axis=0)
        return np.concatenate([i, f, o, g], axis=0)

    lp = {"wx": jnp.asarray(reorder(w_ih).T),
          "wh": jnp.asarray(reorder(w_hh).T),
          "b": jnp.asarray(reorder(b[:, None])[:, 0])}
    hs, _ = L.lstm(jnp.asarray(x), lp)
    np.testing.assert_allclose(np.asarray(hs), ref, atol=1e-5)


def test_registry():
    assert L.get_layer("ReLU") is L.relu
    assert L.get_layer("Eltwise") is L.eltwise
    with pytest.raises(KeyError):
        L.get_layer("NoSuchLayer")

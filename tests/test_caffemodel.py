"""Caffemodel wire-format parsing + layout mapping, cross-checked against
torch's NCHW convolution as an independent oracle."""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.io import caffemodel as CM


# --- minimal independent wire encoder (test fixture only) -------------------

def varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def tag(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def len_field(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + varint(len(payload)) + payload


def encode_blob(arr: np.ndarray) -> bytes:
    shape_payload = len_field(1, b"".join(varint(d) for d in arr.shape))
    data = arr.astype("<f4").tobytes()
    return len_field(7, shape_payload) + len_field(5, data)


def encode_layer(name: str, blobs, *, v1: bool = False) -> bytes:
    nf, bf = (4, 6) if v1 else (1, 7)
    payload = len_field(nf, name.encode())
    for b in blobs:
        payload += len_field(bf, encode_blob(b))
    return payload


def encode_net(layers, *, v1: bool = False) -> bytes:
    field = 2 if v1 else 100
    out = len_field(1, b"testnet")
    for name, blobs in layers:
        out += len_field(field, encode_layer(name, blobs, v1=v1))
    return out


# ---------------------------------------------------------------------------

@pytest.mark.parametrize("v1", [False, True])
def test_parse_roundtrip(tmp_path, v1, rng):
    w = rng.randn(8, 3, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    fc = rng.randn(10, 32).astype(np.float32)
    path = tmp_path / "net.caffemodel"
    path.write_bytes(encode_net(
        [("conv1", [w, b]), ("fc", [fc])], v1=v1))
    out = CM.parse_caffemodel(str(path))
    assert set(out) == {"conv1", "fc"}
    np.testing.assert_array_equal(out["conv1"][0], w)
    np.testing.assert_array_equal(out["conv1"][1], b)
    np.testing.assert_array_equal(out["fc"][0], fc)


def test_parse_legacy_dims(tmp_path, rng):
    """Blobs with num/channels/height/width instead of shape."""
    w = rng.randn(4, 2, 3, 3).astype(np.float32)
    legacy = (tag(1, 0) + varint(4) + tag(2, 0) + varint(2)
              + tag(3, 0) + varint(3) + tag(4, 0) + varint(3)
              + len_field(5, w.astype("<f4").tobytes()))
    payload = len_field(100, len_field(1, b"c") + len_field(7, legacy))
    path = tmp_path / "legacy.caffemodel"
    path.write_bytes(payload)
    out = CM.parse_caffemodel(str(path))
    np.testing.assert_array_equal(out["c"][0], w)


def test_conv_layout_matches_torch(rng):
    """OIHW->HWIO transposed weights through our NHWC conv == torch NCHW."""
    import torch
    import torch.nn.functional as F
    from mscnn_tpu.ops import conv as C

    x = rng.randn(1, 3, 8, 10).astype(np.float32)     # NCHW
    w = rng.randn(5, 3, 3, 3).astype(np.float32)      # OIHW
    b = rng.randn(5).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), padding=1).numpy()  # NCHW

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    w_hwio = jnp.asarray(CM._conv_to_hwio(w))
    y = C.conv2d(x_nhwc, w_hwio, jnp.asarray(b), padding=1)
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, atol=1e-4)


def test_deconv_layout_matches_torch(rng):
    """Grouped bilinear deconv kernel mapping vs torch conv_transpose2d."""
    import torch
    import torch.nn.functional as F
    from mscnn_tpu.ops import conv as C

    ch = 6
    x = rng.randn(1, ch, 5, 7).astype(np.float32)
    w = rng.randn(ch, 1, 4, 4).astype(np.float32)     # [C, 1, kh, kw] grouped
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             stride=2, padding=1, groups=ch).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    w_dw = jnp.asarray(CM._deconv_to_depthwise(w))
    y = C.deconv2d(x_nhwc, w_dw, stride=2, pad=1, groups=ch)
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, atol=1e-4)


def test_fc_after_pool_reorder(rng):
    """NCHW-flatten FC weights re-ordered for NHWC flatten: both paths give
    the same output on the same underlying activation."""
    c, s, out_dim = 4, 3, 6
    act = rng.randn(1, c, s, s).astype(np.float32)    # NCHW activation
    w = rng.randn(out_dim, c * s * s).astype(np.float32)
    ref = w @ act.reshape(-1)

    act_nhwc = np.transpose(act, (0, 2, 3, 1)).reshape(-1)
    w_reordered = CM._fc_after_pool(w, (s, c))
    np.testing.assert_allclose(act_nhwc @ w_reordered, ref, atol=1e-4)


def test_fc_after_pool_rectangular(rng):
    """(h, w, c) geometry entries handle non-square spatial blobs."""
    c, h, wd, out_dim = 3, 2, 5, 6
    act = rng.randn(1, c, h, wd).astype(np.float32)
    w = rng.randn(out_dim, c * h * wd).astype(np.float32)
    ref = w @ act.reshape(-1)

    act_nhwc = np.transpose(act, (0, 2, 3, 1)).reshape(-1)
    w_reordered = CM._fc_after_pool(w, (h, wd, c))
    np.testing.assert_allclose(act_nhwc @ w_reordered, ref, atol=1e-4)
    back = CM._fc_after_pool_inverse(w_reordered, (h, wd, c))
    np.testing.assert_array_equal(back, w)


def test_load_caffemodel_params(tmp_path, rng):
    from mscnn_tpu.utils import fillers

    w = rng.randn(16, 3, 3, 3).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    bad = rng.randn(9, 3, 3, 3).astype(np.float32)     # wrong out channels
    path = tmp_path / "m.caffemodel"
    path.write_bytes(encode_net(
        [("conv1_1", [w, b]), ("conv1_2", [bad, b[:9]])]))

    params = {
        "conv1_1": {"w": jnp.zeros((3, 3, 3, 16)), "b": jnp.zeros(16)},
        "conv1_2": {"w": jnp.zeros((3, 3, 3, 16)), "b": jnp.zeros(16)},
        "fresh": {"w": jnp.ones((4, 4))},
    }
    out, report = CM.load_caffemodel_params(str(path), params)
    assert report["copied"] == ["conv1_1"]
    assert ("conv1_2" in [m[0] for m in report["mismatched"]])
    assert report["skipped"] == ["fresh"]
    np.testing.assert_allclose(out["conv1_1"]["w"],
                               CM._conv_to_hwio(w), atol=1e-6)
    np.testing.assert_allclose(out["conv1_1"]["b"], b, atol=1e-6)
    np.testing.assert_allclose(out["conv1_2"]["w"], 0.0)  # kept template


# --- export + round-trip -----------------------------------------------------

def _assert_params_equal(a, b):
    assert set(a) == set(b)
    for name in a:
        assert set(a[name]) == set(b[name]), name
        for k in a[name]:
            np.testing.assert_array_equal(
                np.asarray(a[name][k]), np.asarray(b[name][k]),
                err_msg=f"{name}/{k}")


def test_fc_after_pool_inverse(rng):
    s, c, out_dim = 5, 8, 6
    w = rng.randn(s * s * c, out_dim).astype(np.float32)
    back = CM._fc_after_pool(CM._fc_after_pool_inverse(w, (s, c)), (s, c))
    np.testing.assert_array_equal(back, w)


@pytest.mark.parametrize("zoo_name", ["kitti_car/mscnn-8s-768-trainval"])
def test_save_load_roundtrip_model(tmp_path, zoo_name):
    """save_caffemodel -> load_caffemodel_params is bit-exact for the
    flagship (8s-768) config — pins the OIHW<->HWIO / FC transposes
    against each other on the real layer inventory."""
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    cfg = zoo.get(zoo_name, deploy=True)
    # shape-faithful params without the (CPU-slow) real initializers
    shapes = jax.eval_shape(lambda k: M.init_params(k, cfg),
                            jax.random.key(0))
    cheap = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(cheap.standard_normal(s.shape), s.dtype),
        shapes)
    path = tmp_path / "snap.caffemodel"
    n = CM.save_caffemodel(params, str(path))
    assert n == sum(1 for p in params.values() if "w" in p)

    zero = jax.tree.map(jnp.zeros_like, params)
    out, report = CM.load_caffemodel_params(str(path), zero)
    assert not report["mismatched"], report["mismatched"]
    assert not report["skipped"]
    _assert_params_equal(out, params)


def test_save_load_roundtrip_deconv(tmp_path, rng):
    """Depthwise-deconv (conv4_3_2x) export/import round trip, plus wire
    layout check: the on-disk kernel must be Caffe's grouped [C,1,kh,kw]."""
    params = {
        "conv4_3_2x": {"w": jnp.asarray(rng.randn(4, 4, 1, 12), jnp.float32)},
        "conv5_1": {"w": jnp.asarray(rng.randn(3, 3, 12, 8), jnp.float32),
                    "b": jnp.asarray(rng.randn(8), jnp.float32)},
    }
    path = tmp_path / "dw.caffemodel"
    CM.save_caffemodel(params, str(path))
    wire = CM.parse_caffemodel(str(path))["conv4_3_2x"][0]
    assert wire.shape == (12, 1, 4, 4)
    zero = jax.tree.map(jnp.zeros_like, params)
    out, report = CM.load_caffemodel_params(str(path), zero)
    assert not report["mismatched"]
    _assert_params_equal(out, params)


def test_save_load_roundtrip_cascade(tmp_path):
    from mscnn_tpu.models import cascade as CC
    from mscnn_tpu.models import zoo

    ccfg = CC.CascadeConfig(base=zoo.tiny_test_config())
    params = CC.init_params(jax.random.key(0), ccfg)
    path = tmp_path / "casc.caffemodel"
    CM.save_caffemodel(params, str(path))
    zero = jax.tree.map(jnp.zeros_like, params)
    out, report = CM.load_caffemodel_params(str(path), zero)
    assert not report["mismatched"], report["mismatched"]
    _assert_params_equal(out, params)


def test_save_load_roundtrip_fc_after_pool(tmp_path, rng):
    """Round trip through the NCHW-flatten FC convention: export with
    fc_after_pool emits reference-layout weights, import restores ours."""
    s, c, out_dim = 5, 16, 12
    params = {"fc6": {"w": jnp.asarray(rng.randn(s * s * c, out_dim),
                                       jnp.float32),
                      "b": jnp.asarray(rng.randn(out_dim), jnp.float32)}}
    fap = {"fc6": (s, c)}
    path = tmp_path / "fc.caffemodel"
    CM.save_caffemodel(params, str(path), fc_after_pool=fap)
    # on the wire the weight must be in the reference's [out, C*S*S] layout
    wire = CM.parse_caffemodel(str(path))["fc6"][0]
    assert wire.shape == (out_dim, c * s * s)
    zero = jax.tree.map(jnp.zeros_like, params)
    out, report = CM.load_caffemodel_params(str(path), zero, fc_after_pool=fap)
    assert not report["mismatched"]
    _assert_params_equal(out, params)


def test_solverstate_roundtrip(tmp_path):
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    from mscnn_tpu.train import solver as S

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    spec = S.SolverSpec(type="sgd", base_lr=0.01, lr_policy="fixed",
                        momentum=0.9)
    state = S.init_state(params, spec)
    # give the history distinguishable values + a nonzero iteration
    state["h1"] = jax.tree.map(
        lambda p: jnp.asarray(np.random.default_rng(0)
                              .standard_normal(p.shape), p.dtype),
        state["h1"])
    state["it"] = jnp.asarray(1234, jnp.int32)

    path = tmp_path / "snap.solverstate"
    CM.save_solverstate(state, str(path), learned_net="snap.caffemodel")
    parsed = CM.parse_solverstate(str(path))
    assert parsed["iter"] == 1234
    assert parsed["learned_net"] == "snap.caffemodel"

    template = {"it": jnp.zeros((), jnp.int32),
                "h1": jax.tree.map(jnp.zeros_like, state["h1"])}
    restored, it = CM.load_solverstate_history(str(path), template)
    assert it == 1234
    _assert_params_equal(restored["h1"], state["h1"])


def test_fc_after_pool_inferred_by_default(tmp_path, rng):
    """Full MS-CNN snapshots apply the fc6 NCHW-flatten permutation
    WITHOUT the caller passing fc_after_pool: the mapping is inferred from
    roi_c1*/fc6* shapes, so reference snapshots import unscrambled and our
    exports feed the reference correctly."""
    s, c, out_dim = 5, 512, 48
    params = {
        "roi_c1": {"w": jnp.asarray(rng.randn(3, 3, 2 * c, c) * 0.1,
                                    jnp.float32),
                   "b": jnp.zeros(c)},
        "fc6": {"w": jnp.asarray(rng.randn(s * s * c, out_dim) * 0.1,
                                 jnp.float32),
                "b": jnp.zeros(out_dim)},
    }
    inferred = CM.infer_fc_after_pool(params)
    assert inferred == {"fc6": (s, c)}
    path = tmp_path / "m.caffemodel"
    CM.save_caffemodel(params, str(path))          # default: inferred
    back, rep = CM.load_caffemodel_params(str(path), params)  # default too
    np.testing.assert_allclose(np.asarray(back["fc6"]["w"]),
                               np.asarray(params["fc6"]["w"]), atol=1e-6)
    # disabling the mapping on ONE side scrambles fc6 -> proves the
    # permutation is real, not an identity
    scrambled, _ = CM.load_caffemodel_params(str(path), params,
                                             fc_after_pool={})
    assert not np.allclose(np.asarray(scrambled["fc6"]["w"]),
                           np.asarray(params["fc6"]["w"]))


def test_solverstate_current_step_field(tmp_path):
    state = {"it": jnp.asarray(120, jnp.int32),
             "h1": {"conv": {"w": jnp.zeros((3, 3, 2, 4)),
                             "b": jnp.zeros(4)}}}
    path = tmp_path / "s.solverstate"
    CM.save_solverstate(state, str(path), current_step=3)
    parsed = CM.parse_solverstate(str(path))
    assert parsed["iter"] == 120
    assert parsed["current_step"] == 3


# --- HDF5 snapshot variant ---------------------------------------------------

def test_hdf5_weights_roundtrip(tmp_path):
    """save_hdf5_weights -> load_hdf5_weights is bit-exact on the flagship
    inventory and the file matches Caffe's Net::ToHDF5 layout
    (/data/<layer>/<param_id>)."""
    import h5py
    from mscnn_tpu.io import hdf5_snapshot as H5
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    cfg = zoo.get("kitti_car/mscnn-8s-768-trainval", deploy=True)
    shapes = jax.eval_shape(lambda k: M.init_params(k, cfg),
                            jax.random.key(0))
    cheap = np.random.default_rng(1)
    params = jax.tree.map(
        lambda s: jnp.asarray(cheap.standard_normal(s.shape), s.dtype),
        shapes)
    path = str(tmp_path / "w.caffemodel.h5")
    n = H5.save_hdf5_weights(params, path)
    assert n == sum(1 for p in params.values() if "w" in p)

    with h5py.File(path, "r") as f:
        assert "data" in f
        assert "conv3_1" in f["data"] and "0" in f["data"]["conv3_1"]
        # caffe blob layout on disk: OIHW
        w_disk = np.asarray(f["data"]["conv3_1"]["0"])
        assert w_disk.shape == tuple(
            np.asarray(params["conv3_1"]["w"]).shape[i]
            for i in (3, 2, 0, 1))

    zero = jax.tree.map(jnp.zeros_like, params)
    out, report = H5.load_hdf5_weights(path, zero)
    assert not report["mismatched"], report["mismatched"]
    assert not report["skipped"]
    _assert_params_equal(out, params)


def test_hdf5_matches_binaryproto(tmp_path):
    """The two snapshot formats load to identical pytrees (same layout
    transposers under both)."""
    from mscnn_tpu.io import hdf5_snapshot as H5
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(3), cfg)
    p_bp = str(tmp_path / "a.caffemodel")
    p_h5 = str(tmp_path / "a.caffemodel.h5")
    CM.save_caffemodel(params, p_bp)
    H5.save_hdf5_weights(params, p_h5)
    zero = jax.tree.map(jnp.zeros_like, params)
    a, _ = CM.load_caffemodel_params(p_bp, zero)
    b, _ = H5.load_hdf5_weights(p_h5, zero)
    _assert_params_equal(a, b)


def test_hdf5_solverstate_roundtrip(tmp_path):
    """HDF5 .solverstate.h5: iter/current_step/history round-trip with the
    caffe dataset layout (iter + history/<i>)."""
    import h5py
    from mscnn_tpu.io import hdf5_snapshot as H5
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    from mscnn_tpu.train import solver as S

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(4), cfg)
    sspec = S.SolverSpec(type="sgd", momentum=0.9)
    state = S.init_state(params, sspec)
    state = dict(state)
    state["it"] = jnp.asarray(123, jnp.int32)
    rng = np.random.default_rng(5)
    state["h1"] = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape), x.dtype),
        state["h1"])

    path = str(tmp_path / "s.solverstate.h5")
    H5.save_hdf5_solverstate(state, path, learned_net="model.h5",
                             current_step=2)
    with h5py.File(path, "r") as f:
        assert int(np.asarray(f["iter"]).reshape(-1)[0]) == 123
        assert int(np.asarray(f["current_step"]).reshape(-1)[0]) == 2
        assert len(f["history"]) > 0

    template = S.init_state(params, sspec)
    restored, it = H5.load_hdf5_solverstate(path, template)
    assert it == 123
    _assert_params_equal(restored["h1"], state["h1"])


def test_restore_params_dispatches_hdf5(tmp_path):
    from mscnn_tpu.io import checkpoint as CKPT
    from mscnn_tpu.io import hdf5_snapshot as H5
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(6), cfg)
    path = str(tmp_path / "w.caffemodel.h5")
    H5.save_hdf5_weights(params, path)
    out = CKPT.restore_params(path, jax.tree.map(jnp.zeros_like, params))
    _assert_params_equal(out, params)


def test_recurrent_caffemodel_roundtrip(tmp_path):
    """LSTM/RNN blob interop: W_xc/b/W_hc in the reference's transposed
    layout (recurrent_layer.cpp) round-trip through save -> load via the
    net_layout_hints recurrent map."""
    import jax

    from mscnn_tpu.models.netbuilder import Net

    text = '''
layer { name: "x" type: "Input" top: "x"
  input_param { shape { dim: 4 dim: 2 dim: 3 } } }
layer { name: "lstm" type: "LSTM" bottom: "x" top: "h"
  recurrent_param { num_output: 5
    weight_filler { type: "uniform" min: -1 max: 1 } } }
'''
    net = Net(text)
    params = net.init(jax.random.key(0))
    hints = CM.net_layout_hints(net)
    assert hints["recurrent"] == {"lstm": "LSTM"}

    path = str(tmp_path / "r.caffemodel")
    n = CM.save_caffemodel(params, path, recurrent=hints["recurrent"])
    assert n == 1
    # on-disk blobs are in Caffe layout: W_xc [4H, D]
    blobs = CM.parse_caffemodel(path)
    assert blobs["lstm"][0].shape == (20, 3)
    assert blobs["lstm"][1].shape == (20,)
    assert blobs["lstm"][2].shape == (20, 5)

    # perturb then restore: load(save(x)) == x
    zeroed = {"lstm": {k: np.zeros_like(v)
                       for k, v in params["lstm"].items()}}
    back, report = CM.load_caffemodel_params(
        path, zeroed, fc_after_pool={}, recurrent=hints["recurrent"])
    assert report["copied"] == ["lstm"] and not report["mismatched"]
    for k in ("wx", "b", "wh"):
        np.testing.assert_array_equal(np.asarray(back["lstm"][k]),
                                      np.asarray(params["lstm"][k]))


def test_rnn_caffemodel_roundtrip_and_autodetect(tmp_path):
    """Caffe RNN has 5 blobs (W_xh, b_h, W_hh, W_ho, b_o —
    rnn_layer.cpp FillUnrolledNet) and recurrent pytrees are
    self-identifying: no hints dict needed on either save or load."""
    import jax

    from mscnn_tpu.models.netbuilder import Net

    text = '''
layer { name: "x" type: "Input" top: "x"
  input_param { shape { dim: 4 dim: 2 dim: 3 } } }
layer { name: "rnn" type: "RNN" bottom: "x" top: "o"
  recurrent_param { num_output: 5
    weight_filler { type: "uniform" min: -1 max: 1 } } }
'''
    net = Net(text)
    params = net.init(jax.random.key(0))
    path = str(tmp_path / "r.caffemodel")
    # NO recurrent hint passed anywhere:
    n = CM.save_caffemodel(params, path)
    assert n == 1
    blobs = CM.parse_caffemodel(path)
    shapes = [b.shape for b in blobs["rnn"]]
    assert shapes == [(5, 3), (5,), (5, 5), (5, 5), (5,)]

    zeroed = {"rnn": {k: np.zeros_like(v)
                      for k, v in params["rnn"].items()}}
    back, report = CM.load_caffemodel_params(path, zeroed, fc_after_pool={})
    assert report["copied"] == ["rnn"] and not report["mismatched"]
    for k in ("wx", "b", "wh", "wo", "bo"):
        np.testing.assert_array_equal(np.asarray(back["rnn"][k]),
                                      np.asarray(params["rnn"][k]))


def test_solverstate_roundtrip_recurrent(tmp_path):
    """Solver history for recurrent layers round-trips through the
    SolverState wire format (positional blobs, transposed weights)."""
    rng = np.random.RandomState(0)
    h1 = {"lstm": {"wx": rng.randn(3, 20).astype(np.float32),
                   "b": rng.randn(20).astype(np.float32),
                   "wh": rng.randn(5, 20).astype(np.float32)},
          "ip": {"w": rng.randn(6, 4).astype(np.float32),
                 "b": rng.randn(4).astype(np.float32)}}
    state = {"it": np.int32(17), "h1": h1}
    path = str(tmp_path / "s.solverstate")
    CM.save_solverstate(state, path)
    template = {"it": np.int32(0),
                "h1": {k: {kk: np.zeros_like(vv)
                           for kk, vv in v.items()}
                       for k, v in h1.items()}}
    back, it = CM.load_solverstate_history(path, template, fc_after_pool={})
    assert it == 17
    for lname, leaves in h1.items():
        for k, v in leaves.items():
            np.testing.assert_allclose(
                np.asarray(back["h1"][lname][k]), v, rtol=1e-6)


def test_batchnorm_import_divides_by_scale_factor(tmp_path):
    """Caffe stores BatchNorm running stats as SUMS plus an accumulated
    scale factor in blobs[2]; Forward divides by it
    (batch_norm_layer.cpp:98-105). Import must apply the same division."""
    c = 6
    mean_sum = np.arange(c, dtype=np.float32) * 4.0
    var_sum = (np.arange(c, dtype=np.float32) + 1.0) * 4.0
    factor = np.array([4.0], np.float32)
    path = tmp_path / "bn.caffemodel"
    path.write_bytes(encode_net([("bn1", [mean_sum, var_sum, factor])]))

    params = {"bn1": {"mean": jnp.zeros(c), "var": jnp.ones(c)}}
    out, report = CM.load_caffemodel_params(str(path), params)
    assert report["copied"] == ["bn1"]
    np.testing.assert_allclose(np.asarray(out["bn1"]["mean"]),
                               mean_sum / 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["bn1"]["var"]),
                               var_sum / 4.0, rtol=1e-6)

    # zero factor -> zeroed stats, the reference's guard
    path2 = tmp_path / "bn0.caffemodel"
    path2.write_bytes(encode_net(
        [("bn1", [mean_sum, var_sum, np.zeros(1, np.float32)])]))
    out, _ = CM.load_caffemodel_params(str(path2), params)
    np.testing.assert_array_equal(np.asarray(out["bn1"]["mean"]),
                                  np.zeros(c))


def test_save_load_roundtrip_bn_prelu_scale(tmp_path, rng):
    """BatchNorm / PReLU / Scale / Bias-only pytrees survive the
    caffemodel round trip (previously silently dropped on export and
    left untouched on import)."""
    c = 5
    params = {
        "bn1": {"mean": jnp.asarray(rng.randn(c).astype(np.float32)),
                "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)},
        "prelu1": {"slope": jnp.asarray(
            rng.rand(c).astype(np.float32) * 0.5)},
        "scale1": {"w": jnp.asarray(rng.randn(c).astype(np.float32)),
                   "b": jnp.asarray(rng.randn(c).astype(np.float32))},
        "bias1": {"b": jnp.asarray(rng.randn(c).astype(np.float32))},
    }
    path = tmp_path / "aux.caffemodel"
    n = CM.save_caffemodel(params, str(path))
    assert n == 4

    zero = jax.tree.map(jnp.zeros_like, params)
    out, report = CM.load_caffemodel_params(str(path), zero)
    assert sorted(report["copied"]) == sorted(params)
    assert not report["mismatched"]
    for lname, leaves in params.items():
        for k, v in leaves.items():
            np.testing.assert_allclose(
                np.asarray(out[lname][k]), np.asarray(v), rtol=1e-6,
                err_msg=f"{lname}.{k}")

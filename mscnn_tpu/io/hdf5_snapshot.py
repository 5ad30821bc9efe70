"""HDF5 snapshot variant (the reference's `snapshot_format: HDF5`).

Layout mirrors Caffe exactly so files interoperate both ways:

  weights  (`Net::ToHDF5`, net.cpp:868-922):
      /data/<layer_name>/<param_id>   float datasets in CAFFE blob layout
      (optional /diff/... is read-ignored here and never written)
  solver state  (`SGDSolver::SnapshotSolverStateToHDF5`,
  sgd_solver.cpp:279-302 + util/hdf5.cpp int/string helpers):
      /iter          [1] int32 dataset
      /learned_net   string dataset
      /current_step  [1] int32 dataset
      /history/<i>   float datasets, learnable-param order

Layout transposition reuses io.caffemodel's mappers (OIHW<->HWIO,
grouped<->depthwise deconv, NCHW<->NHWC FC flatten), so the two snapshot
formats are interchangeable bit-for-bit on the same pytree.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from mscnn_tpu.io import caffemodel as CM


def save_hdf5_weights(params, path: str, *,
                      deconv_names=("conv4_3_2x",),
                      fc_after_pool: Optional[dict] = None) -> int:
    """params pytree -> Caffe Net::ToHDF5 file. Returns layers written."""
    import h5py

    if fc_after_pool is None:
        fc_after_pool = CM.infer_fc_after_pool(params)
    n = 0
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for name, _ltype, blobs in CM._iter_layer_blobs(
                params, deconv_names, fc_after_pool):
            g = data.create_group(name)
            for i, blob in enumerate(blobs):
                g.create_dataset(str(i), data=np.asarray(blob, np.float32))
            n += 1
    return n


def load_hdf5_weights(path: str, params, *,
                      deconv_names=("conv4_3_2x",),
                      fc_after_pool: Optional[dict] = None):
    """Caffe HDF5 weight file -> params pytree by layer name
    (CopyTrainedLayersFromHDF5 semantics, net.cpp:795-838: layers present
    in both are overwritten, others kept). Returns (params, report)."""
    import jax.numpy as jnp

    import h5py

    if fc_after_pool is None:
        fc_after_pool = CM.infer_fc_after_pool(params)
    out = {}
    report = {"copied": [], "skipped": [], "mismatched": []}
    with h5py.File(path, "r") as f:
        data = f["data"]
        for name, p in params.items():
            if name not in data or "0" not in data[name]:
                out[name] = p
                report["skipped"].append(name)
                continue
            g = data[name]
            w = np.asarray(g["0"], np.float32)
            new = dict(p)
            try:
                if "wx" in p:
                    # recurrent pytrees are self-identifying; blob order
                    # and transposes as in CM.load_caffemodel_params
                    # (LSTM W_xc, b_c, W_hc; RNN W_xh, b_h, W_hh, W_ho,
                    # b_o — recurrent_layer.cpp FillUnrolledNet)
                    pairs = [("wx", True), ("b", False), ("wh", True)]
                    if "wo" in p:
                        pairs += [("wo", True), ("bo", False)]
                    if any(str(i) not in g for i in range(len(pairs))):
                        raise ValueError(
                            f"{len(g)} blobs for recurrent layer "
                            f"(expected {len(pairs)})")
                    for i, (key, transpose) in enumerate(pairs):
                        blob = np.asarray(g[str(i)], np.float32)
                        b_arr = blob.T if transpose else blob.reshape(-1)
                        target = np.asarray(p[key])
                        if b_arr.shape != target.shape:
                            raise ValueError(
                                f"{key}: {b_arr.shape} vs {target.shape}")
                        new[key] = jnp.asarray(
                            np.ascontiguousarray(b_arr), target.dtype)
                    out[name] = new
                    report["copied"].append(name)
                    continue
                if "w" in p:
                    target = np.asarray(p["w"])
                    if w.ndim == 4 and name in deconv_names:
                        wt = CM._deconv_import(w, target.shape)
                    elif w.ndim == 4:
                        wt = CM._conv_to_hwio(w)
                    elif w.ndim == 2 and name in fc_after_pool:
                        wt = CM._fc_after_pool(w, fc_after_pool[name])
                    elif w.ndim == 2:
                        wt = CM._fc_to_in_out(w)
                    else:
                        raise ValueError(f"blob rank {w.ndim}")
                    if wt.shape != target.shape:
                        raise ValueError(f"{wt.shape} vs {target.shape}")
                    new["w"] = jnp.asarray(wt, target.dtype)
                if "b" in p and "1" in g:
                    b = np.asarray(g["1"], np.float32).reshape(-1)
                    tb = np.asarray(p["b"])
                    if b.shape != tb.shape:
                        raise ValueError(f"bias {b.shape} vs {tb.shape}")
                    new["b"] = jnp.asarray(b, tb.dtype)
                out[name] = new
                report["copied"].append(name)
            except ValueError as e:
                out[name] = p
                report["mismatched"].append((name, str(e)))
    return out, report


def save_hdf5_solverstate(state, path: str, *, learned_net: str = "",
                          current_step: int = 0,
                          deconv_names=("conv4_3_2x",),
                          fc_after_pool: Optional[dict] = None) -> int:
    """Solver-state pytree -> Caffe HDF5 .solverstate.h5. Returns the
    number of history blobs written."""
    import h5py

    if fc_after_pool is None:
        fc_after_pool = CM.infer_fc_after_pool(state["h1"])
    it = int(np.asarray(state["it"]))
    n = 0
    with h5py.File(path, "w") as f:
        f.create_dataset("iter", data=np.asarray([it], np.int32))
        f.create_dataset("learned_net", data=np.bytes_(learned_net))
        f.create_dataset("current_step",
                         data=np.asarray([current_step], np.int32))
        hist = f.create_group("history")
        for name, _ltype, blobs in CM._iter_layer_blobs(
                state["h1"], deconv_names, fc_after_pool):
            for blob in blobs:
                hist.create_dataset(str(n),
                                    data=np.asarray(blob, np.float32))
                n += 1
    return n


def load_hdf5_solverstate(path: str, state_template, *,
                          deconv_names=("conv4_3_2x",),
                          fc_after_pool: Optional[dict] = None):
    """Caffe HDF5 .solverstate.h5 -> our solver-state pytree (positional
    history blobs mapped in learnable-param order, like
    RestoreSolverStateFromHDF5). Returns (state, iter)."""
    import jax.numpy as jnp

    import h5py

    if fc_after_pool is None:
        fc_after_pool = CM.infer_fc_after_pool(state_template["h1"])
    with h5py.File(path, "r") as f:
        it = int(np.asarray(f["iter"]).reshape(-1)[0])
        hist_g = f["history"]
        hist = [np.asarray(hist_g[str(i)], np.float32)
                for i in range(len(hist_g))]

    h1 = {}
    for name, p in state_template["h1"].items():
        new = dict(p)
        if "wx" in p:
            # recurrent history blobs mirror the weight blob order/layout
            # (W_xh/W_xc first, transposed — see CM._iter_layer_blobs)
            pairs = [("wx", True), ("b", False), ("wh", True)]
            if "wo" in p:
                pairs += [("wo", True), ("bo", False)]
            if len(hist) < len(pairs):
                raise ValueError("HDF5 solverstate has fewer history "
                                 "blobs than the template expects")
            for key, transpose in pairs:
                blob = hist.pop(0)
                b_arr = blob.T if transpose else blob.reshape(-1)
                target = np.asarray(p[key])
                if b_arr.shape != target.shape:
                    raise ValueError(
                        f"{name}.{key}: {b_arr.shape} vs {target.shape}")
                new[key] = jnp.asarray(np.ascontiguousarray(b_arr),
                                       target.dtype)
            h1[name] = new
            continue
        if "w" in p:
            if not hist:
                raise ValueError("HDF5 solverstate has fewer history "
                                 "blobs than the template expects")
            w = hist.pop(0)
            target = np.asarray(p["w"])
            if w.ndim == 4 and name in deconv_names:
                wt = CM._deconv_import(w, target.shape)
            elif w.ndim == 4:
                wt = CM._conv_to_hwio(w)
            elif w.ndim == 2 and name in fc_after_pool:
                wt = CM._fc_after_pool(w, fc_after_pool[name])
            elif w.ndim == 2:
                wt = CM._fc_to_in_out(w)
            else:
                raise ValueError(f"history blob rank {w.ndim}")
            if wt.shape != target.shape:
                raise ValueError(f"{name}: {wt.shape} vs {target.shape}")
            new["w"] = jnp.asarray(wt, target.dtype)
            if "b" in p:
                if not hist:
                    raise ValueError("HDF5 solverstate has fewer history "
                                     "blobs than the template expects")
                b = hist.pop(0).reshape(-1)
                new["b"] = jnp.asarray(b, np.asarray(p["b"]).dtype)
        h1[name] = new
    state = dict(state_template)
    state["h1"] = h1
    state["it"] = jnp.asarray(it, jnp.int32)
    return state, it

"""Checkpoint / resume / warm-start (the Snapshot-Restore-CopyTrainedLayers
triple).

The reference snapshots `<prefix>_iter_N.caffemodel` (weights) +
`.solverstate` (iter, momentum history) and resumes via `Solver::Restore`
(/root/reference/src/caffe/solver.cpp:421-506); finetuning copies
layer-name-matched weights (`Net::CopyTrainedLayersFrom`, net.cpp:750-786).
Here both live in one orbax checkpoint of the train-state pytree
{"params": ..., "solver": {"it", "h1"[, "h2"]}}, saved asynchronously and
restored sharding-aware; warm-start is a name-matched pytree merge with the
same silent-skip semantics for missing layers and a shape check for
present ones.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(prefix: str, it: int) -> str:
    return os.path.abspath(f"{prefix}_iter_{it}")


def snapshot(prefix: str, train_state, it: Optional[int] = None) -> str:
    """Write `<prefix>_iter_N` (N from the solver state unless given)."""
    if it is None:
        it = int(jax.device_get(train_state["solver"]["it"]))
    path = _path(prefix, it)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, train_state, force=True)
    return path


def snapshot_caffemodel(prefix: str, train_state,
                        it: Optional[int] = None,
                        current_step: int = 0) -> str:
    """Write `<prefix>_iter_N.caffemodel` + `.solverstate` in the
    reference's binaryproto snapshot format (snapshot_format: BINARYPROTO;
    solver.cpp:403-419, sgd_solver.cpp:246-302) so reference tooling can
    consume our snapshots directly.  Returns the .caffemodel path."""
    from mscnn_tpu.io import caffemodel as CM

    if it is None:
        it = int(jax.device_get(train_state["solver"]["it"]))
    base = os.path.abspath(f"{prefix}_iter_{it}")
    params = jax.device_get(train_state["params"])
    CM.save_caffemodel(params, base + ".caffemodel")
    solver = jax.device_get(train_state["solver"])
    if "h1" in solver:
        CM.save_solverstate(solver, base + ".solverstate",
                            learned_net=os.path.basename(base) +
                            ".caffemodel",
                            current_step=current_step)
    return base + ".caffemodel"


def snapshot_hdf5(prefix: str, train_state, it: Optional[int] = None,
                  current_step: int = 0) -> str:
    """Write `<prefix>_iter_N.caffemodel.h5` + `.solverstate.h5` in the
    reference's HDF5 snapshot format (snapshot_format: HDF5;
    Net::ToHDF5 net.cpp:868 + sgd_solver.cpp:279-302).  Returns the
    .caffemodel.h5 path."""
    from mscnn_tpu.io import hdf5_snapshot as H5

    if it is None:
        it = int(jax.device_get(train_state["solver"]["it"]))
    base = os.path.abspath(f"{prefix}_iter_{it}")
    params = jax.device_get(train_state["params"])
    H5.save_hdf5_weights(params, base + ".caffemodel.h5")
    solver = jax.device_get(train_state["solver"])
    if "h1" in solver:
        H5.save_hdf5_solverstate(
            solver, base + ".solverstate.h5",
            learned_net=os.path.basename(base) + ".caffemodel.h5",
            current_step=current_step)
    return base + ".caffemodel.h5"


def restore(path: str, template_state):
    """Restore a full train state (params + solver history + iter)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template_state)


def _warn_mismatched(path: str, report: dict) -> None:
    """Surface shape-mismatched layers (which keep their template values —
    CopyTrainedLayersFrom semantics) instead of silently dropping the
    report: a layer left at random init is almost always a bug upstream."""
    if report.get("mismatched"):
        import warnings
        warnings.warn(
            f"{path}: {len(report['mismatched'])} layer(s) kept their "
            f"template values (shape/layout mismatch): "
            f"{report['mismatched']}")


def restore_params(path: str, template_params, layout_hints=None):
    """Restore only the params subtree of a snapshot (for eval/deploy).
    `.caffemodel` paths (ours or the reference's) dispatch to the wire
    importer; anything else is treated as an orbax train-state dir.
    layout_hints: a net_layout_hints() dict (fc_after_pool/deconv_names/
    recurrent) for structurally-correct caffemodel transposes — pass it
    whenever a built Net is at hand; without it the MS-CNN name heuristic
    applies."""
    if path.endswith(".caffemodel"):
        from mscnn_tpu.io import caffemodel as CM
        kw = {}
        if layout_hints:
            kw = {"fc_after_pool": layout_hints.get("fc_after_pool"),
                  "deconv_names": layout_hints.get(
                      "deconv_names", ("conv4_3_2x",)),
                  "recurrent": layout_hints.get("recurrent")}
        out, report = CM.load_caffemodel_params(path, template_params, **kw)
        _warn_mismatched(path, report)
        return out
    if path.endswith((".h5", ".hdf5")):
        from mscnn_tpu.io import hdf5_snapshot as H5
        kw = {}
        if layout_hints:
            kw = {"fc_after_pool": layout_hints.get("fc_after_pool"),
                  "deconv_names": layout_hints.get(
                      "deconv_names", ("conv4_3_2x",))}
        out, report = H5.load_hdf5_weights(path, template_params, **kw)
        _warn_mismatched(path, report)
        return out
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    return copy_trained_layers(template_params, restored["params"])


def copy_trained_layers(params, source, *, strict: bool = False):
    """Name-matched weight copy (CopyTrainedLayersFrom): layers present in
    both pytrees are taken from `source` when shapes agree; everything else
    keeps the target's values. With strict=True a shape mismatch raises
    (the reference CHECKs blob shapes, net.cpp:771-780)."""
    out = {}
    for name, leaf in params.items():
        if name not in source:
            out[name] = leaf
            continue
        src = source[name]
        if isinstance(leaf, dict):
            out[name] = copy_trained_layers(leaf, src, strict=strict)
        else:
            if np.shape(src) != np.shape(leaf):
                if strict:
                    raise ValueError(
                        f"shape mismatch for {name!r}: "
                        f"{np.shape(src)} vs {np.shape(leaf)}")
                out[name] = leaf
            else:
                out[name] = jax.numpy.asarray(src, leaf.dtype)
    return out


def latest_snapshot(prefix: str) -> Optional[str]:
    """Find the newest `<prefix>_iter_N` directory, or None."""
    d, base = os.path.split(os.path.abspath(prefix))
    if not os.path.isdir(d):
        return None
    best_it, best = -1, None
    for name in os.listdir(d):
        if name.startswith(base + "_iter_"):
            try:
                it = int(name[len(base) + 6:])
            except ValueError:
                continue
            if it > best_it:
                best_it, best = it, os.path.join(d, name)
    return best

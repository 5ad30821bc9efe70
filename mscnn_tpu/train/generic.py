"""Generic-net training: `mscnn train` on ANY classic prototxt.

The reference's `caffe train` accepts an arbitrary NetParameter — LeNet,
CaffeNet, autoencoders — not just MS-CNN nets (tools/caffe.cpp:103-233
drives Solver<float>::Solve over whatever net the solver names).  Here
MSCNN-typed nets route through the typed config path
(config/zoo_import.model_from_prototxt); everything else lands on this
module: the prototxt becomes a netbuilder.Net, its TRAIN-phase data layer
becomes a host batch source, `param` specs become lr/decay multiplier
pytrees, and one jitted value_and_grad + solver step trains it under the
same train/loop.solve machinery (same LR policies, snapshots, signals).

Data layers supported as batch sources: ImageData, HDF5Data, DummyData,
WindowData (R-CNN crop-warp sampling), MemoryData (programmatic only),
and `Data` over LMDB environments (io/lmdb.py pure-Python reader; a
LEVELDB-declared source that is actually LMDB — common in recycled
prototxts — is sniffed and accepted, true LevelDB is convert-first via
`mscnn convert_imageset`).  HDF5/NCHW arrays are transposed to the NHWC
activation layout on load.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.config import prototxt as PB
from mscnn_tpu.models import netbuilder as NB
from mscnn_tpu.train import solver as S
from mscnn_tpu.train.train_step import prune_frozen_params

DATA_LAYER_TYPES = NB.DATA_LAYER_TYPES


def find_data_layer(net: NB.Net) -> Optional[dict]:
    """The net's (phase-filtered) data layer message, if any."""
    for layer in net.layers:
        if str(layer.get("type")) in DATA_LAYER_TYPES:
            return layer
    return None


def _looks_like_lmdb(path: str) -> bool:
    """MDB_MAGIC (0xBEEFC0DE LE) at offset 16 of data.mdb — lets a
    misdeclared `backend: LEVELDB` that actually points at an LMDB env
    (common in recycled prototxts) still load."""
    import os
    p = os.path.join(path, "data.mdb") if os.path.isdir(path) else path
    try:
        with open(p, "rb") as f:
            head = f.read(20)
    except OSError:
        return False
    return head[16:20] == b"\xde\xc0\xef\xbe"


def _nchw_to_nhwc(a: np.ndarray) -> np.ndarray:
    return a.transpose(0, 2, 3, 1) if a.ndim == 4 else a


def make_batch_source(net: NB.Net, layer: dict, *, seed: int = 0,
                      train: bool = True, root_folder: str = "",
                      batch_size: Optional[int] = None
                      ) -> Callable[[], Dict]:
    """Host batch source for one data layer: () -> {top: np.ndarray}.

    Mirrors the reference data layers' parameters (image_data_layer.cpp,
    hdf5_data_layer.cpp, dummy_data_layer.cpp); images arrive NHWC.
    batch_size overrides the layer's own batch size (the CLI
    --batch-size flag; for DummyData it replaces every top's leading
    dim).
    """
    ltype = str(layer.get("type"))
    tops = [str(t) for t in PB.as_list(layer.get("top"))]

    if ltype == "ImageData":
        from mscnn_tpu.data import sources as SRC
        ip = layer.get("image_data_param", {})
        tp = layer.get("transform_param", {})
        mv = [float(v) for v in PB.as_list(tp.get("mean_value"))]
        tspec = SRC.TransformSpec(
            scale=float(tp.get("scale", 1.0)),
            mean_values=tuple(mv) if mv else None,
            crop_size=int(tp.get("crop_size", 0)),
            mirror=bool(tp.get("mirror", False)))
        ds = SRC.ImageListDataset(
            str(ip["source"]), batch_size or int(ip.get("batch_size", 1)),
            tspec,
            root_folder=str(ip.get("root_folder", root_folder)),
            # caffe.proto ImageDataParameter.shuffle default = false
            shuffle=bool(ip.get("shuffle", False)), seed=seed, train=train)

        def source():
            b = ds.next_batch()
            out = {tops[0]: b["image"]}
            if len(tops) > 1:
                out[tops[1]] = b["label"]
            return out

        return source

    if ltype == "HDF5Data":
        from mscnn_tpu.data import sources as SRC
        hp = layer.get("hdf5_data_param", {})
        with open(str(hp["source"])) as f:
            files = [ln.strip() for ln in f if ln.strip()]
        ds = SRC.HDF5Dataset(files,
                             batch_size or int(hp.get("batch_size", 1)),
                             shuffle=bool(hp.get("shuffle", False)),
                             seed=seed)

        def source():
            b = ds.next_batch()
            return {t: _nchw_to_nhwc(b[t]) for t in tops if t in b}

        return source

    if ltype == "DummyData":
        dp = layer.get("dummy_data_param", {})
        sh_list = PB.as_list(dp.get("shape"))
        fillers = PB.as_list(dp.get("data_filler"))
        shapes = []
        for ti in range(len(tops)):
            if sh_list:
                dims = [int(d) for d in PB.as_list(
                    sh_list[min(ti, len(sh_list) - 1)]["dim"])]
            else:  # legacy num/channels/height/width fields
                def leg(name):
                    vals = PB.as_list(dp.get(name))
                    return int(vals[min(ti, len(vals) - 1)]) if vals else 1
                dims = [leg("num"), leg("channels"),
                        leg("height"), leg("width")]
            if len(dims) == 4:
                n, c, h, w = dims
                shapes.append((n, h, w, c))
            else:
                shapes.append(tuple(dims))
        if batch_size:
            shapes = [(batch_size,) + tuple(sh[1:]) for sh in shapes]
        rng = np.random.RandomState(seed)

        def source():
            out = {}
            for ti, t in enumerate(tops):
                fp = fillers[min(ti, len(fillers) - 1)] if fillers else {}
                ftype = str(fp.get("type", "constant"))
                if ftype == "gaussian":
                    a = rng.randn(*shapes[ti]).astype(np.float32) \
                        * float(fp.get("std", 1.0)) \
                        + float(fp.get("mean", 0.0))
                elif ftype == "uniform":
                    a = rng.uniform(float(fp.get("min", 0.0)),
                                    float(fp.get("max", 1.0)),
                                    shapes[ti]).astype(np.float32)
                else:
                    a = np.full(shapes[ti], float(fp.get("value", 0.0)),
                                np.float32)
                out[t] = a
            return out

        return source

    if ltype == "WindowData":
        from mscnn_tpu.data import sources as SRC
        from mscnn_tpu.data import window_file as W
        wp = layer.get("window_data_param", {})
        tp = layer.get("transform_param", {})
        mv = [float(v) for v in PB.as_list(tp.get("mean_value"))]
        tspec = SRC.TransformSpec(
            scale=float(tp.get("scale", 1.0)),
            mean_values=tuple(mv) if mv else None,
            mirror=bool(tp.get("mirror", False)))
        images = W.parse_window_file(
            str(wp["source"]),
            root_folder=str(wp.get("root_folder", root_folder)))
        ds = SRC.WindowCropDataset(
            images,
            crop_size=int(tp.get("crop_size", wp.get("crop_size", 227))),
            fg_fraction=float(wp.get("fg_fraction", 0.25)),
            fg_thr=float(wp.get("fg_threshold", 0.5)),
            bg_thr=float(wp.get("bg_threshold", 0.5)),
            context_pad=int(wp.get("context_pad", 0)),
            batch_size=batch_size or int(wp.get("batch_size", 32)),
            seed=seed, tspec=tspec)

        def source():
            b = ds.next_batch()
            out = {tops[0]: b["image"]}
            if len(tops) > 1:
                out[tops[1]] = b["label"]
            return out

        return source

    if ltype == "Data":
        # data_layer.cpp + data_reader.cpp: sequential Datum records.
        # Both backends are read natively — LMDB by io/lmdb.py, LevelDB
        # (SSTable + tail log, snappy blocks) by io/leveldb.py. The
        # declared backend is trusted but cross-checked against the files
        # (recycled prototxts commonly say LEVELDB over an LMDB env).
        from mscnn_tpu.data import sources as SRC
        from mscnn_tpu.io import leveldb as LDB
        dp = layer.get("data_param", {})
        backend = str(dp.get("backend", "LEVELDB")).upper()
        src_path = str(dp["source"])
        if _looks_like_lmdb(src_path):
            backend = "LMDB"
        elif LDB.is_leveldb_dir(src_path):
            backend = "LEVELDB"
        elif backend not in ("LMDB", "LEVELDB"):
            raise ValueError(f"unknown Data backend {backend!r}")
        tp = layer.get("transform_param", {})
        mv = [float(v) for v in PB.as_list(tp.get("mean_value"))]
        tspec = SRC.TransformSpec(
            scale=float(tp.get("scale", 1.0)),
            mean_values=tuple(mv) if mv else None,
            crop_size=int(tp.get("crop_size", 0)),
            mirror=bool(tp.get("mirror", False)))
        cls = SRC.LMDBDataset if backend == "LMDB" else SRC.LevelDBDataset
        ds = cls(src_path, batch_size or int(dp.get("batch_size", 1)),
                 tspec=tspec, seed=seed)

        def source():
            b = ds.next_batch(train=train)
            out = {tops[0]: b["data"]}
            if len(tops) > 1:
                out[tops[1]] = b["label"]
            return out

        return source
    raise ValueError(f"unsupported data layer type {ltype!r} for generic "
                     "training (MemoryData is programmatic-only)")


def param_multipliers(net: NB.Net, params: dict) -> Tuple[dict, dict]:
    """Per-leaf lr/decay multiplier pytrees from `param` specs
    (caffe.proto ParamSpec lr_mult/decay_mult; defaults 1.0)."""
    lr = jax.tree.map(lambda _: 1.0, params)
    dk = jax.tree.map(lambda _: 1.0, params)
    for layer in net.layers:
        name = str(layer.get("name"))
        if name not in params:
            continue
        specs = [s for s in PB.as_list(layer.get("param"))
                 if isinstance(s, dict)]
        if not specs:
            continue
        keys = NB._SHARE_KEYS.get(str(layer.get("type")), ("w", "b"))
        # specs pair with blob POSITIONS (caffe.proto ParamSpec order),
        # so index by position in the full blob order — a layer whose
        # earlier blob was shared away (owner holds the leaf) must not
        # shift later specs onto the wrong blob
        for i, k in enumerate(keys):
            if i >= len(specs):
                break
            if k in params[name]:
                lr[name][k] = float(specs[i].get("lr_mult", 1.0))
                dk[name][k] = float(specs[i].get("decay_mult", 1.0))
    return lr, dk


def _acc_tops(net: NB.Net):
    return [str(PB.as_list(l.get("top"))[0]) for l in net.layers
            if str(l.get("type")) == "Accuracy"]


def make_train_step(net: NB.Net, sspec: S.SolverSpec, *,
                    lr_mults=None, decay_mults=None, mesh=None):
    """One jitted step(state, batch, key) -> (state, metrics) for a
    netbuilder net: fwd through net.apply (losses accumulate into
    blobs['loss']), autodiff backward, Caffe-exact solver update.
    lr_mult-0 leaves are pruned from autodiff (net.cpp:191-247
    backward-need parity, as in train_step.make_train_step).

    With a mesh: P2PSync-style DP over the first mesh axis — each device
    consumes a disjoint micro-batch, grads are pmean-ed, the update is
    computed replicated (train_step.py has the MSCNN analog)."""
    import functools

    from jax.sharding import PartitionSpec as P

    acc_tops = _acc_tops(net)

    def objective(params, batch, key):
        params = prune_frozen_params(params, lr_mults) \
            if lr_mults is not None else params
        blobs = net.apply(params, batch, train=True, key=key)
        extras = {t: blobs[t] for t in acc_tops if t in blobs}
        return blobs["loss"], extras

    def step(state, batch, key):
        (loss, extras), grads = jax.value_and_grad(
            objective, has_aux=True)(state["params"], batch, key)
        metrics = {"loss": loss, **extras}
        if mesh is not None:
            axis = mesh.axis_names[0]
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
        params, sol, lr = S.apply_update(
            state["params"], grads, state["solver"], sspec,
            lr_mults=lr_mults, decay_mults=decay_mults)
        metrics["lr"] = lr
        return {"params": params, "solver": sol}, metrics

    if mesh is None:
        return jax.jit(step)

    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=({"params": P(), "solver": P()}, P(axis), P()),
        out_specs=({"params": P(), "solver": P()}, P()),
        check_vma=False,
    )
    def sharded(state, batch, key):
        # decorrelate per-device dropout (parallel.cpp:276-282 analog)
        return step(state, batch,
                    jax.random.fold_in(key, jax.lax.axis_index(axis)))

    return jax.jit(sharded)


def make_eval_step(net: NB.Net, mesh=None):
    """jitted (params, batch, key) -> {metric: scalar} over the
    TEST-phase net's loss + Accuracy tops (caffe test semantics)."""
    import functools

    from jax.sharding import PartitionSpec as P

    acc_tops = _acc_tops(net)

    def eval_step(params, batch, key):
        blobs = net.apply(params, batch, train=False)
        out = {"loss": blobs["loss"]}
        for t in acc_tops:
            if t in blobs:
                out[t] = blobs[t]
        return out

    if mesh is None:
        return jax.jit(eval_step)

    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P()), out_specs=P(), check_vma=False,
    )
    def sharded(params, batch, key):
        return jax.lax.pmean(eval_step(params, batch, key), axis)

    return jax.jit(sharded)


def setup(net_path: str, sspec: S.SolverSpec, *, phase: str = "TRAIN",
          seed: int = 0, weights: Optional[str] = None, mesh=None,
          batch_size: Optional[int] = None):
    """Build (state, step, batch_source, net) for a generic prototxt.

    Input shapes for init come from one probe batch of the data layer
    (the reference reshapes from the first prefetched batch the same
    way, base_data_layer.cpp).  `weights`: warm-start .caffemodel or
    orbax checkpoint path (copy_trained_layers name matching).
    With a mesh, the state is replicated, batches are sharded over the
    data axis, and the step runs P2PSync-style DP.
    """
    probe_net = NB.Net(net_path, phase=phase)
    layer = find_data_layer(probe_net)
    if layer is None:
        raise ValueError(
            f"net {net_path!r} has no {phase}-phase data layer "
            f"({'/'.join(DATA_LAYER_TYPES)}) and no MSCNN ImageGtData — "
            "nothing to train from")
    source = make_batch_source(probe_net, layer, seed=seed,
                               train=phase == "TRAIN",
                               batch_size=batch_size)
    first = source()
    if mesh is not None:
        n_dev = int(np.prod(mesh.devices.shape))
        bs = next(iter(first.values())).shape[0]
        if bs % n_dev:
            raise ValueError(f"data-layer batch_size {bs} not divisible "
                             f"by {n_dev} devices")
    input_shapes = {k: tuple(v.shape) for k, v in first.items()}
    net = NB.Net(net_path, phase=phase, input_shapes=input_shapes)
    params = net.init(jax.random.key(seed))
    if weights:
        from mscnn_tpu.io import caffemodel as CM
        from mscnn_tpu.io import checkpoint as CKPT
        # structural layout hints so fc-after-pool / deconv / recurrent
        # blobs transpose correctly for THIS graph (not the MS-CNN name
        # heuristic) when warm-starting from a .caffemodel
        params = CKPT.restore_params(weights, params,
                                     layout_hints=CM.net_layout_hints(net))
    lr_mults, decay_mults = param_multipliers(net, params)
    step = make_train_step(net, sspec, lr_mults=lr_mults,
                           decay_mults=decay_mults, mesh=mesh)
    state = {"params": params, "solver": S.init_state(params, sspec)}

    pending = [first]

    if mesh is None:
        def batch_source():
            b = pending.pop() if pending else source()
            return jax.tree.map(jnp.asarray, b)
    else:
        from mscnn_tpu.train.train_step import (replicate_state,
                                                shard_batch)
        state = replicate_state(state, mesh)

        def batch_source():
            b = pending.pop() if pending else source()
            return shard_batch(jax.tree.map(jnp.asarray, b), mesh)

    return state, step, batch_source, net

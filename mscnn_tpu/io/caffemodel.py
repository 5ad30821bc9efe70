"""`.caffemodel` (NetParameter binaryproto) weight importer.

Reads the reference's snapshot format directly off the protobuf wire — no
generated proto code — extracting each layer's name and weight blobs, then
maps them onto our parameter pytree with the layout changes a TPU-native
model needs:

  * conv kernels   OIHW -> HWIO (transpose)
  * deconv kernels GIOHW (grouped, I=1) -> HWIO depthwise [kh, kw, 1, C]
  * FC weights     [out, in] -> [in, out]; the first FC after the ROI-pool
    concat additionally needs its input dimension re-ordered from the
    reference's flattened NCHW activation layout to our NHWC flatten.

Wire schema (field numbers from /root/reference/src/caffe/proto/caffe.proto):
  NetParameter.layer = 100 (LayerParameter), .layers = 2 (V1LayerParameter)
  LayerParameter.name = 1, .type = 2, .blobs = 7
  V1LayerParameter.name = 4, .blobs = 6
  BlobProto.shape = 7 (BlobShape.dim = 1 packed varint), .data = 5
  (packed float), legacy dims num/channels/height/width = 1/2/3/4.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

WIRE_VARINT, WIRE_I64, WIRE_LEN, WIRE_I32 = 0, 1, 2, 5


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip(buf: memoryview, pos: int, wire: int) -> int:
    if wire == WIRE_VARINT:
        _, pos = _read_varint(buf, pos)
    elif wire == WIRE_I64:
        pos += 8
    elif wire == WIRE_LEN:
        n, pos = _read_varint(buf, pos)
        pos += n
    elif wire == WIRE_I32:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


def _fields(buf: memoryview):
    """Iterate (field_number, wire_type, value) over a message buffer.
    LEN fields yield memoryview payloads; varints yield ints."""
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == WIRE_VARINT:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v
        elif wire == WIRE_LEN:
            n, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos: pos + n]
            pos += n
        elif wire == WIRE_I32:
            yield field, wire, bytes(buf[pos: pos + 4])
            pos += 4
        elif wire == WIRE_I64:
            yield field, wire, bytes(buf[pos: pos + 8])
            pos += 8
        else:
            pos = _skip(buf, pos, wire)


def _parse_blob(buf: memoryview) -> np.ndarray:
    shape: List[int] = []
    legacy = [0, 0, 0, 0]
    data_chunks: List[np.ndarray] = []
    for field, wire, val in _fields(buf):
        if field == 7 and wire == WIRE_LEN:        # BlobShape
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == WIRE_LEN:     # packed dims
                    pos = 0
                    while pos < len(v2):
                        d, pos = _read_varint(v2, pos)
                        shape.append(d)
                elif f2 == 1 and w2 == WIRE_VARINT:
                    shape.append(v2)
        elif field == 5 and wire == WIRE_LEN:      # packed float data
            data_chunks.append(np.frombuffer(bytes(val), np.float32))
        elif field == 5 and wire == WIRE_I32:      # unpacked float
            data_chunks.append(
                np.asarray([struct.unpack("<f", val)[0]], np.float32))
        elif field == 8 and wire == WIRE_LEN:      # packed double data
            data_chunks.append(
                np.frombuffer(bytes(val), np.float64).astype(np.float32))
        elif field in (1, 2, 3, 4) and wire == WIRE_VARINT:
            legacy[field - 1] = val
    data = np.concatenate(data_chunks) if data_chunks else np.zeros(0, np.float32)
    if not shape and any(legacy):
        shape = [d for d in legacy]
    if shape and int(np.prod(shape)) == data.size:
        return data.reshape(shape)
    return data


def _parse_layer(buf: memoryview, name_field: int, blobs_field: int):
    name = None
    blobs: List[np.ndarray] = []
    for field, wire, val in _fields(buf):
        if field == name_field and wire == WIRE_LEN:
            name = bytes(val).decode("utf-8", "replace")
        elif field == blobs_field and wire == WIRE_LEN:
            blobs.append(_parse_blob(val))
    return name, blobs


def parse_caffemodel(path: str) -> Dict[str, List[np.ndarray]]:
    """Read a .caffemodel -> {layer_name: [blob arrays]} (layers with no
    blobs are omitted). Handles both current and V1 layer messages."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = memoryview(raw)
    out: Dict[str, List[np.ndarray]] = {}
    for field, wire, val in _fields(buf):
        if wire != WIRE_LEN:
            continue
        if field == 100:      # LayerParameter
            name, blobs = _parse_layer(val, 1, 7)
        elif field == 2:      # V1LayerParameter
            name, blobs = _parse_layer(val, 4, 6)
        else:
            continue
        if name and blobs:
            out[name] = blobs
    return out


def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_to_depthwise(w: np.ndarray) -> np.ndarray:
    """Grouped deconv kernel (group == channels): Caffe stores [C, 1, kh, kw]
    (per-group I/O both 1); our depthwise deconv2d wants HWIO [kh, kw, 1, C]."""
    if w.ndim == 4 and w.shape[1] == 1:
        return np.transpose(w, (2, 3, 1, 0))
    raise ValueError(f"unexpected deconv kernel shape {w.shape}")


def _deconv_dense_to_hwio(w: np.ndarray) -> np.ndarray:
    """Dense (group=1) deconv: Caffe stores [in, out, kh, kw] (the deconv
    weight's leading dim is the BOTTOM channel count, base_conv_layer.cpp
    reverses in/out); our deconv2d wants forward-orientation HWIO."""
    return np.transpose(w, (2, 3, 0, 1))


def _deconv_import(w: np.ndarray, target_shape) -> np.ndarray:
    """Caffe deconv blob -> our HWIO, disambiguating depthwise
    [C,1,kh,kw] vs dense [in,out,kh,kw] by which transform fits
    `target_shape` (shape alone is ambiguous when out channels == 1)."""
    candidates = []
    if w.ndim == 4 and w.shape[1] == 1:
        candidates.append(_deconv_to_depthwise(w))
    if w.ndim == 4:
        candidates.append(_deconv_dense_to_hwio(w))
    for c in candidates:
        if c.shape == tuple(target_shape):
            return c
    return candidates[0] if candidates else w   # let the caller's shape
    #                                             check report the mismatch


def _fc_to_in_out(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _fap_hwc(geom) -> Tuple[int, int, int]:
    """Normalize an fc_after_pool geometry entry: (s, c) legacy square form
    or (h, w, c) -> (h, w, c)."""
    if len(geom) == 2:
        s, c = geom
        return int(s), int(s), int(c)
    h, w, c = geom
    return int(h), int(w), int(c)


def _fc_after_pool(w: np.ndarray, geom) -> np.ndarray:
    """Re-order an [out, C*H*W] FC weight whose input was a flattened NCHW
    activation into our NHWC flatten order [H*W*C, out]."""
    h, ww, c = _fap_hwc(geom)
    out_dim = w.shape[0]
    w = w.reshape(out_dim, c, h, ww)                         # O, C, H, W
    w = np.transpose(w, (2, 3, 1, 0))                        # H, W, C, O
    return w.reshape(h * ww * c, out_dim)


# ---------------------------------------------------------------------------
# Export: NetParameter / SolverState binaryproto writers.
#
# Inverse of the import path so snapshots interoperate with the reference
# both ways (net.cpp:856-866 Net::ToProto -> WriteProtoToBinaryFile;
# sgd_solver.cpp:246-302 SnapshotSolverStateToBinaryProto).  SolverState
# field numbers from caffe.proto: iter = 1, learned_net = 2,
# history = 3 (repeated BlobProto), current_step = 4.
# ---------------------------------------------------------------------------


def _w_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _w_len(field: int, payload: bytes) -> bytes:
    return _w_varint((field << 3) | WIRE_LEN) + _w_varint(len(payload)) + payload


def _encode_blob(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    shape = _w_len(7, _w_len(1, b"".join(_w_varint(int(d)) for d in arr.shape)))
    return shape + _w_len(5, arr.astype("<f4").tobytes())


def array_to_blobproto(arr: np.ndarray) -> bytes:
    """numpy array -> BlobProto wire bytes (pycaffe io.py
    array_to_blobproto parity; caffe.proto BlobProto: shape field 7,
    packed float data field 5)."""
    return _encode_blob(np.asarray(arr))


def blobproto_to_array(data: bytes) -> np.ndarray:
    """BlobProto wire bytes -> numpy array (pycaffe io.py
    blobproto_to_array parity; accepts legacy num/channels/height/width
    shape fields as well as BlobShape)."""
    return _parse_blob(memoryview(data))


def _conv_from_hwio(w: np.ndarray) -> np.ndarray:
    # HWIO -> OIHW (inverse of _conv_to_hwio)
    return np.transpose(w, (3, 2, 0, 1))


def _deconv_from_depthwise(w: np.ndarray) -> np.ndarray:
    """Depthwise deconv HWIO [kh, kw, 1, C] -> Caffe grouped [C, 1, kh, kw]."""
    if w.ndim == 4 and w.shape[2] == 1:
        return np.transpose(w, (3, 2, 0, 1))
    raise ValueError(f"unexpected depthwise deconv kernel shape {w.shape}")


def _fc_from_in_out(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _fc_after_pool_inverse(w: np.ndarray, geom) -> np.ndarray:
    """Inverse of _fc_after_pool: our NHWC-flatten [H*W*C, out] back to the
    reference's NCHW-flatten [out, C*H*W]."""
    h, ww, c = _fap_hwc(geom)
    out_dim = w.shape[1]
    w = w.reshape(h, ww, c, out_dim)                          # H, W, C, O
    w = np.transpose(w, (3, 2, 0, 1))                         # O, C, H, W
    return w.reshape(out_dim, c * h * ww)


def infer_fc_after_pool(params_like) -> dict:
    """{fc layer: (spatial, channels)} for FC layers that flatten a spatial
    conv activation, inferred from an MS-CNN params/history pytree: each
    `fc6<suffix>` consumes the matching `roi_c1<suffix>`'s output at
    spatial = sqrt(fc_in / roi_c1_out) (models/mscnn.py roi_head flattens
    NHWC; the reference flattens NCHW, so these layers need the
    permutation on both import and export). Layers whose shapes do not
    factor that way are left out.

    SCOPE: this is a NAME heuristic that only recognizes the MS-CNN
    layer-naming convention (fc6* fed by roi_c1*).  Any other net with an
    FC after a spatial blob (e.g. fc6 after pool5 in VGG/CaffeNet) is NOT
    detected — derive the dict structurally with net_layout_hints() from a
    built netbuilder Net, or pass fc_after_pool explicitly; otherwise an
    exported .caffemodel keeps that FC's rows in NHWC order, which the
    reference reads with NCHW semantics (silently different outputs)."""
    out = {}
    for name, p in params_like.items():
        if not name.startswith("fc6") or "w" not in p:
            continue
        rc = params_like.get("roi_c1" + name[len("fc6"):])
        if rc is None or "w" not in rc:
            continue
        ch = int(np.asarray(rc["w"]).shape[-1])
        in_dim = int(np.asarray(p["w"]).shape[0])
        s = int(round((in_dim // ch) ** 0.5)) if ch else 0
        if s > 1 and s * s * ch == in_dim:
            out[name] = (s, ch)
    return out


def net_layout_hints(net) -> dict:
    """Structural layout hints for a built netbuilder Net (net.init() must
    have run so net.shapes is populated):

      fc_after_pool: {InnerProduct layer: (h, w, c)} for every FC whose
        bottom blob is 4-D — those flatten NHWC here but NCHW in the
        reference, so their weights need re-ordering on import/export.
      deconv_names: frozenset of Deconvolution layer names, whose 4-D
        blobs use Caffe's reversed in/out orientation.
      recurrent: {LSTM/RNN layer: type} — their blobs store transposed
        weights (W_xc [4H,D] / W_hc [4H,H] vs our wx [D,4H] / wh [H,4H];
        recurrent_layer.cpp blob order W_xc, b, W_hc).

    Unlike infer_fc_after_pool (an MS-CNN name heuristic), this reads the
    actual graph, so it covers nets like VGG/CaffeNet where fc6 consumes
    pool5 directly."""
    from mscnn_tpu.config import prototxt as PB

    shapes = getattr(net, "shapes", None)
    if not shapes:
        raise ValueError("net has no inferred shapes; call net.init() "
                         "before deriving layout hints")
    fc, deconv, recurrent = {}, set(), {}
    for layer in net.layers:
        ltype = layer.get("type")
        name = str(layer.get("name"))
        if ltype == "Deconvolution":
            deconv.add(name)
        elif ltype in ("LSTM", "RNN"):
            recurrent[name] = str(ltype)
        elif ltype == "InnerProduct":
            bots = [str(b) for b in PB.as_list(layer.get("bottom"))]
            sh = shapes.get(bots[0]) if bots else None
            if sh is not None and len(sh) == 4:
                n, h, w, c = sh
                fc[name] = (int(h), int(w), int(c))
    return {"fc_after_pool": fc, "deconv_names": frozenset(deconv),
            "recurrent": recurrent}


def _export_weight(name: str, w: np.ndarray,
                   deconv_names, fc_after_pool) -> Tuple[str, np.ndarray]:
    """Map one of our weights to (caffe layer type, caffe-layout array)."""
    w = np.asarray(w, np.float32)
    if w.ndim == 4 and name in deconv_names:
        # depthwise HWIO [kh,kw,1,C] -> grouped [C,1,kh,kw]; dense HWIO
        # [kh,kw,in,out] -> Caffe's reversed [in,out,kh,kw]
        if w.shape[2] == 1:
            return "Deconvolution", _deconv_from_depthwise(w)
        return "Deconvolution", np.transpose(w, (2, 3, 0, 1))
    if w.ndim == 4:
        return "Convolution", _conv_from_hwio(w)
    if w.ndim == 2 and name in fc_after_pool:
        return "InnerProduct", _fc_after_pool_inverse(w, fc_after_pool[name])
    if w.ndim == 2:
        return "InnerProduct", _fc_from_in_out(w)
    if w.ndim == 1:
        return "Scale", w  # per-channel vector (Scale layer blob)
    raise ValueError(f"layer {name}: cannot export weight of rank {w.ndim}")


def _iter_layer_blobs(params, deconv_names, fc_after_pool,
                      recurrent=None):
    """Yield (name, type, [caffe-layout blobs]) per layer, params order.

    The per-layer blob order matches Net::ToProto: weight then bias (for
    recurrent layers W_xc, b, W_hc with transposed weights).  Layers
    without a 'w' entry are skipped (no learnable blobs to snapshot)."""
    for name, p in params.items():
        if "wx" in p:
            # recurrent pytrees are self-identifying; the explicit map
            # only overrides the type name
            ltype = str(recurrent[name]) if recurrent and name in recurrent \
                else ("RNN" if "wo" in p else "LSTM")
            blobs = [
                np.ascontiguousarray(np.asarray(p["wx"], np.float32).T),
                np.asarray(p["b"], np.float32).reshape(-1),
                np.ascontiguousarray(np.asarray(p["wh"], np.float32).T),
            ]
            if "wo" in p:
                blobs += [
                    np.ascontiguousarray(np.asarray(p["wo"],
                                                    np.float32).T),
                    np.asarray(p["bo"], np.float32).reshape(-1),
                ]
            yield name, ltype, blobs
            continue
        if "mean" in p and "var" in p and "w" not in p:
            # BatchNorm: [mean, var, scale_factor]; we store normalized
            # stats, so export with factor 1 (batch_norm_layer.cpp:98-105)
            yield name, "BatchNorm", [
                np.asarray(p["mean"], np.float32).reshape(-1),
                np.asarray(p["var"], np.float32).reshape(-1),
                np.ones((1,), np.float32),
            ]
            continue
        if "slope" in p and "w" not in p:
            yield name, "PReLU", [
                np.asarray(p["slope"], np.float32).reshape(-1)]
            continue
        if "w" not in p:
            if "b" in p and p["b"] is not None:  # Bias-only layer
                yield name, "Bias", [
                    np.asarray(p["b"], np.float32).reshape(-1)]
            continue
        ltype, w = _export_weight(name, p["w"], deconv_names, fc_after_pool)
        blobs = [w]
        if "b" in p and p["b"] is not None:
            blobs.append(np.asarray(p["b"], np.float32).reshape(-1))
        yield name, ltype, blobs


def save_caffemodel(params, path: str, *, net_name: str = "mscnn_tpu",
                    deconv_names=("conv4_3_2x",),
                    fc_after_pool: Optional[dict] = None,
                    recurrent: Optional[dict] = None) -> int:
    """Write params as a NetParameter binaryproto the reference can read.

    Inverse layout mapping of load_caffemodel_params (HWIO->OIHW,
    depthwise->grouped deconv, [in,out]->[out,in] FC, NHWC->NCHW flatten for
    fc_after_pool layers).  Emits current-format LayerParameter messages
    (field 100; name=1, type=2, blobs=7).  Returns the number of layers
    written.  Ref: net.cpp:856-866.

    fc_after_pool defaults to infer_fc_after_pool, a NAME heuristic scoped
    to MS-CNN layer names (fc6* fed by roi_c1*).  For any other net whose
    FC consumes a spatial blob, pass fc_after_pool explicitly (values
    (s, c) or (h, w, c)) or derive it with net_layout_hints(net) —
    otherwise that FC's rows are exported in NHWC order and the reference
    will read them with NCHW semantics, silently changing outputs.
    """
    if fc_after_pool is None:
        fc_after_pool = infer_fc_after_pool(params)
    out = [_w_len(1, net_name.encode())]
    n = 0
    for name, ltype, blobs in _iter_layer_blobs(params, deconv_names,
                                                fc_after_pool, recurrent):
        payload = _w_len(1, name.encode()) + _w_len(2, ltype.encode())
        for b in blobs:
            payload += _w_len(7, _encode_blob(b))
        out.append(_w_len(100, payload))
        n += 1
    with open(path, "wb") as f:
        f.write(b"".join(out))
    return n


def save_solverstate(state, path: str, *, learned_net: str = "",
                     current_step: int = 0,
                     deconv_names=("conv4_3_2x",),
                     fc_after_pool: Optional[dict] = None) -> int:
    """Write solver history as a SolverState binaryproto.

    History blobs are emitted in Net::learnable_params order (params
    insertion order, weight then bias per layer) with the same layout
    transposes as the weights, so the reference's SGDSolver can resume
    from them.  state: our solver-state pytree ({"it", "h1", ...}); only h1
    maps onto Caffe's single history vector.  current_step: the multistep
    lr-policy stage index (solver.lr_current_step; 0 for other policies).
    Ref: sgd_solver.cpp:246-302.
    """
    if fc_after_pool is None:
        fc_after_pool = infer_fc_after_pool(state["h1"])
    it = int(np.asarray(state["it"]))
    out = [_w_varint((1 << 3) | WIRE_VARINT) + _w_varint(it)]
    if learned_net:
        out.append(_w_len(2, learned_net.encode()))
    n = 0
    for name, _, blobs in _iter_layer_blobs(state["h1"], deconv_names,
                                            fc_after_pool):
        for b in blobs:
            out.append(_w_len(3, _encode_blob(b)))
            n += 1
    out.append(_w_varint((4 << 3) | WIRE_VARINT)
               + _w_varint(int(current_step)))
    with open(path, "wb") as f:
        f.write(b"".join(out))
    return n


def parse_solverstate(path: str) -> dict:
    """Read a SolverState binaryproto -> {iter, learned_net, history,
    current_step} with history as a list of caffe-layout arrays."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    out = {"iter": 0, "learned_net": "", "history": [], "current_step": 0}
    for field, wire, val in _fields(buf):
        if field == 1 and wire == WIRE_VARINT:
            out["iter"] = val
        elif field == 2 and wire == WIRE_LEN:
            out["learned_net"] = bytes(val).decode("utf-8", "replace")
        elif field == 3 and wire == WIRE_LEN:
            out["history"].append(_parse_blob(val))
        elif field == 4 and wire == WIRE_VARINT:
            out["current_step"] = val
    return out


def load_solverstate_history(path: str, state_template,
                             deconv_names=("conv4_3_2x",),
                             fc_after_pool: Optional[dict] = None):
    """Map a SolverState's positional history blobs back onto our solver
    state pytree (inverse layout transposes applied per the template's
    layer names/shapes).  Returns (state, iter).  fc_after_pool defaults
    to the MS-CNN inference (infer_fc_after_pool over the template)."""
    import jax.numpy as jnp

    if fc_after_pool is None:
        fc_after_pool = infer_fc_after_pool(state_template["h1"])
    parsed = parse_solverstate(path)
    hist = list(parsed["history"])
    h1 = {}
    for name, p in state_template["h1"].items():
        new = dict(p)
        if "wx" in p:
            # recurrent history blobs mirror the weight blob order/
            # layout (W_xh/W_xc first, transposed — see _iter_layer_blobs)
            pairs = [("wx", True), ("b", False), ("wh", True)]
            if "wo" in p:
                pairs += [("wo", True), ("bo", False)]
            if len(hist) < len(pairs):
                raise ValueError("solverstate has fewer history blobs "
                                 "than the state template expects")
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
                raise ValueError("solverstate has fewer history blobs than "
                                 "the state template expects")
            w = hist.pop(0)
            target = np.asarray(p["w"])
            if w.ndim == 4 and name in deconv_names:
                wt = _deconv_import(w, target.shape)
            elif w.ndim == 4:
                wt = _conv_to_hwio(w)
            elif w.ndim == 2 and name in fc_after_pool:
                wt = _fc_after_pool(w, fc_after_pool[name])
            elif w.ndim == 2:
                wt = _fc_to_in_out(w)
            else:
                raise ValueError(f"history blob rank {w.ndim}")
            if wt.shape != target.shape:
                raise ValueError(f"{name}: {wt.shape} vs {target.shape}")
            new["w"] = jnp.asarray(wt, target.dtype)
            if "b" in p:
                b = hist.pop(0).reshape(-1)
                new["b"] = jnp.asarray(b, np.asarray(p["b"]).dtype)
        h1[name] = new
    state = dict(state_template)
    state["h1"] = h1
    state["it"] = jnp.asarray(parsed["iter"], jnp.int32)
    return state, parsed["iter"]


def load_caffemodel_params(path: str, params, cfg=None,
                           fc_after_pool: Optional[dict] = None,
                           deconv_names=("conv4_3_2x",),
                           recurrent: Optional[dict] = None):
    """Map a .caffemodel's layers onto a params pytree by name.

    params: our pytree ({layer: {"w", "b"}}); layers present in both are
    overwritten (shapes validated after layout transposition), others kept —
    CopyTrainedLayersFrom semantics (net.cpp:750-786).
    fc_after_pool: {layer_name: (spatial, channels) or (h, w, channels)}
    for FC layers directly consuming a flattened conv activation (e.g.
    {"fc6": (5, 512)} when fc6 follows the 3x3-VALID roi_c1 over a 7x7
    pool). Defaults to the MS-CNN name inference (infer_fc_after_pool:
    fc6* after roi_c1*), so full MS-CNN snapshots round-trip; for other
    nets derive it structurally with net_layout_hints(), or pass {} to
    disable.
    deconv_names: layers whose 4-D blob uses Caffe's deconv orientation
    (leading dim = bottom channels); depthwise [C,1,kh,kw] and dense
    [in,out,kh,kw] are both handled.
    """
    import jax.numpy as jnp

    blobs = parse_caffemodel(path)
    if fc_after_pool is None:
        fc_after_pool = infer_fc_after_pool(params)
    out = {}
    report = {"copied": [], "skipped": [], "mismatched": []}
    for name, p in params.items():
        if name not in blobs:
            out[name] = p
            report["skipped"].append(name)
            continue
        bl = blobs[name]
        new = dict(p)
        w = bl[0]
        try:
            if (recurrent and name in recurrent) or "wx" in p:
                # Recurrent layers are detected from the pytree itself
                # ("wx" leaf) so every import path gets the transposes
                # without needing the hints dict.  Blob order per
                # FillUnrolledNet: LSTM W_xc, b_c, W_hc
                # (lstm_layer.cpp); RNN W_xh, b_h, W_hh, W_ho, b_o
                # (rnn_layer.cpp) — weights transposed vs our jnp-native
                # [D,4H]/[H,4H] layout.
                pairs = [("wx", True), ("b", False), ("wh", True)]
                if "wo" in p:
                    pairs += [("wo", True), ("bo", False)]
                if len(bl) != len(pairs):
                    raise ValueError(
                        f"{len(bl)} blobs for recurrent layer "
                        f"(expected {len(pairs)})")
                for (key, transpose), blob in zip(pairs, bl):
                    b_arr = blob.T if transpose else blob.reshape(-1)
                    target = np.asarray(p[key])
                    if b_arr.shape != target.shape:
                        raise ValueError(
                            f"{key}: {b_arr.shape} vs {target.shape}")
                    new[key] = jnp.asarray(np.ascontiguousarray(b_arr),
                                           target.dtype)
                out[name] = new
                report["copied"].append(name)
                continue
            if "mean" in p and "var" in p and "w" not in p:
                # BatchNorm: blobs = [mean_sum, var_sum, scale_factor];
                # the stored stats are running SUMS that Forward divides
                # by the accumulated factor (batch_norm_layer.cpp:98-105)
                if len(bl) != 3:
                    raise ValueError(
                        f"{len(bl)} blobs for BatchNorm (expected 3)")
                sf = float(np.asarray(bl[2]).reshape(-1)[0])
                sc = 0.0 if sf == 0 else 1.0 / sf
                tm = np.asarray(p["mean"])
                if bl[0].reshape(-1).shape != tm.shape:
                    raise ValueError(
                        f"mean {bl[0].shape} vs {tm.shape}")
                new["mean"] = jnp.asarray(bl[0].reshape(-1) * sc, tm.dtype)
                new["var"] = jnp.asarray(
                    bl[1].reshape(-1) * sc, np.asarray(p["var"]).dtype)
                out[name] = new
                report["copied"].append(name)
                continue
            if "b" in p and "w" not in p and "slope" not in p \
                    and "mean" not in p:
                # Bias-only layer: one [C] blob
                tb = np.asarray(p["b"])
                if bl[0].reshape(-1).shape != tb.shape:
                    raise ValueError(f"bias {bl[0].shape} vs {tb.shape}")
                new["b"] = jnp.asarray(bl[0].reshape(-1), tb.dtype)
                out[name] = new
                report["copied"].append(name)
                continue
            if "slope" in p and "w" not in p:
                # PReLU: one [C] (or [1], channel_shared) slope blob
                ts = np.asarray(p["slope"])
                if bl[0].reshape(-1).shape != ts.shape:
                    raise ValueError(
                        f"slope {bl[0].shape} vs {ts.shape}")
                new["slope"] = jnp.asarray(bl[0].reshape(-1), ts.dtype)
                out[name] = new
                report["copied"].append(name)
                continue
            if "w" in p:
                target = np.asarray(p["w"])
                if w.ndim == 4 and name in deconv_names:
                    wt = _deconv_import(w, target.shape)
                elif w.ndim == 4:
                    wt = _conv_to_hwio(w)
                elif w.ndim == 2 and name in fc_after_pool:
                    wt = _fc_after_pool(w, fc_after_pool[name])
                elif w.ndim == 2:
                    wt = _fc_to_in_out(w)
                elif w.reshape(-1).shape == target.shape:
                    # Scale/Bias-style per-channel vector blob
                    wt = w.reshape(-1)
                else:
                    raise ValueError(f"blob rank {w.ndim}")
                if wt.shape != target.shape:
                    raise ValueError(f"{wt.shape} vs {target.shape}")
                new["w"] = jnp.asarray(wt, target.dtype)
            if "b" in p and len(bl) > 1:
                tb = np.asarray(p["b"])
                if bl[1].reshape(-1).shape == tb.shape:
                    new["b"] = jnp.asarray(bl[1].reshape(-1), tb.dtype)
                else:
                    raise ValueError(
                        f"bias {bl[1].shape} vs {tb.shape}")
            out[name] = new
            report["copied"].append(name)
        except ValueError as e:
            out[name] = p
            report["mismatched"].append((name, str(e)))
    return out, report

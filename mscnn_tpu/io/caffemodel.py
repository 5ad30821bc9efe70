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


def _fc_to_in_out(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _fc_after_pool(w: np.ndarray, spatial: int, channels: int) -> np.ndarray:
    """Re-order an [out, C*S*S] FC weight whose input was a flattened NCHW
    activation into our NHWC flatten order [S*S*C, out]."""
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, spatial, spatial)       # O, C, H, W
    w = np.transpose(w, (2, 3, 1, 0))                        # H, W, C, O
    return w.reshape(spatial * spatial * channels, out_dim)


def load_caffemodel_params(path: str, params, cfg=None,
                           fc_after_pool: Optional[dict] = None):
    """Map a .caffemodel's layers onto a params pytree by name.

    params: our pytree ({layer: {"w", "b"}}); layers present in both are
    overwritten (shapes validated after layout transposition), others kept —
    CopyTrainedLayersFrom semantics (net.cpp:750-786).
    fc_after_pool: {layer_name: (spatial, channels)} for FC layers directly
    consuming a flattened conv activation (e.g. {"fc6": (5, 512)} when fc6
    follows the 3x3-VALID roi_c1 over a 7x7 pool). Defaults to {} (imported
    VGG trunks contain no such layer; fc6 here is roi-stage and trains fresh
    unless importing a full MS-CNN snapshot).
    """
    import jax.numpy as jnp

    blobs = parse_caffemodel(path)
    fc_after_pool = fc_after_pool or {}
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
            if "w" in p:
                target = np.asarray(p["w"])
                if w.ndim == 4 and name == "conv4_3_2x":
                    wt = _deconv_to_depthwise(w)
                elif w.ndim == 4:
                    wt = _conv_to_hwio(w)
                elif w.ndim == 2 and name in fc_after_pool:
                    s, c = fc_after_pool[name]
                    wt = _fc_after_pool(w, s, c)
                elif w.ndim == 2:
                    wt = _fc_to_in_out(w)
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

"""Generic net builder: arbitrary prototxt-defined feedforward graphs.

The reference's Net (src/caffe/net.cpp:49-284) turns a NetParameter into an
executable DAG of registered layers. Here the same prototxt becomes a pair
of pure functions — init(key) -> params and apply(params, inputs) -> blobs —
assembled from the mscnn_tpu.ops registry, so any classic
classification-style prototxt (LeNet, CaffeNet, ...) trains under the same
solver/loop machinery as the MS-CNN models. Phase include/exclude rules are
honored; loss tops accumulate weighted into blobs["loss"].

Layout note: activations are NHWC (TPU-native) rather than Caffe's NCHW;
channel-axis parameters (concat axis 1, etc.) are remapped. Weight import
from .caffemodel goes through io/caffemodel's layout transposers.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mscnn_tpu.config import prototxt as PB
from mscnn_tpu.ops import conv as C
from mscnn_tpu.ops import layers as LY
from mscnn_tpu.utils import fillers

ACTIVATIONS = {
    "ReLU": lambda x, p: LY.relu(x, float(p.get("relu_param", {})
                                          .get("negative_slope", 0.0))),
    "Sigmoid": lambda x, p: LY.sigmoid(x),
    "TanH": lambda x, p: LY.tanh(x),
    "ELU": lambda x, p: LY.elu(x, float(p.get("elu_param", {})
                                        .get("alpha", 1.0))),
    "BNLL": lambda x, p: LY.bnll(x),
    "AbsVal": lambda x, p: LY.absval(x),
    "Power": lambda x, p: LY.power(
        x, float(p.get("power_param", {}).get("power", 1.0)),
        float(p.get("power_param", {}).get("scale", 1.0)),
        float(p.get("power_param", {}).get("shift", 0.0))),
    "Exp": lambda x, p: LY.exp(x),
    "Log": lambda x, p: LY.log(x),
    "Threshold": lambda x, p: LY.threshold(
        x, float(p.get("threshold_param", {}).get("threshold", 0.0))),
}


def _axis(caffe_axis: int) -> int:
    """NCHW axis -> NHWC axis (channels 1 -> -1)."""
    return {0: 0, 1: -1, 2: 1, 3: 2}.get(caffe_axis, caffe_axis)


def _to_nchw(shape_nhwc):
    if len(shape_nhwc) == 4:
        n, h, w, c = shape_nhwc
        return [n, c, h, w]
    return list(shape_nhwc)


def _resolve_reshape(dims, in_shape_nhwc):
    """Caffe ReshapeParameter dims (NCHW order, 0 = copy, -1 = infer) ->
    concrete NHWC-convention output shape (caffe.proto ReshapeParameter)."""
    src = _to_nchw(in_shape_nhwc)
    total = 1
    for d in src:
        total *= d
    out = []
    infer = None
    for i, d in enumerate(dims):
        if d == 0:
            out.append(src[i])
        elif d == -1:
            infer = i
            out.append(1)
        else:
            out.append(int(d))
    known = 1
    for d in out:
        known *= d
    # mirror Caffe's reshape CHECKs: an inconsistent ReshapeParameter must
    # fail here, not produce a silently-truncated shape downstream
    if infer is not None:
        if known == 0 or total % known != 0:
            raise ValueError(
                f"Reshape dims {list(dims)} do not evenly divide the "
                f"{total}-element input shape {tuple(in_shape_nhwc)}")
        out[infer] = total // known
    elif known != total:
        raise ValueError(
            f"Reshape dims {list(dims)} describe {known} elements but the "
            f"input shape {tuple(in_shape_nhwc)} has {total}")
    if len(out) == 4:
        n, c, h, w = out
        return [n, h, w, c]
    return out


def _filler(fp, key, shape, fan_in):
    ftype = str(fp.get("type", "constant")) if fp else "constant"
    if ftype == "constant":
        return fillers.constant(shape, float(fp.get("value", 0.0)) if fp else 0.0)
    if ftype == "gaussian":
        return fillers.gaussian(key, shape, float(fp.get("std", 0.01)),
                                float(fp.get("mean", 0.0)))
    if ftype == "uniform":
        return fillers.uniform(key, shape, float(fp.get("min", 0.0)),
                               float(fp.get("max", 1.0)))
    if ftype == "xavier":
        return fillers.xavier(key, shape)
    if ftype == "msra":
        return fillers.msra(key, shape)
    if ftype == "positive_unitball":
        return fillers.positive_unitball(key, shape)
    if ftype == "bilinear":
        # caffe's BilinearFiller (filler.hpp:244) writes the same k x k
        # bilinear-interpolation pattern into every (in,out) channel pair
        # (used with group=num_output for depthwise 2x deconv upsampling)
        from mscnn_tpu.ops.conv import bilinear_kernel
        if len(shape) != 4 or shape[0] != shape[1]:
            raise ValueError(
                f"bilinear filler requires a square conv kernel, got {shape}")
        pattern = bilinear_kernel(shape[0], 1)  # [k, k, 1, 1]
        return jnp.broadcast_to(pattern, shape)
    raise ValueError(f"unsupported filler {ftype!r}")


# -- PythonLayer support ------------------------------------------------------
# {(module, layer): class} registry for `type: "Python"` prototxt layers.
PYTHON_LAYERS: Dict[tuple, type] = {}


def register_python_layer(module: str, layer: str):
    """Register a user layer class for `type: "Python"` prototxt layers —
    the pycaffe PythonLayer hook
    (/root/reference/include/caffe/layers/python_layer.hpp:1-54).

    The class is instantiated once per net layer as cls(param_str) and must
    implement:

      setup(bottom_shapes) -> top shape tuple, or list of them (one per top)
      forward(*bottoms)    -> top array, or tuple of arrays

    Optionally `init_params(key) -> dict` for learnable state, passed back
    as the first forward argument: forward(params, *bottoms).  Backward is
    autodiff of forward (the TPU-native equivalent of PythonLayer's
    Backward).  (module, layer) pairs not in the registry fall back to
    importing `module` and looking up `layer`, matching pycaffe semantics.

    Usage:
        @register_python_layer("my_layers", "Doubler")
        class Doubler:
            def __init__(self, param_str=""): ...
            def setup(self, bottom_shapes): return bottom_shapes[0]
            def forward(self, x): return 2.0 * x
    """
    def deco(cls):
        PYTHON_LAYERS[(module, layer)] = cls
        return cls
    return deco


def _resolve_python_layer(layer_msg) -> object:
    pp = layer_msg.get("python_param", {})
    module = str(pp.get("module", ""))
    lname = str(pp.get("layer", ""))
    cls = PYTHON_LAYERS.get((module, lname))
    if cls is None:
        import importlib
        try:
            cls = getattr(importlib.import_module(module), lname)
        except (ImportError, AttributeError) as e:
            raise ValueError(
                f"Python layer {module}.{lname} is neither registered via "
                f"register_python_layer nor importable") from e
    return cls(str(pp.get("param_str", "")))


# Caffe blob order -> our param-dict keys, per shareable layer type
# (caffe.proto ParamSpec.name applies to the i-th blob of the layer).
DATA_LAYER_TYPES = ("Data", "ImageData", "HDF5Data", "MemoryData",
                    "DummyData", "WindowData")

# Generic-builder dispatch (Net.apply_layer below), beyond the data
# sources and ACTIVATIONS tables.
_BUILDER_TYPES = (
    "Input", "Silence", "Convolution", "Deconvolution", "InnerProduct",
    "Pooling", "LRN", "Dropout", "Concat", "Eltwise", "Flatten", "Scale",
    "PReLU", "BatchNorm", "Bias", "MVN", "Slice", "Reshape", "ArgMax",
    "Tile", "Crop", "Reduction", "SPP", "Split", "Softmax", "Accuracy",
    "SoftmaxWithLoss", "EuclideanLoss", "HingeLoss", "InfogainLoss",
    "SigmoidCrossEntropyLoss", "MultinomialLogisticLoss",
    "ContrastiveLoss", "LSTM", "RNN", "Embed", "BatchReindex",
    "Parameter", "Python", "Filter", "Im2col",
)

# Detection types served by the dedicated MS-CNN/cascade path
# (config/zoo_import.py + models/mscnn.py + models/cascade.py), mirroring
# the fork's custom layers (SURVEY §2.3).
_DETECTION_TYPES = (
    "ImageGtData", "DetectionLoss", "DetectionAccuracy", "BoxOutput",
    "ProposalTarget", "ROIPooling", "ROIAlign", "SmoothL1Loss",
    "BboxAccuracy", "DecodeBBox",
)


def layer_type_list():
    """Sorted names of every prototxt layer type this framework executes
    (generic builder + the MS-CNN model path).

    Parity with pycaffe's ``caffe.layer_type_list()``
    (/root/reference/python/caffe/_caffe.cpp:361-370, tested by
    python/caffe/test/test_layer_type_list.py) — there it enumerates the
    LayerRegistry; here the registry is the builder's dispatch plus the
    detection-model importer.
    """
    return sorted(set(_BUILDER_TYPES) | set(ACTIVATIONS) |
                  set(DATA_LAYER_TYPES) | set(_DETECTION_TYPES))

_SHARE_KEYS = {
    "Convolution": ("w", "b"), "Deconvolution": ("w", "b"),
    "InnerProduct": ("w", "b"), "Scale": ("w", "b"),
    "PReLU": ("slope",), "Bias": ("b",), "BatchNorm": ("mean", "var"),
    "Embed": ("w", "b"), "Parameter": ("w",),
    # recurrent blob order per FillUnrolledNet param-name registration:
    # LSTM W_xc / b_c / W_hc (lstm_layer.cpp); RNN W_xh / b_h / W_hh /
    # W_ho / b_o (rnn_layer.cpp)
    "LSTM": ("wx", "b", "wh"), "RNN": ("wx", "b", "wh", "wo", "bo"),
}


class Net:
    """Executable net from a NetParameter (text prototxt)."""

    def __init__(self, source: str, phase: str = "TRAIN",
                 input_shapes: Optional[Dict[str, tuple]] = None):
        from mscnn_tpu.config import upgrade as UP

        self.proto = PB.parse_prototxt_file(source) if "\n" not in source \
            else PB.parse_prototxt(source)
        # legacy V0/V1 schemas migrate on load (upgrade_proto equivalent);
        # no-op for modern text. Top-level input/input_dim stays supported
        # both ways (upgrade_input turns it into an Input layer).
        self.proto = UP.upgrade_net(self.proto)
        self.phase = phase
        self.layers = [l for l in PB.layers(self.proto)
                       if PB.layer_phase(l) in (phase, "BOTH")]
        # ctor-supplied shapes take precedence over prototxt-declared ones
        # (legacy top-level input/input_dim is normalized into an Input
        # layer by upgrade_input, so only Input layers remain here)
        self.input_shapes = dict(input_shapes or {})
        # name -> user PythonLayer instance (populated by init())
        self._python_layers: Dict[str, object] = {}
        # Cross-layer parameter sharing via `param { name: "..." }`
        # (reference net.cpp:449-501 AppendParam; the first layer naming a
        # param owns it, later layers share the SAME blob — siamese nets).
        # Here the shared leaf lives ONCE in the params pytree (under the
        # owner layer) and non-owners resolve to it at apply time, so
        # autodiff accumulates both uses' gradients into the single leaf
        # and the solver updates it once — exactly the reference's
        # accumulate-then-update-owner behavior (net.cpp:956).
        # _share_owner: non-owner layer -> {local key: (owner layer, key)}
        self._share_owner: Dict[str, Dict[str, tuple]] = {}
        owners: Dict[str, tuple] = {}
        for layer in self.layers:
            specs = [s for s in PB.as_list(layer.get("param"))
                     if isinstance(s, dict)]
            ltype = str(layer.get("type"))
            lname = str(layer.get("name"))
            for i, spec in enumerate(specs):
                pname = spec.get("name")
                if not pname:
                    continue
                keys = _SHARE_KEYS.get(ltype)
                if keys is None or i >= len(keys):
                    raise ValueError(
                        f"param name sharing is not supported for blob "
                        f"{i} of layer type {ltype!r} (layer {lname!r})")
                if str(pname) in owners:
                    self._share_owner.setdefault(lname, {})[keys[i]] = \
                        owners[str(pname)]
                else:
                    owners[str(pname)] = (lname, keys[i])

    def inputs(self) -> Dict[str, tuple]:
        """Input blob name -> NHWC shape (explicit input_shapes override
        Input-layer declarations)."""
        out = dict(self.input_shapes)
        for layer in self.layers:
            if layer.get("type") != "Input":
                continue
            tops = [str(t) for t in PB.as_list(layer.get("top"))]
            sh_list = PB.as_list(layer.get("input_param", {}).get("shape"))
            for ti, t in enumerate(tops):
                if not sh_list:
                    continue   # dims must come from ctor input_shapes
                dims = [int(d) for d in PB.as_list(
                    sh_list[min(ti, len(sh_list) - 1)]["dim"])]
                if len(dims) == 4:
                    n, c, h, w = dims
                    out.setdefault(t, (n, h, w, c))
                else:
                    out.setdefault(t, tuple(dims))
        return out

    # -- parameter initialization -------------------------------------------

    def init(self, key) -> dict:
        params: dict = {}
        shapes = dict(self.input_shapes)
        keys = iter(jax.random.split(key, max(len(self.layers) * 5, 2)))

        for layer in self.layers:
            ltype = layer.get("type")
            name = str(layer.get("name"))
            bots = [str(b) for b in PB.as_list(layer.get("bottom"))]
            tops = [str(t) for t in PB.as_list(layer.get("top"))]
            in_shape = shapes.get(bots[0]) if bots else None

            if ltype in DATA_LAYER_TYPES:
                # tops come from the training batch source (train/generic)
                # via ctor input_shapes, like the reference's reshape-from-
                # first-prefetched-batch (base_data_layer.cpp)
                continue
            if ltype == "Input":
                # InputParameter.shape is repeated: one per top (or one
                # shared shape, caffe.proto InputParameter); ctor
                # input_shapes (already in `shapes`) win
                sh_list = PB.as_list(layer.get("input_param", {})
                                     .get("shape"))
                for ti, t in enumerate(tops):
                    if t in shapes:
                        continue
                    if not sh_list:
                        raise ValueError(
                            f"Input layer {name!r} declares no shape; "
                            f"pass input_shapes={{{t!r}: ...}}")
                    sh = sh_list[min(ti, len(sh_list) - 1)]
                    dims = [int(d) for d in PB.as_list(sh["dim"])]
                    if len(dims) == 4:
                        n, c, h, w = dims
                        shapes[t] = (n, h, w, c)
                    else:
                        shapes[t] = tuple(dims)
                continue
            if ltype in ("Convolution", "Deconvolution"):
                cp = layer.get("convolution_param", {})
                k = int(cp.get("kernel_size", 3))
                kh = int(cp.get("kernel_h", k))
                kw = int(cp.get("kernel_w", k))
                out_c = int(cp["num_output"])
                group = int(cp.get("group", 1))
                in_c = in_shape[-1] // group
                wshape = (kh, kw, in_c, out_c)   # HWIO both ways
                #  (deconv2d takes forward-orientation HWIO, ops/conv.py:89)
                params[name] = {
                    "w": _filler(cp.get("weight_filler"), next(keys), wshape,
                                 kh * kw * in_c),
                    "b": _filler(cp.get("bias_filler"), next(keys), (out_c,),
                                 out_c) if cp.get("bias_term", True) else None,
                }
                stride = int(cp.get("stride", 1))
                pad = int(cp.get("pad", 0))
                if ltype == "Convolution":
                    oh = (in_shape[1] + 2 * pad - kh) // stride + 1
                    ow = (in_shape[2] + 2 * pad - kw) // stride + 1
                else:
                    oh = stride * (in_shape[1] - 1) + kh - 2 * pad
                    ow = stride * (in_shape[2] - 1) + kw - 2 * pad
                shapes[tops[0]] = (in_shape[0], oh, ow, out_c)
            elif ltype == "InnerProduct":
                ip = layer.get("inner_product_param", {})
                out_d = int(ip["num_output"])
                in_d = 1
                for d in in_shape[1:]:
                    in_d *= d
                params[name] = {
                    "w": _filler(ip.get("weight_filler"), next(keys),
                                 (in_d, out_d), in_d),
                    "b": _filler(ip.get("bias_filler"), next(keys), (out_d,),
                                 out_d) if ip.get("bias_term", True) else None,
                }
                shapes[tops[0]] = (in_shape[0], out_d)
            elif ltype == "Pooling":
                pp = layer.get("pooling_param", {})
                if pp.get("global_pooling", False):
                    shapes[tops[0]] = (in_shape[0], 1, 1, in_shape[-1])
                else:
                    k = int(pp.get("kernel_size", 2))
                    kh = int(pp.get("kernel_h", k))
                    kw = int(pp.get("kernel_w", k))
                    s = int(pp.get("stride", 1))  # caffe.proto:908 default 1
                    sh = int(pp.get("stride_h", s))
                    sw = int(pp.get("stride_w", s))
                    p = int(pp.get("pad", 0))
                    ph = int(pp.get("pad_h", p))
                    pw = int(pp.get("pad_w", p))
                    import math
                    oh = math.ceil((in_shape[1] + 2 * ph - kh) / sh) + 1
                    ow = math.ceil((in_shape[2] + 2 * pw - kw) / sw) + 1
                    if ph > 0 and (oh - 1) * sh >= in_shape[1] + ph:
                        oh -= 1
                    if pw > 0 and (ow - 1) * sw >= in_shape[2] + pw:
                        ow -= 1
                    shapes[tops[0]] = (in_shape[0], oh, ow, in_shape[-1])
            elif ltype == "Concat":
                ax = _axis(int(layer.get("concat_param", {}).get("axis", 1)))
                base = list(shapes[bots[0]])
                base[ax] = sum(shapes[b][ax] for b in bots)
                shapes[tops[0]] = tuple(base)
            elif ltype == "Flatten":
                n = in_shape[0]
                d = 1
                for s in in_shape[1:]:
                    d *= s
                shapes[tops[0]] = (n, d)
            elif ltype in ("SoftmaxWithLoss", "Accuracy", "Softmax",
                           "EuclideanLoss"):
                if ltype == "Softmax" and tops:
                    shapes[tops[0]] = in_shape
            elif ltype == "Slice":
                sp = layer.get("slice_param", {})
                ax = _axis(int(sp.get("axis", sp.get("slice_dim", 1))))
                pts = [int(p) for p in PB.as_list(sp.get("slice_point"))]
                total = in_shape[ax]
                if not pts:
                    step = total // len(tops)
                    pts = [step * (i + 1) for i in range(len(tops) - 1)]
                bounds = [0] + pts + [total]
                for ti, t in enumerate(tops):
                    sh = list(in_shape)
                    sh[ax] = bounds[ti + 1] - bounds[ti]
                    shapes[t] = tuple(sh)
            elif ltype == "Reshape":
                dims = [int(d) for d in PB.as_list(
                    layer["reshape_param"]["shape"]["dim"])]
                shapes[tops[0]] = tuple(_resolve_reshape(dims, in_shape))
            elif ltype == "Filter":
                # fixed-capacity formulation: tops keep each bottom's full
                # first dim (filter_layer.cpp's dynamic new_tops_num becomes
                # compact-to-front + zeroed tail)
                for ti, t in enumerate(tops):
                    shapes[t] = tuple(shapes[bots[ti]])
            elif ltype == "Im2col":
                cp = layer.get("convolution_param", {})
                k = int(cp.get("kernel_size", 3))
                kh = int(cp.get("kernel_h", k))
                kw = int(cp.get("kernel_w", k))
                s = int(cp.get("stride", 1))
                pad = int(cp.get("pad", 0))
                d = int(cp.get("dilation", 1))
                ekh, ekw = d * (kh - 1) + 1, d * (kw - 1) + 1
                oh = (in_shape[1] + 2 * pad - ekh) // s + 1
                ow = (in_shape[2] + 2 * pad - ekw) // s + 1
                shapes[tops[0]] = (in_shape[0], oh, ow,
                                   in_shape[-1] * kh * kw)
            elif ltype == "Crop":
                ref = shapes[bots[1]]
                cp = layer.get("crop_param", {})
                ax = int(cp.get("axis", 2))
                sh = list(in_shape)
                # NCHW crop axes >= ax take the reference's extent
                for caffe_ax in range(ax, 4):
                    sh[_axis(caffe_ax)] = ref[_axis(caffe_ax)]
                shapes[tops[0]] = tuple(sh)
            elif ltype == "ArgMax":
                ap = layer.get("argmax_param", {})
                k = int(ap.get("top_k", 1))
                shapes[tops[0]] = (in_shape[0], 2, k) \
                    if ap.get("out_max_val", False) else (in_shape[0], k)
            elif ltype == "SPP":
                ph = int(layer.get("spp_param", {}).get("pyramid_height", 3))
                d = in_shape[-1] * sum(4 ** l for l in range(ph))
                shapes[tops[0]] = (in_shape[0], d)
            elif ltype == "Embed":
                ep = layer.get("embed_param", {})
                k = int(ep["input_dim"])
                d = int(ep["num_output"])
                params[name] = {
                    "w": _filler(ep.get("weight_filler"), next(keys),
                                 (k, d), k),
                    "b": _filler(ep.get("bias_filler"), next(keys), (d,),
                                 d) if ep.get("bias_term", True) else None,
                }
                shapes[tops[0]] = tuple(in_shape) + (d,)
            elif ltype == "BatchReindex":
                idx_shape = shapes[bots[1]]
                shapes[tops[0]] = (idx_shape[0],) + tuple(in_shape[1:])
            elif ltype == "Parameter":
                dims = [int(d) for d in PB.as_list(
                    layer.get("parameter_param", {})
                    .get("shape", {}).get("dim"))]
                # the blob itself is the output; zero-init like the
                # reference (weights normally arrive via warm start)
                params[name] = {"w": jnp.zeros(tuple(dims))}
                shapes[tops[0]] = tuple(dims)
            elif ltype in ("LSTM", "RNN"):
                rp = layer.get("recurrent_param", {})
                hd = int(rp["num_output"])
                din = 1
                for d in in_shape[2:]:
                    din *= d
                gd = 4 * hd if ltype == "LSTM" else hd
                params[name] = {
                    "wx": _filler(rp.get("weight_filler"), next(keys),
                                  (din, gd), din),
                    "b": _filler(rp.get("bias_filler"), next(keys),
                                 (gd,), gd),
                    "wh": _filler(rp.get("weight_filler"), next(keys),
                                  (hd, gd), hd),
                }
                if ltype == "RNN":
                    # the o_t = tanh(W_ho h_t + b_o) output projection
                    # (rnn_layer.cpp:204-215)
                    params[name]["wo"] = _filler(
                        rp.get("weight_filler"), next(keys), (hd, hd), hd)
                    params[name]["bo"] = _filler(
                        rp.get("bias_filler"), next(keys), (hd,), hd)
                shapes[tops[0]] = (in_shape[0], in_shape[1], hd)
            elif ltype == "Python":
                inst = _resolve_python_layer(layer)
                self._python_layers[name] = inst
                top_shapes = inst.setup([shapes[b] for b in bots])
                if top_shapes is not None:
                    if top_shapes and not isinstance(
                            top_shapes[0], (list, tuple)):
                        top_shapes = [top_shapes]
                    for t, sh in zip(tops, top_shapes):
                        shapes[t] = tuple(sh)
                if hasattr(inst, "init_params"):
                    params[name] = inst.init_params(next(keys))
            else:
                # shape-preserving ops (activations, LRN, Dropout, Eltwise,
                # BatchNorm/PReLU/Bias/Scale with learned params below,
                # Split, MVN)
                ch = in_shape[-1] if in_shape else 1
                if ltype == "Scale":
                    sp = layer.get("scale_param", {})
                    params[name] = {"w": jnp.ones(ch)}
                    if sp.get("bias_term", False):
                        params[name]["b"] = jnp.zeros(ch)
                elif ltype == "PReLU":
                    pp = layer.get("prelu_param", {})
                    shared = bool(pp.get("channel_shared", False))
                    n_slope = 1 if shared else ch
                    params[name] = {"slope": _filler(
                        pp.get("filler", {"type": "constant",
                                          "value": 0.25}),
                        next(keys), (n_slope,), n_slope)}
                elif ltype == "BatchNorm":
                    # running statistics (blobs 0/1; the 1/count scale
                    # blob is a serialization detail)
                    params[name] = {"mean": jnp.zeros(ch),
                                    "var": jnp.ones(ch)}
                elif ltype == "Bias":
                    if len(bots) == 1:
                        bp = layer.get("bias_param", {})
                        params[name] = {"b": _filler(
                            bp.get("filler"), next(keys), (ch,), ch)}
                for t in tops:
                    shapes[t] = in_shape
        self.shapes = shapes
        # Shared params live once, under the owner layer: drop the
        # non-owner's freshly initialized copy after a shape check
        # (strict sharing, the reference's default — net.cpp:466-501).
        for lname, amap in self._share_owner.items():
            for k, (oname, ok) in amap.items():
                mine = params.get(lname, {}).get(k)
                owner = params.get(oname, {}).get(ok)
                if mine is not None and owner is not None \
                        and mine.shape != owner.shape:
                    raise ValueError(
                        f"shared param: layer {lname!r} blob {k!r} shape "
                        f"{mine.shape} != owner {oname!r}.{ok} "
                        f"{owner.shape}")
                if lname in params and k in params[lname]:
                    del params[lname][k]
        return {k: {kk: vv for kk, vv in v.items() if vv is not None}
                for k, v in params.items()}

    def _load_infogain(self, path: str):
        """Cached [K,K] infogain H matrix from a BlobProto file."""
        cache = getattr(self, "_infogain_cache", None)
        if cache is None:
            cache = self._infogain_cache = {}
        if path not in cache:
            from mscnn_tpu.io.caffemodel import blobproto_to_array
            with open(path, "rb") as f:
                arr = blobproto_to_array(f.read())
            cache[path] = arr.reshape(arr.shape[-2], arr.shape[-1])
        return cache[path]

    def layer_params(self, params: dict, name: str) -> dict:
        """The params dict layer `name` computes with: its own leaves plus
        any `param {name}`-shared leaves resolved from their owner layer
        (net.cpp:487-499 ownership semantics)."""
        p = params.get(name, {})
        amap = self._share_owner.get(name)
        if not amap:
            return p
        p = dict(p)
        for k, (oname, ok) in amap.items():
            v = params.get(oname, {}).get(ok)
            if v is not None:
                p[k] = v
        return p

    # -- forward --------------------------------------------------------------

    def apply(self, params: dict, inputs: Dict[str, jax.Array],
              train: bool = False, key=None) -> Dict[str, jax.Array]:
        blobs: Dict[str, jax.Array] = dict(inputs)
        loss = 0.0
        k_iter = iter(jax.random.split(key, 16)) if key is not None else None

        for layer in self.layers:
            ltype = str(layer.get("type"))
            if ltype == "Input" or ltype in DATA_LAYER_TYPES:
                continue
            bots = [blobs[str(b)] for b in PB.as_list(layer.get("bottom"))]
            tops = [str(t) for t in PB.as_list(layer.get("top"))]
            needs_key = ltype == "Dropout" or (
                ltype == "Pooling"
                and str(layer.get("pooling_param", {})
                        .get("pool", "MAX")).upper() == "STOCHASTIC")
            dk = next(k_iter) if (k_iter is not None and needs_key) else None
            outs, dloss = self.apply_layer(layer, params, bots, train=train,
                                           dropout_key=dk)
            loss = loss + dloss
            for t, o in zip(tops, outs):
                blobs[t] = o

        blobs["loss"] = loss
        return blobs

    def apply_layer(self, layer, params: dict, bots, train: bool = False,
                    dropout_key=None):
        """Run ONE layer on materialized bottom blobs.

        Returns (top_values, loss_delta); top_values align with the
        layer's `top` field (extra declared tops of single-output layers
        are left unwritten, matching apply()'s historical behavior).
        This is the unit the per-layer profiler (`mscnn time --layers`)
        jits and times in isolation, the analog of caffe time's per-layer
        loop (tools/caffe.cpp:369-419)."""
        ltype = str(layer.get("type"))
        name = str(layer.get("name"))
        tops = [str(t) for t in PB.as_list(layer.get("top"))]
        loss = 0.0

        if ltype in ("Input", "Silence") or ltype in DATA_LAYER_TYPES:
            return [], 0.0
        if ltype == "Convolution":
            cp = layer.get("convolution_param", {})
            p = self.layer_params(params, name)
            out = C.conv2d(bots[0], p["w"], p.get("b"),
                           stride=int(cp.get("stride", 1)),
                           padding=int(cp.get("pad", 0)))
        elif ltype == "Deconvolution":
            cp = layer.get("convolution_param", {})
            p = self.layer_params(params, name)
            out = C.deconv2d(bots[0], p["w"], p.get("b"),
                             stride=int(cp.get("stride", 1)),
                             pad=int(cp.get("pad", 0)),
                             groups=int(cp.get("group", 1)))
        elif ltype == "InnerProduct":
            p = self.layer_params(params, name)
            x = bots[0].reshape(bots[0].shape[0], -1)
            out = C.dense(x, p["w"], p.get("b"))
        elif ltype == "Im2col":
            cp = layer.get("convolution_param", {})
            k = int(cp.get("kernel_size", 3))
            out = LY.im2col(
                bots[0],
                (int(cp.get("kernel_h", k)), int(cp.get("kernel_w", k))),
                stride=int(cp.get("stride", 1)),
                pad=int(cp.get("pad", 0)),
                dilation=int(cp.get("dilation", 1)))
        elif ltype == "Pooling":
            pp = layer.get("pooling_param", {})
            mode = str(pp.get("pool", "MAX")).upper()
            if mode not in ("MAX", "AVE", "STOCHASTIC"):
                raise ValueError(
                    f"layer {name!r}: unknown pooling mode {mode!r} "
                    "(pooling_layer.cpp LOG(FATAL) on unknown methods)")
            if mode == "STOCHASTIC" and int(pp.get("pad", 0)) != 0:
                raise ValueError(
                    f"layer {name!r}: STOCHASTIC pooling forbids pad "
                    "(pooling_layer.cpp:67-74)")
            if pp.get("global_pooling", False):
                if mode == "MAX":
                    out = bots[0].max(axis=(1, 2), keepdims=True)
                elif mode == "AVE":
                    out = bots[0].mean(axis=(1, 2), keepdims=True)
                else:
                    k = max(bots[0].shape[1], bots[0].shape[2])
                    out = C.stochastic_pool(bots[0], k, 1, train=train,
                                            key=dropout_key)
            elif mode == "STOCHASTIC":
                k = int(pp.get("kernel_size", 2))
                # caffe.proto:908 — stride defaults to 1, not kernel_size
                out = C.stochastic_pool(bots[0], k,
                                        int(pp.get("stride", 1)),
                                        train=train, key=dropout_key)
            else:
                fn = C.max_pool if mode == "MAX" else C.avg_pool
                k = int(pp.get("kernel_size", 0))
                kh = int(pp.get("kernel_h", k))
                kw = int(pp.get("kernel_w", k))
                if kh <= 0 or kw <= 0:
                    raise ValueError(
                        f"layer {name!r}: Pooling needs kernel_size or "
                        "kernel_h/kernel_w (pooling_layer.cpp CHECK)")
                s = int(pp.get("stride", 1))  # caffe.proto:908 default 1
                p = int(pp.get("pad", 0))
                out = fn(bots[0], (kh, kw),
                         (int(pp.get("stride_h", s)),
                          int(pp.get("stride_w", s))),
                         (int(pp.get("pad_h", p)), int(pp.get("pad_w", p))))
        elif ltype in ACTIVATIONS:
            out = ACTIVATIONS[ltype](bots[0], layer)
        elif ltype == "LRN":
            lp = layer.get("lrn_param", {})
            region = str(lp.get("norm_region", "ACROSS_CHANNELS")).upper()
            if region == "WITHIN_CHANNEL":
                # lrn_layer.cpp:24-64 (k unused in this mode)
                out = LY.lrn_within(bots[0], int(lp.get("local_size", 5)),
                                    float(lp.get("alpha", 1.0)),
                                    float(lp.get("beta", 0.75)))
            elif region == "ACROSS_CHANNELS":
                out = LY.lrn(bots[0], int(lp.get("local_size", 5)),
                             float(lp.get("alpha", 1.0)),
                             float(lp.get("beta", 0.75)),
                             float(lp.get("k", 1.0)))
            else:
                raise ValueError(
                    f"layer {name!r}: unknown LRN norm_region {region!r}")
        elif ltype == "Dropout":
            ratio = float(layer.get("dropout_param", {})
                          .get("dropout_ratio", 0.5))
            out = C.dropout(bots[0], ratio, dropout_key, train)
        elif ltype == "Concat":
            ax = _axis(int(layer.get("concat_param", {}).get("axis", 1)))
            out = LY.concat(bots, axis=ax)
        elif ltype == "Eltwise":
            ep = layer.get("eltwise_param", {})
            op = str(ep.get("operation", "SUM")).lower()
            coeffs = [float(c) for c in PB.as_list(ep.get("coeff"))] or None
            out = LY.eltwise(bots, op, coeffs)
        elif ltype == "Flatten":
            out = LY.flatten(bots[0])
        elif ltype == "Scale":
            p = self.layer_params(params, name)
            out = LY.scale(bots[0], p["w"], p.get("b"))
        elif ltype == "PReLU":
            pp = layer.get("prelu_param", {})
            out = LY.prelu(bots[0], self.layer_params(params, name)["slope"],
                           bool(pp.get("channel_shared", False)))
        elif ltype == "BatchNorm":
            bp = layer.get("batch_norm_param", {})
            use_global = bool(bp.get("use_global_stats", not train))
            p = self.layer_params(params, name)
            # batch-stats mode is a pure fn here: the running-average
            # update is the train loop's job (the reference's
            # moving_average_fraction handling)
            out, _, _ = LY.batch_norm(
                bots[0], p["mean"], p["var"],
                eps=float(bp.get("eps", 1e-5)),
                use_global_stats=use_global)
        elif ltype == "Bias":
            b = self.layer_params(params, name)["b"] if len(bots) == 1 else bots[1]
            out = LY.bias(bots[0], b)
        elif ltype == "MVN":
            mp = layer.get("mvn_param", {})
            out = LY.mvn(bots[0],
                         bool(mp.get("normalize_variance", True)),
                         bool(mp.get("across_channels", False)),
                         float(mp.get("eps", 1e-9)))
        elif ltype == "Slice":
            sp = layer.get("slice_param", {})
            ax = _axis(int(sp.get("axis", sp.get("slice_dim", 1))))
            pts = [int(p) for p in PB.as_list(sp.get("slice_point"))]
            if not pts:
                step = bots[0].shape[ax] // len(tops)
                pts = [step * (i + 1) for i in range(len(tops) - 1)]
            return list(LY.slice_(bots[0], pts, axis=ax)), 0.0
        elif ltype == "Reshape":
            dims = [int(d) for d in PB.as_list(
                layer["reshape_param"]["shape"]["dim"])]
            out_shape = _resolve_reshape(dims, bots[0].shape)
            x = bots[0]
            if x.ndim == 4:          # reshape in NCHW convention
                x = jnp.transpose(x, (0, 3, 1, 2))
            flat = LY.reshape(x, _to_nchw(out_shape))
            out = jnp.transpose(flat, (0, 2, 3, 1)) \
                if len(out_shape) == 4 else flat
        elif ltype == "ArgMax":
            ap = layer.get("argmax_param", {})
            flat = bots[0].reshape(bots[0].shape[0], -1)
            if bool(ap.get("out_max_val", False)):
                idx, vals = LY.argmax(flat, int(ap.get("top_k", 1)),
                                      out_max_val=True)
                out = jnp.stack([idx.astype(vals.dtype), vals], 1)
            else:
                out = LY.argmax(flat, int(ap.get("top_k", 1)))
        elif ltype == "Tile":
            tp = layer.get("tile_param", {})
            out = LY.tile(bots[0], int(tp.get("tiles", 1)),
                          _axis(int(tp.get("axis", 1))))
        elif ltype == "Crop":
            cp = layer.get("crop_param", {})
            ax = int(cp.get("axis", 2))
            offs = [int(o) for o in PB.as_list(cp.get("offset"))] or [0]
            x, ref = bots[0], bots[1]
            for i, caffe_ax in enumerate(range(ax, 4)):
                a = _axis(caffe_ax)
                off = offs[i] if i < len(offs) else offs[-1]
                x = jax.lax.slice_in_dim(x, off,
                                         off + ref.shape[a], axis=a)
            out = x
        elif ltype == "Reduction":
            rp = layer.get("reduction_param", {})
            out = LY.reduction(bots[0],
                               str(rp.get("operation", "SUM")).lower(),
                               int(rp.get("axis", 0)),
                               float(rp.get("coeff", 1.0)))
        elif ltype == "SPP":
            pp = layer.get("spp_param", {})
            out = LY.spp(bots[0],
                         int(pp.get("pyramid_height", 3)),
                         str(pp.get("pool", "MAX")).lower())
        elif ltype == "HingeLoss":
            hp = layer.get("hinge_loss_param", {})
            out = LY.hinge_loss(bots[0], bots[1].astype(jnp.int32),
                                str(hp.get("norm", "L1")))
            loss = loss + float(layer.get("loss_weight", 1.0)) * out
        elif ltype == "SigmoidCrossEntropyLoss":
            out = LY.sigmoid_cross_entropy_loss(bots[0], bots[1])
            loss = loss + float(layer.get("loss_weight", 1.0)) * out
        elif ltype == "MultinomialLogisticLoss":
            out = LY.multinomial_logistic_loss(
                bots[0], bots[1].astype(jnp.int32))
            loss = loss + float(layer.get("loss_weight", 1.0)) * out
        elif ltype == "InfogainLoss":
            # H matrix from the optional third bottom, else from the
            # infogain_loss_param.source binaryproto file
            # (infogain_loss_layer.cpp:22-32)
            if len(bots) > 2:
                h = bots[2]
            else:
                src = str(layer.get("infogain_loss_param", {})
                          .get("source", ""))
                if not src:
                    raise ValueError(
                        f"InfogainLoss {name!r} needs a third bottom or "
                        "infogain_loss_param.source")
                h = jnp.asarray(self._load_infogain(src))
            out = LY.infogain_loss(bots[0], bots[1].astype(jnp.int32), h)
            loss = loss + float(layer.get("loss_weight", 1.0)) * out
        elif ltype in ("LSTM", "RNN"):
            # RecurrentLayer: bottoms x [T,N,...] (+ optional cont [T,N],
            # recurrent_layer.hpp:28-52); weights use the jnp-native
            # [D,4H] layout — caffemodel interop transposes via the
            # net_layout_hints "recurrent" map (io/caffemodel.py).
            p = self.layer_params(params, name)
            x = bots[0].reshape(bots[0].shape[0], bots[0].shape[1], -1)
            cont = bots[1] if len(bots) > 1 else None
            if ltype == "LSTM":
                out, _ = LY.lstm(x, p, cont=cont)
            else:
                out, _ = LY.rnn(x, p, cont=cont)
        elif ltype == "Embed":
            p = self.layer_params(params, name)
            out = LY.embed(bots[0].astype(jnp.int32), p["w"], p.get("b"))
        elif ltype == "BatchReindex":
            out = LY.batch_reindex(bots[0], bots[1].astype(jnp.int32))
        elif ltype == "Parameter":
            out = self.layer_params(params, name)["w"]
        elif ltype == "ContrastiveLoss":
            cp = layer.get("contrastive_loss_param", {})
            out = LY.contrastive_loss(
                bots[0], bots[1], bots[2],
                margin=float(cp.get("margin", 1.0)),
                legacy=bool(cp.get("legacy_version", False)))
            loss = loss + float(layer.get("loss_weight", 1.0)) * out
        elif ltype == "Split":
            return [bots[0]] * len(tops), 0.0
        elif ltype == "Filter":
            # filter_layer.cpp:16-58: bottoms[:-1] filtered by the last
            # bottom (selector, one value per item). TPU-native fixed-shape
            # form: kept rows compacted to the front, dropped tail zeroed;
            # capacity == input first dim.
            outs_f, keep = LY.filter_(bots[:-1], bots[-1])
            outs = [o * keep.reshape((-1,) + (1,) * (o.ndim - 1))
                    .astype(o.dtype) for o in outs_f]
            return outs, 0.0
        elif ltype == "Softmax":
            out = jax.nn.softmax(bots[0], axis=-1)
        elif ltype == "SoftmaxWithLoss":
            logits, labels = bots[0], bots[1].astype(jnp.int32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            picked = jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
            out = -picked.mean()
            loss = loss + float(layer.get("loss_weight", 1.0)) * out
        elif ltype == "EuclideanLoss":
            out = LY.euclidean_loss(bots[0], bots[1])
            loss = loss + float(layer.get("loss_weight", 1.0)) * out
        elif ltype == "Accuracy":
            out = LY.accuracy(bots[0], bots[1].astype(jnp.int32))
        elif ltype == "Python":
            inst = self._python_layers.get(name)
            if inst is None:
                inst = _resolve_python_layer(layer)
                self._python_layers[name] = inst
            args = ([params[name]] if name in params else []) + bots
            out = inst.forward(*args)
            if isinstance(out, (list, tuple)):
                lw = float(layer.get("loss_weight", 0.0))
                return list(out), lw * out[0] if lw else 0.0
            lw = float(layer.get("loss_weight", 0.0))
            if lw:
                loss = loss + lw * out
        else:
            raise NotImplementedError(
                f"layer type {ltype!r} (layer {name!r}) is not supported "
                f"by the generic net builder")
        return [out], loss

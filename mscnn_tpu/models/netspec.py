"""Programmatic net specification (pycaffe NetSpec equivalent).

Covers the net-authoring surface of the reference's
/root/reference/python/caffe/net_spec.py:1-229: layers are declared in a
functional style through the `layers` pseudo-module, composed by passing
Tops as inputs, named by assignment to a NetSpec, and serialized to
protobuf text that the rest of this framework (models.netbuilder.Net,
config.zoo_import) consumes directly:

    from mscnn_tpu.models import netspec
    L, P = netspec.layers, netspec.params

    n = netspec.NetSpec()
    n.data = L.Input(input_param=dict(shape=dict(dim=[1, 3, 28, 28])))
    n.conv1 = L.Convolution(n.data, kernel_size=5, num_output=20,
                            weight_filler=dict(type="xavier"))
    n.pool1 = L.Pooling(n.conv1, kernel_size=2, stride=2, pool=P.Pooling.MAX)
    text = n.to_prototxt()

Design differences from the reference (which wraps generated protobuf
classes): messages here are the plain nested dicts of config.prototxt, so
`assign` is structural rather than descriptor-driven, and the
layer-type -> parameter-field map is a table derived from caffe.proto
(LayerParameter fields 100-155, src/caffe/proto/caffe.proto:350-414)
instead of runtime descriptor reflection. Auto-naming, ntop/in_place
handling, and kwarg routing match the reference semantics.
"""

from __future__ import annotations

from collections import Counter, OrderedDict

from mscnn_tpu.config import prototxt as PB

# LayerParameter.type -> '<prefix>_param' field prefix
# (caffe.proto:350-414; names whose camel-case does not lower-case
# mechanically are spelled out).
PARAM_NAMES = {
    "Accuracy": "accuracy", "ArgMax": "argmax", "BatchNorm": "batch_norm",
    "Bias": "bias", "Concat": "concat",
    "ContrastiveLoss": "contrastive_loss", "Convolution": "convolution",
    "Deconvolution": "convolution", "Crop": "crop", "Data": "data",
    "Dropout": "dropout", "DummyData": "dummy_data", "Eltwise": "eltwise",
    "ELU": "elu", "Embed": "embed", "Exp": "exp", "Flatten": "flatten",
    "HDF5Data": "hdf5_data", "HDF5Output": "hdf5_output",
    "HingeLoss": "hinge_loss", "ImageData": "image_data",
    "InfogainLoss": "infogain_loss", "InnerProduct": "inner_product",
    "Input": "input", "Log": "log", "LRN": "lrn",
    "MemoryData": "memory_data", "MVN": "mvn", "Parameter": "parameter",
    "Pooling": "pooling", "Power": "power", "PReLU": "prelu",
    "Python": "python", "Recurrent": "recurrent", "RNN": "recurrent",
    "LSTM": "recurrent", "Reduction": "reduction", "ReLU": "relu",
    "Reshape": "reshape", "Scale": "scale", "Sigmoid": "sigmoid",
    "Softmax": "softmax", "SoftmaxWithLoss": "softmax", "SPP": "spp",
    "Slice": "slice", "TanH": "tanh", "Threshold": "threshold",
    "Tile": "tile", "WindowData": "window_data",
    # MS-CNN additions (caffe.proto:406-414)
    "ROIPooling": "roi_pooling", "SmoothL1Loss": "smooth_l1_loss",
    "DetectionLoss": "detection_loss",
    "DetectionAccuracy": "detection_accuracy", "BoxOutput": "box_output",
    "ProposalTarget": "proposal_target", "ImageGtData": "image_gt_data",
    "BBoxReg": "bbox_reg", "DecodeBBox": "decode_bbox",
}

# fields that live on LayerParameter itself (never routed into
# <type>_param); caffe.proto:306-357
_LAYER_FIELDS = {
    "name", "type", "bottom", "top", "phase", "loss_weight", "param",
    "blobs", "propagate_down", "include", "exclude",
}


class Top:
    """One output blob of a layer function."""

    def __init__(self, fn: "Function", n: int):
        self.fn = fn
        self.n = n

    def to_proto(self) -> PB.Message:
        return to_proto(self)


class Function:
    """A layer: its type, parameters, and input Tops."""

    def __init__(self, type_name: str, inputs, params: dict):
        self.type_name = type_name
        self.inputs = inputs
        self.params = dict(params)
        self.ntop = int(self.params.pop("ntop", 1))
        self.in_place = bool(self.params.pop("in_place", False))
        self.tops = tuple(Top(self, n) for n in range(self.ntop))

    def _get_name(self, names, autonames):
        if self not in names and self.ntop > 0:
            names[self] = self._get_top_name(self.tops[0], names, autonames)
        elif self not in names:
            autonames[self.type_name] += 1
            names[self] = self.type_name + str(autonames[self.type_name])
        return names[self]

    def _get_top_name(self, top, names, autonames):
        if top not in names:
            autonames[top.fn.type_name] += 1
            names[top] = top.fn.type_name + str(autonames[top.fn.type_name])
        return names[top]

    def _to_proto(self, layers, names, autonames) -> None:
        if self in layers:
            return
        bottoms = []
        for inp in self.inputs:
            inp.fn._to_proto(layers, names, autonames)
            bottoms.append(PB.as_list(layers[inp.fn]["top"])[inp.n])
        layer: PB.Message = {"name": None, "type": self.type_name}
        if bottoms:
            layer["bottom"] = bottoms
        if self.in_place:
            layer["top"] = list(bottoms)
        elif self.ntop:
            layer["top"] = [self._get_top_name(t, names, autonames)
                            for t in self.tops]
        layer["name"] = self._get_name(names, autonames)

        param_field = PARAM_NAMES.get(self.type_name)
        for k, v in self.params.items():
            if k in _LAYER_FIELDS or k.endswith("_param") \
                    or param_field is None:
                layer[k] = v
            else:
                layer.setdefault(param_field + "_param", {})[k] = v
        layers[self] = layer


def to_proto(*tops) -> PB.Message:
    """NetParameter message computing the given Tops (auto-named blobs)."""
    layers: "OrderedDict[Function, PB.Message]" = OrderedDict()
    autonames: Counter = Counter()
    for top in tops:
        top.fn._to_proto(layers, {}, autonames)
    return {"layer": list(layers.values())}


class NetSpec:
    """Named collection of Tops; assignment names the blob (and its layer)."""

    def __init__(self):
        super().__setattr__("tops", OrderedDict())

    def __setattr__(self, name, value):
        self.tops[name] = value

    def __getattr__(self, name):
        if name == "tops":
            raise AttributeError(name)
        try:
            return self.tops[name]
        except KeyError:
            raise AttributeError(name) from None

    __setitem__ = __setattr__
    __getitem__ = __getattr__

    def to_proto(self) -> PB.Message:
        # Top (or ntop=0 Function) -> assigned name
        names = {top: name for name, top in self.tops.items()}
        autonames: Counter = Counter()
        layers: "OrderedDict[Function, PB.Message]" = OrderedDict()
        for top in self.tops.values():
            fn = top.fn if isinstance(top, Top) else top
            fn._to_proto(layers, names, autonames)
        return {"layer": list(layers.values())}

    def to_prototxt(self, name: str = None) -> str:
        msg = self.to_proto()
        if name is not None:
            msg = {"name": name, **msg}
        return PB.emit_prototxt(msg) + "\n"


class Layers:
    """Pseudo-module: `layers.Convolution(bottom, kernel_size=3, ...)`."""

    def __getattr__(self, name):
        def layer_fn(*args, **kwargs):
            fn = Function(name, args, kwargs)
            if fn.ntop == 0:
                return fn
            if fn.ntop == 1:
                return fn.tops[0]
            return fn.tops
        return layer_fn


class Parameters:
    """Pseudo-module for enum constants: `params.Pooling.MAX` == "MAX".
    Messages here are schema-less dicts, so the enum value IS its name."""

    def __getattr__(self, name):
        class _Enum:
            def __getattr__(self, value):
                return value
        return _Enum()


layers = Layers()
params = Parameters()

"""Coordinate mapping between NetSpec tops (pycaffe coord_map equivalent).

Reimplements /root/reference/python/caffe/coord_map.py:1-185 on the
dict-message NetSpec of models.netspec: each spatial layer induces an
affine map (axis, scale, shift) from its input to its output coordinates;
composing maps along the graph and inverting the `from` chain yields the
offset needed to align two tops (the FCN crop-alignment algebra). `crop`
emits the Crop layer with the computed axis/offset, exactly like the
reference.
"""

from __future__ import annotations

import numpy as np

from mscnn_tpu.models import netspec

PASS_THROUGH_LAYERS = ["AbsVal", "BatchNorm", "Bias", "BNLL", "Dropout",
                       "Eltwise", "ELU", "Log", "LRN", "Exp", "MVN",
                       "Power", "ReLU", "PReLU", "Scale", "Sigmoid",
                       "Split", "TanH", "Threshold"]


class UndefinedMapException(Exception):
    """Layer with no defined coordinate mapping."""


class AxisMismatchException(Exception):
    """Composed maps disagree on the spatial axis."""


def conv_params(fn: netspec.Function):
    """Canonical (axis, stride, effective kernel, pad) of a conv-like
    layer, from convolution_param/pooling_param dict or flat kwargs."""
    params = fn.params.get("convolution_param",
                           fn.params.get("pooling_param", fn.params))
    axis = params.get("axis", 1)
    ks = np.array(params["kernel_size"], ndmin=1)
    dilation = np.array(params.get("dilation", 1), ndmin=1)
    if {"pad_h", "pad_w", "kernel_h", "kernel_w", "stride_h",
            "stride_w"} & set(params):
        raise ValueError("cropping does not support legacy _h/_w params")
    return (axis, np.array(params.get("stride", 1), ndmin=1),
            (ks - 1) * dilation + 1,
            np.array(params.get("pad", 0), ndmin=1))


def crop_params(fn: netspec.Function):
    params = fn.params.get("crop_param", fn.params)
    axis = params.get("axis", 2)      # spatial crop for N, C, H, W
    offset = np.array(params.get("offset", 0), ndmin=1)
    return (axis, offset)


def coord_map(fn: netspec.Function):
    """(axis, scale, shift) induced by one layer; identity for pointwise
    layers (coord_map.py:58-78)."""
    if fn.type_name in ("Convolution", "Pooling", "Im2col"):
        axis, stride, ks, pad = conv_params(fn)
        return axis, 1 / stride, (pad - (ks - 1) / 2) / stride
    if fn.type_name == "Deconvolution":
        axis, stride, ks, pad = conv_params(fn)
        return axis, stride, (ks - 1) / 2 - pad
    if fn.type_name in PASS_THROUGH_LAYERS:
        return None, 1, 0
    if fn.type_name == "Crop":
        axis, offset = crop_params(fn)
        return axis - 1, 1, -offset   # -1 for last non-coordinate dim
    raise UndefinedMapException(fn.type_name)


def compose(base_map, next_map):
    """Sequential composition: scales multiply, the further shift is
    scaled by the base scale."""
    ax1, a1, b1 = base_map
    ax2, a2, b2 = next_map
    if ax1 is None:
        ax = ax2
    elif ax2 is None or ax1 == ax2:
        ax = ax1
    else:
        raise AxisMismatchException(f"{ax1} vs {ax2}")
    return ax, a1 * a2, a1 * b2 + b1


def inverse(cmap):
    ax, a, b = cmap
    return ax, 1 / a, -b / a


def coord_map_from_to(top_from: netspec.Top, top_to: netspec.Top):
    """Affine map from `top_from` coords to `top_to` coords, found by
    walking both ancestries to a common blob (coord_map.py:117-168)."""

    def collect_bottoms(top):
        bottoms = top.fn.inputs
        # only a Crop's first bottom is coordinate-mapped; the second is
        # the size reference
        if top.fn.type_name == "Crop":
            bottoms = bottoms[:1]
        return bottoms

    from_maps = {top_from: (None, 1, 0)}
    frontier = {top_from}
    while frontier:
        top = frontier.pop()
        try:
            m = coord_map(top.fn)
        except UndefinedMapException:
            continue
        for bottom in collect_bottoms(top):
            from_maps[bottom] = compose(from_maps[top], m)
            frontier.add(bottom)

    to_maps = {top_to: (None, 1, 0)}
    frontier = {top_to}
    while frontier:
        top = frontier.pop()
        if top in from_maps:
            return compose(to_maps[top], inverse(from_maps[top]))
        try:
            m = coord_map(top.fn)
        except UndefinedMapException:
            continue
        for bottom in collect_bottoms(top):
            to_maps[bottom] = compose(to_maps[top], m)
            frontier.add(bottom)

    raise RuntimeError("Could not compute map between tops; are they "
                       "connected by spatial layers?")


def crop(top_from: netspec.Top, top_to: netspec.Top) -> netspec.Top:
    """Crop layer aligning `top_from` onto `top_to`'s grid
    (coord_map.py:171-185)."""
    ax, a, b = coord_map_from_to(top_from, top_to)
    a, b = np.atleast_1d(a), np.atleast_1d(b)
    if not (a == 1).all():
        raise ValueError(f"scale mismatch on crop (a = {a})")
    if not (b <= 0).all():
        raise ValueError(f"cannot crop negative offset (b = {b})")
    if not (np.round(b) == b).all():
        raise ValueError(f"cannot crop noninteger offset (b = {b})")
    return netspec.layers.Crop(
        top_from, top_to,
        crop_param=dict(axis=int(ax) + 1,   # +1 for first cropping dim
                        offset=[int(v) for v in -np.round(b).astype(int)]))

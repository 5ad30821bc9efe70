"""Convolution / pooling / upsampling primitives, NHWC on the MXU.

Thin wrappers over lax.conv_general_dilated with the layout fixed to
(NHWC, HWIO, NHWC) -- the TPU-native layout -- plus Caffe-compatible
ceil-mode pooling (pooling_layer.cpp computes output dims with ceil) and the
depthwise bilinear 2x upsampler that replaces the reference's grouped
Deconvolution with a fixed bilinear filler
(/root/reference/examples/kitti_car/mscnn-7s-576-2x/trainval_2nd.prototxt
conv4_3_2x: kernel 4, stride 2, pad 1, group == channels, bilinear filler).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b=None, *, stride: int = 1, padding="SAME"):
    """2-D convolution, NHWC x HWIO -> NHWC.

    padding: "SAME", "VALID", or an int (symmetric explicit padding, the
    Caffe `pad:` parameter).
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # The MXU accumulates in f32 regardless of output dtype; requesting an
    # f32 output for low-precision inputs breaks the conv transpose rule
    # under autodiff (jax 0.9), so only ask for it when inputs are f32.
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=DIMS,
        preferred_element_type=pet,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def _pool_padding(size: int, k: int, s: int, pad: int, ceil_mode: bool):
    """Per-edge (lo, hi) padding reproducing Caffe's ceil-mode output size."""
    if ceil_mode:
        out = int(math.ceil((size + 2 * pad - k) / s)) + 1
        # Caffe clips the last window to stay inside the padded region.
        if pad > 0 and (out - 1) * s >= size + pad:
            out -= 1
    else:
        out = (size + 2 * pad - k) // s + 1
    hi = max((out - 1) * s + k - size - pad, 0)
    return (pad, hi), out


def max_pool(x, k: int = 2, stride: int = 2, pad: int = 0, ceil_mode: bool = True):
    """Max pooling with Caffe's ceil-mode output-size convention."""
    (plo_h, phi_h), _ = _pool_padding(x.shape[1], k, stride, pad, ceil_mode)
    (plo_w, phi_w), _ = _pool_padding(x.shape[2], k, stride, pad, ceil_mode)
    # init must be a weak-typed Python constant: a traced init value breaks
    # reverse-mode autodiff of reduce_window under jit.
    neg = float("-inf") if jnp.issubdtype(x.dtype, jnp.floating) \
        else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)),
    )


def avg_pool(x, k: int = 2, stride: int = 2, pad: int = 0, ceil_mode: bool = True):
    """Average pooling (Caffe AVE mode: divides by full window size)."""
    (plo_h, phi_h), _ = _pool_padding(x.shape[1], k, stride, pad, ceil_mode)
    (plo_w, phi_w), _ = _pool_padding(x.shape[2], k, stride, pad, ceil_mode)
    s = lax.reduce_window(
        x, 0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0, lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)),
    )
    return s / (k * k)


def deconv2d(x, w, b=None, *, stride: int = 2, pad: int = 1, groups: int = 1):
    """Transposed convolution as an input-dilated convolution.

    w: HWIO with I = in_channels // groups (the *forward* orientation; the
    kernel is flipped here, matching transposed-conv semantics).
    Output spatial size = in * stride for k = 2*stride, pad = stride//2.
    """
    k_h, k_w = w.shape[0], w.shape[1]
    w_flip = w[::-1, ::-1]
    y = lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1, 1),
        padding=[(k_h - 1 - pad, k_h - 1 - pad), (k_w - 1 - pad, k_w - 1 - pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def bilinear_kernel(k: int, channels: int, dtype=jnp.float32):
    """Caffe's bilinear filler (include/caffe/filler.hpp:244) as an HWIO
    depthwise kernel [k, k, 1, channels] for use with deconv2d(groups=C)."""
    f = math.ceil(k / 2.0)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    pos = jnp.arange(k, dtype=dtype)
    val = (1 - jnp.abs(pos / f - c))
    kern2d = val[:, None] * val[None, :]
    return jnp.tile(kern2d[:, :, None, None], (1, 1, 1, channels))


def upsample2x_bilinear(x, kernel=None):
    """Fixed 2x bilinear upsample (the conv4_3_2x branch). If ``kernel`` is
    None a bilinear 4x4 depthwise kernel is built on the fly."""
    c = x.shape[-1]
    if kernel is None:
        kernel = bilinear_kernel(4, c, x.dtype)
    return deconv2d(x, kernel.astype(x.dtype), stride=2, pad=1, groups=c)


def dense(x, w, b=None):
    """Fully-connected layer: x [..., D] @ w [D, O]."""
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = jnp.dot(x, w, preferred_element_type=pet)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def dropout(x, rate: float, key, train: bool):
    """Inverted dropout (Caffe scales by 1/(1-rate) at train time)."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)

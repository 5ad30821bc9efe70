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


def _as_pair(v):
    """int -> (v, v); (h, w) passes through (Caffe kernel_h/w etc.)."""
    return (int(v), int(v)) if isinstance(v, (int, float)) else \
        (int(v[0]), int(v[1]))


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


def max_pool(x, k=2, stride=2, pad=0, ceil_mode: bool = True):
    """Max pooling with Caffe's ceil-mode output-size convention.
    k/stride/pad take an int (square, the common case) or an (h, w) pair
    (PoolingParameter kernel_h/kernel_w etc., caffe.proto:902-910)."""
    kh, kw = _as_pair(k)
    sh, sw = _as_pair(stride)
    ph, pw = _as_pair(pad)
    (plo_h, phi_h), _ = _pool_padding(x.shape[1], kh, sh, ph, ceil_mode)
    (plo_w, phi_w), _ = _pool_padding(x.shape[2], kw, sw, pw, ceil_mode)
    # init must be a weak-typed Python constant: a traced init value breaks
    # reverse-mode autodiff of reduce_window under jit.
    neg = float("-inf") if jnp.issubdtype(x.dtype, jnp.floating) \
        else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)),
    )


def _ave_divisor(size: int, k: int, s: int, pad: int, out: int):
    """Caffe AVE pool_size along one axis (pooling_layer.cpp:197-205):
    the window clipped to [start, size + pad] — pad cells count, the
    ceil-mode overhang past size + pad does not."""
    start = jnp.arange(out) * s - pad
    return (jnp.minimum(start + k, size + pad) - start).astype(jnp.float32)


def avg_pool(x, k=2, stride=2, pad=0, ceil_mode: bool = True):
    """Average pooling (Caffe AVE mode): the sum counts real pixels only,
    the divisor is the window clipped to the padded extent — so interior
    windows divide by kh*kw (pad zeros included) while ceil-mode edge
    windows divide by their smaller clipped size
    (pooling_layer.cpp:197-212, pinned in tests/test_golden_ref_ops.py)."""
    kh, kw = _as_pair(k)
    sh, sw = _as_pair(stride)
    ph, pw = _as_pair(pad)
    (plo_h, phi_h), oh = _pool_padding(x.shape[1], kh, sh, ph, ceil_mode)
    (plo_w, phi_w), ow = _pool_padding(x.shape[2], kw, sw, pw, ceil_mode)
    s = lax.reduce_window(
        x, 0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0, lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)),
    )
    dh = _ave_divisor(x.shape[1], kh, sh, ph, oh)
    dw = _ave_divisor(x.shape[2], kw, sw, pw, ow)
    div = (dh[:, None] * dw[None, :])[None, :, :, None]
    return s / div.astype(s.dtype)


def _pool_patches(x, k: int, stride: int, ceil_mode: bool):
    """Gather (N, OH, OW, k*k, C) unpadded pooling windows plus a validity
    mask. Stochastic pooling forbids padding (pooling_layer.cpp:67-74), so
    windows start at ``p * stride`` and are clipped at the input edge
    (pooling_layer.cu:95-98). Cells past the edge are masked out."""
    n, h, w, c = x.shape
    _, oh = _pool_padding(h, k, stride, 0, ceil_mode)
    _, ow = _pool_padding(w, k, stride, 0, ceil_mode)
    h_idx = jnp.arange(oh)[:, None] * stride + jnp.arange(k)[None, :]
    w_idx = jnp.arange(ow)[:, None] * stride + jnp.arange(k)[None, :]
    valid_h = h_idx < h
    valid_w = w_idx < w
    xh = jnp.take(x, jnp.minimum(h_idx, h - 1).reshape(-1), axis=1)
    xh = xh.reshape(n, oh, k, w, c)
    xw = jnp.take(xh, jnp.minimum(w_idx, w - 1).reshape(-1), axis=3)
    xw = xw.reshape(n, oh, k, ow, k, c)
    # (N, OH, OW, kh, kw, C) -> flatten window row-major (h fastest-outer),
    # matching the reference's h-then-w scan order.
    patches = xw.transpose(0, 1, 3, 2, 4, 5).reshape(n, oh, ow, k * k, c)
    mask = (valid_h[:, None, :, None] & valid_w[None, :, None, :])
    mask = mask.reshape(1, oh, ow, k * k, 1)
    return patches * mask, mask


def stochastic_pool(x, k: int = 2, stride: int = 2, *, train: bool = False,
                    key=None, ceil_mode: bool = True):
    """Stochastic pooling (Zeiler & Fergus), Caffe STOCHASTIC mode.

    Train (pooling_layer.cu StoPoolForwardTrain :83-122): per window, draw
    u~U[0,1), threshold = u * sum(window), output the first cell whose
    running cumulative sum reaches the threshold. The backward routes the
    gradient to the sampled cell only (StoPoolBackward :300-334) — here
    that is simply the autodiff of the gather, with the sampled index held
    fixed exactly as the reference holds rand_idx_ from the forward.

    Test (StoPoolForwardTest :125-154): probability-weighted average
    sum(x^2) / (FLT_MIN + sum(x)).

    Assumes non-negative activations (post-ReLU), as the reference does.
    Padding is not supported (pooling_layer.cpp:67-74 CHECKs pad==0).
    """
    patches, _ = _pool_patches(x, k, stride, ceil_mode)
    if not train:
        cumsum = patches.sum(axis=3) + jnp.finfo(jnp.float32).tiny
        return (jnp.square(patches).sum(axis=3) / cumsum).astype(x.dtype)
    if key is None:
        raise ValueError("stochastic_pool(train=True) requires a PRNG key")
    csum = jnp.cumsum(patches, axis=3)
    total = csum[:, :, :, -1:, :]
    u = jax.random.uniform(key, total.shape, dtype=jnp.float32)
    thres = lax.stop_gradient(u * total)
    # First index with cumsum >= thres; argmax returns the first True.
    sel = jnp.argmax(csum >= thres, axis=3, keepdims=True)
    return jnp.take_along_axis(patches, sel, axis=3)[:, :, :, 0, :]


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

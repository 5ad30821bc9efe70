"""The standard op library: the reference's L2 layer set as pure functions.

Covers the non-detection layers of /root/reference/src/caffe/layers/ (see
SURVEY.md section 2.4): activations, normalization, elementwise/structural
ops, classic losses/metrics, and minimal recurrent cells — each a pure
jnp function with Caffe's exact semantics (NHWC layout, channel axis -1).
`LAYERS` is the name registry (the LayerRegistry analog,
include/caffe/layer_factory.hpp:56): graph builders resolve ops by the same
type names the prototxt zoo uses.

Convolution/pooling/deconvolution/dense/dropout live in mscnn_tpu.ops.conv;
detection-specific layers in boxes/nms/roi/losses/proposal_target.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from mscnn_tpu.ops import conv as C

# --------------------------------------------------------------------------
# Activations
# --------------------------------------------------------------------------


def relu(x, negative_slope: float = 0.0):
    """ReLU with optional leaky slope (relu_layer.cpp)."""
    return jnp.where(x > 0, x, negative_slope * x)


def prelu(x, slope, channel_shared: bool = False):
    """PReLU: per-channel learned slope [C] (prelu_layer.cpp)."""
    a = slope if channel_shared else slope.reshape(
        (1,) * (x.ndim - 1) + (-1,))
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def elu(x, alpha: float = 1.0):
    return jnp.where(x > 0, x, alpha * (jnp.expm1(x)))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def bnll(x):
    """BNLL: log(1 + exp(x)), overflow-safe (bnll_layer.cpp)."""
    return jnp.where(x > 0, x + jnp.log1p(jnp.exp(-x)), jnp.log1p(jnp.exp(x)))


def power(x, power: float = 1.0, scale: float = 1.0, shift: float = 0.0):
    """(shift + scale * x) ^ power (power_layer.cpp)."""
    return jnp.power(shift + scale * x, power)


def exp(x, base: float = -1.0, scale: float = 1.0, shift: float = 0.0):
    """base^(shift + scale*x); base -1 means e (exp_layer.cpp)."""
    y = shift + scale * x
    return jnp.exp(y) if base <= 0 else jnp.power(base, y)


def log(x, base: float = -1.0, scale: float = 1.0, shift: float = 0.0):
    y = jnp.log(shift + scale * x)
    return y if base <= 0 else y / jnp.log(base)


def absval(x):
    return jnp.abs(x)


def threshold(x, threshold: float = 0.0):
    """Binary indicator x > t (threshold_layer.cpp)."""
    return (x > threshold).astype(x.dtype)


# --------------------------------------------------------------------------
# Normalization
# --------------------------------------------------------------------------


def lrn(x, local_size: int = 5, alpha: float = 1.0, beta: float = 0.75,
        k: float = 1.0):
    """Across-channel local response normalization (lrn_layer.cpp):
    y = x / (k + alpha/n * sum_{window} x^2)^beta, window over channels."""
    sq = x * x
    pad = local_size // 2
    summed = lax.reduce_window(
        sq, 0.0, lax.add,
        window_dimensions=(1,) * (x.ndim - 1) + (local_size,),
        window_strides=(1,) * x.ndim,
        padding=((0, 0),) * (x.ndim - 1) + ((pad, pad),),
    )
    return x / jnp.power(k + alpha / local_size * summed, beta)


def lrn_within(x, local_size: int = 5, alpha: float = 1.0,
               beta: float = 0.75):
    """WITHIN_CHANNEL LRN (lrn_layer.cpp:24-64): the reference composes
    AVE pooling of x^2 over a local_size spatial window (pad (size-1)/2,
    stride 1 — so edge windows use Caffe's clipped pool_size) with a power
    layer (1 + alpha*s)^(-beta); k is unused in this mode. local_size must
    be odd (lrn_layer.cpp CHECK). Pinned against the reference-executed
    layer in tests/test_golden_ref_ops.py."""
    if local_size % 2 != 1:
        raise ValueError("LRN only supports odd values for local_size")
    s = C.avg_pool(x * x, local_size, 1, (local_size - 1) // 2)
    return x * jnp.power(1.0 + alpha * s, -beta)


def batch_norm(x, mean=None, var=None, *, eps: float = 1e-5, axis=-1,
               use_global_stats: bool = True):
    """BatchNorm (no scale/bias — the reference pairs it with a Scale
    layer). With use_global_stats, normalizes by the provided moving
    mean/var; otherwise by batch statistics. Returns (y, mean, var)."""
    if not use_global_stats or mean is None:
        ch = axis if axis >= 0 else x.ndim + axis
        axes = tuple(i for i in range(x.ndim) if i != ch)
        mean = x.mean(axes)
        var = x.var(axes)
    shape = [1] * x.ndim
    shape[axis] = -1
    y = (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
    return y, mean, var


def mvn(x, normalize_variance: bool = True, across_channels: bool = False,
        eps: float = 1e-9):
    """Mean-variance normalization over spatial dims (mvn_layer.cpp)."""
    axes = (1, 2, 3) if across_channels else (1, 2)
    m = x.mean(axes, keepdims=True)
    y = x - m
    if normalize_variance:
        y = y / (jnp.sqrt((y * y).mean(axes, keepdims=True)) + eps)
    return y


def scale(x, scale_param, bias=None, axis: int = -1):
    """Scale layer: per-channel multiply (+ optional bias)."""
    shape = [1] * x.ndim
    shape[axis] = -1
    y = x * scale_param.reshape(shape)
    if bias is not None:
        y = y + bias.reshape(shape)
    return y


def bias(x, bias_param, axis: int = -1):
    shape = [1] * x.ndim
    shape[axis] = -1
    return x + bias_param.reshape(shape)


# --------------------------------------------------------------------------
# Structural
# --------------------------------------------------------------------------


def concat(xs: Sequence, axis: int = -1):
    return jnp.concatenate(list(xs), axis=axis)


def slice_(x, slice_points: Sequence[int], axis: int = -1):
    """Split at explicit points (slice_layer.cpp)."""
    return jnp.split(x, list(slice_points), axis=axis)


def split(x, num: int):
    """Split layer: fan a blob out to multiple consumers (identity copies;
    autodiff accumulates the incoming gradients, which is the layer's whole
    purpose in the reference, insert_splits.cpp)."""
    return tuple(x for _ in range(num))


def flatten(x, axis: int = 1):
    return x.reshape(x.shape[:axis] + (-1,))


def reshape(x, shape):
    return x.reshape(shape)


def eltwise(xs: Sequence, operation: str = "sum",
            coeffs: Optional[Sequence[float]] = None):
    """PROD / SUM (with coefficients) / MAX (eltwise_layer.cpp)."""
    xs = list(xs)
    if operation == "prod":
        out = xs[0]
        for x in xs[1:]:
            out = out * x
        return out
    if operation == "max":
        out = xs[0]
        for x in xs[1:]:
            out = jnp.maximum(out, x)
        return out
    if operation == "sum":
        cs = coeffs if coeffs is not None else [1.0] * len(xs)
        out = cs[0] * xs[0]
        for c, x in zip(cs[1:], xs[1:]):
            out = out + c * x
        return out
    raise ValueError(f"unknown eltwise operation {operation!r}")


def crop(x, ref_shape, offsets, axis: int = 1):
    """Crop x to ref_shape starting at offsets along axes >= axis."""
    starts = [0] * axis + list(offsets)
    sizes = list(x.shape[:axis]) + list(ref_shape[axis:])
    while len(starts) < x.ndim:
        starts.append(0)
    return lax.dynamic_slice(x, starts, sizes)


def tile(x, tiles: int, axis: int = -1):
    reps = [1] * x.ndim
    reps[axis] = tiles
    return jnp.tile(x, reps)


def argmax(x, top_k: int = 1, out_max_val: bool = False, axis: int = -1):
    vals, idx = lax.top_k(jnp.moveaxis(x, axis, -1), top_k)
    return (idx, vals) if out_max_val else idx


def batch_reindex(x, permut):
    """Row gather (batch_reindex_layer.cpp)."""
    return x[permut]


def embed(ids, table, bias_param=None):
    """Embedding lookup [N] -> [N, D] (embed_layer.cpp)."""
    out = table[ids]
    if bias_param is not None:
        out = out + bias_param
    return out


def reduction(x, operation: str = "sum", axis: int = 0, coeff: float = 1.0):
    """SUM / ASUM / SUMSQ / MEAN over trailing axes from `axis`."""
    axes = tuple(range(axis, x.ndim)) if axis >= 0 else (axis,)
    if operation == "sum":
        r = x.sum(axes)
    elif operation == "asum":
        r = jnp.abs(x).sum(axes)
    elif operation == "sumsq":
        r = (x * x).sum(axes)
    elif operation == "mean":
        r = x.mean(axes)
    else:
        raise ValueError(f"unknown reduction {operation!r}")
    return coeff * r


def silence(x):
    """Consume a blob without output (silence_layer.cpp)."""
    return None


def filter_(xs: Sequence, selector):
    """Filter layer with fixed shapes: rows where selector != 0 are
    compacted to the front; a validity mask replaces the reference's
    dynamic row count."""
    keep = selector.reshape(-1) != 0
    order = jnp.argsort(~keep, stable=True)
    return [x[order] for x in xs], keep[order]


def im2col(x, kernel, stride: int = 1, pad: int = 0, dilation: int = 1):
    """Im2col as a graph layer (im2col_layer.cpp / util/im2col.cpp:11-60):
    each output position's receptive-field patch becomes its channel
    vector, ordered Caffe-style channel-major (c*kh*kw + ki*kw + kj).

    x: [B, H, W, C] NHWC -> [B, OH, OW, C*kh*kw]. The reference emits
    NCHW [B, C*kh*kw, OH, OW]; under this framework's NHWC convention the
    channel axis carries the same c-major patch order, so a downstream
    InnerProduct/Reshape consumes identical per-position vectors. XLA
    lowers conv_general_dilated_patches to the same gather/reshape it
    fuses into convolutions — no materialized intermediate unless the
    graph actually uses it.
    """
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    return lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride),
        [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def spp(x, pyramid_height: int = 3, pool: str = "max"):
    """Spatial pyramid pooling (spp_layer.cpp:14-61): level l pools a
    2^l x 2^l grid with kernel = ceil(dim / bins), stride = kernel and
    pad = (kernel*bins - dim + 1) / 2 — the reference's exact window
    placement (pinned in tests/test_golden_ref_ops.py) — then flattens and
    concatenates levels. x: [B, H, W, C] -> [B, D]."""
    b, h, w, c = x.shape
    outs = []
    for level in range(pyramid_height):
        bins = 2 ** level
        kh, kw = -(-h // bins), -(-w // bins)
        ph, pw = (kh * bins - h + 1) // 2, (kw * bins - w + 1) // 2
        fn = C.max_pool if pool == "max" else C.avg_pool
        pooled = fn(x, (kh, kw), (kh, kw), (ph, pw))
        outs.append(pooled[:, :bins, :bins, :].reshape(b, -1))
    return jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------------------
# Losses / metrics
# --------------------------------------------------------------------------


def euclidean_loss(a, b):
    """sum((a - b)^2) / (2N) (euclidean_loss_layer.cpp)."""
    n = a.shape[0]
    return jnp.sum((a - b) ** 2) / (2.0 * n)


def hinge_loss(scores, labels, norm: str = "L1"):
    """Multiclass hinge (hinge_loss_layer.cpp): flip the correct-class
    score's sign, margin 1, L1 or squared L2 accumulation."""
    n, k = scores.shape
    sign = jnp.where(jax.nn.one_hot(labels, k, dtype=scores.dtype) > 0,
                     -1.0, 1.0)
    margins = jnp.maximum(0.0, 1.0 + sign * scores)
    if norm == "L2":
        return jnp.sum(margins * margins) / n
    return jnp.sum(margins) / n


def sigmoid_cross_entropy_loss(logits, targets):
    """Mean-over-batch summed BCE (sigmoid_cross_entropy_loss_layer.cpp)."""
    n = logits.shape[0]
    per = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return per.sum() / n


def multinomial_logistic_loss(probs, labels, eps: float = 1e-20):
    n = probs.shape[0]
    picked = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
    return -jnp.log(jnp.maximum(picked, eps)).sum() / n


def infogain_loss(probs, labels, infogain, eps: float = 1e-20):
    """-sum_k H[label, k] log(p_k) / N (infogain_loss_layer.cpp)."""
    n = probs.shape[0]
    h = infogain[labels]                 # [N, K]
    return -(h * jnp.log(jnp.maximum(probs, eps))).sum() / n


def contrastive_loss(a, b, y, margin: float = 1.0, legacy: bool = False):
    """Siamese contrastive loss (contrastive_loss_layer.cpp): similar pairs
    pull (d^2), dissimilar push to margin."""
    d2 = ((a - b) ** 2).sum(-1)
    d = jnp.sqrt(d2)
    n = a.shape[0]
    if legacy:
        push = jnp.maximum(margin - d2, 0.0)
    else:
        push = jnp.maximum(margin - d, 0.0) ** 2
    return (y * d2 + (1 - y) * push).sum() / (2.0 * n)


def accuracy(scores, labels, top_k: int = 1,
             ignore_label: Optional[int] = None):
    """Top-k accuracy with optional ignore label (accuracy_layer.cpp)."""
    picked = jnp.take_along_axis(scores, labels[:, None], -1)[:, 0]
    rank = (scores > picked[:, None]).sum(-1)
    correct = rank < top_k
    if ignore_label is not None:
        m = labels != ignore_label
        cnt = m.sum()
        return jnp.where(cnt > 0,
                         jnp.where(m, correct, False).sum() / cnt, 0.0)
    return correct.mean()


# --------------------------------------------------------------------------
# Recurrent (lstm_layer / rnn_layer equivalents as lax.scan cells)
# --------------------------------------------------------------------------


def lstm_unit(c_prev, gates):
    """One LSTM step from pre-activation gates [N, 4H] laid out
    (input, forget, output, candidate) like lstm_unit_layer.cpp."""
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c_prev + i * g
    return c, o * jnp.tanh(c)


def lstm(x_seq, params, h0=None, c0=None, cont=None):
    """Sequence LSTM: x_seq [T, N, D], params {wx [D,4H], wh [H,4H],
    b [4H]}. Returns (h_seq [T, N, H], (h_T, c_T)).

    cont: optional [T, N] sequence-continuation indicators (the
    RecurrentLayer's second bottom, recurrent_layer.hpp:28-52):
    cont[t]=0 resets the carried h/c to zero before step t, so multiple
    sequences can be packed along T."""
    hdim = params["wh"].shape[0]
    n = x_seq.shape[1]
    h0 = jnp.zeros((n, hdim)) if h0 is None else h0
    c0 = jnp.zeros((n, hdim)) if c0 is None else c0

    def step(carry, xc):
        h, c = carry
        if cont is None:
            x = xc
        else:
            x, ct = xc
            h = h * ct[:, None]
            c = c * ct[:, None]
        gates = x @ params["wx"] + h @ params["wh"] + params["b"]
        c, h = lstm_unit(c, gates)
        return (h, c), h

    xs = x_seq if cont is None else (x_seq, cont)
    (hT, cT), hs = lax.scan(step, (h0, c0), xs)
    return hs, (hT, cT)


def rnn(x_seq, params, h0=None, cont=None):
    """Caffe RNN (rnn_layer.cpp FillUnrolledNet):
        h_t = tanh(x_t @ wx + h_{t-1} @ wh + b)
        o_t = tanh(h_t @ wo + bo)          <- the layer's output
    params {wx [D,H], b [H], wh [H,H], wo [H,H], bo [H]} (the reference's
    W_xh, b_h, W_hh, W_ho, b_o blob order).  Returns (o_seq [T,N,H], h_T).
    Omit wo/bo for the bare hidden-state recurrence (o_t = h_t).
    cont as in lstm()."""
    hdim = params["wh"].shape[0]
    n = x_seq.shape[1]
    h0 = jnp.zeros((n, hdim)) if h0 is None else h0

    def step(h, xc):
        if cont is None:
            x = xc
        else:
            x, ct = xc
            h = h * ct[:, None]
        h = jnp.tanh(x @ params["wx"] + h @ params["wh"] + params["b"])
        o = jnp.tanh(h @ params["wo"] + params["bo"]) \
            if "wo" in params else h
        return h, o

    xs = x_seq if cont is None else (x_seq, cont)
    hT, os_ = lax.scan(step, h0, xs)
    return os_, hT


# --------------------------------------------------------------------------
# Registry (LayerRegistry analog) — prototxt type name -> function
# --------------------------------------------------------------------------

LAYERS = {
    "ReLU": relu, "PReLU": prelu, "ELU": elu, "Sigmoid": sigmoid,
    "TanH": tanh, "BNLL": bnll, "Power": power, "Exp": exp, "Log": log,
    "AbsVal": absval, "Threshold": threshold,
    "LRN": lrn, "BatchNorm": batch_norm, "MVN": mvn,
    "Scale": scale, "Bias": bias,
    "Concat": concat, "Slice": slice_, "Split": split, "Flatten": flatten,
    "Reshape": reshape, "Eltwise": eltwise, "Crop": crop, "Tile": tile,
    "ArgMax": argmax, "BatchReindex": batch_reindex, "Embed": embed,
    "Reduction": reduction, "Silence": silence, "Filter": filter_,
    "SPP": spp, "Im2col": im2col,
    "EuclideanLoss": euclidean_loss, "HingeLoss": hinge_loss,
    "SigmoidCrossEntropyLoss": sigmoid_cross_entropy_loss,
    "MultinomialLogisticLoss": multinomial_logistic_loss,
    "InfogainLoss": infogain_loss, "ContrastiveLoss": contrastive_loss,
    "Accuracy": accuracy,
    "LSTM": lstm, "RNN": rnn,
    "Convolution": C.conv2d, "Deconvolution": C.deconv2d,
    "Pooling": C.max_pool, "InnerProduct": C.dense, "Dropout": C.dropout,
}


def get_layer(type_name: str):
    if type_name not in LAYERS:
        raise KeyError(f"unknown layer type {type_name!r}; "
                       f"registered: {sorted(LAYERS)}")
    return LAYERS[type_name]

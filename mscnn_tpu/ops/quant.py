"""Post-training int8 quantization for the deploy trunk.

The BASELINE.json north star names "bf16/int8 options" for the trunk; this
module supplies the int8 half: symmetric per-output-channel weight scales,
symmetric per-tensor activation scales calibrated from a handful of
batches, and an int8 conv whose int32 accumulator dequantizes into the
bf16 epilogue (bias + ReLU fuse into the conv output, XLA-side).

Scheme (the standard TPU-friendly PTQ recipe):

    w_q[.., oc] = round(w[.., oc] / w_s[oc]),  w_s = max|w| / 127
    x_q         = round(clip(x / x_s)),        x_s = calibrated max|x|/127
    y           = conv_int8(x_q, w_q) * (x_s * w_s) + b

The trunk convolutions quantize by default (conv1..conv6, loss1_conv1 —
where the single-stage deploy FLOPs live); the per-scale proposal heads
stay bf16 (shallow shapes, no int8 gain — round-3 MXU characterization).
The ROI-head matmuls (roi_c1 3x3x1024 conv, fc6 dense — K = 9.2k/12.8k,
deep-contraction shapes) quantize as a separate opt-in
(MSCNNConfig.int8_roi_head + quantize_roi_heads): they are a minor term
of the single-stage graph but 3-5 head invocations of a cascade.  v5e int8 MXU peak is 2x bf16.  The conv1 pair participates via
calibrate_trunk_scales(include_conv1=True) on the plain-conv path (the
deploy default since r3: its full-res int8 halves the dominant HBM
traffic, 55.3 -> 57.8 img/s over plain bf16 conv1 and beats the fused
bf16 Pallas kernel's 52.7); the Pallas/s2d conv1 paths are bf16-only and
ignore the int8 leaves.

Scales travel INSIDE the params pytree (extra "w_q"/"w_s"/"x_s" leaves per
quantized layer) so a calibrated model round-trips through jit without
recompiling per calibration, and the bf16 "w" stays alongside as the
dequantization oracle / export source.

Capability parity note: the reference has no int8 path (cuDNN-era float,
docs/performance_hardware.md); this is TPU-native headroom, off by
default (MSCNNConfig.int8_trunk).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# trunk layers eligible for int8 (conv1 pair stays in the Pallas kernel)
TRUNK_INT8 = (
    "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
    "conv6_1", "loss1_conv1",
    "rpn_3_conv", "rpn_4_conv",
)

# The conv1 pair is opt-in (calibrate_trunk_scales(include_conv1=True)):
# on the plain-conv path its full-res int8 halves the dominant HBM
# traffic; the fused Pallas kernel path ignores these leaves (bf16-only).
# conv1_1 reads the mean-subtracted input image, whose range is that of
# 8-bit pixels — per-tensor int8 there loses essentially nothing.
CONV1_INT8 = ("conv1_1", "conv1_2")


def quantize_weight(w) -> tuple:
    """HWIO conv weight (or [in, out] dense weight) -> (int8 weight,
    [out_c] f32 scales), symmetric per-output-channel."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_act(x, x_scale):
    """bf16/f32 activation -> int8 with the calibrated per-tensor scale."""
    q = jnp.round(x.astype(jnp.float32) / x_scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def conv2d_int8(x, x_scale, w_q, w_s, b=None, *, stride: int = 1,
                padding="SAME", out_dtype=jnp.bfloat16):
    """int8 x int8 -> int32 conv, dequantized into `out_dtype`.

    x: float activation (quantized internally so the quantize fuses with
    the producer); x_scale: [] f32; w_q: [kh,kw,in,out] int8; w_s: [out].
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    xq = quantize_act(x, x_scale)
    y = lax.conv_general_dilated(
        xq, w_q,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (x_scale * w_s)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def dense_int8(x, x_scale, w_q, w_s, b=None, *, out_dtype=jnp.bfloat16):
    """int8 x int8 -> int32 matmul, dequantized into `out_dtype`.

    x: [M, K] float activation; w_q: [K, N] int8; w_s: [N] f32.
    Same scheme as conv2d_int8 (the ROI head's fc6 is the one big dense
    contraction in the deploy graph: K = 12.8k at pooled 7).
    """
    xq = quantize_act(x, x_scale)
    y = lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (x_scale * w_s)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def calibrate_trunk_scales(params, cfg, images, percentile: float = 99.9,
                           include_conv1: bool = False) -> Dict[str, float]:
    """Per-layer activation scales from representative images.

    Runs the float trunk capturing each quantizable conv's INPUT blob and
    returns {layer: max-abs-based scale}.  `percentile` clips outliers
    (100 = plain max-abs).  images: [N, H, W, 3] mean-subtracted, any
    batch split; a handful of batches suffices for max-abs statistics.
    `include_conv1` also calibrates the conv1 pair (for plain-conv deploy;
    the float pass is forced onto the plain path so conv1_1 is observable).
    """
    import dataclasses

    from mscnn_tpu.models import mscnn as M

    names = TRUNK_INT8 + (CONV1_INT8 if include_conv1 else ())
    if include_conv1 and (cfg.pallas_conv1 or cfg.s2d_conv1):
        cfg = dataclasses.replace(cfg, pallas_conv1=False, s2d_conv1=False)

    feats_fn = jax.jit(lambda p, x: M.trunk(p, x, cfg))
    maxima: Dict[str, float] = {}
    images = np.asarray(images)
    for i in range(images.shape[0]):
        img = images[i: i + 1]
        feats = jax.device_get(feats_fn(params, img))
        for name in names:
            if name not in params:
                continue
            src = _input_blob(name, cfg)
            a = img if src == "__input__" else feats.get(src)
            if a is None:
                continue
            a = np.abs(np.asarray(a, np.float32)).reshape(-1)
            m = float(np.percentile(a, percentile)) if percentile < 100 \
                else float(a.max())
            maxima[name] = max(maxima.get(name, 0.0), m)
    return {k: max(v, 1e-6) / 127.0 for k, v in maxima.items()}


def _input_blob(layer: str, cfg) -> str:
    """Which trunk feature map feeds `layer` (models/mscnn.py trunk
    wiring)."""
    wiring = {
        "conv1_1": "__input__", "conv1_2": "conv1_1",
        "conv2_1": "pool1", "conv2_2": "conv2_1",
        "conv3_1": "pool2", "conv3_2": "conv3_1", "conv3_3": "conv3_2",
        "conv4_1": "pool3", "conv4_2": "conv4_1", "conv4_3": "conv4_2",
        "conv5_1": "pool4", "conv5_2": "conv5_1", "conv5_3": "conv5_2",
        "conv6_1": "pool5", "loss1_conv1": "conv4_3",
        "rpn_3_conv": "pool5", "rpn_4_conv": "pool6",
    }
    return wiring[layer]


def calibrate_roi_head_scales(params, cfg, images, ccfg=None
                              ) -> Dict[str, float]:
    """Activation scales for the ROI-head matmuls (roi_c1 / fc6, incl.
    cascade-stage suffixes) from representative images.

    Runs the deploy graph with `captures` plumbed through roi_head
    (models/mscnn.py): each quantizable input's abs-max comes back as a
    scalar per layer name.  Plain max-abs, not a percentile: the pooled
    blob is mostly exact zeros (masked invalid-roi rows), which poisons
    percentile statistics in both directions.
    """
    import numpy as np

    from mscnn_tpu.models import mscnn as M

    def run(p, x):
        caps: Dict[str, jax.Array] = {}
        if ccfg is not None:
            from mscnn_tpu.models import cascade as CC
            CC.deploy_forward(p, x, ccfg, captures=caps)
        else:
            M.deploy_forward(p, x, cfg, captures=caps)
        return caps

    fn = jax.jit(run)
    maxima: Dict[str, float] = {}
    images = np.asarray(images)
    for i in range(images.shape[0]):
        caps = jax.device_get(fn(params, images[i: i + 1]))
        for name, m in caps.items():
            maxima[name] = max(maxima.get(name, 0.0), float(m))
    return {k: max(v, 1e-6) / 127.0 for k, v in maxima.items()}


def quantize_roi_heads(params, act_scales: Dict[str, float]):
    """Augment the ROI-head matmul layers (roi_c1* conv, fc6* dense) with
    int8 leaves, same layout as quantize_trunk.  cls_pred/bbox_pred stay
    float (tiny contractions, and the bbox regression is
    precision-sensitive)."""
    out = {}
    for name, p in params.items():
        if name in act_scales and "w" in p \
                and (name.startswith("roi_c1") or name.startswith("fc6")):
            w_q, w_s = quantize_weight(p["w"])
            p = dict(p)
            p["w_q"] = w_q
            p["w_s"] = w_s
            p["x_s"] = jnp.asarray(act_scales[name], jnp.float32)
        out[name] = p
    return out


def quantize_trunk(params, act_scales: Dict[str, float]):
    """Augment a params pytree with int8 leaves for the calibrated trunk
    convs: params[name] gains "w_q" (int8), "w_s" ([out] f32), "x_s"
    ([] f32).  The original "w" stays (oracle + export).  Layers without a
    calibrated scale are left untouched (they run the float path)."""
    out = {}
    for name, p in params.items():
        if name in act_scales and "w" in p \
                and name in TRUNK_INT8 + CONV1_INT8:
            w_q, w_s = quantize_weight(p["w"])
            p = dict(p)
            p["w_q"] = w_q
            p["w_s"] = w_s
            p["x_s"] = jnp.asarray(act_scales[name], jnp.float32)
        out[name] = p
    return out

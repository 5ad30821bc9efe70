"""MS-CNN: multi-scale proposal + detection network, as pure functions.

The reference expresses this model as prototxt over a VGG16 trunk with
per-scale "LFCN" heads, an anchor-field BoxOutput proposal stage, and a
Fast-R-CNN style ROI head over 2x-upsampled conv4_3 features
(/root/reference/examples/kitti_car/mscnn-7s-576-2x/mscnn_deploy.prototxt,
trainval_2nd.prototxt). Here the whole network is a pair of pure functions
(init_params, apply) over a flat params dict; everything jit-compiles to one
XLA program with static shapes, and proposals never leave the device.

Layout: NHWC activations, HWIO conv kernels, [in, out] dense weights.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mscnn_tpu.ops import boxes as box_ops
from mscnn_tpu.ops import conv as C
from mscnn_tpu.ops import nms as nms_ops
from mscnn_tpu.ops import roi as roi_ops
from mscnn_tpu.utils import fillers

# VGG16 trunk: (name, out_channels); pools sit between the blocks.
VGG_BLOCKS = (
    ("conv1_1", 64), ("conv1_2", 64),
    ("conv2_1", 128), ("conv2_2", 128),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
)
POOL_AFTER = {"conv1_2": "pool1", "conv2_2": "pool2", "conv3_3": "pool3",
              "conv4_3": "pool4", "conv5_3": "pool5"}


@dataclasses.dataclass(frozen=True)
class BranchSpec:
    """One proposal head: a small FCN on a trunk feature map."""
    name: str       # e.g. "LFCN_1_5x5"
    source: str     # trunk feature: "loss1_conv1", "conv5_3", "conv6_1", "pool6"
    kernel: object  # int (square) or (kh, kw) — citypersons uses 5x3 heads
    stride: int     # image-space downsample rate of the source map
    field_w: float  # anchor field size in image pixels
    field_h: float

    @property
    def kernel_hw(self):
        k = self.kernel
        return (k, k) if isinstance(k, int) else tuple(k)


# Declarative trunk tail applied after the VGG blocks, in order:
#   ("conv", name, source, kernel, out_channels)   3x3 SAME + ReLU
#   ("pool", name, source, mode, kernel, stride)   mode "max" | "ave"
# The kitti/caltech/citypersons family adds conv6 + max pool6 + the
# loss1_conv1 buffer conv on conv4_3; widerface instead AVE-pools pool5 and
# adds per-scale rpn_N_conv 3x3s (examples/widerface/mscnn-12s-2x/
# trainval_2nd.prototxt:360-376, 1191-1199).
KITTI_EXTRA_LAYERS = (
    ("conv", "conv6_1", "pool5", 3, 512),
    ("pool", "pool6", "conv6_1", "max", 2, 2),
    ("conv", "loss1_conv1", "conv4_3", 3, 512),
)
WIDERFACE_EXTRA_LAYERS = (
    ("pool", "pool6", "pool5", "ave", 2, 2),
    ("conv", "rpn_1_conv", "conv4_3", 3, 512),
    ("conv", "rpn_2_conv", "conv5_3", 3, 512),
    ("conv", "rpn_3_conv", "pool5", 3, 512),
    ("conv", "rpn_4_conv", "pool6", 3, 512),
)


@dataclasses.dataclass(frozen=True)
class ProposalSpec:
    """BoxOutput parameters (caffe.proto BoxOutputParameter)."""
    fg_thr: float = -8.0
    iou_thr: float = 0.65
    nms_mode: str = "iou"
    max_nms_num: int = 3000    # pre-NMS top-k cap
    max_out: int = 512         # fixed post-NMS roi capacity (TPU static shape)
    min_size: float = 15.0
    field_whr: float = 2.0
    field_xyr: float = 2.0
    # per-branch pre-top-k before the global sort — exact, wins on
    # many-branch dense pyramids (widerface 12s: -0.5 ms of 24.1 at
    # 1024^2) but costs ~3% on the flagship whose propose is already
    # ~1 ms, so it is a per-config opt-in (A/B in BENCH.md round 4)
    prebranch_topk: bool = False


@dataclasses.dataclass(frozen=True)
class MSCNNConfig:
    name: str = "mscnn-7s-576-2x"
    num_classes: int = 5       # incl. background
    input_hw: tuple = (576, 768)
    branches: tuple = ()
    extra_layers: tuple = KITTI_EXTRA_LAYERS
    proposal: ProposalSpec = dataclasses.field(default_factory=ProposalSpec)
    bbox_mean: tuple = (0.0, 0.0, 0.0, 0.0)
    bbox_std: tuple = (0.1, 0.1, 0.2, 0.2)
    # ROI head
    use_2x_upsample: bool = True
    roi_pooled: int = 7
    roi_pad_ratio: float = 0.25
    roi_spatial_scale: float = 0.25
    roi_samples: int = 8       # sample grid per pooling bin
    # "fast" pools via a shared 2x2 sliding-max table at half the lookups:
    # exact for bins in [2, roi_samples] px (a WIDER envelope than "exact"
    # point sampling, which is only exact to roi_samples px), <=1 px window
    # overreach below 2 px bins. 3-4x faster forward and backward; "exact"
    # remains for oracle comparisons against the reference.
    roi_method: str = "fast"
    roi_align: bool = False    # Cascade variants use ROIAlign
    # split fast-table pooling into <=roi_chunk-roi gathers (lax.map):
    # one fused 512-roi gather falls off a memory cliff (2.8x the cost of
    # 2x256 — BENCH.md round 5, profile_cascade_roi_chunk.py: cascade
    # deploy 54.0 -> 41.6 ms). Bit-exact (gathers are elementwise-
    # independent). 0 disables.
    roi_chunk: int = 256
    fc_dim: int = 4096
    dropout: float = 0.5
    compute_dtype: str = "float32"   # "bfloat16" for the fast path
    # run conv1_1/conv1_2/pool1 on the 2x2 space-to-depth transform
    # (exact equivalence; see ops/s2d.py). Measured NET-SLOWER on v5e with
    # the current XLA (the structured kernel's 4x FLOPs outweigh the
    # occupancy gain: bench 36.9 -> 32.1 img/s), so off by default; kept as
    # an option for future XLA versions / other chips.
    s2d_conv1: bool = False
    # fused Pallas conv1_1+conv1_2+pool1 (pair-lane layout, VMEM-resident
    # full-res activations; ops/pallas/conv1_kernel.py). Exact oracle
    # fallback is the plain conv path (pallas_conv1=False).
    pallas_conv1: bool = False
    # post-training int8 trunk (deploy-only): calibrated layers carry
    # w_q/w_s/x_s leaves (ops/quant.py quantize_trunk); layers without
    # them keep the float path, so a half-calibrated model still runs
    int8_trunk: bool = False
    # post-training int8 ROI-head matmuls (roi_c1 conv + fc6 dense, incl.
    # cascade-stage suffixes — deep contractions, K = 9.2k/12.8k, the
    # good int8 MXU regime per the round-3 characterization). Same leaf
    # scheme via quantize_roi_heads; cls/bbox preds stay float.
    int8_roi_head: bool = False

    @property
    def head_channels(self) -> int:
        return self.num_classes + 4

    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def kitti_car_branches():
    """The 7-scale KITTI-car pyramid (trainval_2nd.prototxt:32-52)."""
    fields = (60.0, 84.0, 120.0, 168.0, 240.0, 336.0, 480.0)
    return (
        BranchSpec("LFCN_1_5x5", "loss1_conv1", 5, 8, fields[0], fields[0]),
        BranchSpec("LFCN_1_7x7", "loss1_conv1", 7, 8, fields[1], fields[1]),
        BranchSpec("LFCN_2_5x5", "conv5_3", 5, 16, fields[2], fields[2]),
        BranchSpec("LFCN_2_7x7", "conv5_3", 7, 16, fields[3], fields[3]),
        BranchSpec("LFCN_3_5x5", "conv6_1", 5, 32, fields[4], fields[4]),
        BranchSpec("LFCN_3_7x7", "conv6_1", 7, 32, fields[5], fields[5]),
        BranchSpec("LFCN_4_5x5", "pool6", 5, 64, fields[6], fields[6]),
    )


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(key, cfg: MSCNNConfig):
    """Initialize the full parameter pytree (flat dict layer -> {w, b}).

    Trunk convs use MSRA (they are meant to be overwritten by imported VGG16
    weights); new layers follow the prototxt fillers: gaussian std 0.01 for
    loss1_conv1/conv6_1/roi_c1/cls_pred, std 0.001 for LFCN heads, fc6 and
    bbox_pred; the 2x upsampler is a frozen bilinear kernel.
    """
    params = {}
    keys = iter(jax.random.split(key, 128))
    in_c = 3
    for lname, out_c in VGG_BLOCKS:
        params[lname] = {
            "w": fillers.msra(next(keys), (3, 3, in_c, out_c)),
            "b": fillers.constant((out_c,)),
        }
        in_c = out_c
    for spec in cfg.extra_layers:
        if spec[0] == "conv":
            _, lname, _, k, out_c = spec
            params[lname] = {
                "w": fillers.gaussian(next(keys), (k, k, 512, out_c), 0.01),
                "b": fillers.constant((out_c,)),
            }
    hc = cfg.head_channels
    for br in cfg.branches:
        kh, kw = br.kernel_hw
        params[br.name] = {
            "w": fillers.gaussian(next(keys), (kh, kw, 512, hc), 0.001),
            "b": fillers.constant((hc,)),
        }
    if cfg.use_2x_upsample:
        params["conv4_3_2x"] = {"w": fillers.bilinear(4, 512)}
    params.update(init_roi_head_params(keys, cfg))
    return params


def init_roi_head_params(keys, cfg: MSCNNConfig, suffix: str = "",
                         bbox_out: Optional[int] = None):
    """ROI-head parameter block (roi_c1 -> fc6 -> cls_pred / bbox_pred),
    optionally name-suffixed for cascade stages (`_2nd`, `_3rd`)."""
    pooled_in = 2 * 512  # org + ctx concat
    grid = cfg.roi_pooled + 1 if cfg.roi_align else cfg.roi_pooled
    fc_in = (grid - 2) * (grid - 2) * 512  # after 3x3 VALID conv
    if bbox_out is None:
        bbox_out = 4 * cfg.num_classes
    return {
        f"roi_c1{suffix}": {
            "w": fillers.gaussian(next(keys), (3, 3, pooled_in, 512), 0.01),
            "b": fillers.constant((512,)),
        },
        f"fc6{suffix}": {
            "w": fillers.gaussian(next(keys), (fc_in, cfg.fc_dim), 0.001),
            "b": fillers.constant((cfg.fc_dim,)),
        },
        f"cls_pred{suffix}": {
            "w": fillers.gaussian(next(keys), (cfg.fc_dim, cfg.num_classes), 0.01),
            "b": fillers.constant((cfg.num_classes,)),
        },
        f"bbox_pred{suffix}": {
            "w": fillers.gaussian(next(keys), (cfg.fc_dim, bbox_out), 0.001),
            "b": fillers.constant((bbox_out,)),
        },
    }


# Layers whose params are frozen during fine-tuning, and layers that keep the
# VGG default multipliers (no param block => lr_mult 1 / decay_mult 1 for both
# weight and bias); everything else is a new layer with w:(1,1) b:(2,1)
# (trainval_2nd.prototxt param blocks).
_FROZEN = ("conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv4_3_2x")
_VGG_DEFAULT = ("conv3_1", "conv3_2", "conv3_3", "conv4_1", "conv4_2",
                "conv4_3", "conv5_1", "conv5_2", "conv5_3")


def param_lr_multipliers(params, cfg: MSCNNConfig):
    """Caffe `param { lr_mult }` pytree: conv1/conv2 and the bilinear
    upsampler frozen, VGG conv3-5 at 1x, new-layer biases at 2x."""
    mults = {}
    for name, p in params.items():
        if name in _FROZEN:
            mults[name] = {k: 0.0 for k in p}
        elif name in _VGG_DEFAULT:
            mults[name] = {k: 1.0 for k in p}
        else:
            mults[name] = {k: (2.0 if k == "b" else 1.0) for k in p}
    return mults


def param_decay_multipliers(params, cfg: MSCNNConfig):
    """Caffe `param { decay_mult }` pytree: 0 for frozen layers, 1 elsewhere
    (the MS-CNN prototxts never decay-exempt biases)."""
    return {
        name: {k: (0.0 if name in _FROZEN else 1.0) for k in p}
        for name, p in params.items()
    }


# ---------------------------------------------------------------------------
# Forward functions
# ---------------------------------------------------------------------------

def _cb(params, name, x, relu=True, int8=False):
    p = params[name]
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    if int8 and "w_q" in p:
        # calibrated int8 fast path (ops/quant.py): int8 x int8 -> int32
        # conv, dequant + bias fused into the epilogue
        from mscnn_tpu.ops import quant as Q
        y = Q.conv2d_int8(x, p["x_s"], p["w_q"], p["w_s"], p["b"],
                          padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
                          out_dtype=x.dtype)
    else:
        y = C.conv2d(x, p["w"].astype(x.dtype), p["b"],
                     padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)])
    return jax.nn.relu(y) if relu else y


def trunk(params, x, cfg: MSCNNConfig):
    """VGG16 trunk + the config's extra tail layers (conv6/pool6/loss1_conv1
    for the kitti family, ave-pool6 + rpn convs for widerface).
    x: [B, H, W, 3] (BGR, mean-subtracted). Returns the feature dict."""
    x = x.astype(cfg.cdtype())
    feats = {}
    blocks = list(VGG_BLOCKS)
    if cfg.pallas_conv1:
        from mscnn_tpu.ops.pallas import conv1_kernel as CK
        x = CK.conv1_pool_fused(
            x, params["conv1_1"]["w"].astype(x.dtype), params["conv1_1"]["b"],
            params["conv1_2"]["w"].astype(x.dtype), params["conv1_2"]["b"])
        x = x.astype(cfg.cdtype())
        feats["pool1"] = x
        blocks = blocks[2:]  # conv1_1 / conv1_2 consumed (their full-res
        #                      feats are never read downstream)
    elif cfg.s2d_conv1 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        from mscnn_tpu.ops import s2d
        x = s2d.conv1_block_s2d(
            x, params["conv1_1"]["w"].astype(x.dtype), params["conv1_1"]["b"],
            params["conv1_2"]["w"].astype(x.dtype), params["conv1_2"]["b"])
        feats["pool1"] = x
        blocks = blocks[2:]  # conv1_1 / conv1_2 consumed (full-res feats
        #                      are never read downstream)
    for lname, _ in blocks:
        x = _cb(params, lname, x, int8=cfg.int8_trunk)
        feats[lname] = x
        if lname in POOL_AFTER:
            x = C.max_pool(x, 2, 2)
            feats[POOL_AFTER[lname]] = x
    for spec in cfg.extra_layers:
        if spec[0] == "conv":
            _, lname, source, _, _ = spec
            feats[lname] = _cb(params, lname, feats[source],
                               int8=cfg.int8_trunk)
        else:
            _, lname, source, mode, k, s = spec
            pool = C.max_pool if mode == "max" else C.avg_pool
            feats[lname] = pool(feats[source], k, s)
    return feats


def heads(params, feats, cfg: MSCNNConfig):
    """Per-branch raw head outputs, f32: list of [B, h, w, C+4]."""
    outs = []
    for br in cfg.branches:
        y = _cb(params, br.name, feats[br.source], relu=False)
        outs.append(y.astype(jnp.float32))
    return outs


def propose(head_outs, cfg: MSCNNConfig, *, apply_bbox_norm: bool = False):
    """BoxOutput: decode all scales, filter, top-k, on-device NMS.

    Returns a dict with fixed-capacity per-image proposals:
      boxes  [B, R, 4]  image-space corners (x1, y1, x2, y2 = x1 + w)
      scores [B, R]
      valid  [B, R]
    R = cfg.proposal.max_out. The per-scale DetectionLoss heads never apply
    bbox normalization in the zoo configs, so apply_bbox_norm defaults off.
    """
    p = cfg.proposal
    mean = cfg.bbox_mean if apply_bbox_norm else None
    std = cfg.bbox_std if apply_bbox_norm else None

    def one_image(per_scale):
        all_b, all_s, all_v = [], [], []
        for br, out in zip(cfg.branches, per_scale):
            b, s, v = box_ops.decode_anchor_field(
                out[..., : cfg.num_classes], out[..., cfg.num_classes:],
                field_w=br.field_w, field_h=br.field_h, stride=br.stride,
                field_whr=p.field_whr, field_xyr=p.field_xyr,
                bbox_mean=mean, bbox_std=std, min_size=p.min_size,
            )
            v = v & (s >= p.fg_thr)
            if p.prebranch_topk and b.shape[0] > p.max_nms_num:
                # exact: every global top-k element is inside its
                # branch's top-k; shrinks the global sort from sum(n_b)
                # to <= n_branches * k (see ProposalSpec.prebranch_topk)
                b, s, v = nms_ops.topk_candidates(b, s, v, p.max_nms_num)
            all_b.append(b)
            all_s.append(s)
            all_v.append(v)
        bb = jnp.concatenate(all_b, 0)
        ss = jnp.concatenate(all_s, 0)
        vv = jnp.concatenate(all_v, 0)
        k = min(p.max_nms_num, bb.shape[0])
        bb, ss, vv = nms_ops.topk_candidates(bb, ss, vv, k)
        ob, os_, ov = nms_ops.nms_xywh(
            bb, ss, vv, iou_thr=p.iou_thr, mode=p.nms_mode, max_out=p.max_out)
        return box_ops.xywh_to_corners(ob), os_, ov

    boxes, scores, valid = jax.vmap(one_image)(head_outs)
    return {"boxes": boxes, "scores": scores, "valid": valid}


def upsampled_roi_feature(params, conv4_3, cfg: MSCNNConfig):
    """The shared ROI source map (conv4_3, 2x bilinear-upsampled when
    configured) — computed once and fed to every cascade stage."""
    if cfg.use_2x_upsample:
        return C.upsample2x_bilinear(
            conv4_3, params["conv4_3_2x"]["w"].astype(conv4_3.dtype))
    return conv4_3


def roi_head(params, conv4_3, batch_idx, rois, valid, cfg: MSCNNConfig,
             *, train: bool = False, dropout_key: Optional[jax.Array] = None,
             suffix: str = "", feat=None, image_major: bool = False,
             captures: Optional[dict] = None):
    """Detection sub-network over proposals.

    conv4_3: [B, H/8, W/8, 512]; batch_idx: [R]; rois: [R, 4] corners;
    valid: [R]. Returns (cls_pred [R, C], bbox_pred [R, 4C or 8]).
    suffix selects a cascade stage's head params; pass feat to reuse an
    already-upsampled ROI source map.

    image_major: caller guarantees rois are grouped image-major with an
    equal count per image (batch_idx == repeat(arange(B), R/B) — what
    flatten_proposals emits). The fast-table pooling then gathers
    per-image from each image's own table slice instead of one batched
    gather over the [B, H, W, C] table — bit-exact, and it removes the
    batch-size gather regression (BENCH.md round 3: the batched form
    degrades 3.4 -> 7.5 ms/img from b1 to b4; the per-image form holds
    ~4.2 ms at both).
    """
    if feat is None:
        feat = upsampled_roi_feature(params, conv4_3, cfg)
    scale = cfg.roi_spatial_scale

    org = ctx = None
    if cfg.roi_align:
        ck = int(cfg.roi_chunk)
        r = rois.shape[0]
        if ck and r > ck and r % ck == 0:
            # same gather-volume cliff as the fast-table path
            # (MSCNNConfig.roi_chunk): bilinear-sample in <=ck-roi chunks
            def _two(args):
                bc, rc, vc = args
                o = roi_ops.roi_align(feat, bc, rc, vc,
                                      spatial_scale=scale, pad_ratio=0.0,
                                      pooled=cfg.roi_pooled)
                c = roi_ops.roi_align(feat, bc, rc, vc,
                                      spatial_scale=scale,
                                      pad_ratio=cfg.roi_pad_ratio,
                                      pooled=cfg.roi_pooled)
                return o, c

            n = r // ck
            org, ctx = jax.lax.map(_two, (batch_idx.reshape(n, ck),
                                          rois.reshape(n, ck, 4),
                                          valid.reshape(n, ck)))
            org = org.reshape(r, *org.shape[2:])
            ctx = ctx.reshape(r, *ctx.shape[2:])
        else:
            pool = lambda pr: roi_ops.roi_align(  # noqa: E731
                feat, batch_idx, rois, valid, spatial_scale=scale,
                pad_ratio=pr, pooled=cfg.roi_pooled)
    elif cfg.roi_method == "fast":
        # (an int8 table — halving the gather bytes — measured NEUTRAL:
        # the bin gathers are DMA-issue-bound, not byte-bound; BENCH.md
        # round 3. ops/roi supports int dtypes if that balance shifts.)
        table = roi_ops.sliding_max_table(feat, 2)
        kw = dict(spatial_scale=scale, pooled=cfg.roi_pooled,
                  samples=max(cfg.roi_samples // 2, 2), table_k=2,
                  is_table=True)
        B = table.shape[0]
        ck = int(cfg.roi_chunk)

        def _pools_chunked(tb, bi, rb, vb):
            """Both pools over one roi set, split into <=roi_chunk-roi
            gathers when large (see MSCNNConfig.roi_chunk)."""
            r = rb.shape[0]
            if not (ck and r > ck and r % ck == 0):
                o = roi_ops.roi_max_pool_fast(tb, bi, rb, vb,
                                              pad_ratio=0.0, **kw)
                c = roi_ops.roi_max_pool_fast(tb, bi, rb, vb,
                                              pad_ratio=cfg.roi_pad_ratio,
                                              **kw)
                return o, c

            def two(args):
                bc, rc, vc = args
                o = roi_ops.roi_max_pool_fast(tb, bc, rc, vc,
                                              pad_ratio=0.0, **kw)
                c = roi_ops.roi_max_pool_fast(tb, bc, rc, vc,
                                              pad_ratio=cfg.roi_pad_ratio,
                                              **kw)
                return o, c

            n = r // ck
            o, c = jax.lax.map(two, (bi.reshape(n, ck),
                                     rb.reshape(n, ck, 4),
                                     vb.reshape(n, ck)))
            return (o.reshape(r, *o.shape[2:]), c.reshape(r, *c.shape[2:]))

        if image_major and B > 1 and rois.shape[0] % B == 0:
            per = rois.shape[0] // B
            rois_b = rois.reshape(B, per, 4)
            valid_b = valid.reshape(B, per)
            zero = jnp.zeros((per,), jnp.int32)

            def one(args):
                tb, rb, vb = args
                return _pools_chunked(tb[None], zero, rb, vb)

            org, ctx = jax.lax.map(one, (table, rois_b, valid_b))
            org = org.reshape(-1, *org.shape[2:])
            ctx = ctx.reshape(-1, *ctx.shape[2:])
        else:
            org, ctx = _pools_chunked(table, batch_idx, rois, valid)
    else:
        pool = lambda pr: roi_ops.roi_max_pool(  # noqa: E731
            feat, batch_idx, rois, valid, spatial_scale=scale,
            pad_ratio=pr, pooled=cfg.roi_pooled, samples=cfg.roi_samples)
    if org is None:
        org = pool(0.0)
        ctx = pool(cfg.roi_pad_ratio)
    x = jnp.concatenate([org, ctx], axis=-1).astype(cfg.cdtype())

    def _capture(name, a):
        # abs-max of a quantizable input, for PTQ calibration
        # (ops/quant.calibrate_roi_head_scales); the cascade re-score
        # heads revisit a suffix, so fold maxima together
        if captures is not None:
            m = jnp.max(jnp.abs(a.astype(jnp.float32)))
            captures[name] = jnp.maximum(captures[name], m) \
                if name in captures else m

    _capture(f"roi_c1{suffix}", x)
    p = params[f"roi_c1{suffix}"]
    if cfg.int8_roi_head and "w_q" in p:
        from mscnn_tpu.ops import quant as Q
        x = jax.nn.relu(Q.conv2d_int8(x, p["x_s"], p["w_q"], p["w_s"],
                                      p["b"], padding="VALID",
                                      out_dtype=x.dtype))
    else:
        x = jax.nn.relu(C.conv2d(x, p["w"].astype(x.dtype), p["b"],
                                 padding="VALID"))
    x = x.reshape(x.shape[0], -1)
    _capture(f"fc6{suffix}", x)
    p = params[f"fc6{suffix}"]
    if cfg.int8_roi_head and "w_q" in p:
        from mscnn_tpu.ops import quant as Q
        x = jax.nn.relu(Q.dense_int8(x, p["x_s"], p["w_q"], p["w_s"],
                                     p["b"], out_dtype=x.dtype))
    else:
        x = jax.nn.relu(C.dense(x, p["w"].astype(x.dtype), p["b"]))
    if train and cfg.dropout > 0:
        x = C.dropout(x, cfg.dropout, dropout_key, train=True)
    p = params[f"cls_pred{suffix}"]
    cls = C.dense(x, p["w"].astype(x.dtype), p["b"])
    p = params[f"bbox_pred{suffix}"]
    bbox = C.dense(x, p["w"].astype(x.dtype), p["b"])
    return cls.astype(jnp.float32), bbox.astype(jnp.float32)


def flatten_proposals(prop):
    """[B, R, ...] proposal dict -> flat per-roi arrays with batch indices."""
    B, R = prop["valid"].shape
    batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    boxes = prop["boxes"].reshape(B * R, 4)
    scores = prop["scores"].reshape(B * R)
    valid = prop["valid"].reshape(B * R)
    return batch_idx, boxes, scores, valid


def deploy_forward(params, images, cfg: MSCNNConfig, *, captures=None):
    """Full inference graph: images -> proposals + per-roi cls/bbox preds.

    images: [B, H, W, 3] BGR mean-subtracted. Mirrors mscnn_deploy.prototxt:
    trunk -> heads -> BoxOutput -> 2x deconv -> ROI pool (org+ctx) -> FC head.
    Returns dict with proposals and raw cls_pred / bbox_pred (the final
    softmax + per-class decode + NMS live in mscnn_tpu.inference).
    captures: optional dict populated with PTQ calibration maxima
    (quant.calibrate_roi_head_scales).
    """
    feats = trunk(params, images, cfg)
    outs = heads(params, feats, cfg)
    prop = propose(outs, cfg)
    batch_idx, boxes, scores, valid = flatten_proposals(prop)
    cls_pred, bbox_pred = roi_head(
        params, feats["conv4_3"], batch_idx, boxes, valid, cfg, train=False,
        image_major=True,   # flatten_proposals emits R rois per image
        captures=captures)
    return {
        "proposals": prop,
        "batch_idx": batch_idx,
        "rois": boxes,
        "roi_scores": scores,
        "roi_valid": valid,
        "cls_pred": cls_pred,
        "bbox_pred": bbox_pred,
    }

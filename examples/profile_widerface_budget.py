"""Fine-grained widerface 12s deploy budget (1024x1024 b1 bf16).

BENCH.md round 4 left "heads+NMS 14.3 of 24.1 ms" undecomposed. This
splits it with the cumulative protocol: trunk -> +rpn source convs ->
+12 branch 1x1 heads -> +decode (no top-k) -> +top-k -> +NMS -> full
(ROI head), and A/Bs one structural lever: merging the per-source 1x1
branch heads into a single conv per source map (5 heads on rpn_1_conv
share an input; each is a [Cin, 6]-column GEMM that pads the MXU's
128-lane N dimension — one [Cin, 30] GEMM wastes 4x less).
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu import inference as I
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import boxes as box_ops
from mscnn_tpu.ops import conv as C
from mscnn_tpu.ops import nms as nms_ops


def timed(jfn, *args, iters=30):
    jax.block_until_ready(jfn(*args))
    for _ in range(3):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def heads_merged(params, feats, cfg):
    """One 1x1 conv per source map, outputs split per branch (bit-equal
    column-wise to the per-branch convs)."""
    by_source = {}
    for bi, br in enumerate(cfg.branches):
        by_source.setdefault(br.source, []).append(bi)
    outs = [None] * len(cfg.branches)
    for src, idxs in by_source.items():
        ws = jnp.concatenate(
            [params[cfg.branches[i].name]["w"] for i in idxs], axis=-1)
        bs = jnp.concatenate(
            [params[cfg.branches[i].name]["b"] for i in idxs], axis=-1)
        x = feats[src]
        y = C.conv2d(x, ws.astype(x.dtype), bs.astype(x.dtype))
        y = y.astype(jnp.float32)
        c0 = 0
        for i in idxs:
            cn = params[cfg.branches[i].name]["b"].shape[0]
            outs[i] = y[..., c0:c0 + cn]
            c0 += cn
    return outs


def decode_only(head_outs, cfg, with_topk):
    p = cfg.proposal

    def one_image(per_scale):
        all_b, all_s, all_v = [], [], []
        for br, out in zip(cfg.branches, per_scale):
            b, s, v = box_ops.decode_anchor_field(
                out[..., : cfg.num_classes], out[..., cfg.num_classes:],
                field_w=br.field_w, field_h=br.field_h, stride=br.stride,
                field_whr=p.field_whr, field_xyr=p.field_xyr,
                bbox_mean=None, bbox_std=None, min_size=p.min_size)
            v = v & (s >= p.fg_thr)
            if with_topk and p.prebranch_topk and b.shape[0] > p.max_nms_num:
                b, s, v = nms_ops.topk_candidates(b, s, v, p.max_nms_num)
            all_b.append(b)
            all_s.append(s)
            all_v.append(v)
        bb = jnp.concatenate(all_b, 0)
        ss = jnp.concatenate(all_s, 0)
        vv = jnp.concatenate(all_v, 0)
        if not with_topk:
            return bb, ss, vv
        k = min(p.max_nms_num, bb.shape[0])
        return nms_ops.topk_candidates(bb, ss, vv, k)

    per_image = [jnp.moveaxis(o, 0, 0) for o in head_outs]
    return jax.vmap(lambda *xs: one_image(xs))(*per_image)


def main():
    cfg = zoo.widerface_12s_2x(deploy=True, input_hw=(1024, 1024))
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    x = jnp.asarray(jax.random.normal(jax.random.key(1), (1, h, w, 3)) * 40)

    res = {}
    graphs = [
        ("trunk", lambda p, x: M.trunk(p, x, cfg)),
        ("heads", lambda p, x: M.heads(p, M.trunk(p, x, cfg), cfg)),
        ("heads_merged", lambda p, x: heads_merged(
            p, M.trunk(p, x, cfg), cfg)),
        ("decode", lambda p, x: decode_only(
            M.heads(p, M.trunk(p, x, cfg), cfg), cfg, with_topk=False)),
        ("decode_topk", lambda p, x: decode_only(
            M.heads(p, M.trunk(p, x, cfg), cfg), cfg, with_topk=True)),
        ("propose", lambda p, x: M.propose(
            M.heads(p, M.trunk(p, x, cfg), cfg), cfg)),
        ("propose_merged", lambda p, x: M.propose(
            heads_merged(p, M.trunk(p, x, cfg), cfg), cfg)),
        ("full", lambda p, x: M.deploy_forward(p, x, cfg)),
    ]
    prev = 0.0
    for name, fn in graphs:
        ms = timed(jax.jit(fn), params, x)
        res[name] = round(ms, 2)
        print(name, res[name], flush=True)

    # numerical check: merged == per-branch heads
    a = jax.jit(lambda p, x: M.heads(p, M.trunk(p, x, cfg), cfg))(params, x)
    b = jax.jit(lambda p, x: heads_merged(
        p, M.trunk(p, x, cfg), cfg))(params, x)
    import numpy as np
    mx = max(float(jnp.max(jnp.abs(ai - bi))) for ai, bi in zip(a, b))
    res["merged_max_abs_diff"] = mx
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

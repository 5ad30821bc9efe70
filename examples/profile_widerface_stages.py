"""Cumulative stage breakdown of the widerface 12s deploy graph at
1024x1024 b1 bf16: trunk -> +heads -> +propose -> full (ROI head), plus
an A/B of a per-branch pre-top-k inside propose (top-k of per-branch
top-ks is exact when each branch keeps min(n_branch, k)).

BENCH.md round 4 context: heads+nms+roi is 14.3 of 24.1 ms/img; this
decomposes it and probes the one algorithmic knob (the 93k-candidate
global top-k) that could plausibly move it. Pipelined-dispatch protocol.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import boxes as box_ops
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


def propose_prebranch_topk(head_outs, cfg):
    """propose() with a per-branch pre-top-k before the global one."""
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
            kb = min(p.max_nms_num, b.shape[0])
            b, s, v = nms_ops.topk_candidates(b, s, v, kb)
            all_b.append(b)
            all_s.append(s)
            all_v.append(v)
        bb = jnp.concatenate(all_b, 0)
        ss = jnp.concatenate(all_s, 0)
        vv = jnp.concatenate(all_v, 0)
        k = min(p.max_nms_num, bb.shape[0])
        bb, ss, vv = nms_ops.topk_candidates(bb, ss, vv, k)
        ob, os_, ov = nms_ops.nms_xywh(
            bb, ss, vv, iou_thr=p.iou_thr, mode=p.nms_mode,
            max_out=p.max_out)
        return box_ops.xywh_to_corners(ob), os_, ov

    boxes, scores, valid = jax.vmap(one_image)(head_outs)
    return {"boxes": boxes, "scores": scores, "valid": valid}


def main():
    cfg = zoo.widerface_12s_2x(deploy=True, input_hw=(1024, 1024))
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    x = jnp.asarray(
        jax.random.normal(jax.random.key(1), (1, h, w, 3)) * 40.0)

    def g_trunk(p, x):
        return M.trunk(p, x, cfg)

    def g_heads(p, x):
        return M.heads(p, M.trunk(p, x, cfg), cfg)

    def g_prop(p, x):
        return M.propose(M.heads(p, M.trunk(p, x, cfg), cfg), cfg)

    def g_prop_pre(p, x):
        return propose_prebranch_topk(
            M.heads(p, M.trunk(p, x, cfg), cfg), cfg)

    def g_full(p, x):
        return M.deploy_forward(p, x, cfg)

    res = {}
    prev = 0.0
    for name, fn in [("trunk", g_trunk), ("heads", g_heads),
                     ("propose", g_prop), ("full", g_full)]:
        ms = timed(jax.jit(fn), params, x)
        res[name] = round(ms, 2)
        res[name + "_delta"] = round(ms - prev, 2)
        prev = ms
    res["propose_prebranch"] = round(timed(jax.jit(g_prop_pre), params, x),
                                     2)
    # equivalence spot check
    a = jax.jit(g_prop)(params, x)
    b = jax.jit(g_prop_pre)(params, x)
    res["prebranch_equal"] = bool(
        jnp.array_equal(a["boxes"], b["boxes"]) &
        jnp.array_equal(a["valid"], b["valid"]))
    print(json.dumps(res))


if __name__ == "__main__":
    main()

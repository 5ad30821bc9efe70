"""Why is the cascade's per-stage ROI cost superlinear in capacity?

profile_cascade_stages.py (BENCH.md round 5): one roi_head stage costs
~4.9 ms at max_out=256 but ~13.7 ms at 512 — 2.8x for 2x the rois. This
A/Bs the same full cascade deploy graph (576x1920 b1 bf16, max_out 512)
with the roi gathers split into chunks of `chunk` rois via lax.map: if
the superlinearity is one fused gather blowing a memory threshold,
chunking restores ~linear cost; if the gathers are issue-bound, the
serialized map makes it worse.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu import inference as I
from mscnn_tpu.models import cascade as CC
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import boxes as box_ops
from mscnn_tpu.ops import roi as roi_ops


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


def chunked_roi_head(params, feat2x_table, rois, valid, cfg, suffix, chunk):
    """roi_head body with the two pools mapped over roi chunks (b1)."""
    from mscnn_tpu.ops import conv as C

    kw = dict(spatial_scale=cfg.roi_spatial_scale, pooled=cfg.roi_pooled,
              samples=max(cfg.roi_samples // 2, 2), table_k=2,
              is_table=True)
    R = rois.shape[0]
    n = R // chunk
    rois_c = rois.reshape(n, chunk, 4)
    valid_c = valid.reshape(n, chunk)
    zero = jnp.zeros((chunk,), jnp.int32)

    def one(args):
        rb, vb = args
        o = roi_ops.roi_max_pool_fast(feat2x_table, zero, rb, vb,
                                      pad_ratio=0.0, **kw)
        c = roi_ops.roi_max_pool_fast(feat2x_table, zero, rb, vb,
                                      pad_ratio=cfg.roi_pad_ratio, **kw)
        return o, c

    org, ctx = jax.lax.map(one, (rois_c, valid_c))
    org = org.reshape(R, *org.shape[2:])
    ctx = ctx.reshape(R, *ctx.shape[2:])
    x = jnp.concatenate([org, ctx], axis=-1).astype(cfg.cdtype())
    p = params[f"roi_c1{suffix}"]
    x = jax.nn.relu(C.conv2d(x, p["w"].astype(x.dtype), p["b"],
                             padding="VALID"))
    x = x.reshape(x.shape[0], -1)
    p = params[f"fc6{suffix}"]
    x = jax.nn.relu(C.dense(x, p["w"].astype(x.dtype), p["b"]))
    p = params[f"cls_pred{suffix}"]
    cls = C.dense(x, p["w"].astype(x.dtype), p["b"])
    p = params[f"bbox_pred{suffix}"]
    bbox = C.dense(x, p["w"].astype(x.dtype), p["b"])
    return cls.astype(jnp.float32), bbox.astype(jnp.float32)


def cascade_chunked(params, images, ccfg, chunk):
    cfg = ccfg.base
    feats = M.trunk(params, images, cfg)
    outs = M.heads(params, feats, cfg)
    prop = M.propose(outs, cfg)
    batch_idx, boxes, scores, valid = M.flatten_proposals(prop)
    boxes = boxes.at[:, 2:].add(-1.0)
    feat2x = M.upsampled_roi_feature(params, feats["conv4_3"], cfg)
    table = roi_ops.sliding_max_table(feat2x, 2)
    cur_boxes, cur_valid = boxes, valid
    cls_pred = bbox_pred = None
    for si, st in enumerate(ccfg.stages):
        cls_pred, bbox_pred = chunked_roi_head(
            params, table, cur_boxes, cur_valid, cfg, st.suffix, chunk)
        if si + 1 < len(ccfg.stages):
            cur_boxes, cur_valid = box_ops.decode_bbox(
                bbox_pred, cur_boxes, cur_valid,
                bbox_mean=(0.0,) * 4, bbox_std=st.bbox_std, train=False)
    return cls_pred, bbox_pred, cur_boxes


def main():
    res = {}
    ccfg = zoo.cascade_kitti_car_7s_576_2x(deploy=True, max_out=512)
    ccfg = dataclasses.replace(
        ccfg, base=dataclasses.replace(ccfg.base, compute_dtype="bfloat16"))
    cfg = ccfg.base
    params = CC.init_params(jax.random.key(0), ccfg)
    h, w = cfg.input_hw
    x = jnp.asarray(jax.random.normal(jax.random.key(1), (1, h, w, 3)) * 40)

    res["baseline_512"] = round(timed(
        jax.jit(lambda p, x: I.cascade_deploy_outputs(p, x, ccfg)),
        params, x), 2)
    print("baseline_512", res["baseline_512"], flush=True)
    for chunk in (256, 128, 64):
        res[f"chunk_{chunk}"] = round(timed(
            jax.jit(lambda p, x, c=chunk: cascade_chunked(p, x, ccfg, c)),
            params, x), 2)
        print(f"chunk_{chunk}", res[f"chunk_{chunk}"], flush=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

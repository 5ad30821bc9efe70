"""ROI-stage sub-breakdown on the flagship deploy geometry.

Cumulative jitted graphs from shared inputs (conv4_3 [1,96,320,512] and
256 proposals): +upsample2x -> +table -> +pools(org/ctx) -> +fc head.
Pipelined-dispatch timing (BENCH.md)."""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import conv as C
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


def main():
    cfg = zoo.kitti_car_8s_768(deploy=True, max_out=256)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    params = M.init_params(jax.random.key(0), cfg)
    ks = jax.random.split(jax.random.key(1), 3)
    conv4_3 = jax.random.normal(ks[0], (1, 96, 320, 512), jnp.bfloat16)
    R = cfg.proposal.max_out
    xy = jax.random.uniform(ks[1], (R, 2)) * jnp.asarray([2000.0, 600.0])
    wh = 30.0 + jax.random.uniform(ks[2], (R, 2)) * 300.0
    rois = jnp.concatenate([xy, xy + wh], 1)
    batch_idx = jnp.zeros((R,), jnp.int32)
    valid = jnp.ones((R,), bool)
    scale = cfg.roi_spatial_scale

    def g_up(p, f):
        return M.upsampled_roi_feature(p, f, cfg)

    def g_table(p, f):
        return roi_ops.sliding_max_table(g_up(p, f), 2)

    def g_pools(p, f):
        table = g_table(p, f)
        pool = lambda pr: roi_ops.roi_max_pool_fast(
            table, batch_idx, rois, valid, spatial_scale=scale,
            pad_ratio=pr, pooled=cfg.roi_pooled,
            samples=max(cfg.roi_samples // 2, 2), table_k=2, is_table=True)
        return pool(0.0), pool(cfg.roi_pad_ratio)

    def g_full(p, f):
        return M.roi_head(p, f, batch_idx, rois, valid, cfg, train=False)

    res = {}
    prev = 0.0
    for name, fn in [("upsample", g_up), ("table", g_table),
                     ("pools", g_pools), ("full_roi_head", g_full)]:
        ms = timed(jax.jit(fn), params, conv4_3)
        res[f"{name}_ms"] = round(ms, 2)
        res[f"{name}_delta_ms"] = round(ms - prev, 2)
        prev = ms
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

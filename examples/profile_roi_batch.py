"""ROI-stage batch-scaling diagnosis (VERDICT r2 item 4).

At b1 vs b4 on the flagship geometry, times the ROI stage's internals:
table build (2x upsample + sliding max, linear in B), the org+ctx bin-max
gathers in the production BATCHED form (one gather over the [B,H,W,C]
table with a batch-index vector), and a PER-IMAGE variant (lax.map over
images, each gathering from its own [1,H,W,C] slice) — bit-exactness of
the variant is asserted before timing. Pipelined protocol; run solo."""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import roi as roi_ops


def timed(jfn, *args, iters=20):
    jax.block_until_ready(jfn(*args))
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
    R = cfg.proposal.max_out
    scale = cfg.roi_spatial_scale
    S = max(cfg.roi_samples // 2, 2)

    for B in (1, 4):
        ks = jax.random.split(jax.random.key(B), 3)
        conv4_3 = jax.random.normal(ks[0], (B, 96, 320, 512), jnp.bfloat16)
        xy = jax.random.uniform(ks[1], (B * R, 2)) \
            * jnp.asarray([2000.0, 600.0])
        wh = 30.0 + jax.random.uniform(ks[2], (B * R, 2)) * 300.0
        rois = jnp.concatenate([xy, xy + wh], 1)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
        valid = jnp.ones((B * R,), bool)

        def g_table(p, f):
            return roi_ops.sliding_max_table(
                M.upsampled_roi_feature(p, f, cfg), 2)

        def pools_batched(p, f):
            table = g_table(p, f)
            pool = lambda pr: roi_ops.roi_max_pool_fast(  # noqa: E731
                table, batch_idx, rois, valid, spatial_scale=scale,
                pad_ratio=pr, pooled=cfg.roi_pooled, samples=S,
                table_k=2, is_table=True)
            return pool(0.0), pool(cfg.roi_pad_ratio)

        def pools_per_image(p, f):
            table = g_table(p, f)
            rois_b = rois.reshape(B, R, 4)
            valid_b = valid.reshape(B, R)
            zero = jnp.zeros((R,), jnp.int32)

            def one(args):
                tb, rb, vb = args
                pool = lambda pr: roi_ops.roi_max_pool_fast(  # noqa: E731
                    tb[None], zero, rb, vb, spatial_scale=scale,
                    pad_ratio=pr, pooled=cfg.roi_pooled, samples=S,
                    table_k=2, is_table=True)
                return pool(0.0), pool(cfg.roi_pad_ratio)

            org, ctx = jax.lax.map(one, (table, rois_b, valid_b))
            return (org.reshape(B * R, *org.shape[2:]),
                    ctx.reshape(B * R, *ctx.shape[2:]))

        jb = jax.jit(pools_batched)
        jp = jax.jit(pools_per_image)
        ob, cb = jax.device_get(jb(params, conv4_3))
        op, cp = jax.device_get(jp(params, conv4_3))
        exact = bool(np.array_equal(ob, op) and np.array_equal(cb, cp))

        jt = jax.jit(g_table)
        t_table = timed(jt, params, conv4_3)
        t_batched = timed(jb, params, conv4_3)
        t_perimg = timed(jp, params, conv4_3)
        print(json.dumps({
            f"b{B}": {
                "table_ms_per_img": round(t_table / B, 2),
                "pools_batched_ms_per_img": round(
                    (t_batched - t_table) / B, 2),
                "pools_per_image_ms_per_img": round(
                    (t_perimg - t_table) / B, 2),
                "per_image_bit_exact": exact,
            }}), flush=True)


if __name__ == "__main__":
    main()

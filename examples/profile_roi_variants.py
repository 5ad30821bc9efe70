"""ROI pool gather restructures, timed on the flagship geometry.

Variants of the table fast path (ops/roi.py _roi_max_pool_table_impl):
  scan      — production: lax.scan over S*S steps, one [R,P,P,C] gather each
  vect      — no scan: one [R,P,S,P,S,C] gather then max over (S,S)
  merged    — org+ctx rois concatenated into ONE impl call (2R rois)
  flatgather— positions flattened to one [R*P*P*S*S] row gather on the
              [H*W, C]-reshaped table, then reshape+max
"""

import dataclasses
import functools
import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu.models import zoo
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


def table_positions(table, batch_idx, boxes, valid, spatial_scale,
                    pad_ratio, pooled, samples, k):
    """Shared index math from _roi_max_pool_table_impl."""
    B, H, W, C = table.shape
    S = samples
    x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
    pad_w = (x2 - x1 + 1.0) * pad_ratio
    pad_h = (y2 - y1 + 1.0) * pad_ratio
    rha = roi_ops.round_half_away
    start_w = rha((x1 - pad_w) * spatial_scale).astype(jnp.int32)
    start_h = rha((y1 - pad_h) * spatial_scale).astype(jnp.int32)
    end_w = rha((x2 + pad_w) * spatial_scale).astype(jnp.int32)
    end_h = rha((y2 + pad_h) * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(end_w - start_w + 1, 1)
    roi_h = jnp.maximum(end_h - start_h + 1, 1)
    lo_h, hi_h = roi_ops._bin_edges(start_h, roi_h, pooled)
    lo_w, hi_w = roi_ops._bin_edges(start_w, roi_w, pooled)
    lo_h, hi_h = jnp.clip(lo_h, 0, H), jnp.clip(hi_h, 0, H)
    lo_w, hi_w = jnp.clip(lo_w, 0, W), jnp.clip(hi_w, 0, W)
    i = jnp.arange(S, dtype=jnp.int32)

    def positions(lo, hi):
        span = jnp.maximum(hi - lo - k, 0)[:, :, None]
        return lo[:, :, None] + (span * i[None, None, :]) // max(S - 1, 1)

    hpos = jnp.clip(positions(lo_h, hi_h), 0, H - 1)
    wpos = jnp.clip(positions(lo_w, hi_w), 0, W - 1)
    empty = ((hi_h - lo_h)[:, :, None] == 0) | ((hi_w - lo_w)[:, None, :] == 0)
    return hpos, wpos, empty


def pool_vect(table, batch_idx, boxes, valid, *, spatial_scale, pad_ratio,
              pooled, samples, k):
    B, H, W, C = table.shape
    hpos, wpos, empty = table_positions(
        table, batch_idx, boxes, valid, spatial_scale, pad_ratio, pooled,
        samples, k)
    bidx = jnp.clip(batch_idx, 0, B - 1)
    g = table[bidx[:, None, None, None, None],
              hpos[:, :, :, None, None],
              wpos[:, None, None, :, :], :]   # [R,P,S,P,S,C]
    out = g.max(axis=(2, 4))
    mask = empty | ~valid[:, None, None]
    return jnp.where(mask[..., None], 0.0, out)


def pool_flatgather(table, batch_idx, boxes, valid, *, spatial_scale,
                    pad_ratio, pooled, samples, k):
    B, H, W, C = table.shape
    S = samples
    R = boxes.shape[0]
    hpos, wpos, empty = table_positions(
        table, batch_idx, boxes, valid, spatial_scale, pad_ratio, pooled,
        samples, k)
    bidx = jnp.clip(batch_idx, 0, B - 1)
    flat = table.reshape(B * H * W, C)
    idx = (bidx[:, None, None, None, None] * (H * W)
           + hpos[:, :, :, None, None] * W
           + wpos[:, None, None, :, :])          # [R,P,S,P,S]
    g = jnp.take(flat, idx.reshape(-1), axis=0)
    g = g.reshape(R, pooled, S, pooled, S, C)
    out = g.max(axis=(2, 4))
    mask = empty | ~valid[:, None, None]
    return jnp.where(mask[..., None], 0.0, out)


def main():
    cfg = zoo.kitti_car_8s_768(deploy=True, max_out=256)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    ks = jax.random.split(jax.random.key(1), 3)
    table = jax.random.normal(ks[0], (1, 192, 640, 512), jnp.bfloat16)
    R = cfg.proposal.max_out
    xy = jax.random.uniform(ks[1], (R, 2)) * jnp.asarray([2000.0, 600.0])
    wh = 30.0 + jax.random.uniform(ks[2], (R, 2)) * 300.0
    rois = jnp.concatenate([xy, xy + wh], 1)
    batch_idx = jnp.zeros((R,), jnp.int32)
    valid = jnp.ones((R,), bool)
    kw = dict(spatial_scale=cfg.roi_spatial_scale, pooled=cfg.roi_pooled,
              samples=max(cfg.roi_samples // 2, 2))

    def two_pool(fn, **extra):
        def f(table):
            a = fn(table, batch_idx, rois, valid, pad_ratio=0.0,
                   **kw, **extra)
            b = fn(table, batch_idx, rois, valid,
                   pad_ratio=cfg.roi_pad_ratio, **kw, **extra)
            return a, b
        return f

    def scan_fn(table, batch_idx, rois, valid, *, pad_ratio, **kw2):
        return roi_ops.roi_max_pool_fast(
            table, batch_idx, rois, valid, pad_ratio=pad_ratio,
            table_k=2, is_table=True, **kw2)

    def merged(table):
        rois2 = jnp.concatenate([rois, rois], 0)
        bidx2 = jnp.concatenate([batch_idx, batch_idx], 0)
        valid2 = jnp.concatenate([valid, valid], 0)
        # pad_ratio differs per half -> emulate with two position sets is
        # not possible in one impl call; instead scale boxes for the ctx
        # half so pad_ratio=0 reproduces the padded window
        pr = cfg.roi_pad_ratio
        x1, y1, x2, y2 = [rois[:, i] for i in range(4)]
        pw, ph = (x2 - x1 + 1.0) * pr, (y2 - y1 + 1.0) * pr
        ctx = jnp.stack([x1 - pw, y1 - ph, x2 + pw, y2 + ph], 1)
        rois2 = jnp.concatenate([rois, ctx], 0)
        out = pool_vect(table, bidx2, rois2, valid2, pad_ratio=0.0,
                        k=2, **kw)
        return out[:R], out[R:]

    res = {}
    ref = jax.jit(two_pool(scan_fn))(table)
    res["scan_ms"] = round(timed(jax.jit(two_pool(scan_fn)), table), 2)
    for name, f in [("vect", jax.jit(two_pool(pool_vect, k=2))),
                    ("flatgather",
                     jax.jit(two_pool(pool_flatgather, k=2))),
                    ("merged", jax.jit(merged))]:
        try:
            out = f(table)
            err = max(float(jnp.abs(a - b).max())
                      for a, b in zip(out, ref))
            res[f"{name}_maxerr"] = err
            res[f"{name}_ms"] = round(timed(f, table), 2)
        except Exception as e:
            res[name] = f"FAIL {type(e).__name__}: {e}"[:160]
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""ROI feature extraction: context-padded max pooling and bilinear align.

TPU-native formulation of the reference's ROIPooling / ROIAlign
(/root/reference/src/caffe/layers/roi_pooling_layer.cpp:63-138 and
roi_align_layer.cpp:49-147): fixed roi count with validity masks, gathers
instead of scalar loops, and a sample-grid max instead of a variable-size
bin scan. With ``samples`` >= the bin pixel count the max is exact (the
sample positions cover every integer pixel of the bin); larger bins are
uniformly subsampled. Both ops differentiate through gather/max, so the
second stage trains end-to-end into the trunk.

ROI format: boxes are image-space corners (x1, y1, x2, y2) with an inclusive
pixel convention (the reference computes pad from x2 - x1 + 1), plus a
per-roi batch index and validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def round_half_away(x):
    """C++ round(): half away from zero (jnp.round is half-to-even)."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def _bin_edges(start, size_px, pooled: int):
    """Caffe bin boundaries: [floor(p*bs), ceil((p+1)*bs)) + start.

    start: [R] int; size_px: [R] int (roi size in feature pixels).
    Returns (lo [R, P], hi [R, P]) un-clamped feature coordinates.

    Computed in exact integer arithmetic (floor(p*s/P) = p*s // P and
    ceil((p+1)*s/P) = ((p+1)*s + P - 1) // P) rather than float32 so the
    result is deterministic under XLA's algebraic rewrites; this matches the
    reference's float path except at exact-integer boundary ties, where
    float32 rounding there can spuriously widen a bin by one pixel.
    """
    p = jnp.arange(pooled, dtype=jnp.int32)
    s = size_px.astype(jnp.int32)[:, None]
    lo = (p[None, :] * s) // pooled + start[:, None]
    hi = ((p[None, :] + 1) * s + pooled - 1) // pooled + start[:, None]
    return lo, hi


@partial(jax.jit, static_argnames=("pooled", "samples"))
def _roi_max_pool_impl(feat, batch_idx, boxes, valid,
                       spatial_scale, pad_ratio, pooled, samples):
    B, H, W, C = feat.shape
    R = boxes.shape[0]
    S = samples

    x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
    pad_w = (x2 - x1 + 1.0) * pad_ratio
    pad_h = (y2 - y1 + 1.0) * pad_ratio
    start_w = round_half_away((x1 - pad_w) * spatial_scale).astype(jnp.int32)
    start_h = round_half_away((y1 - pad_h) * spatial_scale).astype(jnp.int32)
    end_w = round_half_away((x2 + pad_w) * spatial_scale).astype(jnp.int32)
    end_h = round_half_away((y2 + pad_h) * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(end_w - start_w + 1, 1)
    roi_h = jnp.maximum(end_h - start_h + 1, 1)

    lo_h, hi_h = _bin_edges(start_h, roi_h, pooled)
    lo_w, hi_w = _bin_edges(start_w, roi_w, pooled)
    lo_h = jnp.clip(lo_h, 0, H)
    hi_h = jnp.clip(hi_h, 0, H)
    lo_w = jnp.clip(lo_w, 0, W)
    hi_w = jnp.clip(hi_w, 0, W)
    bin_h = hi_h - lo_h  # [R, P]
    bin_w = hi_w - lo_w

    # Sample positions: lo + floor(i * bin / S); covers every pixel when
    # bin <= S, uniform subsample otherwise.
    i = jnp.arange(S, dtype=jnp.int32)
    hpos = lo_h[:, :, None] + (i[None, None, :] * bin_h[:, :, None]) // S  # [R,P,S]
    wpos = lo_w[:, :, None] + (i[None, None, :] * bin_w[:, :, None]) // S
    hpos = jnp.clip(hpos, 0, H - 1)
    wpos = jnp.clip(wpos, 0, W - 1)

    bidx = jnp.clip(batch_idx, 0, B - 1)

    def step(acc, s):
        si, sj = s // S, s % S
        h = hpos[:, :, si]  # [R, P]
        w = wpos[:, :, sj]
        g = feat[bidx[:, None, None], h[:, :, None], w[:, None, :], :]  # [R,P,P,C]
        return jnp.maximum(acc, g), None

    neg = jnp.asarray(-3.0e38, feat.dtype)
    init = jnp.full((R, pooled, pooled, C), neg, feat.dtype)
    out, _ = jax.lax.scan(step, init, jnp.arange(S * S))

    empty = (bin_h[:, :, None] == 0) | (bin_w[:, None, :] == 0)
    mask = empty | ~valid[:, None, None]
    return jnp.where(mask[..., None], 0.0, out)


def roi_max_pool(feat, batch_idx, boxes, valid, *, spatial_scale: float,
                 pad_ratio: float = 0.0, pooled: int = 7, samples: int = 8):
    """Context-padded max ROI pooling (exact sampling path).

    feat: [B, H, W, C]; batch_idx: [R] int; boxes: [R, 4] image-space corners;
    valid: [R] bool. Returns [R, pooled, pooled, C]; invalid rois are zero.
    """
    return _roi_max_pool_impl(feat, batch_idx, boxes, valid,
                              float(spatial_scale), float(pad_ratio),
                              int(pooled), int(samples))


def sliding_max_table(feat, k: int = 2):
    """T[h, w] = max over feat[h:h+k, w:w+k] (edge-padded), one streaming
    pass shared by all pools over the same feature map."""
    return jax.lax.reduce_window(
        feat, -jnp.inf if jnp.issubdtype(feat.dtype, jnp.floating)
        else jnp.asarray(jnp.iinfo(feat.dtype).min, feat.dtype),
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, k - 1), (0, k - 1), (0, 0)),
    )


@partial(jax.jit, static_argnames=("pooled", "samples", "table_k"))
def _roi_max_pool_table_impl(table, batch_idx, boxes, valid,
                             spatial_scale, pad_ratio, pooled, samples,
                             table_k):
    """Fast path: bin maxes looked up from a k x k sliding-max table.

    Each lookup at position p covers feat[p : p+k], so ``samples`` stride-k
    positions cover bins up to samples*k pixels EXACTLY — the same envelope
    as samples*k point samples on the raw map at 1/k the gather count (the
    gather is the deploy graph's bottleneck; see BENCH notes). Bins smaller
    than k overreach by at most k-1 px (the lookup window is clamped inside
    the bin's start), a deliberate speed/fidelity trade for the deploy path;
    training and oracle tests use the exact sampling path.
    """
    B, H, W, C = table.shape
    R = boxes.shape[0]
    S = samples
    k = table_k

    x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
    pad_w = (x2 - x1 + 1.0) * pad_ratio
    pad_h = (y2 - y1 + 1.0) * pad_ratio
    start_w = round_half_away((x1 - pad_w) * spatial_scale).astype(jnp.int32)
    start_h = round_half_away((y1 - pad_h) * spatial_scale).astype(jnp.int32)
    end_w = round_half_away((x2 + pad_w) * spatial_scale).astype(jnp.int32)
    end_h = round_half_away((y2 + pad_h) * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(end_w - start_w + 1, 1)
    roi_h = jnp.maximum(end_h - start_h + 1, 1)

    lo_h, hi_h = _bin_edges(start_h, roi_h, pooled)
    lo_w, hi_w = _bin_edges(start_w, roi_w, pooled)
    lo_h = jnp.clip(lo_h, 0, H)
    hi_h = jnp.clip(hi_h, 0, H)
    lo_w = jnp.clip(lo_w, 0, W)
    hi_w = jnp.clip(hi_w, 0, W)
    bin_h = hi_h - lo_h  # [R, P]
    bin_w = hi_w - lo_w

    # Evenly spread lookup positions from lo to hi-k; consecutive gaps are
    # <= k whenever bin <= S*k, so the k-windows tile the bin exactly.
    # Larger bins are uniformly subsampled; bins < k clamp to lo (the
    # window then pokes at most k-1 px past the bin).
    i = jnp.arange(S, dtype=jnp.int32)

    def positions(lo, hi):
        bin_ = hi - lo
        span = jnp.maximum(bin_ - k, 0)[:, :, None]  # [R, P, 1]
        p = lo[:, :, None] + (span * i[None, None, :]) // max(S - 1, 1)
        return p

    hpos = jnp.clip(positions(lo_h, hi_h), 0, H - 1)  # [R, P, S]
    wpos = jnp.clip(positions(lo_w, hi_w), 0, W - 1)
    bidx = jnp.clip(batch_idx, 0, B - 1)

    def step(acc, s):
        si, sj = s // S, s % S
        h = hpos[:, :, si]
        w = wpos[:, :, sj]
        g = table[bidx[:, None, None], h[:, :, None], w[:, None, :], :]
        return jnp.maximum(acc, g), None

    neg = jnp.asarray(-3.0e38, table.dtype) \
        if jnp.issubdtype(table.dtype, jnp.floating) \
        else jnp.asarray(jnp.iinfo(table.dtype).min, table.dtype)
    init = jnp.full((R, pooled, pooled, C), neg, table.dtype)
    out, _ = jax.lax.scan(step, init, jnp.arange(S * S))

    empty = (bin_h[:, :, None] == 0) | (bin_w[:, None, :] == 0)
    mask = empty | ~valid[:, None, None]
    return jnp.where(mask[..., None], jnp.zeros((), out.dtype), out)


def roi_max_pool_fast(feat_or_table, batch_idx, boxes, valid, *,
                      spatial_scale: float, pad_ratio: float = 0.0,
                      pooled: int = 7, samples: int = 4, table_k: int = 2,
                      is_table: bool = False):
    """Table-accelerated max ROI pooling (deploy fast path).

    Build the table once with sliding_max_table(feat, table_k) and pass
    is_table=True to share it between the org and ctx pools.
    """
    table = feat_or_table if is_table else \
        sliding_max_table(feat_or_table, table_k)
    return _roi_max_pool_table_impl(
        table, batch_idx, boxes, valid, float(spatial_scale),
        float(pad_ratio), int(pooled), int(samples), int(table_k))


@partial(jax.jit, static_argnames=("pooled",))
def _roi_align_impl(feat, batch_idx, boxes, valid, spatial_scale, pad_ratio, pooled):
    B, H, W, C = feat.shape
    G = pooled + 1  # the reference samples a (pooled+1)^2 grid

    x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
    pad_w = (x2 - x1 + 1.0) * pad_ratio
    pad_h = (y2 - y1 + 1.0) * pad_ratio
    start_w = (x1 - pad_w) * spatial_scale - 0.5
    start_h = (y1 - pad_h) * spatial_scale - 0.5
    end_w = (x2 + pad_w) * spatial_scale - 0.5
    end_h = (y2 + pad_h) * spatial_scale - 0.5
    roi_w = end_w - start_w
    roi_h = end_h - start_h
    bs_w = roi_w / pooled
    bs_h = roi_h / pooled

    g = jnp.arange(G, dtype=jnp.float32)
    hf = start_h[:, None] + g[None, :] * bs_h[:, None]  # [R, G]
    wf = start_w[:, None] + g[None, :] * bs_w[:, None]

    # out-of-map grid points produce 0 (reference roi_align_layer.cpp:103-107)
    oob_h = (hf < -0.5) | (hf > H - 0.5)
    oob_w = (wf < -0.5) | (wf > W - 0.5)

    hfloor = jnp.floor(hf).astype(jnp.int32)
    wfloor = jnp.floor(wf).astype(jnp.int32)
    hceil, wceil = hfloor + 1, wfloor + 1
    hf_c = jnp.clip(hf, 0.0, H - 1.0)
    wf_c = jnp.clip(wf, 0.0, W - 1.0)
    hfloor = jnp.clip(hfloor, 0, H - 1)
    wfloor = jnp.clip(wfloor, 0, W - 1)
    hceil = jnp.clip(hceil, 0, H - 1)
    wceil = jnp.clip(wceil, 0, W - 1)

    lh = hf_c - hfloor
    lw = wf_c - wfloor
    hh, hw = 1.0 - lh, 1.0 - lw

    bidx = jnp.clip(batch_idx, 0, B - 1)[:, None, None]

    def gat(hi, wi):
        return feat[bidx, hi[:, :, None], wi[:, None, :], :]  # [R, G, G, C]

    v00 = gat(hfloor, wfloor)
    v10 = gat(hfloor, wceil)
    v01 = gat(hceil, wfloor)
    v11 = gat(hceil, wceil)
    w00 = (hh[:, :, None] * hw[:, None, :])[..., None]
    w10 = (hh[:, :, None] * lw[:, None, :])[..., None]
    w01 = (lh[:, :, None] * hw[:, None, :])[..., None]
    w11 = (lh[:, :, None] * lw[:, None, :])[..., None]
    out = w00 * v00 + w10 * v10 + w01 * v01 + w11 * v11

    malformed = (roi_h <= 0) | (roi_w <= 0)
    zero = (oob_h[:, :, None] | oob_w[:, None, :]
            | malformed[:, None, None] | ~valid[:, None, None])
    return jnp.where(zero[..., None], 0.0, out)


def roi_align(feat, batch_idx, boxes, valid, *, spatial_scale: float,
              pad_ratio: float = 0.0, pooled: int = 7):
    """Bilinear ROI align on a (pooled+1)^2 grid with -0.5 coordinate shift.

    Returns [R, pooled+1, pooled+1, C]; out-of-map grid points and invalid or
    malformed rois produce zeros, matching the reference.
    """
    return _roi_align_impl(feat, batch_idx, boxes, valid,
                           float(spatial_scale), float(pad_ratio), int(pooled))

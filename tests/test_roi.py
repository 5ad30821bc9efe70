"""ROI pooling / align tests against numpy oracles of the reference loops."""

import numpy as np
import jax.numpy as jnp

from mscnn_tpu.ops import roi as R


def np_roi_max_pool(feat, batch_idx, boxes, scale, pad_ratio, pooled):
    """Oracle mirroring roi_pooling_layer.cpp:63-138 (NHWC feat)."""
    B, H, W, C = feat.shape
    n = len(boxes)
    out = np.zeros((n, pooled, pooled, C), np.float32)

    def rnd(v):
        return int(np.trunc(v + (0.5 if v >= 0 else -0.5)))

    for r in range(n):
        x1, y1, x2, y2 = boxes[r]
        pw = (x2 - x1 + 1) * pad_ratio
        ph = (y2 - y1 + 1) * pad_ratio
        sw, sh = rnd((x1 - pw) * scale), rnd((y1 - ph) * scale)
        ew, eh = rnd((x2 + pw) * scale), rnd((y2 + ph) * scale)
        rh, rw = max(eh - sh + 1, 1), max(ew - sw + 1, 1)
        # exact integer bin edges (see _bin_edges for why not float32)
        for phh in range(pooled):
            for pww in range(pooled):
                hs = min(max(phh * rh // pooled + sh, 0), H)
                he = min(max(((phh + 1) * rh + pooled - 1) // pooled + sh, 0), H)
                ws = min(max(pww * rw // pooled + sw, 0), W)
                we = min(max(((pww + 1) * rw + pooled - 1) // pooled + sw, 0), W)
                if he <= hs or we <= ws:
                    out[r, phh, pww] = 0.0
                else:
                    region = feat[batch_idx[r], hs:he, ws:we, :]
                    out[r, phh, pww] = region.max(axis=(0, 1))
    return out


def np_roi_align(feat, batch_idx, boxes, scale, pad_ratio, pooled):
    """Oracle mirroring roi_align_layer.cpp:49-147 (NHWC feat)."""
    B, H, W, C = feat.shape
    n = len(boxes)
    G = pooled + 1
    out = np.zeros((n, G, G, C), np.float32)
    for r in range(n):
        x1, y1, x2, y2 = boxes[r]
        pw = (x2 - x1 + 1) * pad_ratio
        ph = (y2 - y1 + 1) * pad_ratio
        sw = (x1 - pw) * scale - 0.5
        sh = (y1 - ph) * scale - 0.5
        ew = (x2 + pw) * scale - 0.5
        eh = (y2 + ph) * scale - 0.5
        rh, rw = eh - sh, ew - sw
        bsh, bsw = rh / pooled, rw / pooled
        for gi in range(G):
            for gj in range(G):
                if rh <= 0 or rw <= 0:
                    continue
                hf = sh + gi * bsh
                wf = sw + gj * bsw
                if hf < -0.5 or hf > H - 0.5 or wf < -0.5 or wf > W - 0.5:
                    continue
                hfl, wfl = int(np.floor(hf)), int(np.floor(wf))
                hcl, wcl = hfl + 1, wfl + 1
                hf = min(max(hf, 0), H - 1)
                wf = min(max(wf, 0), W - 1)
                hfl = min(max(hfl, 0), H - 1)
                wfl = min(max(wfl, 0), W - 1)
                hcl = min(max(hcl, 0), H - 1)
                wcl = min(max(wcl, 0), W - 1)
                lh, lw = hf - hfl, wf - wfl
                hh, hw = 1 - lh, 1 - lw
                v = (hw * hh * feat[batch_idx[r], hfl, wfl]
                     + lw * hh * feat[batch_idx[r], hfl, wcl]
                     + hw * lh * feat[batch_idx[r], hcl, wfl]
                     + lw * lh * feat[batch_idx[r], hcl, wcl])
                out[r, gi, gj] = v
    return out


def make_case(rng, B=2, H=24, W=32, C=8, n=12, max_roi=60.0):
    feat = rng.randn(B, H, W, C).astype(np.float32)
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 80, n)
    boxes[:, 1] = rng.uniform(0, 60, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(8, max_roi, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(8, max_roi, n)
    bidx = rng.randint(0, B, n).astype(np.int32)
    return feat, bidx, boxes


def test_roi_max_pool_matches_oracle(rng):
    feat, bidx, boxes = make_case(rng)
    for pad_ratio in (0.0, 0.25):
        want = np_roi_max_pool(feat, bidx, boxes, 0.25, pad_ratio, 7)
        got = R.roi_max_pool(
            jnp.asarray(feat), jnp.asarray(bidx), jnp.asarray(boxes),
            jnp.ones(len(boxes), bool),
            spatial_scale=0.25, pad_ratio=pad_ratio, pooled=7, samples=8)
        assert np.allclose(np.asarray(got), want, atol=1e-5), pad_ratio


def test_roi_max_pool_large_roi_subsamples(rng):
    """Bins larger than `samples` px: result must be <= exact max and >= a
    uniform-subsample lower bound (sanity, not exactness)."""
    feat, bidx, boxes = make_case(rng, H=64, W=64, max_roi=250.0)
    want = np_roi_max_pool(feat, bidx, boxes, 1.0, 0.0, 7)
    got = np.asarray(R.roi_max_pool(
        jnp.asarray(feat), jnp.asarray(bidx), jnp.asarray(boxes),
        jnp.ones(len(boxes), bool),
        spatial_scale=1.0, pad_ratio=0.0, pooled=7, samples=8))
    assert (got <= want + 1e-5).all()
    # with enough samples it becomes exact
    got64 = np.asarray(R.roi_max_pool(
        jnp.asarray(feat), jnp.asarray(bidx), jnp.asarray(boxes),
        jnp.ones(len(boxes), bool),
        spatial_scale=1.0, pad_ratio=0.0, pooled=7, samples=40))
    assert np.allclose(got64, want, atol=1e-5)


def test_roi_max_pool_invalid_rois_zero(rng):
    feat, bidx, boxes = make_case(rng)
    valid = np.zeros(len(boxes), bool)
    got = np.asarray(R.roi_max_pool(
        jnp.asarray(feat), jnp.asarray(bidx), jnp.asarray(boxes),
        jnp.asarray(valid), spatial_scale=0.25, pooled=7))
    assert (got == 0).all()


def test_roi_align_matches_oracle(rng):
    feat, bidx, boxes = make_case(rng)
    for pad_ratio in (0.0, 0.25):
        want = np_roi_align(feat, bidx, boxes, 0.25, pad_ratio, 7)
        got = R.roi_align(
            jnp.asarray(feat), jnp.asarray(bidx), jnp.asarray(boxes),
            jnp.ones(len(boxes), bool),
            spatial_scale=0.25, pad_ratio=pad_ratio, pooled=7)
        assert np.allclose(np.asarray(got), want, atol=1e-4), pad_ratio


def test_roi_ops_differentiable(rng):
    import jax
    feat, bidx, boxes = make_case(rng, n=4)

    def loss_pool(f):
        return R.roi_max_pool(f, jnp.asarray(bidx), jnp.asarray(boxes),
                              jnp.ones(4, bool), spatial_scale=0.25,
                              pooled=7).sum()

    def loss_align(f):
        return R.roi_align(f, jnp.asarray(bidx), jnp.asarray(boxes),
                           jnp.ones(4, bool), spatial_scale=0.25,
                           pooled=7).sum()

    g1 = jax.grad(loss_pool)(jnp.asarray(feat))
    g2 = jax.grad(loss_align)(jnp.asarray(feat))
    assert np.isfinite(np.asarray(g1)).all() and np.abs(np.asarray(g1)).sum() > 0
    assert np.isfinite(np.asarray(g2)).all() and np.abs(np.asarray(g2)).sum() > 0

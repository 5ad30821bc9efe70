"""Table-accelerated ROI pooling vs the exact sampling path."""

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.ops import roi as roi_ops


def setup(rng, H=32, W=48, C=8, B=2):
    feat = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    return feat


def test_sliding_max_table_values(rng):
    feat = setup(rng)
    t = roi_ops.sliding_max_table(feat, 2)
    assert t.shape == feat.shape
    f = np.asarray(feat)
    # interior point: max of the 2x2 window
    expect = f[0, 5:7, 9:11, :].max(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(t[0, 5, 9]), expect)
    # edge: padding contributes -inf, window truncates
    expect_edge = f[0, -1:, -1:, :].max(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(t[0, -1, -1]), expect_edge)


def test_fast_matches_exact_for_medium_bins(rng):
    """Bins of 2..8 feature px (k=2, samples=4 covers 8): exact parity."""
    feat = setup(rng, H=64, W=96)
    # spatial_scale 1: roi of 14..56 px -> bins 2..8
    rois = jnp.asarray([
        [4.0, 6.0, 4.0 + 20, 6.0 + 27],
        [10.0, 2.0, 10.0 + 55, 2.0 + 41],
        [0.0, 0.0, 27.0, 55.0],
    ])
    bidx = jnp.zeros(3, jnp.int32)
    valid = jnp.ones(3, bool)
    exact = roi_ops.roi_max_pool(feat, bidx, rois, valid, spatial_scale=1.0,
                                 pad_ratio=0.0, pooled=7, samples=64)
    fast = roi_ops.roi_max_pool_fast(feat, bidx, rois, valid,
                                     spatial_scale=1.0, pad_ratio=0.0,
                                     pooled=7, samples=4, table_k=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-6)


def test_fast_small_bins_overreach_bounded(rng):
    """Bins of 1 px overreach at most 1 px: fast >= exact, and fast <= max
    over the bin dilated by 1."""
    feat = setup(rng, H=32, W=32)
    rois = jnp.asarray([[3.0, 4.0, 3.0 + 6, 4.0 + 6]])  # 7px roi -> 1px bins
    bidx = jnp.zeros(1, jnp.int32)
    valid = jnp.ones(1, bool)
    exact = np.asarray(roi_ops.roi_max_pool(
        feat, bidx, rois, valid, spatial_scale=1.0, pad_ratio=0.0,
        pooled=7, samples=8))
    fast = np.asarray(roi_ops.roi_max_pool_fast(
        feat, bidx, rois, valid, spatial_scale=1.0, pad_ratio=0.0,
        pooled=7, samples=4, table_k=2))
    assert (fast >= exact - 1e-6).all()
    f = np.asarray(feat)[0]
    # overall bound: nothing outside the roi dilated by 1 px
    # (rows from y in [4, 4+7), cols from x in [3, 3+7), +1 dilation)
    region = f[4: 4 + 7 + 1, 3: 3 + 7 + 1].max()
    assert fast.max() <= region + 1e-6


def test_fast_invalid_and_empty_zeroed(rng):
    feat = setup(rng)
    rois = jnp.asarray([[4.0, 4.0, 20.0, 20.0], [4.0, 4.0, 20.0, 20.0]])
    bidx = jnp.zeros(2, jnp.int32)
    valid = jnp.asarray([True, False])
    out = roi_ops.roi_max_pool_fast(feat, bidx, rois, valid,
                                    spatial_scale=1.0, pad_ratio=0.0,
                                    pooled=7, samples=4)
    assert np.abs(np.asarray(out[1])).sum() == 0.0
    assert np.abs(np.asarray(out[0])).sum() > 0.0


def test_fast_path_in_model(rng):
    """roi_head with cfg.roi_method='fast' runs and produces finite logits."""
    import dataclasses
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    cfg = dataclasses.replace(zoo.tiny_test_config(), roi_method="fast")
    params = M.init_params(jax.random.key(0), cfg)
    conv4_3 = jnp.asarray(rng.randn(1, 8, 12, 512), jnp.float32)
    rois = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])
    cls, bbox = M.roi_head(params, conv4_3, jnp.zeros(1, jnp.int32), rois,
                           jnp.ones(1, bool), cfg)
    assert np.isfinite(np.asarray(cls)).all()
    assert np.isfinite(np.asarray(bbox)).all()


def test_roi_head_image_major_bit_exact():
    """The per-image fast-table pooling (image_major=True, the deploy
    batched-serving path) is bit-exact vs the batched gather."""
    import dataclasses

    import jax
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    cfg = zoo.tiny_test_config(deploy=True)
    cfg = dataclasses.replace(cfg, roi_method="fast")
    params = M.init_params(jax.random.key(0), cfg)
    B, R = 3, 16
    h8, w8 = cfg.input_hw[0] // 8, cfg.input_hw[1] // 8
    ks = jax.random.split(jax.random.key(1), 3)
    conv4_3 = jax.random.normal(ks[0], (B, h8, w8, 512), jnp.float32)
    xy = jax.random.uniform(ks[1], (B * R, 2)) * 40.0
    wh = 8.0 + jax.random.uniform(ks[2], (B * R, 2)) * 30.0
    rois = jnp.concatenate([xy, xy + wh], 1)
    batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    valid = jnp.ones((B * R,), bool)

    a = M.roi_head(params, conv4_3, batch_idx, rois, valid, cfg,
                   train=False, image_major=False)
    b = M.roi_head(params, conv4_3, batch_idx, rois, valid, cfg,
                   train=False, image_major=True)
    for x, y, name in ((a[0], b[0], "cls"), (a[1], b[1], "bbox")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_roi_head_chunked_pools_bit_exact():
    """MSCNNConfig.roi_chunk splits the fast-table pools into lax.map'd
    chunks (the 512-roi gather memory cliff, BENCH.md round 5); the split
    must be bit-exact vs the single fused gather, on both the image-major
    and flat paths."""
    import dataclasses

    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    base = zoo.tiny_test_config(deploy=True)
    params = M.init_params(jax.random.key(0), base)
    B, R = 2, 16
    h8, w8 = base.input_hw[0] // 8, base.input_hw[1] // 8
    ks = jax.random.split(jax.random.key(3), 3)
    conv4_3 = jax.random.normal(ks[0], (B, h8, w8, 512), jnp.float32)
    xy = jax.random.uniform(ks[1], (B * R, 2)) * 40.0
    wh = 8.0 + jax.random.uniform(ks[2], (B * R, 2)) * 30.0
    rois = jnp.concatenate([xy, xy + wh], 1)
    batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    valid = jnp.ones((B * R,), bool).at[5].set(False)

    for image_major in (False, True):
        outs = {}
        for chunk in (0, 4):
            cfg = dataclasses.replace(base, roi_chunk=chunk)
            outs[chunk] = M.roi_head(params, conv4_3, batch_idx, rois,
                                     valid, cfg, train=False,
                                     image_major=image_major)
        for a, b, name in ((outs[0][0], outs[4][0], "cls"),
                           (outs[0][1], outs[4][1], "bbox")):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name} image_major={image_major}")

    # the ROIAlign path (cascade-align variants) chunks too; its head
    # params use the (pooled+1)^2 align grid, so re-init for that config
    align_base = dataclasses.replace(base, roi_align=True)
    align_params = M.init_params(jax.random.key(0), align_base)
    outs = {}
    for chunk in (0, 4):
        cfg = dataclasses.replace(align_base, roi_chunk=chunk)
        outs[chunk] = M.roi_head(align_params, conv4_3, batch_idx, rois,
                                 valid, cfg, train=False)
    for a, b, name in ((outs[0][0], outs[4][0], "cls"),
                       (outs[0][1], outs[4][1], "bbox")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"{name} roi_align")

"""Model forward-pass tests: shapes, grid sizes, jit-ability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo


@pytest.fixture(scope="module")
def tiny():
    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_trunk_feature_grids(tiny):
    cfg, params = tiny
    x = jnp.zeros((1, 64, 96, 3))
    feats = M.trunk(params, x, cfg)
    assert feats["conv4_3"].shape == (1, 8, 12, 512)   # stride 8
    assert feats["loss1_conv1"].shape == (1, 8, 12, 512)
    assert feats["conv5_3"].shape == (1, 4, 6, 512)    # stride 16
    assert feats["conv6_1"].shape == (1, 2, 3, 512)    # stride 32
    assert feats["pool6"].shape == (1, 1, 2, 512)      # stride 64


def test_heads_shapes(tiny):
    cfg, params = tiny
    x = jnp.zeros((2, 64, 96, 3))
    feats = M.trunk(params, x, cfg)
    outs = M.heads(params, feats, cfg)
    assert len(outs) == 2
    assert outs[0].shape == (2, 8, 12, cfg.num_classes + 4)
    assert outs[1].shape == (2, 4, 6, cfg.num_classes + 4)


def test_propose_fixed_shapes(tiny, rng):
    cfg, params = tiny
    B = 2
    outs = [
        jnp.asarray(rng.randn(B, 8, 12, cfg.num_classes + 4).astype(np.float32)),
        jnp.asarray(rng.randn(B, 4, 6, cfg.num_classes + 4).astype(np.float32)),
    ]
    prop = M.propose(outs, cfg)
    R = cfg.proposal.max_out
    assert prop["boxes"].shape == (B, R, 4)
    assert prop["scores"].shape == (B, R)
    assert prop["valid"].shape == (B, R)
    v = np.asarray(prop["valid"])
    b = np.asarray(prop["boxes"])
    # valid proposals have positive size and live inside the image
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    assert (w[v] >= cfg.proposal.min_size - 1e-4).all()
    assert (h[v] >= cfg.proposal.min_size - 1e-4).all()
    assert (b[..., 0][v] >= 0).all() and (b[..., 1][v] >= 0).all()


def test_deploy_forward_jit(tiny, rng):
    cfg, params = tiny
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32) * 30)
    fwd = jax.jit(lambda p, im: M.deploy_forward(p, im, cfg))
    out = fwd(params, x)
    R = cfg.proposal.max_out
    assert out["cls_pred"].shape == (R, cfg.num_classes)
    assert out["bbox_pred"].shape == (R, 4 * cfg.num_classes)
    assert np.isfinite(np.asarray(out["cls_pred"])).all()
    # second call hits the cache (no retrace error)
    out2 = fwd(params, x)
    assert np.allclose(np.asarray(out["cls_pred"]), np.asarray(out2["cls_pred"]))


def test_propose_respects_fg_thr(tiny, rng):
    cfg, params = tiny
    B = 1
    # all scores extremely negative -> nothing passes fg_thr
    outs = [
        jnp.asarray(np.full((B, 8, 12, cfg.num_classes + 4), 0.0, np.float32)
                    + np.concatenate([
                        np.array([100.0] + [-100.0] * (cfg.num_classes - 1),
                                 np.float32),
                        np.zeros(4, np.float32)])),
        jnp.asarray(np.full((B, 4, 6, cfg.num_classes + 4), 0.0, np.float32)
                    + np.concatenate([
                        np.array([100.0] + [-100.0] * (cfg.num_classes - 1),
                                 np.float32),
                        np.zeros(4, np.float32)])),
    ]
    prop = M.propose(outs, cfg)
    assert not np.asarray(prop["valid"]).any()


def test_param_lr_multipliers(tiny):
    cfg, params = tiny
    mults = M.param_lr_multipliers(params, cfg)
    assert mults["conv4_3_2x"]["w"] == 0.0
    # conv1/conv2 are frozen, VGG conv3-5 keep default 1x for w and b,
    # new layers get the 2x bias rate (trainval_2nd.prototxt param blocks)
    assert mults["conv1_1"]["w"] == 0.0 and mults["conv1_1"]["b"] == 0.0
    assert mults["conv3_1"]["w"] == 1.0 and mults["conv3_1"]["b"] == 1.0
    assert mults["fc6"]["w"] == 1.0 and mults["fc6"]["b"] == 2.0
    decays = M.param_decay_multipliers(params, cfg)
    assert decays["conv1_1"]["w"] == 0.0 and decays["fc6"]["w"] == 1.0
    assert jax.tree.structure(mults) == jax.tree.structure(params)


def test_bf16_forward(tiny, rng):
    cfg, params = tiny
    import dataclasses
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    feats = M.trunk(params, x, cfg16)
    assert feats["conv4_3"].dtype == jnp.bfloat16
    outs = M.heads(params, feats, cfg16)
    assert outs[0].dtype == jnp.float32  # heads cast back for box math


def test_prebranch_topk_is_exact():
    """ProposalSpec.prebranch_topk must not change propose() outputs:
    per-branch pre-top-k keeps every global top-k element (the widerface
    perf opt-in, BENCH.md round 4)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    cfg = zoo.tiny_test_config(num_classes=2)
    # tiny branches have 8x12=96 and 4x6=24 positions; max_nms_num 64
    # makes the gate active on branch 1 only — both cases covered
    assert cfg.proposal.max_nms_num == 64
    params = M.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(
        2, *cfg.input_hw, 3).astype(np.float32) * 80.0)
    outs = M.heads(params, M.trunk(params, x, cfg), cfg)
    base = M.propose(outs, cfg)
    pre_cfg = dataclasses.replace(cfg, proposal=dataclasses.replace(
        cfg.proposal, prebranch_topk=True))
    pre = M.propose(outs, pre_cfg)
    np.testing.assert_array_equal(np.asarray(base["valid"]),
                                  np.asarray(pre["valid"]))
    np.testing.assert_array_equal(np.asarray(base["boxes"]),
                                  np.asarray(pre["boxes"]))
    np.testing.assert_array_equal(np.asarray(base["scores"]),
                                  np.asarray(pre["scores"]))

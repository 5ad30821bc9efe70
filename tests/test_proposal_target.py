"""ProposalTarget sampling property tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mscnn_tpu.ops import proposal_target as PT
from mscnn_tpu.ops import boxes as B


def spec(**kw):
    d = dict(cls_num=3, batch_size=64, fg_fraction=0.25, fg_thr=0.5,
             bg_thr_hg=0.49, bg_thr_lw=0.1, num_img_per_batch=2,
             img_width=256, img_height=192)
    d.update(kw)
    return PT.ProposalTargetSpec(**d)


def make_inputs(rng, n=40, g=6, num_img=2):
    gt = np.zeros((g, 7), np.float32)
    gt[:, 0] = rng.randint(0, num_img, g)
    gt[:, 1] = rng.uniform(0, 150, g)
    gt[:, 2] = rng.uniform(0, 100, g)
    gt[:, 3] = gt[:, 1] + rng.uniform(30, 60, g)
    gt[:, 4] = gt[:, 2] + rng.uniform(30, 60, g)
    gt[:, 5] = rng.randint(1, 3, g)
    gt[:, 6] = 0
    # proposals: jittered copies of gts (likely fg) + random boxes
    rois = np.zeros((n, 4), np.float32)
    ridx = np.zeros(n, np.int32)
    for i in range(n):
        if i < n // 2:
            j = rng.randint(0, g)
            jit = rng.uniform(-6, 6, 4)
            rois[i] = gt[j, 1:5] + jit
            ridx[i] = gt[j, 0]
        else:
            x, y = rng.uniform(0, 180), rng.uniform(0, 120)
            rois[i] = [x, y, x + rng.uniform(20, 60), y + rng.uniform(20, 60)]
            ridx[i] = rng.randint(0, num_img)
    return ridx, rois, gt


def run(rng, sp=None, seed=0, **kw):
    sp = sp or spec(**kw)
    ridx, rois, gt = make_inputs(rng)
    out = PT.proposal_target(
        jax.random.PRNGKey(seed), jnp.asarray(ridx), jnp.asarray(rois),
        jnp.ones(len(rois), bool), jnp.asarray(gt),
        jnp.ones(len(gt), bool), sp)
    return {k: np.asarray(v) for k, v in out.items()}, ridx, rois, gt, sp


def test_output_shapes_and_fill(rng):
    out, *_ , sp = run(rng)
    R = sp.batch_size
    assert out["rois"].shape == (R, 4)
    assert out["labels"].shape == (R,)
    assert out["bbox_targets"].shape == (R, 4 * sp.cls_num)
    assert out["valid"].all()


def test_fg_count_and_ordering(rng):
    out, ridx, rois, gt, sp = run(rng)
    n_fg = int(out["n_fg"])
    assert n_fg <= round(sp.fg_fraction * sp.batch_size)
    labels = out["labels"]
    # fg slots first, all positive; bg slots all zero
    assert (labels[:n_fg] > 0).all()
    assert (labels[n_fg:] == 0).all()


def test_fg_rois_overlap_their_gt(rng):
    out, ridx, rois, gt, sp = run(rng)
    n_fg = int(out["n_fg"])
    for i in range(n_fg):
        assert out["match_gt"][i, 0] == out["labels"][i]
        assert out["match_gt"][i, 5] >= sp.fg_thr - 1e-5


def test_bg_rois_in_band_or_filled(rng):
    out, ridx, rois, gt, sp = run(rng)
    n_fg = int(out["n_fg"])
    # every bg roi must have overlap < fg_thr with every same-image gt
    for i in range(n_fg, sp.batch_size):
        x1, y1, x2, y2 = out["rois"][i]
        img = out["batch_idx"][i]
        for g in gt:
            if int(g[0]) != int(img):
                continue
            from tests.test_boxes import np_iou_xywh
            ov = np_iou_xywh((x1, y1, x2 - x1 + 1, y2 - y1 + 1),
                             (g[1], g[2], g[3] - g[1] + 1, g[4] - g[2] + 1),
                             "iou")
            assert ov < sp.fg_thr + 1e-5


def test_bbox_targets_decode_back_to_gt(rng):
    out, ridx, rois, gt, sp = run(rng)
    n_fg = int(out["n_fg"])
    for i in range(min(n_fg, 8)):
        lab = int(out["labels"][i])
        t = out["bbox_targets"][i, 4 * lab:4 * lab + 4]
        # (t can be all-zero when the sampled fg roi is an appended gt box)
        assert (out["inside_w"][i, 4 * lab:4 * lab + 4] == 1).all()
        # decode target around the roi -> should recover the matched gt
        dec = np.asarray(B.decode_with_prior(
            jnp.asarray(t[None, :]), jnp.asarray(out["rois"][i][None, :]),
            sp.bbox_mean, sp.bbox_std))[0]
        gtbox = out["match_gt"][i, 1:5]
        assert np.allclose(dec, gtbox, atol=0.5), (dec, gtbox)


def test_no_gts_all_background(rng):
    sp = spec()
    ridx, rois, gt = make_inputs(rng)
    out = PT.proposal_target(
        jax.random.PRNGKey(0), jnp.asarray(ridx), jnp.asarray(rois),
        jnp.ones(len(rois), bool), jnp.asarray(gt),
        jnp.zeros(len(gt), bool), sp)  # all gts invalid
    out = {k: np.asarray(v) for k, v in out.items()}
    assert int(out["n_fg"]) == 0
    assert (out["labels"] == 0).all()
    assert (out["bbox_targets"] == 0).all()


def test_ignored_gts_not_fg(rng):
    ridx, rois, gt = make_inputs(rng)
    gt[:, 6] = 1  # every gt ignored
    sp = spec()
    out = PT.proposal_target(
        jax.random.PRNGKey(0), jnp.asarray(ridx), jnp.asarray(rois),
        jnp.ones(len(rois), bool), jnp.asarray(gt),
        jnp.ones(len(gt), bool), sp)
    assert int(np.asarray(out["n_fg"])) == 0


def test_sample_weight_balance(rng):
    out, ridx, rois, gt, sp = run(rng)
    n_fg = int(out["n_fg"])
    if n_fg > 0:
        w = out["sample_weight"]
        # positive weights sum to ~fg_fraction * R
        assert abs(w[:n_fg].sum() - sp.fg_fraction * sp.batch_size) < 1e-3
        assert abs(w[n_fg:].sum() - (1 - sp.fg_fraction) * sp.batch_size) < 1e-3


def test_deterministic_given_key(rng):
    out1, *_ = run(rng, seed=7)
    rng2 = np.random.RandomState(0)
    out2, *_ = run(rng2, seed=7)
    assert np.allclose(out1["rois"], out2["rois"])
    assert (out1["labels"] == out2["labels"]).all()

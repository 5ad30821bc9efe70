"""Synthetic batch generation (the DummyData-layer analog): random images +
random gt boxes with labels rasterized through the real rasterizer. Used by
`mscnn time`, the driver dry run, and the test suite."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mscnn_tpu.data import rasterize as R


def make_batch(cfg, batch: int = 2, n_gt: int = 3, seed: int = 0,
               with_labels: bool = True):
    """Random batch dict for an MSCNNConfig: image, labels (optional),
    gt_boxes [B, G, 7], gt_valid, plus empty ronis and a full copy region."""
    rng = np.random.RandomState(seed)
    h, w = cfg.input_hw
    images = jnp.asarray(rng.randn(batch, h, w, 3), jnp.float32)

    spec = R.raster_spec_from_config(cfg)
    gt_rows, valid_rows, labels_per_img = [], [], []
    for b in range(batch):
        x1 = rng.uniform(0, w * 0.5, n_gt)
        y1 = rng.uniform(0, h * 0.5, n_gt)
        bw = rng.uniform(12, min(w, 60) * 0.6, n_gt)
        bh = rng.uniform(12, min(h, 60) * 0.6, n_gt)
        lab = rng.randint(1, cfg.num_classes, n_gt)
        if with_labels:
            gts6 = jnp.asarray(
                np.stack([x1, y1, x1 + bw, y1 + bh, lab, np.zeros(n_gt)], -1),
                jnp.float32)
            labels_per_img.append(R.rasterize_labels(
                gts6, jnp.ones(n_gt, bool), jnp.zeros((1, 4), jnp.float32),
                jnp.zeros(1, bool), spec))
        gt_rows.append(np.stack(
            [np.full(n_gt, b), x1, y1, x1 + bw, y1 + bh, lab,
             np.zeros(n_gt)], -1))
        valid_rows.append(np.ones(n_gt, bool))

    out = {
        "image": images,
        "gt_boxes": jnp.asarray(np.stack(gt_rows), jnp.float32),
        "gt_valid": jnp.asarray(np.stack(valid_rows)),
        "ronis": jnp.zeros((batch, 1, 4), jnp.float32),
        "roni_valid": jnp.zeros((batch, 1), bool),
        "copy_region": jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, w, h], jnp.float32), (batch, 4)),
    }
    if with_labels:
        out["labels"] = tuple(
            jnp.stack([labels_per_img[b][s] for b in range(batch)])
            for s in range(len(cfg.branches)))
    return out

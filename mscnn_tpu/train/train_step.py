"""End-to-end MS-CNN training step, single XLA program, DP over a mesh.

This replaces the reference's Solver::Step hot loop
(/root/reference/src/caffe/solver.cpp:194-274) plus P2PSync multi-GPU data
parallelism (/root/reference/src/caffe/parallel.cpp:325-380). One call =
forward (trunk -> per-scale heads -> detection losses -> BoxOutput ->
ProposalTarget -> ROI head -> cls/bbox losses) + backward + solver update,
entirely on device: no host NMS roundtrip (box_output_layer.cpp runs on CPU
every iteration in the reference) and no host bootstrap scan
(detection_loss_layer.cu:129-190).

Parallelism: `shard_map` over a 1-D "data" mesh axis; each device consumes a
disjoint micro-batch (like each P2PSync worker), gradients are `pmean`-ed
over ICI (the reference's tree-reduce + 1/solver_count scaling,
parallel.cpp:375-377), and every device applies the identical update to its
replicated params.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mscnn_tpu.data import rasterize as RZ
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.ops import losses as L
from mscnn_tpu.ops import proposal_target as PT
from mscnn_tpu.train import solver as S


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    """Stage-dependent training hyperparameters (trainval_{1st,2nd}.prototxt)."""
    stage: int = 2                    # 1 = proposal sub-net only, 2 = joint
    sample_mode: str = "bootstrap"    # stage 1 uses "random"
    pos_neg_weighted: bool = True     # stage 1: false
    branch_loss_weight: float = 0.9   # per-scale DetectionLoss loss_weight
    cls_loss_weight: float = 1.0
    bbox_loss_weight: float = 1.0
    smooth_l1_sigma: float = 1.0
    fg_threshold: float = 0.5         # rasterizer fg IoU (image_gt_data_param)
    bg_threshold: float = 0.2
    bg_multiple: float = 2.0
    roi_batch: int = 256              # ProposalTarget batch_size (TRAIN)
    roi_fg_fraction: float = 0.25
    roi_fg_thr: float = 0.5
    roi_bg_thr_hg: float = 0.49
    roi_bg_thr_lw: float = 0.1
    with_metrics: bool = True
    # image normalization for uint8 loader batches (AugmentSpec
    # emit_uint8): (img - mean) * scale happens on device, masked to the
    # pasted copy region so values match the float loader path exactly
    input_mean: tuple = (104.0, 117.0, 123.0)
    input_scale: float = 1.0


def branch_loss_specs(cfg: M.MSCNNConfig, tspec: TrainSpec):
    """Per-branch DetectionLossSpec; DetectionLoss heads in the zoo never use
    bbox mean/std normalization (only the roi-stage bbox_pred does)."""
    return tuple(
        L.DetectionLossSpec(
            cls_num=cfg.num_classes,
            field_w=br.field_w, field_h=br.field_h, stride=br.stride,
            field_whr=cfg.proposal.field_whr, field_xyr=cfg.proposal.field_xyr,
            bg_threshold=tspec.bg_threshold, bg_multiple=tspec.bg_multiple,
            sample_mode=tspec.sample_mode,
            pos_neg_weighted=tspec.pos_neg_weighted,
        )
        for br in cfg.branches
    )


def proposal_target_spec(cfg: M.MSCNNConfig, tspec: TrainSpec,
                         num_img: int) -> PT.ProposalTargetSpec:
    h, w = cfg.input_hw
    return PT.ProposalTargetSpec(
        cls_num=cfg.num_classes,
        batch_size=tspec.roi_batch,
        fg_fraction=tspec.roi_fg_fraction,
        fg_thr=tspec.roi_fg_thr,
        bg_thr_hg=tspec.roi_bg_thr_hg,
        bg_thr_lw=tspec.roi_bg_thr_lw,
        num_img_per_batch=num_img,
        img_width=w, img_height=h,
        bbox_mean=cfg.bbox_mean, bbox_std=cfg.bbox_std,
    )


def rasterize_batch(batch, cfg: M.MSCNNConfig, tspec: TrainSpec):
    """On-device per-scale label rasterization from the batch's gt/roni
    boxes — replaces the reference's prefetch-thread C++ label loop
    (image_gt_data_layer.cpp:640-744) with vectorized jnp under jit."""
    rspec = RZ.raster_spec_from_config(cfg, fg_threshold=tspec.fg_threshold)

    def one(gt7, gtv, ronis, roniv, region):
        gts6 = jnp.concatenate([gt7[:, 1:5], gt7[:, 5:6], gt7[:, 6:7]], -1)
        return tuple(RZ.rasterize_labels(gts6, gtv, ronis, roniv, rspec,
                                         copy_region=region))

    return jax.vmap(one)(batch["gt_boxes"], batch["gt_valid"],
                         batch["ronis"], batch["roni_valid"],
                         batch["copy_region"])


def sync_input_norm(tspec: TrainSpec, aug) -> TrainSpec:
    """Mirror the AugmentSpec's mean/scale into TrainSpec.input_mean/scale.

    normalize_uint8_batch reads mean/scale from TrainSpec while the loader
    reads them from AugmentSpec; any emit_uint8 caller that forgets to keep
    them in sync silently trains on wrongly normalized images. Every call
    site that builds both specs should route through this helper."""
    import dataclasses as _dc
    return _dc.replace(tspec, input_mean=tuple(aug.mean_values),
                       input_scale=float(aug.scale))


def normalize_uint8_batch(batch, tspec: TrainSpec):
    """Device-side image normalization for uint8 loader batches.

    The augment chain keeps the image uint8 until the final paste
    (image_gt_data_layer.cpp:568-599 does the same: cv::Mat bytes into a
    mean-subtracted float blob), so shipping raw uint8 and normalizing
    here is bit-identical to the float loader path while moving 4x fewer
    bytes host->device. Outside the pasted copy region the float path
    holds zeros (the reference zero-fills the batch blob); the
    copy-region mask reproduces that exactly.
    No-op for float batches (the oracle path).
    """
    img = batch.get("image")
    if img is None or img.dtype != jnp.uint8:
        return batch
    _, h, w, _ = img.shape
    mean = jnp.asarray(tspec.input_mean, jnp.float32)
    x = (img.astype(jnp.float32) - mean) * tspec.input_scale
    cr = batch["copy_region"]          # [B, 4] = (src_x, src_y, w, h)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :]
    mx = (xs >= cr[:, 0:1]) & (xs < cr[:, 0:1] + cr[:, 2:3])
    my = (ys >= cr[:, 1:2]) & (ys < cr[:, 1:2] + cr[:, 3:4])
    mask = (my[:, :, None] & mx[:, None, :])[..., None]
    return {**batch, "image": jnp.where(mask, x, 0.0)}


def _flatten_gts(gt_boxes, gt_valid):
    """[B, G, 7] per-image gts -> flat [B*G, 7] with batch-index column."""
    b, g, _ = gt_boxes.shape
    img = jnp.repeat(jnp.arange(b, dtype=jnp.float32), g)
    flat = gt_boxes.reshape(b * g, 7).at[:, 0].set(img)
    return flat, gt_valid.reshape(b * g)


def loss_fn(params, batch, key, cfg: M.MSCNNConfig, tspec: TrainSpec):
    """Total training loss + metrics for one (micro-)batch.

    batch = {"image": [B, H, W, 3] BGR mean-subtracted,
             "labels": tuple of per-scale [B, h, w, 6] maps,
             "gt_boxes": [B, G, 7] (img_id, x1, y1, x2, y2, label, ignored),
             "gt_valid": [B, G] bool}.
    When "labels" is absent the maps are rasterized on device from
    gt_boxes/ronis/copy_region (see rasterize_batch).
    """
    specs = branch_loss_specs(cfg, tspec)
    k_det, k_pt, k_drop = jax.random.split(key, 3)

    labels = batch.get("labels")
    if labels is None:
        labels = rasterize_batch(batch, cfg, tspec)

    feats = M.trunk(params, batch["image"], cfg)
    outs = M.heads(params, feats, cfg)

    total = 0.0
    metrics = {}
    det_keys = jax.random.split(k_det, len(outs))
    for i, (out, lab, spec) in enumerate(zip(outs, labels, specs)):
        li, aux = L.detection_loss(out, lab, spec, key=det_keys[i])
        total = total + tspec.branch_loss_weight * li
        metrics[f"det_loss_{i}"] = li
        if tspec.with_metrics:
            acc = L.detection_accuracy(out, lab, spec)
            metrics[f"det_acc_{i}"] = acc["accuracy"]
            metrics[f"det_fg_acc_{i}"] = acc["fore_accuracy"]
            metrics[f"det_boxiou_{i}"] = acc["boxiou"]

    if tspec.stage >= 2:
        # BoxOutput never backprops in the reference (propagate_down: 0);
        # stopping gradients here also keeps the non-differentiable Pallas
        # NMS kernel out of the autodiff graph.
        prop = M.propose(jax.tree.map(jax.lax.stop_gradient, outs), cfg)
        batch_idx, boxes, _, valid = M.flatten_proposals(prop)
        gt_flat, gt_valid_flat = _flatten_gts(batch["gt_boxes"], batch["gt_valid"])
        pts = proposal_target_spec(cfg, tspec, batch["image"].shape[0])
        # BoxOutput emits continuous x2 = x1 + w; ProposalTarget expects the
        # reference's inclusive convention (w = x2 - x1 + 1), adjust here.
        boxes_incl = boxes.at[:, 2:].add(-1.0)
        sample = PT.proposal_target(
            k_pt, batch_idx, jax.lax.stop_gradient(boxes_incl),
            valid, gt_flat, gt_valid_flat, pts)
        cls_pred, bbox_pred = M.roi_head(
            params, feats["conv4_3"], sample["batch_idx"], sample["rois"],
            sample["valid"], cfg, train=True, dropout_key=k_drop)
        cls_loss = L.softmax_ce_loss(cls_pred, sample["labels"],
                                     valid=sample["valid"])
        bbox_loss = L.smooth_l1_loss(
            bbox_pred, sample["bbox_targets"], sample["inside_w"],
            sample["outside_w"], sigma=tspec.smooth_l1_sigma)
        total = total + tspec.cls_loss_weight * cls_loss \
            + tspec.bbox_loss_weight * bbox_loss
        metrics["loss_cls"] = cls_loss
        metrics["loss_bbox"] = bbox_loss
        if tspec.with_metrics:
            metrics["cls_accuracy"] = L.roi_accuracy(
                cls_pred, sample["labels"], sample["valid"])
            post, pre = L.bbox_accuracy(
                bbox_pred, sample["rois"], sample["match_gt"], sample["valid"],
                bbox_mean=cfg.bbox_mean, bbox_std=cfg.bbox_std)
            metrics["bbox_iou"] = post
            metrics["bbox_iou_pre"] = pre

    metrics["loss"] = total
    return total, metrics


def prune_frozen_params(params, lr_mults):
    """stop_gradient every param whose lr_mult is 0 — the autodiff-side
    half of Caffe's backward-need pruning (net.cpp:191-247). Must be
    applied INSIDE the differentiated objective (grad of the stopped value
    is an exact zero, and XLA drops the dead backward chain). Leaves
    without a recorded mult stay trainable."""
    def maybe_stop(path, leaf):
        mult = lr_mults
        try:
            for entry in path:
                mult = mult[entry.key]
        except (KeyError, TypeError):
            return leaf
        return jax.lax.stop_gradient(leaf) if mult == 0.0 else leaf

    return jax.tree_util.tree_map_with_path(maybe_stop, params)


def make_train_step(cfg: M.MSCNNConfig, tspec: TrainSpec, sspec: S.SolverSpec,
                    lr_mults=None, decay_mults=None,
                    mesh: Optional[Mesh] = None, donate: bool = True,
                    loss_function=None):
    """Build the jitted train step.

    Returns step(train_state, batch, key) -> (train_state, metrics) where
    train_state = {"params": ..., "solver": ...}. With a mesh, the batch is
    consumed sharded over the leading axis of every array in `batch` and the
    params/solver state are fully replicated. loss_function overrides the
    objective (signature (params, batch, key, cfg, tspec) -> (loss, metrics);
    the cascade trainer passes models.cascade's variant).
    """
    user_objective = loss_function if loss_function is not None else loss_fn

    def objective(params, batch, key, cfg, tspec):
        # uint8 loader batches normalize on device (no-op for float)
        return user_objective(params, normalize_uint8_batch(batch, tspec),
                              key, cfg, tspec)

    # Backward-need pruning (net.cpp:191-247 parity): a param with
    # lr_mult 0 never updates (local_rate 0 and zero-initialized history),
    # so cut it out of the autodiff graph entirely.  With MS-CNN's frozen
    # conv1/conv2 this lets XLA drop the whole backward below conv3_1 —
    # the full-resolution dgrad/wgrad and pool1/pool2 select-and-scatter
    # that otherwise dominate the step (BENCH.md round 3).  The returned
    # grads are exact zeros for frozen leaves, which is also what the
    # reference's pruned layers report.
    if lr_mults is not None:
        base_objective = objective

        def objective(params, batch, key, cfg, tspec):  # noqa: F811
            return base_objective(prune_frozen_params(params, lr_mults),
                                  batch, key, cfg, tspec)

    def grads_and_metrics(params, batch, key):
        if sspec.iter_size > 1:
            # gradient accumulation: batch pytree carries a leading
            # [iter_size] axis of micro-batches (see stack_microbatches);
            # apply_update divides by iter_size (the Normalize step).
            def micro(carry, mb_and_key):
                mb, k = mb_and_key
                (_, m), g = jax.value_and_grad(
                    objective, has_aux=True)(params, mb, k, cfg, tspec)
                return jax.tree.map(jnp.add, carry, g), m

            zeros = jax.tree.map(jnp.zeros_like, params)
            keys = jax.random.split(key, sspec.iter_size)
            grads, metrics = jax.lax.scan(micro, zeros, (batch, keys))
            metrics = jax.tree.map(lambda m: m.mean(0), metrics)
            return grads, metrics
        (_, metrics), grads = jax.value_and_grad(
            objective, has_aux=True)(params, batch, key, cfg, tspec)
        return grads, metrics

    if mesh is None:
        def step(train_state, batch, key):
            grads, metrics = grads_and_metrics(
                train_state["params"], batch, key)
            params, sstate, lr = S.apply_update(
                train_state["params"], grads, train_state["solver"], sspec,
                lr_mults, decay_mults)
            metrics["lr"] = lr
            return {"params": params, "solver": sstate}, metrics

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=({"params": P(), "solver": P()}, P(axis), P()),
        out_specs=({"params": P(), "solver": P()}, P()),
        check_vma=False,
    )
    def sharded_step(train_state, batch, key):
        # Decorrelate per-device sampling like the reference's per-worker
        # seed offset (parallel.cpp:276-282).
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        grads, metrics = grads_and_metrics(train_state["params"], batch, key)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        params, sstate, lr = S.apply_update(
            train_state["params"], grads, train_state["solver"], sspec,
            lr_mults, decay_mults)
        metrics["lr"] = lr
        return {"params": params, "solver": sstate}, metrics

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: M.MSCNNConfig, tspec: TrainSpec,
                   mesh: Optional[Mesh] = None):
    """Forward-only metric step (the solver's Test() loop body). Metric
    values of -1 mark batches with no valid samples; Test-averaging skips
    them (solver.cpp:368-394)."""
    eval_tspec = dataclasses.replace(tspec, with_metrics=True)

    def step(params, batch, key):
        _, metrics = loss_fn(params, normalize_uint8_batch(batch, tspec),
                             key, cfg, eval_tspec)
        return metrics

    if mesh is None:
        return jax.jit(step)

    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def sharded(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return jax.lax.pmean(step(params, batch, key), axis)

    return jax.jit(sharded)


def stack_microbatches(batches):
    """Stack iter_size batch dicts on a new leading axis for the
    gradient-accumulation path."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def _put_global(x, sharding: NamedSharding):
    """device_put that also works when the mesh spans multiple processes:
    each process contributes its process-local portion (the full value for
    replicated specs) and jax assembles the global array."""
    if jax.process_count() > 1:
        import numpy as np
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def replicate_state(train_state, mesh: Mesh):
    """Place params/solver state fully replicated on the mesh. Multi-host:
    every process must hold identical values (deterministic init)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: _put_global(x, sharding), train_state)


def shard_batch(batch, mesh: Mesh):
    """Shard every leading axis of the batch pytree over the data axis.
    Multi-host: `batch` is this process's local slice of the global batch
    (global batch = concatenation over processes in process order), the
    analog of P2PSync's workers consuming disjoint batches."""
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.tree.map(lambda x: _put_global(x, sharding), batch)

"""End-to-end training-step tests on the tiny config: single-device loss
descent, data-parallel shard_map equivalence of replicated state, and the
eval step's -1 metric convention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.data import rasterize as R
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.parallel import data_parallel_mesh
from mscnn_tpu.train import solver as S
from mscnn_tpu.train import train_step as T


from mscnn_tpu.data.synthetic import make_batch  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    return cfg, params


def test_single_device_stage2_descends(tiny):
    cfg, params = tiny
    tspec = T.TrainSpec(stage=2, roi_batch=32, with_metrics=False)
    sspec = S.SolverSpec(type="sgd", base_lr=1e-3, lr_policy="fixed",
                         momentum=0.9, weight_decay=5e-4)
    step = T.make_train_step(cfg, tspec, sspec, donate=False)
    batch = make_batch(cfg)
    state = {"params": params, "solver": S.init_state(params, sspec)}
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert float(metrics["lr"]) == pytest.approx(1e-3)


def test_stage1_proposal_only(tiny):
    cfg, params = tiny
    tspec = T.TrainSpec(stage=1, sample_mode="random",
                        pos_neg_weighted=False, with_metrics=True)
    sspec = S.SolverSpec(base_lr=5e-5, lr_policy="fixed")
    step = T.make_train_step(cfg, tspec, sspec, donate=False)
    batch = make_batch(cfg)
    state = {"params": params, "solver": S.init_state(params, sspec)}
    state, metrics = step(state, batch, jax.random.key(0))
    assert "loss_cls" not in metrics          # no roi stage
    assert np.isfinite(float(metrics["loss"]))
    assert "det_acc_0" in metrics


def test_data_parallel_step_replicated(tiny):
    cfg, params = tiny
    mesh = data_parallel_mesh(8)
    tspec = T.TrainSpec(stage=2, roi_batch=32, with_metrics=False)
    sspec = S.SolverSpec(base_lr=1e-3, lr_policy="fixed", momentum=0.9)
    step = T.make_train_step(cfg, tspec, sspec, mesh=mesh, donate=False)
    batch = make_batch(cfg, batch=8)
    state = {"params": params, "solver": S.init_state(params, sspec)}
    state = T.replicate_state(state, mesh)
    batch = T.shard_batch(batch, mesh)
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # params must remain identical across devices (fully replicated update)
    w = state["params"]["cls_pred"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    assert int(state["solver"]["it"]) == 1


def test_lr_multipliers_freeze_trunk(tiny):
    cfg, params = tiny
    lr_mults = M.param_lr_multipliers(params, cfg)
    decay_mults = M.param_decay_multipliers(params, cfg)
    tspec = T.TrainSpec(stage=1, sample_mode="random",
                        pos_neg_weighted=False, with_metrics=False)
    sspec = S.SolverSpec(base_lr=1e-2, lr_policy="fixed", momentum=0.9)
    step = T.make_train_step(cfg, tspec, sspec, lr_mults=lr_mults,
                             decay_mults=decay_mults, donate=False)
    batch = make_batch(cfg)
    state = {"params": params, "solver": S.init_state(params, sspec)}
    new_state, _ = step(state, batch, jax.random.key(0))
    # conv1_1 is frozen (lr_mult 0, decay_mult 0)
    np.testing.assert_array_equal(
        np.asarray(new_state["params"]["conv1_1"]["w"]),
        np.asarray(params["conv1_1"]["w"]))
    # conv3_1 trains
    assert not np.array_equal(
        np.asarray(new_state["params"]["conv3_1"]["w"]),
        np.asarray(params["conv3_1"]["w"]))


def test_frozen_backward_pruning_equivalent_and_cheaper(tiny):
    """lr_mult-0 params are cut from autodiff (net.cpp:191-247 parity):
    the step result matches the unpruned math exactly, while the compiled
    backward does measurably less work."""
    cfg, params = tiny
    lr_mults = M.param_lr_multipliers(params, cfg)
    decay_mults = M.param_decay_multipliers(params, cfg)
    tspec = T.TrainSpec(stage=1, sample_mode="random",
                        pos_neg_weighted=False, with_metrics=False)
    sspec = S.SolverSpec(base_lr=1e-2, lr_policy="fixed", momentum=0.9,
                         weight_decay=5e-4)
    batch = make_batch(cfg)
    key = jax.random.key(3)

    step = T.make_train_step(cfg, tspec, sspec, lr_mults=lr_mults,
                             decay_mults=decay_mults, donate=False)
    state = {"params": params, "solver": S.init_state(params, sspec)}
    pruned_state, _ = step(state, batch, key)

    # unpruned reference: full grads + the same multiplier-aware update
    grads = jax.grad(
        lambda p: T.loss_fn(p, batch, key, cfg, tspec)[0])(params)
    ref_params, _, _ = S.apply_update(
        params, grads, S.init_state(params, sspec), sspec, lr_mults,
        decay_mults)
    for name in ("conv1_1", "conv3_1", "LFCN_0", "conv6_1"):
        if name not in params:
            continue
        np.testing.assert_allclose(
            np.asarray(pruned_state["params"][name]["w"]),
            np.asarray(ref_params[name]["w"]), rtol=1e-5, atol=1e-7,
            err_msg=name)

    # and the pruned backward compiles to strictly less work
    def flops(fn):
        c = jax.jit(fn).lower(params, batch, key).compile().cost_analysis()
        return (c[0] if isinstance(c, (list, tuple)) else c)["flops"]

    def pruned_grad(p, bt, k):
        def obj(pp):
            return T.loss_fn(T.prune_frozen_params(pp, lr_mults),
                             bt, k, cfg, tspec)[0]
        return jax.grad(obj)(p)

    def full_grad(p, bt, k):
        return jax.grad(lambda pp: T.loss_fn(pp, bt, k, cfg, tspec)[0])(p)

    assert flops(pruned_grad) < 0.9 * flops(full_grad)


def test_eval_step(tiny):
    cfg, params = tiny
    tspec = T.TrainSpec(stage=2, roi_batch=32)
    eval_step = T.make_eval_step(cfg, tspec)
    batch = make_batch(cfg)
    metrics = eval_step(params, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    for k in ("cls_accuracy", "bbox_iou", "det_acc_0"):
        assert k in metrics


def test_iter_size_accumulation(tiny):
    """iter_size=2: grads accumulate over 2 micro-batches, update divides
    by iter_size (matches a single step on the mean gradient)."""
    cfg, params = tiny
    tspec = T.TrainSpec(stage=1, sample_mode="bootstrap", with_metrics=False)
    b1 = make_batch(cfg, batch=2, seed=1)
    b2 = make_batch(cfg, batch=2, seed=2)

    sspec_acc = S.SolverSpec(base_lr=1e-3, lr_policy="fixed", momentum=0.0,
                             weight_decay=0.0, iter_size=2)
    step_acc = T.make_train_step(cfg, tspec, sspec_acc, donate=False)
    stacked = T.stack_microbatches([b1, b2])
    state = {"params": params, "solver": S.init_state(params, sspec_acc)}
    out_acc, metrics = step_acc(state, stacked, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))

    # manual: mean of the two micro-grads applied once
    keys = jax.random.split(jax.random.key(0), 2)
    g1 = jax.grad(lambda p: T.loss_fn(p, b1, keys[0], cfg, tspec)[0])(params)
    g2 = jax.grad(lambda p: T.loss_fn(p, b2, keys[1], cfg, tspec)[0])(params)
    gm = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    sspec_one = S.SolverSpec(base_lr=1e-3, lr_policy="fixed", momentum=0.0,
                             weight_decay=0.0)
    manual, _, _ = S.apply_update(params, gm,
                                  S.init_state(params, sspec_one), sspec_one)
    np.testing.assert_allclose(
        np.asarray(out_acc["params"]["cls_pred"]["w"], np.float64),
        np.asarray(manual["cls_pred"]["w"], np.float64), rtol=2e-4)


def test_bf16_training_step(tiny):
    """bfloat16 compute path trains end-to-end (grads flow, loss finite)."""
    import dataclasses
    cfg, _ = tiny
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    params = M.init_params(jax.random.key(0), cfg16)
    tspec = T.TrainSpec(stage=2, roi_batch=16, with_metrics=False)
    sspec = S.SolverSpec(base_lr=1e-4, lr_policy="fixed")
    step = T.make_train_step(cfg16, tspec, sspec, donate=False)
    batch = make_batch(cfg16)
    state = {"params": params, "solver": S.init_state(params, sspec)}
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # params stay f32 (master weights), loss computed through bf16 trunk
    assert state["params"]["conv3_1"]["w"].dtype == jnp.float32

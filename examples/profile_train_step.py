"""Training-step breakdown at the bench geometry (8s-768 TRAIN crop
768x1024, batch 4, bf16): loss-only forward vs UNPRUNED value_and_grad vs
the full production step (which passes lr_mults, so frozen-param backward
pruning applies — train_step.py make_train_step), pipelined-dispatch
protocol.  fwd_bwd_ms deliberately measures the unpruned gradient: the
gap between it + update and full_step_ms is the net.cpp:191-247-style
backward-pruning saving (round 3: 182 ms unpruned fwd+bwd vs 104 ms full
pruned step = ~78 ms reclaimed; 21.3 -> 38.6 train img/s)."""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu.data import rasterize as R
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.train import solver as S
from mscnn_tpu.train import train_step as T


def timed(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    for _ in range(2):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    b = 4
    cfg = zoo.kitti_car_8s_768(deploy=False)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    params = M.init_params(jax.random.key(0), cfg)
    tspec = T.TrainSpec(stage=2, with_metrics=False)
    sspec = S.SolverSpec(type="sgd", base_lr=5e-5, lr_policy="step",
                         gamma=0.1, stepsize=10000, momentum=0.9,
                         weight_decay=5e-4)

    h, w = cfg.input_hw
    rspec = R.raster_spec_from_config(cfg)
    gts6 = jnp.asarray([[100.0, 300.0, 400.0, 500.0, 1.0, 0.0]],
                       jnp.float32)
    maps = R.rasterize_labels(gts6, jnp.ones(1, bool),
                              jnp.zeros((1, 4), jnp.float32),
                              jnp.zeros(1, bool), rspec)
    batch = {
        "image": jnp.zeros((b, h, w, 3), jnp.float32),
        "labels": tuple(jnp.broadcast_to(m, (b,) + m.shape) for m in maps),
        "gt_boxes": jnp.broadcast_to(
            jnp.asarray([[[0.0, 100.0, 300.0, 400.0, 500.0, 1.0, 0.0]]]),
            (b, 1, 7)),
        "gt_valid": jnp.ones((b, 1), bool),
    }
    key = jax.random.key(1)

    loss_fn = jax.jit(lambda p, bt, k: T.loss_fn(p, bt, k, cfg, tspec)[0])
    grad_fn = jax.jit(lambda p, bt, k: jax.grad(
        lambda pp: T.loss_fn(pp, bt, k, cfg, tspec)[0])(p))
    step = T.make_train_step(cfg, tspec, sspec,
                             lr_mults=M.param_lr_multipliers(params, cfg),
                             decay_mults=M.param_decay_multipliers(params,
                                                                   cfg),
                             donate=False)
    state = {"params": params, "solver": S.init_state(params, sspec)}

    res = {}
    res["fwd_loss_ms"] = round(timed(loss_fn, params, batch, key), 1)
    res["fwd_bwd_ms"] = round(timed(grad_fn, params, batch, key), 1)
    res["full_step_ms"] = round(
        timed(lambda s: step(s, batch, key)[1], state), 1)
    res["bwd_delta_ms"] = round(res["fwd_bwd_ms"] - res["fwd_loss_ms"], 1)
    res["pruning_saving_ms"] = round(
        res["fwd_bwd_ms"] - res["full_step_ms"], 1)
    res["train_img_per_s"] = round(b / (res["full_step_ms"] / 1e3), 2)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

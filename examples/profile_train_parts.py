"""Forward-side decomposition of the (pruned) training step at the bench
geometry: trunk+heads alone vs stage-1 loss vs the full stage-2 objective,
and the same splits under value_and_grad with frozen-param pruning — so
the remaining step cost is attributable (conv fwd vs detection losses vs
proposal/sampling/ROI machinery vs their backwards). Pipelined protocol;
run solo."""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu.data import rasterize as R
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
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
    mults = M.param_lr_multipliers(params, cfg)

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

    def freeze(p):
        return T.prune_frozen_params(p, mults)

    ts1 = T.TrainSpec(stage=1, sample_mode="bootstrap",
                      with_metrics=False)
    ts2 = T.TrainSpec(stage=2, with_metrics=False)

    def l_heads(p, bt, k):
        outs = M.heads(p, M.trunk(p, bt["image"], cfg), cfg)
        return sum(o.sum() for o in outs)

    def l_stage1(p, bt, k):
        return T.loss_fn(p, bt, k, cfg, ts1)[0]

    def l_stage2(p, bt, k):
        return T.loss_fn(p, bt, k, cfg, ts2)[0]

    res = {}
    for name, fn in (("trunk_heads", l_heads), ("stage1", l_stage1),
                     ("stage2", l_stage2)):
        fwd = jax.jit(fn)
        bwd = jax.jit(lambda p, bt, k, fn=fn: jax.grad(
            lambda pp: fn(freeze(pp), bt, k))(p))
        res[f"{name}_fwd_ms"] = round(timed(fwd, params, batch, key), 1)
        res[f"{name}_fwd_bwd_pruned_ms"] = round(
            timed(bwd, params, batch, key), 1)
        print(json.dumps({k: v for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    main()

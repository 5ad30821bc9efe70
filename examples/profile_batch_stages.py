"""Propose vs ROI split at b1/b4 (follow-up to profile_batch_scaling.py):
which sub-stage loses per-image efficiency when batched. Pipelined
protocol; run solo."""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import quant as Q


def timed(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = zoo.kitti_car_8s_768(deploy=True, max_out=256)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                              pallas_conv1=True)
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    rng = np.random.RandomState(0)
    calib = rng.randn(1, h, w, 3).astype(np.float32) * 40.0
    qparams = Q.quantize_trunk(
        params, Q.calibrate_trunk_scales(params, cfg, calib))
    qcfg = dataclasses.replace(cfg, int8_trunk=True)

    res = {}
    for b in (1, 4):
        x = jnp.zeros((b, h, w, 3), jnp.float32)
        heads_fn = jax.jit(
            lambda p, xx: M.heads(p, M.trunk(p, xx, qcfg), qcfg))
        prop_fn = jax.jit(lambda p, xx: M.propose(
            M.heads(p, M.trunk(p, xx, qcfg), qcfg), qcfg))
        full = jax.jit(lambda p, xx: M.deploy_forward(p, xx, qcfg))
        t_heads = timed(heads_fn, qparams, x)
        t_prop = timed(prop_fn, qparams, x)
        t_full = timed(full, qparams, x)
        res[f"b{b}"] = {
            "trunk_heads_ms_per_img": round(t_heads / b, 2),
            "propose_delta_ms_per_img": round((t_prop - t_heads) / b, 2),
            "roi_delta_ms_per_img": round((t_full - t_prop) / b, 2),
        }
        print(json.dumps({f"b{b}": res[f"b{b}"]}), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

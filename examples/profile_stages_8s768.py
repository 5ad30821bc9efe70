"""Cumulative stage breakdown of the flagship 8s-768 deploy graph
(768x2560, bf16, Pallas conv1 per MSCNN_CONV1): trunk -> +heads ->
+propose -> full (ROI head). Pipelined-dispatch protocol (BENCH.md);
per-stage time = difference of cumulative graphs."""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.utils import profiling as P


def timed(jfn, *args, iters=30):
    jax.block_until_ready(jfn(*args))
    for _ in range(3):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    conv1 = os.environ.get("MSCNN_CONV1", "pallas")
    cfg = zoo.kitti_car_8s_768(deploy=True, max_out=256)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                              pallas_conv1=conv1 == "pallas",
                              s2d_conv1=conv1 == "s2d")
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    x = jnp.zeros((1, h, w, 3), jnp.float32)

    def g_trunk(p, x):
        return M.trunk(p, x, cfg)

    def g_heads(p, x):
        return M.heads(p, M.trunk(p, x, cfg), cfg)

    def g_prop(p, x):
        feats = M.trunk(p, x, cfg)
        return M.propose(M.heads(p, feats, cfg), cfg)

    def g_full(p, x):
        return M.deploy_forward(p, x, cfg)

    res = {"conv1": conv1}
    peak = P.peak_flops()
    prev = 0.0
    for name, fn in [("trunk", g_trunk), ("heads", g_heads),
                     ("propose", g_prop), ("full", g_full)]:
        jfn = jax.jit(fn)
        try:
            an = jfn.lower(params, x).compile().cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            fl = float(an["flops"])
        except Exception:
            fl = None
        ms = timed(jfn, params, x)
        res[f"{name}_ms"] = round(ms, 2)
        res[f"{name}_delta_ms"] = round(ms - prev, 2)
        if fl and peak:
            res[f"{name}_mfu"] = round(fl / (ms / 1e3) / peak, 3)
        prev = ms
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

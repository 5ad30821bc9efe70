"""Stage breakdown of the r3-final deploy config (8s-768 768x2560, int8
trunk incl. the conv1 pair on the plain conv path, batch 4): cumulative
trunk -> +heads -> +propose -> full graphs, per-image deltas.  Pipelined
protocol (BENCH.md); run solo on the chip."""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import quant as Q
from mscnn_tpu.utils import profiling as P


def timed(fn, *args, iters=30):
    jax.block_until_ready(fn(*args))
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = zoo.kitti_car_8s_768(deploy=True, max_out=256)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    calib = np.random.RandomState(0).randn(1, h, w, 3).astype(
        np.float32) * 40.0
    qparams = Q.quantize_trunk(
        params, Q.calibrate_trunk_scales(params, cfg, calib,
                                         include_conv1=True))
    qcfg = dataclasses.replace(cfg, int8_trunk=True)

    batch = 4
    x = jnp.zeros((batch, h, w, 3), jnp.float32)

    def g_trunk(p, xx):
        return M.trunk(p, xx, qcfg)

    def g_heads(p, xx):
        return M.heads(p, M.trunk(p, xx, qcfg), qcfg)

    def g_prop(p, xx):
        return M.propose(M.heads(p, M.trunk(p, xx, qcfg), qcfg), qcfg)

    def g_full(p, xx):
        return M.deploy_forward(p, xx, qcfg)

    res = {"batch": batch}
    peak = P.peak_flops()
    prev = 0.0
    for name, fn in [("trunk", g_trunk), ("heads", g_heads),
                     ("propose", g_prop), ("full", g_full)]:
        jfn = jax.jit(fn)
        try:
            an = jfn.lower(qparams, x).compile().cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            fl = float(an["flops"])
        except Exception:
            fl = None
        ms = timed(jfn, qparams, x)
        res[f"{name}_ms_per_img"] = round(ms / batch, 2)
        res[f"{name}_delta_ms_per_img"] = round((ms - prev) / batch, 2)
        if fl and peak:
            res[f"{name}_mfu_bf16peak"] = round(fl / (ms / 1e3) / peak, 3)
        prev = ms
        print(json.dumps(res), flush=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

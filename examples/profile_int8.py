"""int8-trunk deploy A/B at the bench geometry (8s-768, 768x2560, b1):
float(bf16) vs calibrated-int8 trunk through the full deploy graph,
pipelined-dispatch protocol (BENCH.md). Run solo on the chip."""

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
    cfg = zoo.kitti_car_8s_768(deploy=True)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                              pallas_conv1=True)
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 40.0)

    fwd = jax.jit(lambda p, x: M.deploy_forward(p, x, cfg))
    base_ms = timed(fwd, params, img)

    scales = Q.calibrate_trunk_scales(params, cfg, np.asarray(img))
    qparams = Q.quantize_trunk(params, scales)
    qcfg = dataclasses.replace(cfg, int8_trunk=True)
    qfwd = jax.jit(lambda p, x: M.deploy_forward(p, x, qcfg))
    q_ms = timed(qfwd, qparams, img)

    # trunk-only split so the saving is attributable
    tr = jax.jit(lambda p, x: M.trunk(p, x, cfg)["conv6_1"])
    qtr = jax.jit(lambda p, x: M.trunk(p, x, qcfg)["conv6_1"])
    print(json.dumps({
        "deploy_bf16_ms": round(base_ms, 2),
        "deploy_int8_ms": round(q_ms, 2),
        "trunk_bf16_ms": round(timed(tr, params, img), 2),
        "trunk_int8_ms": round(timed(qtr, qparams, img), 2),
        "img_per_s_bf16": round(1e3 / base_ms, 2),
        "img_per_s_int8": round(1e3 / q_ms, 2),
    }))


if __name__ == "__main__":
    main()

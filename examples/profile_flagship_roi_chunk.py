"""Does the flagship deploy graph have the cascade's 512-roi gather cliff?

Round 5 found cascade ROI stages cost 2.8x at 512 rois what they cost at
256 (BENCH.md "the 512-roi gather cliff") and fixed it with lax.map
chunking (MSCNNConfig.roi_chunk=256). The flagship bench runs max_out=256
— a single chunk, so the fix is bench-neutral by construction — but two
combinations were never swept:

  * sub-256 chunks at the bench capacity (does splitting the 256-roi
    gather help at 768x2560, where the table is 2x bigger than the
    cascade's?), and
  * the flagship at max_out=512 (the zoo/detect default capacity), where
    the cascade cliff would predict a win from chunk=256.

Protocol = bench.py bench_deploy (b4, bf16 + int8 trunk + int8 conv1,
pipelined 20-iter loop after warmup), one v5e chip.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import quant as Q

import numpy as np


def build(max_out, chunk):
    cfg = zoo.kitti_car_8s_768(deploy=True, max_out=max_out)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                              int8_trunk=True, roi_chunk=chunk)
    return cfg


def timed_deploy(cfg, batch=4, iters=20):
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    calib = np.random.RandomState(0).randn(1, h, w, 3).astype(
        np.float32) * 40.0
    fcfg = dataclasses.replace(cfg, int8_trunk=False)
    params = Q.quantize_trunk(
        params, Q.calibrate_trunk_scales(params, fcfg, calib,
                                         include_conv1=True))
    images = jnp.zeros((batch, h, w, 3), jnp.float32)
    fwd = jax.jit(lambda p, x: M.deploy_forward(p, x, cfg))
    jax.block_until_ready(fwd(params, images))
    for _ in range(3):
        jax.block_until_ready(fwd(params, images))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / iters / batch * 1e3  # ms/img


if __name__ == "__main__":
    for max_out, chunks in ((256, (0, 128, 64)), (512, (0, 256, 128))):
        for ck in chunks:
            ms = timed_deploy(build(max_out, ck))
            print(json.dumps({"max_out": max_out, "roi_chunk": ck,
                              "ms_per_img": round(ms, 2),
                              "img_per_sec": round(1e3 / ms, 1)}),
                  flush=True)

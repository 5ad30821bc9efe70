"""Benchmark harness: steady-state inference throughput on the real chip.

Measures the full MS-CNN deploy graph (VGG trunk + 7-scale heads + on-device
BoxOutput NMS + ROI head) at the BASELINE.json geometry (768x2560 KITTI
input) and reports images/sec against the reference Titan baseline
(~0.4 s/img at 1920x576, /root/reference/README.md + paper; BASELINE.md
pegs the reference at 2.5 img/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_SEC = 2.5  # Titan, mscnn deploy (BASELINE.md)


def main():
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    # the BASELINE.json reference model: mscnn-8s-768-trainval, whose deploy
    # input is natively 768x2560 (run_mscnn_detection.m:36)
    cfg = zoo.kitti_car_8s_768(deploy=True, max_out=256)
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")

    batch = 1
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    images = jnp.zeros((batch, h, w, 3), jnp.float32)

    fwd = jax.jit(lambda p, x: M.deploy_forward(p, x, cfg))

    # compile + warmup
    out = fwd(params, images)
    jax.block_until_ready(out)
    for _ in range(3):
        jax.block_until_ready(fwd(params, images))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "kitti_deploy_768x2560_images_per_sec",
        "value": round(img_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

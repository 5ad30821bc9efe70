"""Benchmark harness: the three BASELINE.json metrics in ONE JSON line.

  * images/sec/chip — steady-state full deploy graph (VGG trunk + 8-scale
    heads + on-device BoxOutput NMS + ROI head) at the BASELINE geometry
    (768x2560 KITTI input, run_mscnn_detection.m:36).  Primary metric.
  * train_images_per_sec — stage-2 joint training step (batch 4 at the
    8s-768 TRAIN crop 768x1024, incl. on-device label rasterization,
    proposal generation, sampling, SGD update), matching what `caffe time`
    measured fwd+bwd (/root/reference/tools/caffe.cpp:334-422).
  * nms_p50_ms — median device-time of one BoxOutput NMS pass at deploy
    candidate count (2000 -> 256), measured as K scanned kernels inside a
    single XLA program so the ~25 ms tunnel RTT cannot poison it.

vs_baseline compares against the reference Titan deploy speed (~0.4 s/img
at 1920x576, /root/reference/README.md + paper; BASELINE.md pegs 2.5 img/s).

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "train_images_per_sec",
   "nms_p50_ms"}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import time

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_SEC = 2.5  # Titan, mscnn deploy (BASELINE.md)


def bench_deploy(cfg) -> float:
    from mscnn_tpu.models import mscnn as M

    # batch 4 is the aggregate-throughput sweet spot since the per-image
    # ROI pooling fix (BENCH.md round 3: b1 46.8 / b4 52.8 img/s);
    # MSCNN_BENCH_BATCH=1 gives the single-stream latency variant
    batch = int(os.environ.get("MSCNN_BENCH_BATCH", "4"))
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    if cfg.int8_trunk:
        # calibrate + quantize on a synthetic batch (PTQ, ops/quant.py)
        import numpy as _np
        from mscnn_tpu.ops import quant as Q
        calib = _np.random.RandomState(0).randn(1, h, w, 3).astype(
            _np.float32) * 40.0
        fcfg = dataclasses.replace(cfg, int8_trunk=False)
        # the conv1 pair quantizes too on the plain-conv path (default;
        # MSCNN_INT8_CONV1=0 for the bf16-conv1 control) — BENCH.md r3:
        # 55.3 -> 57.8 img/s over plain bf16 conv1
        inc_c1 = (os.environ.get("MSCNN_INT8_CONV1", "1") not in ("0", "")
                  and not (cfg.pallas_conv1 or cfg.s2d_conv1))
        params = Q.quantize_trunk(
            params, Q.calibrate_trunk_scales(params, fcfg, calib,
                                             include_conv1=inc_c1))
    images = jnp.zeros((batch, h, w, 3), jnp.float32)

    fwd = jax.jit(lambda p, x: M.deploy_forward(p, x, cfg))

    # same jit instance -> the explicit compile below is reused by calls
    try:
        analysis = fwd.lower(params, images).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        bench_deploy.flops = float(analysis["flops"]) / batch
    except Exception:
        bench_deploy.flops = None

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
    return batch * iters / dt


def bench_train(cfg) -> float:
    """Pipelined stage-2 training steps on synthetic data, batch 4."""
    from mscnn_tpu.data import rasterize as R
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.train import solver as S
    from mscnn_tpu.train import train_step as T

    b = 4
    params = M.init_params(jax.random.key(0), cfg)
    tspec = T.TrainSpec(stage=2, with_metrics=False)
    sspec = S.SolverSpec(type="sgd", base_lr=5e-5, lr_policy="step",
                         gamma=0.1, stepsize=10000, momentum=0.9,
                         weight_decay=5e-4)
    step = T.make_train_step(cfg, tspec, sspec,
                             lr_mults=M.param_lr_multipliers(params, cfg),
                             decay_mults=M.param_decay_multipliers(params, cfg),
                             donate=True)

    h, w = cfg.input_hw
    rspec = R.raster_spec_from_config(cfg)
    gts6 = jnp.asarray([[100.0, 300.0, 400.0, 500.0, 1.0, 0.0]], jnp.float32)
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
    state = {"params": params, "solver": S.init_state(params, sspec)}

    key = jax.random.key(1)
    state, metrics = step(state, batch, key)          # compile
    jax.block_until_ready(metrics)
    for i in range(2):                                # warmup
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(key, 10 + i))
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    return b * iters / dt


def bench_train_e2e(cfg) -> dict:
    """Full train-path throughput: JPEG fixtures on disk -> native C++
    loader (decode + augment + window assembly) -> H2D -> on-device label
    rasterization -> jitted stage-2 step.  The synthetic bench_train
    number is the device ceiling; this measures the same step fed by the
    real input pipeline (base_data_layer.cpp:80-108 async-prefetch
    analog) and reports how much of each iteration the device spends
    waiting on input.

    Run via MSCNN_BENCH_E2E=1 python bench.py (prints its own JSON line;
    the default driver protocol is unchanged).
    """
    import shutil
    import tempfile

    import cv2
    import numpy as np

    from mscnn_tpu.data import native_loader as NL
    from mscnn_tpu.data import pipeline as P
    from mscnn_tpu.data import window_file as W
    from mscnn_tpu.data.augment import AugmentSpec
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.train import solver as S
    from mscnn_tpu.train import train_step as T

    b = 4
    # the flagship ImageGtData geometry (trainval_2nd.prototxt:24-32):
    # resize 2560x768, random-crop 1024x768, batch 4, min_gt_height 45.
    # Default ships raw uint8 canvases and normalizes on device (4x less
    # H2D traffic, bit-identical — tests/test_native_loader.py);
    # MSCNN_E2E_FLOAT=1 measures the float32-transfer control.
    emit_u8 = os.environ.get("MSCNN_E2E_FLOAT") in (None, "", "0")
    aug = AugmentSpec(template_hw=(768, 1024), resize_hw=(768, 2560),
                      mirror=True, min_gt_height=45.0, emit_uint8=emit_u8)
    dspec = P.DatasetSpec(batch_size=b)

    # KITTI-native-sized JPEG fixtures (1242x375) with plausible boxes
    root = tempfile.mkdtemp(prefix="mscnn_e2e_")
    try:
        rng = np.random.RandomState(0)
        images = []
        for i in range(32):
            img = rng.randint(0, 255, (375, 1242, 3), dtype=np.uint8)
            path = os.path.join(root, f"im_{i:03d}.jpg")
            cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
            n_gt = rng.randint(2, 6)
            x1 = rng.uniform(0, 1000, n_gt)
            y1 = rng.uniform(50, 250, n_gt)
            bw = rng.uniform(40, 200, n_gt)
            bh = rng.uniform(30, 100, n_gt)
            gts = np.stack([np.ones(n_gt), np.zeros(n_gt),
                            x1, y1, np.minimum(x1 + bw, 1241),
                            np.minimum(y1 + bh, 374)], -1)
            images.append(W.WindowImage(path, 3, 375, 1242,
                                        gts.astype(np.float32),
                                        np.zeros((0, 4), np.float32)))
        wf = os.path.join(root, "windows.txt")
        W.write_window_file(wf, images)

        params = M.init_params(jax.random.key(0), cfg)
        tspec = T.sync_input_norm(
            T.TrainSpec(stage=2, with_metrics=False), aug)
        sspec = S.SolverSpec(type="sgd", base_lr=5e-5, lr_policy="step",
                             gamma=0.1, stepsize=10000, momentum=0.9,
                             weight_decay=5e-4)
        step = T.make_train_step(
            cfg, tspec, sspec,
            lr_mults=M.param_lr_multipliers(params, cfg),
            decay_mults=M.param_decay_multipliers(params, cfg),
            donate=True)
        state = {"params": params, "solver": S.init_state(params, sspec)}

        def device_put(batch):
            return jax.tree.map(jnp.asarray, batch)

        with NL.make_loader(wf, aug, dspec, device_put=device_put) as src:
            key = jax.random.key(1)
            state, metrics = step(state, src.get(), key)   # compile
            jax.block_until_ready(metrics)
            for i in range(3):                             # warmup
                state, metrics = step(state, src.get(),
                                      jax.random.fold_in(key, i))
            jax.block_until_ready(metrics)

            iters = 30
            get_s = 0.0
            t0 = time.perf_counter()
            for i in range(iters):
                g0 = time.perf_counter()
                batch = src.get()
                get_s += time.perf_counter() - g0
                state, metrics = step(state, batch,
                                      jax.random.fold_in(key, 10 + i))
            jax.block_until_ready(metrics)
            dt = time.perf_counter() - t0
        return {
            "train_e2e_images_per_sec": round(b * iters / dt, 3),
            "input_wait_ms_per_iter": round(get_s / iters * 1e3, 3),
            "iter_ms": round(dt / iters * 1e3, 3),
            "input_mode": "uint8" if emit_u8 else "float32",
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_nms_p50(cfg) -> float:
    """Median per-call device time (ms) of the deploy NMS pass.

    K kernels scanned inside one jitted program -> per-call time is pure
    device time; the median over repeated program runs is the p50."""
    from mscnn_tpu.ops import nms as nms_ops

    n = cfg.proposal.max_nms_num
    key = jax.random.key(0)
    kb, ks = jax.random.split(key)
    xy = jax.random.uniform(kb, (n, 2)) * jnp.asarray([2560.0, 768.0])
    wh = 20.0 + jax.random.uniform(kb, (n, 2)) * 200.0
    boxes = jnp.concatenate([xy, wh], 1)              # xywh (center, size)
    scores = jax.random.uniform(ks, (n,))
    valid = jnp.ones((n,), bool)

    K = 50

    @jax.jit
    def scanned(boxes, scores, valid):
        def body(carry, _):
            # fold the carry into the scores so XLA cannot hoist the kernel
            b, s = carry
            ob, os_, ov = nms_ops.nms_xywh(
                b, s, valid, iou_thr=cfg.proposal.iou_thr,
                mode=cfg.proposal.nms_mode, max_out=cfg.proposal.max_out)
            return (b, s + 1e-9 * os_[0]), ov.sum()
        (_, _), outs = jax.lax.scan(body, (boxes, scores), None, length=K)
        return outs

    jax.block_until_ready(scanned(boxes, scores, valid))  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(scanned(boxes, scores, valid))
        times.append((time.perf_counter() - t0) / K * 1e3)
    return statistics.median(times)


def main():
    from mscnn_tpu.models import zoo

    if os.environ.get("MSCNN_BENCH_E2E") not in (None, "", "0"):
        # standalone end-to-end train-path mode (loader -> H2D -> step);
        # the driver's default protocol below is untouched
        cfg = zoo.kitti_car_8s_768(deploy=False)
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
        print(json.dumps({"metric": "kitti_train_e2e_images_per_sec",
                          "unit": "images/sec/chip",
                          **bench_train_e2e(cfg)}))
        return

    # the BASELINE.json reference model: mscnn-8s-768-trainval
    deploy_cfg = zoo.kitti_car_8s_768(deploy=True, max_out=256)
    deploy_cfg = dataclasses.replace(deploy_cfg, compute_dtype="bfloat16")
    train_cfg = zoo.kitti_car_8s_768(deploy=False)
    train_cfg = dataclasses.replace(train_cfg, compute_dtype="bfloat16")

    # int8 deploy trunk (MSCNN_INT8=0 for the bf16 control): calibrated
    # PTQ on conv1..conv6 (ops/quant.py); training stays bf16
    int8 = os.environ.get("MSCNN_INT8", "1") not in ("0", "false")
    if int8:
        deploy_cfg = dataclasses.replace(deploy_cfg, int8_trunk=True)
    # conv1 strategy (BENCH.md A/B protocol): plain | pallas (fused
    # conv1_1+conv1_2+pool1 bf16 kernel) | s2d.  Deploy default: plain
    # when the int8 trunk is on (int8 conv1 beats the bf16 kernel, r3:
    # 57.8 vs 52.7 img/s at b4), the fused Pallas kernel for the bf16
    # control.  The TRAINING config pins plain regardless of MSCNN_INT8
    # (training never runs int8; conv1/conv2 are frozen so the kernel is
    # forward-only there — r2 measured it train-neutral, r3 plain read
    # 38.8 vs 38.0), so the int8 A/B toggles exactly one deploy-side
    # variable for train_images_per_sec.
    conv1 = os.environ.get("MSCNN_CONV1")
    dep_c1 = conv1 or ("plain" if int8 else "pallas")
    trn_c1 = conv1 or "plain"
    deploy_cfg = dataclasses.replace(
        deploy_cfg, s2d_conv1=dep_c1 == "s2d", pallas_conv1=dep_c1 == "pallas")
    train_cfg = dataclasses.replace(
        train_cfg, s2d_conv1=trn_c1 == "s2d", pallas_conv1=trn_c1 == "pallas")

    img_per_sec = bench_deploy(deploy_cfg)
    train_ips = bench_train(train_cfg)
    nms_p50 = bench_nms_p50(deploy_cfg)

    from mscnn_tpu.utils import profiling as P
    deploy_mfu = P.mfu(bench_deploy.flops, img_per_sec) \
        if bench_deploy.flops else None

    print(json.dumps({
        "metric": "kitti_deploy_768x2560_images_per_sec",
        "value": round(img_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
        "train_images_per_sec": round(train_ips, 3),
        "nms_p50_ms": round(nms_p50, 4),
        "deploy_mfu": round(deploy_mfu, 4) if deploy_mfu else None,
    }))


def _wait_for_chip(deadline_s: float) -> bool:
    """Bounded pre-flight for the tunnel's hang-mode outage (observed
    2026-08-17, >1.5 h: jax.devices() blocks forever with no error, so
    the exception-based retry below never fires).  Probes in short-lived
    subprocesses — a hung probe is killed by its timeout, this process
    stays clean.  The probe asserts a non-CPU platform: with a stripped
    env the axon sitecustomize no-ops and jax silently falls back to
    CPU, which would fake a recovery."""
    import subprocess
    import sys

    probe = ("import jax, jax.numpy as jnp\n"
             "assert jax.devices()[0].platform != 'cpu'\n"
             "jnp.ones((8, 8)).sum().block_until_ready()\n"
             "print('PROBE_OK')\n")
    t0 = time.monotonic()
    attempt = 0
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True, timeout=90)
            if "PROBE_OK" in r.stdout:
                return True
            reason = (r.stderr or r.stdout).strip()[-120:]
        except subprocess.TimeoutExpired:
            reason = "probe hung 90 s"
        attempt += 1
        if time.monotonic() - t0 > deadline_s:
            return False
        print(f"chip probe {attempt} failed ({reason}); retrying",
              file=sys.stderr)
        time.sleep(20)


if __name__ == "__main__":
    _wait = float(os.environ.get("MSCNN_BENCH_WAIT_S", "480"))
    if _wait > 0 and not _wait_for_chip(_wait):
        import sys

        print(f"chip unreachable after {_wait:.0f}s of pre-flight probes; "
              "tunnel outage — rerun bench.py when it recovers",
              file=sys.stderr)
        sys.exit(2)
    try:
        main()
    except Exception as e:
        # The tunneled chip occasionally wedges transiently (backend
        # FailedPrecondition on every call; recovers in ~1-2 min —
        # BENCH.md r3). Re-exec in a fresh process (the jax backend
        # handle in this one stays poisoned) up to twice, then give up.
        import sys

        n = int(os.environ.get("MSCNN_BENCH_RETRY", "0"))
        if n >= 2:
            raise
        print(f"bench attempt {n + 1} failed ({type(e).__name__}: {e}); "
              "retrying in 120 s", file=sys.stderr)
        time.sleep(120)
        os.environ["MSCNN_BENCH_RETRY"] = str(n + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

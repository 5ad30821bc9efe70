"""End-to-end quality validation of the CASCADE path on synthetic data.

Same protocol as examples/synthetic_e2e.py, but training the 3-stage
cascade (fg_thr 0.5/0.6/0.7, loss weights 1/0.5/0.25 — the
cascade-mscnn trainval_2nd.prototxt schedule) from scratch and scoring
the cascade deploy pipeline (staged refinement, class-agnostic final
regression, last-stage scoring) with the official KITTI AP protocol.
This is the quality loop for models/cascade.py — the single-stage loop
only exercises models/mscnn.py.

Run: PYTHONPATH=.:/root/.axon_site python examples/synthetic_e2e_cascade.py
Optional: ITERS=N (default 6000), ENSEMBLE=1 scores via the averaged
cls_prob_3rd_avg ensemble (widerface run_cascademscnn.m:46) instead of
the last head alone, ROIALIGN=1 uses ROIAlign pooling — ENSEMBLE=1
ROIALIGN=1 together exercise the widerface cascade-12s-align
configuration's scoring path on the tiny geometry.
"""
import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu import inference as I
from mscnn_tpu.evaluation import kitti_eval as KE
from mscnn_tpu.models import cascade as CC
from mscnn_tpu.models import zoo
from mscnn_tpu.train import solver as S
from mscnn_tpu.train import train_step as T

_base = zoo.tiny_test_config(num_classes=2)
if int(os.environ.get("ROIALIGN", "0")):
    _base = dataclasses.replace(_base, roi_align=True)
ccfg = CC.CascadeConfig(
    base=_base,
    ensemble_avg=bool(int(os.environ.get("ENSEMBLE", "0"))))
cfg = ccfg.base
H, W = cfg.input_hw
rng = np.random.RandomState(0)


def sample_scene(rng, n_max=3):
    img = rng.rand(H, W, 3).astype(np.float32) * 0.3
    n = rng.randint(1, n_max + 1)
    gts = []
    for _ in range(n):
        for _try in range(20):
            bw = rng.randint(25, 40)
            bh = rng.randint(25, 40)
            x1 = rng.randint(0, W - bw)
            y1 = rng.randint(0, H - bh)
            clear = all(x1 + bw + 2 < g[0] or g[2] + 2 < x1
                        or y1 + bh + 2 < g[1] or g[3] + 2 < y1 for g in gts)
            if clear:
                img[y1:y1 + bh, x1:x1 + bw] = rng.rand() * 0.3 + 0.7
                gts.append([x1, y1, x1 + bw, y1 + bh, 1.0, 0.0])
                break
    return img * 255.0 - 127.0, np.asarray(gts, np.float32)


def make_batch(rng, b=4, gmax=4):
    imgs = []
    gt7 = np.zeros((b, gmax, 7), np.float32)
    gv = np.zeros((b, gmax), bool)
    for i in range(b):
        img, gts = sample_scene(rng)
        imgs.append(img)
        g = len(gts)
        gt7[i, :g, 0] = i
        gt7[i, :g, 1:5] = gts[:, :4]
        gt7[i, :g, 5] = 1.0
        gv[i, :g] = True
    return {
        "image": jnp.asarray(np.stack(imgs)),
        "gt_boxes": jnp.asarray(gt7), "gt_valid": jnp.asarray(gv),
        "ronis": jnp.zeros((b, 1, 4), jnp.float32),
        "roni_valid": jnp.zeros((b, 1), bool),
        "copy_region": jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, W, H], jnp.float32), (b, 4)),
    }


params = CC.init_params(jax.random.key(0), ccfg)
tspec = T.TrainSpec(stage=2, roi_batch=32, with_metrics=False)
sspec = S.SolverSpec(base_lr=5e-5, lr_policy="step", stepsize=4500,
                     momentum=0.9, weight_decay=5e-4)
def _objective(params, batch, key, cfg_, tspec_):
    # make_train_step passes (cfg, tspec) positionally; the cascade loss
    # takes ccfg instead (same wrapper as cli.py's _cascade_objective)
    return CC.loss_fn(params, batch, key, ccfg, tspec_,
                      roi_batch=tspec_.roi_batch)


step = T.make_train_step(
    cfg, tspec, sspec, lr_mults=CC.param_lr_multipliers(params, ccfg),
    donate=False, loss_function=_objective)
state = {"params": params, "solver": S.init_state(params, sspec)}

iters = int(os.environ.get("ITERS", "6000"))
t0 = time.time()
pool = [make_batch(rng) for _ in range(16)]
for i in range(iters):
    state, m = step(state, pool[i % 16], jax.random.key(i))
    if i % 2000 == 0:
        print(f"it {i}: loss {float(m['loss']):.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)

# --- cascade deploy + eval ---------------------------------------------------
dccfg = dataclasses.replace(ccfg, base=dataclasses.replace(
    cfg, proposal=dataclasses.replace(cfg.proposal, fg_thr=-5.0)))
fwd = I.make_cascade_forward(state["params"], dccfg)
spec = I.DetectSpec(max_per_class=16)
gts_all, dets_all = [], []
rng2 = np.random.RandomState(99)
for k in range(60):
    img, gts = sample_scene(rng2)
    bgr = np.clip(img + 127.0, 0, 255).astype(np.uint8)
    det = I.detect_cascade(state["params"], bgr, dccfg, spec,
                           mean_values=(127.0, 127.0, 127.0), fwd=fwd)
    gts_all.append([KE.KittiObject("pedestrian", 0.0, 0,
                                   g[0], g[1], g[2], g[3]) for g in gts])
    drow = []
    for bx, sc, v in zip(det["boxes"][0], det["scores"][0],
                         det["valid"][0]):
        if v:
            drow.append(KE.KittiObject(
                "pedestrian", -1, -1, bx[0], bx[1],
                bx[0] + bx[2], bx[1] + bx[3], score=float(sc)))
    dets_all.append(drow)

for d in range(3):
    _, ap = KE.eval_class(gts_all, dets_all, "pedestrian", d)
    print(f"cascade AP[{KE.DIFFICULTIES[d]}] = {ap:.1f}")

# --- int8 trunk: cascades share the single-stage trunk, so trunk-only PTQ
# applies unchanged (the staged ROI heads stay in the compute dtype) -------
from mscnn_tpu.ops import quant as Q  # noqa: E402

calib_imgs = np.stack([sample_scene(np.random.RandomState(7))[0]
                       for _ in range(4)])
scales = Q.calibrate_trunk_scales(state["params"], dccfg.base, calib_imgs,
                                  include_conv1=True)
qparams = Q.quantize_trunk(state["params"], scales)
qbase = dataclasses.replace(dccfg.base, int8_trunk=True)
if os.environ.get("INT8_HEADS"):
    # --int8-heads leg: the staged roi_c1/fc6 matmuls quantize too
    # (MSCNNConfig.int8_roi_head), calibrated on the int8-trunk deploy
    hccfg = dataclasses.replace(dccfg, base=qbase)
    hscales = Q.calibrate_roi_head_scales(qparams, qbase, calib_imgs,
                                          ccfg=hccfg)
    qparams = Q.quantize_roi_heads(qparams, hscales)
    qbase = dataclasses.replace(qbase, int8_roi_head=True)
    print(f"int8 ROI heads: calibrated {sorted(hscales)}")
qccfg = dataclasses.replace(dccfg, base=qbase)
qfwd = I.make_cascade_forward(qparams, qccfg)
rng3 = np.random.RandomState(99)
qdets_all = []
for k in range(60):
    img, _ = sample_scene(rng3)
    bgr = np.clip(img + 127.0, 0, 255).astype(np.uint8)
    det = I.detect_cascade(qparams, bgr, qccfg, spec,
                           mean_values=(127.0, 127.0, 127.0), fwd=qfwd)
    drow = []
    for bx, sc, v in zip(det["boxes"][0], det["scores"][0],
                         det["valid"][0]):
        if v:
            drow.append(KE.KittiObject(
                "pedestrian", -1, -1, bx[0], bx[1],
                bx[0] + bx[2], bx[1] + bx[3], score=float(sc)))
    qdets_all.append(drow)
for d in range(3):
    _, ap = KE.eval_class(gts_all, qdets_all, "pedestrian", d)
    print(f"int8 cascade AP[{KE.DIFFICULTIES[d]}] = {ap:.1f}")

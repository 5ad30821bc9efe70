"""Two-step training schedule validated end-to-end on synthetic data.

The reference's canonical workflow (train_mscnn.sh: `caffe train
solver_1st` then `caffe train solver_2nd -weights stage1.caffemodel`,
tools/caffe.cpp:151-161 CopyLayers): stage 1 pretrains the proposal
sub-network alone (sample_mode "random", trainval_1st.prototxt:393-396),
stage 2 trains the joint proposal+detection objective warm-started from
stage 1's weights (sample_mode "bootstrap", pos_neg_weighted,
trainval_2nd.prototxt:429-440) at 10x the learning rate — exactly the
lr jump (5e-5 -> 5e-4) the reference's solver pair uses, which is only
stable because of the warm start.

Scores the stage-2 model with the official KITTI AP protocol and prints
per-stage wall time. Run on the TPU container:
    PYTHONPATH=.:/root/.axon_site python examples/synthetic_e2e_train2.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu import inference as I
from mscnn_tpu.evaluation import kitti_eval as KE
from mscnn_tpu.io.checkpoint import copy_trained_layers
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.train import solver as S
from mscnn_tpu.train import train_step as T

cfg = zoo.tiny_test_config(num_classes=2)
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


pool = [make_batch(rng) for _ in range(16)]

# --- stage 1: proposal sub-net only (solver_1st: lr 5e-5, random sampling)
params = M.init_params(jax.random.key(0), cfg)
tspec1 = T.TrainSpec(stage=1, sample_mode="random", pos_neg_weighted=False,
                     with_metrics=False)
sspec1 = S.SolverSpec(base_lr=5e-5, lr_policy="step", stepsize=4500,
                      momentum=0.9, weight_decay=5e-4)
step1 = T.make_train_step(cfg, tspec1, sspec1,
                          lr_mults=M.param_lr_multipliers(params, cfg),
                          decay_mults=M.param_decay_multipliers(params, cfg),
                          donate=False)
state = {"params": params, "solver": S.init_state(params, sspec1)}
STAGE1_ITERS = 2500
t0 = time.time()
for i in range(STAGE1_ITERS):
    state, m = step1(state, pool[i % 16], jax.random.key(i))
    if i % 1000 == 0:
        print(f"stage1 it {i}: loss {float(m['loss']):.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
t_stage1 = time.time() - t0
print(f"stage1 done: loss {float(m['loss']):.3f} in {t_stage1:.0f}s",
      flush=True)

# --- stage 2: joint objective, warm-started, 10x lr (solver_2nd) ---------
warm = copy_trained_layers(M.init_params(jax.random.key(1), cfg),
                           jax.device_get(state["params"]))
tspec2 = T.TrainSpec(stage=2, roi_batch=32, sample_mode="bootstrap",
                     pos_neg_weighted=True, with_metrics=False)
sspec2 = S.SolverSpec(base_lr=5e-4, lr_policy="step", stepsize=2000,
                      momentum=0.9, weight_decay=5e-4)
step2 = T.make_train_step(cfg, tspec2, sspec2,
                          lr_mults=M.param_lr_multipliers(warm, cfg),
                          decay_mults=M.param_decay_multipliers(warm, cfg),
                          donate=False)
state = {"params": warm, "solver": S.init_state(warm, sspec2)}
STAGE2_ITERS = 3500
t0 = time.time()
for i in range(STAGE2_ITERS):
    state, m = step2(state, pool[(7 + i) % 16], jax.random.key(10000 + i))
    if i % 1000 == 0:
        print(f"stage2 it {i}: loss {float(m['loss']):.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
t_stage2 = time.time() - t0
print(f"stage2 done: loss {float(m['loss']):.3f} in {t_stage2:.0f}s",
      flush=True)

# --- deploy + KITTI AP ----------------------------------------------------
dcfg = dataclasses.replace(
    cfg, proposal=dataclasses.replace(cfg.proposal, fg_thr=-5.0))
fwd = I.make_forward(state["params"], dcfg)
spec = I.DetectSpec(max_per_class=16)
gts_all, dets_all = [], []
rng2 = np.random.RandomState(99)
for k in range(60):
    img, gts = sample_scene(rng2)
    bgr = np.clip(img + 127.0, 0, 255).astype(np.uint8)
    det = I.detect(state["params"], bgr, dcfg, spec,
                   mean_values=(127.0, 127.0, 127.0), fwd=fwd)
    gts_all.append([KE.KittiObject("pedestrian", 0.0, 0,
                                   g[0], g[1], g[2], g[3]) for g in gts])
    drow = []
    for bx, sc, v in zip(det["boxes"][0], det["scores"][0], det["valid"][0]):
        if v:
            drow.append(KE.KittiObject(
                "pedestrian", -1, -1, bx[0], bx[1],
                bx[0] + bx[2], bx[1] + bx[3], score=float(sc)))
    dets_all.append(drow)

aps = []
for d in range(3):
    _, ap = KE.eval_class(gts_all, dets_all, "pedestrian", d)
    aps.append(ap)
    print(f"AP[{KE.DIFFICULTIES[d]}] = {ap:.1f}")
print(f"two-step schedule: stage1 {STAGE1_ITERS} its {t_stage1:.0f}s + "
      f"stage2 {STAGE2_ITERS} its {t_stage2:.0f}s, "
      f"AP(mod) {aps[1]:.1f}", flush=True)

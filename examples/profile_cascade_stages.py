"""Cumulative stage breakdown of the 3-stage cascade deploy graph
(kitti_car/cascade-mscnn-7s-576-2x, 576x1920 b1 bf16): trunk -> +heads ->
+propose -> +stage1 head -> +stage2 -> full (3 stages), plus a proposal
capacity A/B (max_out 512, the zoo default `mscnn time` records, vs 256,
the fixed capacity bench.py's flagship protocol uses).

BENCH.md round-4 context: the cascade row is the weakest MFU in the zoo
(55.46 ms/img, 11.1%) with "3 sequential ROI stages" named as the cost;
this measures how the 55 ms actually splits and what each stage's
roi_head (2 x max_out gathers on the 2x-upsampled table) costs.
Pipelined-dispatch protocol (BENCH.md measurement notes).
"""

import json
import time

import jax
import jax.numpy as jnp

from mscnn_tpu import inference as I
from mscnn_tpu.models import cascade as CC
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.ops import boxes as box_ops


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


def partial_deploy(params, images, ccfg, num_stages):
    """CC.deploy_forward truncated after `num_stages` roi_head stages
    (same code shape so deltas attribute per-stage cost)."""
    cfg = ccfg.base
    feats = M.trunk(params, images, cfg)
    outs = M.heads(params, feats, cfg)
    prop = M.propose(outs, cfg)
    batch_idx, boxes, _, valid = M.flatten_proposals(prop)
    boxes = boxes.at[:, 2:].add(-1.0)
    feat2x = M.upsampled_roi_feature(params, feats["conv4_3"], cfg)
    cur_boxes, cur_valid = boxes, valid
    cls_pred = bbox_pred = None
    for si, st in enumerate(ccfg.stages[:num_stages]):
        cls_pred, bbox_pred = M.roi_head(
            params, feats["conv4_3"], batch_idx, cur_boxes, cur_valid, cfg,
            train=False, suffix=st.suffix, feat=feat2x, image_major=True)
        if si + 1 < len(ccfg.stages):
            cur_boxes, cur_valid = box_ops.decode_bbox(
                bbox_pred, cur_boxes, cur_valid,
                bbox_mean=(0.0,) * 4, bbox_std=st.bbox_std, train=False)
    return cls_pred, bbox_pred, cur_boxes


def main():
    import dataclasses

    res = {}
    for max_out in (512, 256):
        ccfg = zoo.cascade_kitti_car_7s_576_2x(deploy=True, max_out=max_out)
        ccfg = dataclasses.replace(
            ccfg, base=dataclasses.replace(ccfg.base,
                                           compute_dtype="bfloat16"))
        cfg = ccfg.base
        params = CC.init_params(jax.random.key(0), ccfg)
        h, w = cfg.input_hw
        x = jnp.asarray(
            jax.random.normal(jax.random.key(1), (1, h, w, 3)) * 40.0)

        graphs = {
            "trunk": lambda p, x: M.trunk(p, x, cfg),
            "heads": lambda p, x: M.heads(p, M.trunk(p, x, cfg), cfg),
            "propose": lambda p, x: M.propose(
                M.heads(p, M.trunk(p, x, cfg), cfg), cfg),
            "stage1": lambda p, x: partial_deploy(p, x, ccfg, 1),
            "stage2": lambda p, x: partial_deploy(p, x, ccfg, 2),
            # what `mscnn time` measures: ensemble re-score DCE'd away
            # for the KITTI cascade (ensemble_avg=False)
            "full": lambda p, x: I.cascade_deploy_outputs(p, x, ccfg),
        }
        sub = {}
        prev = 0.0
        for name, fn in graphs.items():
            ms = timed(jax.jit(fn), params, x)
            sub[name] = round(ms, 2)
            sub[name + "_delta"] = round(ms - prev, 2)
            prev = ms
        res[f"max_out_{max_out}"] = sub
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

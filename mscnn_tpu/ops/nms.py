"""On-device, fixed-shape greedy NMS.

The reference runs NMS on the host every iteration
(/root/reference/src/caffe/layers/box_output_layer.cpp:39-63, `nmsMax`): boxes
sorted by score, each surviving box suppresses later boxes whose overlap
exceeds the threshold. Here the same greedy semantics run entirely on-device
with static shapes: candidates are sorted with invalid entries pushed to the
end, then a sequential suppression loop updates a keep-mask. A Pallas TPU
kernel (mscnn_tpu/ops/pallas/nms_kernel.py) provides the fast path; this
module is the reference jnp implementation and the fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mscnn_tpu.ops import boxes as box_ops

NEG_INF = jnp.float32(-1e30)


def sort_by_score(boxes, scores, valid):
    """Descending score order with invalid entries last. Returns sorted copies."""
    s = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-s)
    return boxes[order], s[order], valid[order], order


def nms_keep_mask(sorted_boxes, sorted_valid, *, iou_thr: float, mode: str = "iou"):
    """Greedy suppression over score-sorted (x, y, w, h) boxes.

    Returns a bool keep mask aligned with the sorted inputs. Box j is kept iff
    it is valid and no kept box i < j overlaps it above ``iou_thr``.
    """
    n = sorted_boxes.shape[0]
    idx = jnp.arange(n)

    def body(i, keep):
        row = box_ops.iou_xywh(sorted_boxes[i][None, :], sorted_boxes, mode)[0]
        suppress = (row > iou_thr) & (idx > i) & keep[i]
        return keep & ~suppress

    return jax.lax.fori_loop(0, n, body, sorted_valid)


_PALLAS_PROBE: dict = {}   # {} = not probed yet; {"ok": bool} afterwards


def _pallas_supported() -> bool:
    """Capability probe: can the default backend compile + run the Pallas
    NMS kernel?  Tried once per process on a tiny instance and cached, so
    `use_pallas=None` auto-selection works on any Mosaic-capable backend
    without naming platforms (and cleanly falls back to the jnp scan
    elsewhere, e.g. the CPU test mesh, where the compile raises)."""
    if "ok" not in _PALLAS_PROBE:
        try:
            from mscnn_tpu.ops.pallas import nms_kernel
            # AOT lower+compile on abstract shapes: raises on backends
            # without Mosaic ("Only interpret mode is supported on CPU"),
            # runs nothing on capable ones, and is immune to any ambient
            # trace the caller may be inside (the probe usually fires
            # while a jitted model is being traced).
            jax.jit(functools.partial(
                nms_kernel.nms_pallas, iou_thr=0.5, mode="iou", max_out=16,
            )).lower(
                jax.ShapeDtypeStruct((256, 4), jnp.float32),
                jax.ShapeDtypeStruct((256,), jnp.float32),
                jax.ShapeDtypeStruct((256,), jnp.bool_),
            ).compile()
            _PALLAS_PROBE["ok"] = True
        except Exception as e:  # noqa: BLE001 — any failure means fallback
            import warnings
            warnings.warn(
                f"Pallas NMS probe failed ({type(e).__name__}: "
                f"{str(e)[:120]}); falling back to the jnp scan NMS for "
                f"this process. Clear mscnn_tpu.ops.nms._PALLAS_PROBE to "
                f"re-probe, or pass use_pallas explicitly.")
            _PALLAS_PROBE["ok"] = False
    return _PALLAS_PROBE["ok"]


def nms_xywh(
    boxes,
    scores,
    valid,
    *,
    iou_thr: float,
    mode: str = "iou",
    max_out: int,
    use_pallas: bool = None,
):
    """Full fixed-shape greedy NMS, select-and-suppress formulation.

    boxes: [N, 4] (x, y, w, h); scores/valid: [N].
    Returns (out_boxes [max_out, 4], out_scores [max_out], out_valid [max_out]).
    Survivors appear in descending score order; slots past the survivor count
    are masked invalid (boxes/scores zeroed).

    Greedy NMS truncated at ``max_out`` survivors is computed with a
    ``max_out``-step scan — each step selects the argmax-score live box and
    kills its overlaps — instead of the textbook N-step suppression sweep.
    The reference discards everything past max_post_nms_num anyway
    (box_output_layer.cpp:186-192), so the results are identical while the
    sequential depth drops from N (3000) to max_out (typically 256-512),
    with each step a single [N] VPU pass. No pre-sort is needed.

    On TPU backends (use_pallas=None -> auto) the loop runs as a single
    Pallas kernel with the working scores resident in VMEM
    (mscnn_tpu/ops/pallas/nms_kernel.py); this jnp scan is the oracle
    implementation and the CPU/GPU fallback.
    """
    if use_pallas is None:
        use_pallas = _pallas_supported()
    if use_pallas:
        from mscnn_tpu.ops.pallas import nms_kernel
        return nms_kernel.nms_pallas(
            boxes, scores, valid, iou_thr=iou_thr, mode=mode,
            max_out=max_out)
    n = boxes.shape[0]
    s0 = jnp.where(valid, scores, NEG_INF)

    def body(live_scores, _):
        i = jnp.argmax(live_scores)
        sel_score = live_scores[i]
        sel_ok = sel_score > NEG_INF / 2
        row = box_ops.iou_xywh(boxes[i][None, :], boxes, mode)[0]
        kill = sel_ok & (row > iou_thr)
        nxt = jnp.where(kill, NEG_INF, live_scores).at[i].set(NEG_INF)
        return nxt, (i, sel_ok, sel_score)

    _, (idx, ok, sel_scores) = jax.lax.scan(
        body, s0, None, length=min(max_out, n))
    pad = max_out - idx.shape[0]
    if pad > 0:
        idx = jnp.concatenate([idx, jnp.zeros(pad, idx.dtype)])
        ok = jnp.concatenate([ok, jnp.zeros(pad, bool)])
        sel_scores = jnp.concatenate([sel_scores, jnp.full(pad, NEG_INF)])
    out_boxes = jnp.where(ok[:, None], boxes[idx], 0.0)
    out_scores = jnp.where(ok, sel_scores, 0.0)
    return out_boxes, out_scores, ok


def topk_candidates(boxes, scores, valid, k: int):
    """Keep the top-k valid candidates by score (the pre-NMS cap).

    Mirrors box_output_layer.cpp:175-179 (sort + resize to max_nms_num).
    Returns (boxes [k, 4], scores [k], valid [k]) in descending score order.
    """
    s = jnp.where(valid, scores, NEG_INF)
    top_s, top_i = jax.lax.top_k(s, k)
    out_valid = top_s > NEG_INF / 2
    return boxes[top_i], jnp.where(out_valid, top_s, 0.0), out_valid

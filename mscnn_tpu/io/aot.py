"""Ahead-of-time deploy compilation: serialize the single-dispatch
serving graph to a portable artifact directory.

TPU-native analog of shipping a Caffe deploy bundle
(mscnn_deploy.prototxt + .caffemodel, reference
examples/kitti_car/run_mscnn_detection.m:24-27): the reference ships a
*config* that every serving host re-builds and re-runs layer by layer;
here the whole traced program — trunk, heads, in-graph decode + NMS
(including the Pallas kernel when exported on TPU) and per-class
post-processing — is lowered once to versioned StableHLO via
`jax.export` and written next to the weights.  A serving host loads the
artifact and calls it without any model-building code, and the export
can target platforms the exporting host does not have (e.g. compile the
TPU artifact from a CPU build machine, `platforms=("tpu",)`).

Artifact layout (one directory):
  deploy.stablehlo   jax.export serialized Exported (versioned, stable)
  params.npz         flat param leaves as raw little-endian byte arrays
  params_meta.json   per-leaf dtype/shape (bf16 etc. survive the trip)
  meta.json          input geometry, mean values, DetectSpec, platforms
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

def _flatten(params) -> list:
    """-> [(path_parts, np.ndarray)]; key path kept as a LIST so layer
    names containing any separator character (Caffe allows e.g.
    'inception_3a/1x1') round-trip exactly."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        parts = [str(getattr(p, "key", getattr(p, "idx", p)))
                 for p in path]
        out.append((parts, np.asarray(jax.device_get(leaf))))
    return out


def save_params(params, npz_path: str, meta_path: str) -> int:
    """Write param leaves as raw bytes (index-named npz entries) + a
    path/dtype/shape sidecar (npz alone mangles ml_dtypes like bfloat16
    into void records, and npz entry names cannot carry arbitrary layer
    names)."""
    flat = _flatten(params)
    meta = [{"path": parts, "dtype": str(v.dtype), "shape": list(v.shape)}
            for parts, v in flat]
    np.savez(npz_path, **{f"p{i}": np.frombuffer(v.tobytes(), np.uint8)
                          for i, (_, v) in enumerate(flat)})
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return len(flat)


def load_params(npz_path: str, meta_path: str):
    import ml_dtypes  # noqa: F401  (registers bfloat16 etc. with numpy)

    with open(meta_path) as f:
        meta = json.load(f)
    raw = np.load(npz_path)
    root: dict = {}
    for i, m in enumerate(meta):
        a = np.frombuffer(raw[f"p{i}"].tobytes(),
                          dtype=np.dtype(m["dtype"])).reshape(m["shape"])
        node = root
        for p in m["path"][:-1]:
            node = node.setdefault(p, {})
        node[m["path"][-1]] = a
    return root


_IMAGE_MAJOR_KEYS = ("rois", "roi_scores", "roi_valid", "cls_pred",
                     "bbox_pred", "cls_prob")


def _reshape_image_major(outputs, batch: int, max_out: int):
    """[B*R, ...] deploy outputs -> [B, R, ...] (the deploy graph emits
    proposals image-major, R = cfg.proposal.max_out rows per image —
    same slicing as inference.detect_batch)."""
    return {k: outputs[k].reshape((batch, max_out) + outputs[k].shape[1:])
            for k in _IMAGE_MAJOR_KEYS if k in outputs}


def make_batched_e2e(params, cfg, spec, *, batch: int,
                     mean_values=(104.0, 117.0, 123.0)):
    """Batched single-dispatch serving graph: [B,H,W,3] uint8 images (+
    per-image ratios/orig_wh) -> per-image final detections, postprocess
    vmapped over the image-major proposal blocks. Batch>1 is the
    throughput serving shape — bench.py's deploy protocol runs batch 4."""
    from mscnn_tpu import inference as I
    from mscnn_tpu.models import mscnn as M

    mean = jnp.asarray(mean_values, jnp.float32)

    def fwd(p, imgs_u8, ratios, orig_wh):
        x = imgs_u8.astype(jnp.float32) - mean
        o = M.deploy_forward(p, x, cfg)
        sub = _reshape_image_major(o, batch, cfg.proposal.max_out)
        boxes, scores, valid = jax.vmap(
            lambda s, r, w: I.postprocess(s, r, w, cfg, spec))(
                sub, ratios, orig_wh)
        return {"boxes": boxes, "scores": scores, "valid": valid,
                "rois": sub["rois"], "roi_scores": sub["roi_scores"],
                "roi_valid": sub["roi_valid"]}

    return jax.jit(fwd)


def make_cascade_e2e(params, ccfg, spec, *, batch: int = 1,
                     mean_values=(104.0, 117.0, 123.0)):
    """Cascade single-dispatch serving graph: inference.detect_cascade
    semantics in ONE jitted program, built from the SAME shared helpers
    the live paths use (cascade_deploy_outputs / expand_cascade_bbox /
    cascade_post_cfg) so scoring/decode semantics cannot drift."""
    from mscnn_tpu import inference as I

    cfg = ccfg.base
    cfg_last = I.cascade_post_cfg(ccfg)
    mean = jnp.asarray(mean_values, jnp.float32)

    def fwd(p, imgs_u8, ratios, orig_wh):
        x = imgs_u8.astype(jnp.float32) - mean
        o = I.cascade_deploy_outputs(p, x[None] if batch == 1 else x,
                                     ccfg)
        o = I.expand_cascade_bbox(o, cfg.num_classes)
        if batch == 1:
            sub = {k: o[k] for k in _IMAGE_MAJOR_KEYS if k in o}
            boxes, scores, valid = I.postprocess(sub, ratios, orig_wh,
                                                 cfg_last, spec)
        else:
            sub = _reshape_image_major(o, batch, cfg.proposal.max_out)
            boxes, scores, valid = jax.vmap(
                lambda s, r, w: I.postprocess(s, r, w, cfg_last, spec))(
                    sub, ratios, orig_wh)
        return {"boxes": boxes, "scores": scores, "valid": valid,
                "rois": sub["rois"], "roi_scores": sub["roi_scores"],
                "roi_valid": sub["roi_valid"]}

    return jax.jit(fwd)


def export_deploy(params, cfg, out_dir: str, *, spec=None,
                  mean_values=(104.0, 117.0, 123.0),
                  platforms: Optional[Sequence[str]] = None,
                  batch: int = 1, cascade=None) -> str:
    """Lower the e2e serving graph (inference.make_e2e_forward: uint8
    net-size image -> final per-class detections) to a serialized
    Exported and write the artifact directory. Returns out_dir.

    platforms: target platform list for cross-compilation (default: the
    exporting host's platform). NOTE the NMS Pallas-vs-XLA choice is made
    at trace time, so exporting on TPU captures the Pallas kernel while a
    CPU-host cross-export targets TPU with the pure-XLA NMS scan (still
    correct, slightly slower).

    batch: images per serving call (static). batch=1 exports the
    latency-optimal single-image program; batch>1 the throughput shape.

    cascade: a CascadeConfig for staged models (then cfg must be
    cascade.base) — exports the detect_cascade semantics in one program.
    """
    from mscnn_tpu import inference as I

    spec = spec or I.DetectSpec()
    os.makedirs(out_dir, exist_ok=True)
    net_h, net_w = cfg.input_hw
    if cascade is not None:
        fwd = make_cascade_e2e(params, cascade, spec, batch=batch,
                               mean_values=mean_values)
    elif batch == 1:
        fwd = I.make_e2e_forward(params, cfg, spec,
                                 mean_values=mean_values)
    else:
        fwd = make_batched_e2e(params, cfg, spec, batch=batch,
                               mean_values=mean_values)
    if batch == 1:
        img_sds = jax.ShapeDtypeStruct((net_h, net_w, 3), jnp.uint8)
        vec_sds = jax.ShapeDtypeStruct((2,), jnp.float32)
    else:
        img_sds = jax.ShapeDtypeStruct((batch, net_h, net_w, 3), jnp.uint8)
        vec_sds = jax.ShapeDtypeStruct((batch, 2), jnp.float32)
    args = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a),
                                                    jnp.result_type(a)),
                     params),
        img_sds, vec_sds, vec_sds,
    )
    exported = jax.export.export(
        fwd, platforms=list(platforms) if platforms else None)(*args)
    with open(os.path.join(out_dir, "deploy.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    n = save_params(params,
                    os.path.join(out_dir, "params.npz"),
                    os.path.join(out_dir, "params_meta.json"))
    meta = {
        "format": "mscnn-tpu-aot-v1",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "input_hw": [int(net_h), int(net_w)],
        "batch": int(batch),
        "cascade": cascade is not None,
        "num_classes": int(cfg.num_classes),
        "mean_values": [float(m) for m in mean_values],
        "detect_spec": {
            "proposal_thr": spec.proposal_thr,
            "nms_overlap": spec.nms_overlap,
            "nms_mode": spec.nms_mode,
            "max_per_class": spec.max_per_class,
            "score_thr": spec.score_thr,
        },
        "param_leaves": n,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class CompiledDeploy:
    """A loaded AOT artifact: callable serving endpoint + metadata.

    `detect(image_bgr)` mirrors inference.detect()'s output dict (boxes/
    scores/valid in original-image coordinates) but runs entirely from
    the serialized program — no model code, configs or prototxts needed
    on the serving host.
    """

    def __init__(self, out_dir: str):
        with open(os.path.join(out_dir, "meta.json")) as f:
            self.meta = json.load(f)
        with open(os.path.join(out_dir, "deploy.stablehlo"), "rb") as f:
            self.exported = jax.export.deserialize(bytearray(f.read()))
        self.params = load_params(
            os.path.join(out_dir, "params.npz"),
            os.path.join(out_dir, "params_meta.json"))
        # jit wraps Exported.call so repeat calls hit the executable cache
        self._fn = jax.jit(self.exported.call)
        self.batch = int(self.meta.get("batch", 1))

    def __call__(self, img_u8, ratios, orig_wh):
        return self._fn(self.params, img_u8, ratios, orig_wh)

    def _prep(self, image_bgr: np.ndarray):
        import cv2

        net_h, net_w = self.meta["input_hw"]
        oh, ow = image_bgr.shape[:2]
        resized = cv2.resize(image_bgr, (net_w, net_h),
                             interpolation=cv2.INTER_LINEAR)
        return (resized.astype(np.uint8),
                np.asarray([net_h / oh, net_w / ow], np.float32),
                np.asarray([ow, oh], np.float32))

    @staticmethod
    def _result(out, i, ratios) -> dict:
        sl = (lambda a: np.asarray(a)[i]) if i is not None \
            else (lambda a: np.asarray(a))
        props = np.asarray(sl(out["rois"]), np.float64)
        props[:, [0, 2]] /= float(ratios[1])
        props[:, [1, 3]] /= float(ratios[0])
        return {
            "boxes": sl(out["boxes"]),
            "scores": sl(out["scores"]),
            "valid": sl(out["valid"]),
            "proposals": props,
            "proposal_scores": sl(out["roi_scores"]),
            "proposal_valid": sl(out["roi_valid"]),
        }

    def detect(self, image_bgr: np.ndarray) -> dict:
        if self.batch > 1:
            return self.detect_many([image_bgr])[0]
        img, ratios, orig_wh = self._prep(image_bgr)
        out = self(jnp.asarray(img), jnp.asarray(ratios),
                   jnp.asarray(orig_wh))
        return self._result(out, None, ratios)

    def detect_many(self, images_bgr) -> list:
        """Batched serving call(s): pads the tail group by repeating the
        last image (batch is static in the exported program)."""
        if self.batch == 1:
            return [self.detect(im) for im in images_bgr]
        preps = [self._prep(im) for im in images_bgr]
        results = []
        for g0 in range(0, len(preps), self.batch):
            grp = preps[g0:g0 + self.batch]
            pad = self.batch - len(grp)
            full = grp + [grp[-1]] * pad
            out = self(jnp.asarray(np.stack([p[0] for p in full])),
                       jnp.asarray(np.stack([p[1] for p in full])),
                       jnp.asarray(np.stack([p[2] for p in full])))
            # one device->host transfer per output array per GROUP (the
            # per-image _result slices numpy views, not device arrays)
            out = {k: np.asarray(v) for k, v in out.items()}
            for i, p in enumerate(grp):
                results.append(self._result(out, i, p[1]))
        return results


def load_deploy(out_dir: str) -> CompiledDeploy:
    return CompiledDeploy(out_dir)

"""Classifier / Detector convenience drivers + input Transformer.

Covers pycaffe's user-facing prediction wrappers
(/root/reference/python/caffe/classifier.py:1-98,
python/caffe/detector.py:1-75(windowed R-CNN driver),
python/caffe/io.py:150-250 Transformer / :300-335 oversample): load a
prototxt-defined net (models.netbuilder), preprocess host images
(resize, raw-scale, channel swap, mean, input-scale), and predict.

TPU-first differences: activations are NHWC (no HWC->CHW transpose), the
oversampled 10-crop batch is assembled host-side and runs as ONE jitted
forward (the reference forwards crops through a reshaped net), and
detector window crops are padded to a fixed batch so the graph compiles
once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.models.netbuilder import Net


def resize_image(img: np.ndarray, new_hw) -> np.ndarray:
    """Resize HWC float image (io.py resize_image; cv2 instead of
    scikit-image)."""
    import cv2

    h, w = int(new_hw[0]), int(new_hw[1])
    out = cv2.resize(np.asarray(img, np.float32), (w, h),
                     interpolation=cv2.INTER_LINEAR)
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def oversample(images: Sequence[np.ndarray], crop_hw) -> np.ndarray:
    """10-crop augmentation: 4 corners + center, plus mirrors
    (io.py:300-335). [N] HWC -> [10N, ch, cw, C], crop-major per image."""
    ch, cw = int(crop_hw[0]), int(crop_hw[1])
    out = []
    for img in images:
        h, w = img.shape[:2]
        if h < ch or w < cw:
            raise ValueError(f"image {img.shape} smaller than crop "
                             f"{(ch, cw)}")
        corners = [(0, 0), (0, w - cw), (h - ch, 0), (h - ch, w - cw),
                   ((h - ch) // 2, (w - cw) // 2)]
        crops = [img[y:y + ch, x:x + cw] for y, x in corners]
        crops += [c[:, ::-1] for c in crops]
        out.extend(crops)
    return np.stack(out).astype(np.float32)


class Transformer:
    """Host-side input preprocessing (io.py Transformer), NHWC-native.

    Order matches the reference's preprocess(): resize -> raw_scale ->
    channel_swap -> mean subtract -> input_scale."""

    def __init__(self, inputs: Dict[str, tuple]):
        self.inputs = dict(inputs)          # name -> (N, H, W, C)
        self.raw_scale: Dict[str, float] = {}
        self.input_scale: Dict[str, float] = {}
        self.mean: Dict[str, np.ndarray] = {}
        self.channel_swap: Dict[str, tuple] = {}

    def _check(self, name):
        if name not in self.inputs:
            raise KeyError(f"unknown input {name!r}")

    def set_raw_scale(self, name: str, scale: float):
        self._check(name)
        self.raw_scale[name] = float(scale)

    def set_input_scale(self, name: str, scale: float):
        self._check(name)
        self.input_scale[name] = float(scale)

    def set_mean(self, name: str, mean: np.ndarray):
        """Scalar per-channel mean [C] or full [H, W, C] plane."""
        self._check(name)
        mean = np.asarray(mean, np.float32)
        c = self.inputs[name][-1]
        if mean.ndim == 1 and mean.shape[0] != c:
            raise ValueError(f"mean channels {mean.shape[0]} != input {c}")
        self.mean[name] = mean

    def set_channel_swap(self, name: str, order: Sequence[int]):
        """e.g. (2, 1, 0) for RGB -> BGR (what Caffe-trained nets eat)."""
        self._check(name)
        self.channel_swap[name] = tuple(order)

    def preprocess(self, name: str, img: np.ndarray) -> np.ndarray:
        self._check(name)
        _, h, w, _ = self.inputs[name]
        x = np.asarray(img, np.float32)
        if x.ndim == 2:
            x = x[:, :, None]
        if x.shape[:2] != (h, w):
            x = resize_image(x, (h, w))
        if name in self.raw_scale:
            x = x * self.raw_scale[name]
        if name in self.channel_swap:
            x = x[:, :, list(self.channel_swap[name])]
        if name in self.mean:
            x = x - self.mean[name]
        if name in self.input_scale:
            x = x * self.input_scale[name]
        return x

    def deprocess(self, name: str, x: np.ndarray) -> np.ndarray:
        """Inverse of preprocess (for visualization)."""
        self._check(name)
        x = np.asarray(x, np.float32)
        if name in self.input_scale:
            x = x / self.input_scale[name]
        if name in self.mean:
            x = x + self.mean[name]
        if name in self.channel_swap:
            order = self.channel_swap[name]
            inv = [order.index(i) for i in range(len(order))]
            x = x[:, :, inv]
        if name in self.raw_scale:
            x = x / self.raw_scale[name]
        return x


class _NetDriver:
    """Shared: prototxt net + params + jitted forward to one output."""

    def __init__(self, model_file: str, weights: Optional[str] = None,
                 mean=None, input_scale=None, raw_scale=None,
                 channel_swap=None, phase: str = "TEST",
                 output: Optional[str] = None, seed: int = 0):
        self.net = Net(model_file, phase=phase)
        self.params = self.net.init(jax.random.key(seed))
        if weights:
            from mscnn_tpu.io import caffemodel as CM
            # structural hints from the built graph: an FC fed by a 4-D
            # blob (fc6-after-pool5 in the standard Classifier nets) needs
            # the NCHW->NHWC flatten permutation, and deconv blobs use
            # Caffe's reversed in/out orientation
            hints = CM.net_layout_hints(self.net)
            self.params, report = CM.load_caffemodel_params(
                weights, self.params,
                fc_after_pool=hints["fc_after_pool"],
                deconv_names=hints["deconv_names"])
            if report["mismatched"]:
                raise ValueError(
                    f"weight blobs in {weights!r} do not fit this net: "
                    f"{report['mismatched']}")

        net_inputs = self.net.inputs()
        if not net_inputs:
            raise ValueError("net has no Input layer / input declaration")
        self.input_name = next(iter(net_inputs))
        in_shape = net_inputs[self.input_name]
        self.transformer = Transformer({self.input_name: in_shape})
        if mean is not None:
            self.transformer.set_mean(self.input_name, mean)
        if input_scale is not None:
            self.transformer.set_input_scale(self.input_name, input_scale)
        if raw_scale is not None:
            self.transformer.set_raw_scale(self.input_name, raw_scale)
        if channel_swap is not None:
            self.transformer.set_channel_swap(self.input_name, channel_swap)

        if output is None:
            # last non-loss top of the graph, softmaxed if logits
            self.output = self.net.layers[-1].get("top")
            if isinstance(self.output, list):
                self.output = self.output[0]
            self.output = str(self.output)
        else:
            self.output = output
        self._fwd = jax.jit(
            lambda p, x: self.net.apply(p, {self.input_name: x})[
                self.output])

    def forward(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(self.params, jnp.asarray(x)))


class Classifier(_NetDriver):
    """Image classification driver (classifier.py): resize to image_dims,
    center-crop or 10-crop oversample to the net input, average."""

    def __init__(self, model_file: str, weights: Optional[str] = None,
                 image_dims=None, **kw):
        super().__init__(model_file, weights, **kw)
        n, h, w, c = self.net.inputs()[self.input_name]
        self.crop_dims = (h, w)
        self.image_dims = tuple(image_dims) if image_dims else (h, w)

    def predict(self, inputs: Sequence[np.ndarray],
                oversample_crops: bool = True) -> np.ndarray:
        imgs = [resize_image(np.asarray(im, np.float32), self.image_dims)
                for im in inputs]
        if oversample_crops:
            batch = oversample(imgs, self.crop_dims)
        else:
            ch, cw = self.crop_dims
            batch = np.stack([
                im[(im.shape[0] - ch) // 2:(im.shape[0] - ch) // 2 + ch,
                   (im.shape[1] - cw) // 2:(im.shape[1] - cw) // 2 + cw]
                for im in imgs]).astype(np.float32)
        batch = np.stack([self.transformer.preprocess(self.input_name, b)
                          for b in batch])
        preds = self.forward(batch)
        preds = preds.reshape(len(inputs), -1, preds.shape[-1])
        return preds.mean(axis=1)


class Detector(_NetDriver):
    """Windowed detection driver (detector.py detect_windows): crop each
    window with context padding, warp to the net input, classify all
    windows in one jitted batch.

    COORDINATE ORDER: windows here are (x1, y1, x2, y2) — x first.
    pycaffe's detector.py takes (ymin, xmin, ymax, xmax); code ported from
    it must swap the pairs or crops will be silently transposed."""

    def __init__(self, model_file: str, weights: Optional[str] = None,
                 context_pad: int = 0, **kw):
        super().__init__(model_file, weights, **kw)
        self.context_pad = int(context_pad)

    def crop(self, img: np.ndarray, window) -> np.ndarray:
        """Context-padded, edge-clipped crop (detector.py:120-170)."""
        x1, y1, x2, y2 = (int(v) for v in window)
        pad = self.context_pad
        h, w = img.shape[:2]
        cx1, cy1 = max(x1 - pad, 0), max(y1 - pad, 0)
        cx2, cy2 = min(x2 + pad, w), min(y2 + pad, h)
        return img[cy1:cy2, cx1:cx2]

    def detect_windows(self, images_windows) -> List[dict]:
        """[(image HWC, [windows])] -> [{window, prediction}] per window."""
        crops = []
        meta = []
        for img, windows in images_windows:
            img = np.asarray(img, np.float32)
            for win in windows:
                crops.append(self.transformer.preprocess(
                    self.input_name, self.crop(img, win)))
                meta.append(tuple(win))
        if not crops:
            return []
        preds = self.forward(np.stack(crops))
        return [{"window": m, "prediction": p}
                for m, p in zip(meta, preds)]

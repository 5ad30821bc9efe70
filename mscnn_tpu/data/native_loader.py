"""ctypes binding for the native (C++/OpenCV) data-loading core.

Builds `native/libmscnn_loader.so` on demand (cmake + ninja, cached) and
exposes it with the same batch-dict contract as the Python pipeline
(mscnn_tpu/data/pipeline.py): augmented images plus gt/roni boxes and the
copy region; per-scale label maps stay a device-side concern. Prefer this
loader for throughput — the Python pipeline remains the portable fallback
(`make_loader` picks automatically).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from mscnn_tpu.data.augment import AugmentSpec
from mscnn_tpu.data.pipeline import DatasetSpec

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmscnn_loader.so")


class _CLoaderConfig(ctypes.Structure):
    _fields_ = [
        ("batch_size", ctypes.c_int), ("template_h", ctypes.c_int),
        ("template_w", ctypes.c_int), ("resize_h", ctypes.c_int),
        ("resize_w", ctypes.c_int), ("max_gts", ctypes.c_int),
        ("max_ronis", ctypes.c_int), ("mirror", ctypes.c_int),
        ("mean_b", ctypes.c_float), ("mean_g", ctypes.c_float),
        ("mean_r", ctypes.c_float), ("scale", ctypes.c_float),
        ("do_multiple_scale", ctypes.c_int), ("min_scale", ctypes.c_int),
        ("max_scale", ctypes.c_int), ("min_whaspect", ctypes.c_float),
        ("max_whaspect", ctypes.c_float), ("min_gt_w", ctypes.c_float),
        ("min_gt_h", ctypes.c_float), ("fg_img_multiple", ctypes.c_int),
        ("shuffle", ctypes.c_int), ("seed", ctypes.c_uint64),
        ("num_workers", ctypes.c_int), ("queue_depth", ctypes.c_int),
        ("emit_uint8", ctypes.c_int),
    ]


def _lib_is_stale() -> bool:
    """True if the built .so predates its sources. Checked BEFORE the first
    dlopen: glibc caches loaded libraries by pathname, so a rebuild after
    CDLL would silently keep serving the old image."""
    try:
        lib_mtime = os.path.getmtime(_LIB_PATH)
    except OSError:
        return False
    for src in ("mscnn_loader.cc", "CMakeLists.txt"):
        try:
            if os.path.getmtime(os.path.join(_NATIVE_DIR, src)) > lib_mtime:
                return True
        except OSError:
            continue
    return False


def build_native(force: bool = False) -> str:
    """Compile the shared library if missing or stale; returns its path."""
    if os.path.exists(_LIB_PATH) and not force and not _lib_is_stale():
        return _LIB_PATH
    build_dir = os.path.join(_NATIVE_DIR, "build")
    os.makedirs(build_dir, exist_ok=True)
    subprocess.run(["cmake", "-G", "Ninja", ".."], cwd=build_dir, check=True,
                   capture_output=True)
    subprocess.run(["ninja"], cwd=build_dir, check=True, capture_output=True)
    return _LIB_PATH


def native_available() -> bool:
    if os.path.exists(_LIB_PATH):
        return True
    try:
        build_native()
        return True
    except Exception:
        return False


_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        if not hasattr(lib, "mscnn_loader_next_u8"):
            # Stale binary despite the mtime check (e.g. sources untouched
            # but built from an old tree). Rebuilding + re-dlopening the
            # same path would return the cached stale handle, so fail
            # loudly; build_native(force=True) in a fresh process recovers.
            raise RuntimeError(
                "native loader .so is stale (missing mscnn_loader_next_u8); "
                "delete native/build and retry in a fresh process")
        lib.mscnn_loader_create.restype = ctypes.c_void_p
        lib.mscnn_loader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(_CLoaderConfig)]
        lib.mscnn_loader_create_records.restype = ctypes.c_void_p
        lib.mscnn_loader_create_records.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(_CLoaderConfig)]
        lib.mscnn_loader_next.restype = ctypes.c_int
        lib.mscnn_loader_next.argtypes = [ctypes.c_void_p] + \
            [np.ctypeslib.ndpointer(dtype=d, flags="C_CONTIGUOUS")
             for d in (np.float32, np.float32, np.uint8, np.float32,
                       np.uint8, np.float32)]
        lib.mscnn_loader_next_u8.restype = ctypes.c_int
        lib.mscnn_loader_next_u8.argtypes = [ctypes.c_void_p] + \
            [np.ctypeslib.ndpointer(dtype=d, flags="C_CONTIGUOUS")
             for d in (np.uint8, np.float32, np.uint8, np.float32,
                       np.uint8, np.float32)]
        lib.mscnn_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.mscnn_loader_last_error.restype = ctypes.c_char_p
        _lib = lib
    return _lib


def is_record_shard(path: str) -> bool:
    """True if `path` is a packed record shard (data/records.py layout)."""
    try:
        with open(path, "rb") as f:
            return f.read(4) == b"MSCR"
    except OSError:
        return False


class NativeLoader:
    """Drop-in batch source backed by the C++ worker pool (owns its own
    prefetch queue, so no Python-side Prefetcher is needed)."""

    def __init__(self, window_file: str, aug: AugmentSpec, spec: DatasetSpec,
                 root_folder: str = "", num_workers: int = 2,
                 queue_depth: int = 3):
        lib = _load_lib()
        th, tw = aug.template_hw
        c = _CLoaderConfig(
            batch_size=spec.batch_size, template_h=th, template_w=tw,
            resize_h=aug.resize_hw[0] if aug.resize_hw else 0,
            resize_w=aug.resize_hw[1] if aug.resize_hw else 0,
            max_gts=spec.max_gts, max_ronis=spec.max_ronis,
            mirror=int(aug.mirror),
            mean_b=aug.mean_values[0], mean_g=aug.mean_values[1],
            mean_r=aug.mean_values[2], scale=aug.scale,
            do_multiple_scale=int(aug.do_multiple_scale),
            min_scale=aug.min_scale, max_scale=aug.max_scale,
            min_whaspect=aug.min_whaspect or 0.0,
            max_whaspect=aug.max_whaspect or 0.0,
            min_gt_w=aug.min_gt_width, min_gt_h=aug.min_gt_height,
            fg_img_multiple=spec.fg_img_multiple, shuffle=int(spec.shuffle),
            seed=spec.seed, num_workers=num_workers, queue_depth=queue_depth,
            emit_uint8=int(getattr(aug, "emit_uint8", False)),
        )
        self._lib = lib
        self._spec = spec
        self._uint8 = bool(getattr(aug, "emit_uint8", False))
        self._shape = (spec.batch_size, th, tw)
        if is_record_shard(window_file):
            # packed shard: one descriptor, pread + imdecode in the workers
            self._handle = lib.mscnn_loader_create_records(
                window_file.encode(), ctypes.byref(c))
        else:
            self._handle = lib.mscnn_loader_create(
                window_file.encode(), root_folder.encode(), ctypes.byref(c))
        if not self._handle:
            raise RuntimeError(
                f"native loader init failed: "
                f"{lib.mscnn_loader_last_error().decode()}")

    def next_batch(self) -> dict:
        b, th, tw = self._shape
        g, rn = self._spec.max_gts, self._spec.max_ronis
        image = np.empty((b, th, tw, 3),
                         np.uint8 if self._uint8 else np.float32)
        gt_boxes = np.empty((b, g, 7), np.float32)
        gt_valid = np.empty((b, g), np.uint8)
        ronis = np.empty((b, rn, 4), np.float32)
        roni_valid = np.empty((b, rn), np.uint8)
        copy_region = np.empty((b, 4), np.float32)
        next_fn = self._lib.mscnn_loader_next_u8 if self._uint8 \
            else self._lib.mscnn_loader_next
        rc = next_fn(
            self._handle, image, gt_boxes, gt_valid, ronis, roni_valid,
            copy_region)
        if rc != 0:
            raise RuntimeError(
                f"native loader: "
                f"{self._lib.mscnn_loader_last_error().decode()}")
        return {
            "image": image,
            "gt_boxes": gt_boxes,
            "gt_valid": gt_valid.astype(bool),
            "ronis": ronis,
            "roni_valid": roni_valid.astype(bool),
            "copy_region": copy_region,
        }

    get = next_batch  # Prefetcher-compatible alias

    def close(self):
        if self._handle:
            self._lib.mscnn_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def make_loader(window_file: str, aug: AugmentSpec, spec: DatasetSpec,
                root_folder: str = "", prefer_native: bool = True,
                device_put=None, num_workers: int = 2, queue_depth: int = 3):
    """Batch-source factory: native C++ loader when buildable, else the
    Python dataset wrapped in the threaded Prefetcher. Returns an object
    with .get() -> batch dict and .close()."""
    if prefer_native and native_available():
        try:
            loader = NativeLoader(window_file, aug, spec, root_folder,
                                  num_workers=num_workers,
                                  queue_depth=queue_depth)
        except Exception as e:
            import warnings
            warnings.warn(f"native loader unavailable ({e!r}); "
                          "falling back to the Python pipeline")
            loader = None
    else:
        loader = None
    if loader is not None:
        if device_put is None:
            return loader

        # run device_put in a Prefetcher worker thread (depth 2) so the
        # host->device transfer overlaps the device's current step — the
        # same overlap the Python pipeline gets, and the difference
        # between serialized H2D and hidden H2D on slow links
        # (BENCH.md round 4: the e2e train bench's input wait)
        from mscnn_tpu.data import pipeline as P

        class _CloseBoth(P.Prefetcher):
            def close(self):
                super().close()
                if self.thread.is_alive():
                    # The worker is still blocked inside mscnn_loader_next
                    # (slow decode/IO); destroying the native handle now
                    # would free the Loader out from under the running
                    # call. Leak it instead — process teardown reclaims.
                    return
                loader.close()

        return _CloseBoth(loader, depth=2, device_put=device_put)
    from mscnn_tpu.data import pipeline as P
    if is_record_shard(window_file):
        from mscnn_tpu.data import records as R
        ds = R.RecordShard(window_file).dataset(aug, spec)
    else:
        ds = P.dataset_from_window_file(window_file, aug, spec, root_folder)
    return P.Prefetcher(ds, device_put=device_put)

"""Native C++ loader: build, batch contract, invariants vs the Python
pipeline, throughput sanity, and error propagation."""

import numpy as np
import pytest

from mscnn_tpu.data import native_loader as NL
from mscnn_tpu.data import pipeline as P
from mscnn_tpu.data import window_file as W
from mscnn_tpu.data.augment import AugmentSpec

pytestmark = pytest.mark.skipif(
    not NL.native_available(), reason="native loader not buildable")


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("native_data")
    rng = np.random.RandomState(0)
    images = []
    for i in range(5):
        img = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
        path = str(root / f"im_{i}.png")
        assert cv2.imwrite(path, img)
        gts = np.array([[1, 0, 10 + i, 20, 60 + i, 70]], np.float32)
        ronis = (np.array([[0, 0, 10, 10]], np.float32) if i % 2
                 else np.zeros((0, 4), np.float32))
        images.append(W.WindowImage(path, 3, 96, 128, gts, ronis))
    wf = str(root / "windows.txt")
    W.write_window_file(wf, images)
    return wf, root


def _aug(**kw):
    kw.setdefault("mirror", False)
    return AugmentSpec(template_hw=(96, 128), **kw)


def test_native_batch_contract(disk_dataset):
    wf, _ = disk_dataset
    spec = P.DatasetSpec(batch_size=3, max_gts=8, max_ronis=4)
    with NL.NativeLoader(wf, _aug(), spec) as loader:
        batch = loader.next_batch()
    assert batch["image"].shape == (3, 96, 128, 3)
    assert batch["image"].dtype == np.float32
    assert batch["gt_boxes"].shape == (3, 8, 7)
    assert batch["gt_valid"].dtype == bool
    assert batch["copy_region"].shape == (3, 4)
    # full-size image: copy region covers the template
    np.testing.assert_array_equal(batch["copy_region"],
                                  [[0, 0, 128, 96]] * 3)
    # gt img_id column matches the slot
    for b in range(3):
        v = batch["gt_valid"][b]
        assert v.any()
        assert (batch["gt_boxes"][b, v, 0] == b).all()


def test_native_matches_python_mean_subtraction(disk_dataset):
    """Identity geometry: canvas must be exactly image - mean (both paths)."""
    import cv2
    wf, root = disk_dataset
    spec = P.DatasetSpec(batch_size=1, max_gts=8, max_ronis=4, shuffle=False)
    # one worker: batch completion order == sample order
    with NL.NativeLoader(wf, _aug(), spec, num_workers=1) as loader:
        batch = loader.next_batch()
    # unshuffled: first sample is im_0
    img = cv2.imread(str(root / "im_0.png"), cv2.IMREAD_COLOR)
    expect = img.astype(np.float32) - np.array([104.0, 117.0, 123.0],
                                               np.float32)
    np.testing.assert_allclose(batch["image"][0], expect, atol=1e-5)
    np.testing.assert_allclose(batch["gt_boxes"][0, 0, 1:5], [10, 20, 60, 70])


def test_native_augmentations_run(disk_dataset):
    wf, _ = disk_dataset
    aug = _aug(mirror=True, resize_hw=(96, 128), do_multiple_scale=True,
               min_scale=20, max_scale=80, min_gt_height=10.0)
    spec = P.DatasetSpec(batch_size=2, max_gts=8, max_ronis=4, seed=3)
    with NL.NativeLoader(wf, aug, spec) as loader:
        for _ in range(6):
            batch = loader.next_batch()
            assert np.isfinite(batch["image"]).all()
            assert np.isfinite(batch["gt_boxes"]).all()
            # labels/ignores stay in range
            v = batch["gt_valid"]
            assert set(np.unique(batch["gt_boxes"][..., 6][v])) <= {0.0, 1.0}


def test_native_deterministic_given_seed(disk_dataset):
    wf, _ = disk_dataset
    spec = P.DatasetSpec(batch_size=2, max_gts=8, max_ronis=4, seed=11)
    with NL.NativeLoader(wf, _aug(mirror=True), spec,
                         num_workers=1) as loader:
        a = loader.next_batch()
    with NL.NativeLoader(wf, _aug(mirror=True), spec,
                         num_workers=1) as loader:
        b = loader.next_batch()
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])


def test_native_error_propagation(tmp_path):
    images = [W.WindowImage(str(tmp_path / "missing.png"), 3, 96, 128,
                            np.zeros((0, 6), np.float32),
                            np.zeros((0, 4), np.float32))]
    wf = str(tmp_path / "w.txt")
    W.write_window_file(wf, images)
    spec = P.DatasetSpec(batch_size=1, max_gts=4, max_ronis=2)
    with NL.NativeLoader(wf, _aug(), spec) as loader:
        with pytest.raises(RuntimeError, match="could not read"):
            loader.next_batch()


def test_make_loader_prefers_native(disk_dataset):
    wf, _ = disk_dataset
    spec = P.DatasetSpec(batch_size=2, max_gts=8, max_ronis=4)
    loader = NL.make_loader(wf, _aug(), spec)
    try:
        assert isinstance(loader, NL.NativeLoader)
        batch = loader.get()
        assert batch["image"].shape[0] == 2
    finally:
        loader.close()


def test_native_throughput_smoke(disk_dataset):
    """The worker pool keeps producing batches back to back."""
    import time
    wf, _ = disk_dataset
    spec = P.DatasetSpec(batch_size=4, max_gts=8, max_ronis=4)
    with NL.NativeLoader(wf, _aug(mirror=True), spec,
                         num_workers=2) as loader:
        loader.next_batch()  # warm
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            loader.next_batch()
        dt = time.perf_counter() - t0
    assert dt / n < 0.5, f"native loader too slow: {dt / n:.3f}s per batch"


def test_native_uint8_matches_float_after_device_normalize(disk_dataset):
    """AugmentSpec.emit_uint8 ships raw bytes; after on-device
    normalization (train_step.normalize_uint8_batch) the image must be
    BIT-IDENTICAL to the float loader path — same seed, same batch."""
    import jax.numpy as jnp

    from mscnn_tpu.train import train_step as T

    wf, _ = disk_dataset
    spec = P.DatasetSpec(batch_size=3, max_gts=8, max_ronis=4, shuffle=False)
    # octave rescale on: the interpolated resize is the risky case
    kw = dict(do_multiple_scale=True, min_scale=30, max_scale=60,
              resize_hw=(80, 100))
    # num_workers=1: with >1 workers the first queued batch depends on
    # thread scheduling, so the two loaders could hand back different
    # (seed-deterministic) batches under load
    with NL.NativeLoader(wf, _aug(**kw), spec, num_workers=1) as lf:
        ref = lf.next_batch()
    with NL.NativeLoader(wf, _aug(emit_uint8=True, **kw), spec,
                         num_workers=1) as lu:
        raw = lu.next_batch()
    assert raw["image"].dtype == np.uint8
    for k in ("gt_boxes", "gt_valid", "ronis", "roni_valid", "copy_region"):
        np.testing.assert_array_equal(raw[k], ref[k])
    norm = T.normalize_uint8_batch(
        {k: jnp.asarray(v) for k, v in raw.items()}, T.TrainSpec())
    np.testing.assert_array_equal(np.asarray(norm["image"]), ref["image"])


def test_python_uint8_augment_matches_float(disk_dataset):
    """Same property on the pure-Python augment path."""
    import jax.numpy as jnp

    from mscnn_tpu.data import augment as A
    from mscnn_tpu.train import train_step as T

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (70, 90, 3)).astype(np.uint8)
    gts = np.array([[1, 0, 10, 20, 60, 65]], np.float32)
    ronis = np.zeros((0, 4), np.float32)
    kw = dict(resize_hw=(120, 150), do_multiple_scale=True,
              min_scale=30, max_scale=60)
    f = A.augment(np.random.RandomState(7), img, gts, ronis, _aug(**kw))
    u = A.augment(np.random.RandomState(7), img, gts, ronis,
                  _aug(emit_uint8=True, **kw))
    assert u[0].dtype == np.uint8
    batch = {"image": jnp.asarray(u[0][None]),
             "copy_region": jnp.asarray(np.asarray(u[3], np.float32)[None])}
    # copy_region convention: (src_x, src_y, copy_w, copy_h)
    norm = T.normalize_uint8_batch(batch, T.TrainSpec())
    np.testing.assert_array_equal(np.asarray(norm["image"][0]), f[0])

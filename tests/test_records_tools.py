"""Packed record shards + aux tools (convert_imageset / compute_mean /
extract_features): format round trip, Python + native loader equivalence
against the per-file path, and CLI surfaces."""

import os

import numpy as np
import pytest

from mscnn_tpu import tools as TL
from mscnn_tpu.data import native_loader as NL
from mscnn_tpu.data import pipeline as P
from mscnn_tpu.data import records as R
from mscnn_tpu.data import window_file as W
from mscnn_tpu.data.augment import AugmentSpec


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("rec_data")
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
    return wf, root, images


@pytest.fixture(scope="module")
def shard(disk_dataset, tmp_path_factory):
    wf, root, images = disk_dataset
    path = str(tmp_path_factory.mktemp("shard") / "data.mscr")
    n = R.write_records(path, images)
    assert n == 5
    return path


def test_shard_roundtrip(shard, disk_dataset):
    wf, root, images = disk_dataset
    s = R.RecordShard(shard)
    assert len(s) == 5
    for i, im in enumerate(images):
        got = s.images[i]
        assert got.path == im.path
        assert (got.channels, got.height, got.width) == (3, 96, 128)
        np.testing.assert_array_equal(got.gts, im.gts)
        np.testing.assert_array_equal(got.ronis, im.ronis)
        # raw-bytes mode stores the file verbatim
        assert s.read_bytes(i) == open(im.path, "rb").read()
        import cv2
        np.testing.assert_array_equal(s.read_image(i),
                                      cv2.imread(im.path, cv2.IMREAD_COLOR))


def test_shard_dataset_matches_window_file(shard, disk_dataset):
    """Same seed -> identical augmented batches from the packed shard and
    the per-file pipeline (raw-bytes packing is lossless)."""
    wf, root, images = disk_dataset
    aug = AugmentSpec(template_hw=(96, 128), mirror=False)
    spec = P.DatasetSpec(batch_size=3, max_gts=8, max_ronis=4, seed=11)
    ds_file = P.MSCNNDataset(images, aug, spec)
    ds_pack = R.RecordShard(shard).dataset(aug, spec)
    for _ in range(3):
        a = ds_file.next_batch()
        b = ds_pack.next_batch()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.skipif(not NL.native_available(),
                    reason="native loader not buildable")
def test_native_records_matches_window_file(shard, disk_dataset):
    """The C++ loader over the shard reproduces the window-file loader
    batch-for-batch (same seed, same augmentation RNG stream)."""
    wf, root, images = disk_dataset
    aug = AugmentSpec(template_hw=(96, 128), mirror=False)
    spec = P.DatasetSpec(batch_size=2, max_gts=8, max_ronis=4, seed=3,
                         shuffle=True)
    with NL.NativeLoader(wf, aug, spec, num_workers=1) as lf, \
            NL.NativeLoader(shard, aug, spec, num_workers=1) as lr:
        for _ in range(4):
            a = lf.next_batch()
            b = lr.next_batch()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_is_record_shard(shard, disk_dataset):
    wf, _, _ = disk_dataset
    assert NL.is_record_shard(shard)
    assert not NL.is_record_shard(wf)
    assert not NL.is_record_shard("/nonexistent/path")


def test_cli_convert_imageset_window_file(disk_dataset, tmp_path):
    from mscnn_tpu import cli
    wf, root, images = disk_dataset
    out = str(tmp_path / "cli.mscr")
    rc = cli.main(["convert_imageset", "--window-file", wf, "-o", out])
    assert rc == 0
    assert len(R.RecordShard(out)) == 5


def test_cli_convert_imageset_listfile(disk_dataset, tmp_path):
    from mscnn_tpu import cli
    wf, root, images = disk_dataset
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        for i, im in enumerate(images):
            f.write(f"{os.path.basename(im.path)} {i % 3}\n")
    out = str(tmp_path / "cls.mscr")
    rc = cli.main(["convert_imageset", "--listfile", lst,
                   "--root-folder", str(root), "--shuffle", "-o", out])
    assert rc == 0
    s = R.RecordShard(out)
    assert len(s) == 5
    labels = sorted(int(im.gts[0, 0]) for im in s.images)
    assert labels == [0, 0, 1, 1, 2]
    # full-image gt row carries the frame size
    for im in s.images:
        assert (im.gts[0, 4], im.gts[0, 5]) == (128.0, 96.0)


def test_compute_mean_values(disk_dataset, tmp_path):
    import cv2
    wf, root, images = disk_dataset
    bgr, pixel = TL.compute_image_mean(wf)
    stack = np.stack([cv2.imread(im.path, cv2.IMREAD_COLOR)
                      for im in images]).astype(np.float64)
    np.testing.assert_allclose(bgr, stack.reshape(-1, 3).mean(0), atol=1e-9)
    np.testing.assert_allclose(pixel, stack.mean(0), atol=1e-9)

    # BlobProto output parses back with the reference wire reader
    out = str(tmp_path / "mean.binaryproto")
    TL.compute_image_mean(wf, output=out)
    from mscnn_tpu.io import caffemodel as CM
    with open(out, "rb") as f:
        blob = CM._parse_blob(memoryview(f.read()))
    assert blob.shape == (1, 3, 96, 128)
    np.testing.assert_allclose(blob[0], np.transpose(pixel, (2, 0, 1)),
                               atol=1e-4)


def test_compute_mean_on_shard(shard, disk_dataset):
    wf, _, _ = disk_dataset
    bgr_s, _ = TL.compute_image_mean(shard)
    bgr_f, _ = TL.compute_image_mean(wf)
    np.testing.assert_allclose(bgr_s, bgr_f, atol=1e-9)


def test_extract_features(disk_dataset, tmp_path):
    import h5py
    import jax

    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    wf, root, images = disk_dataset
    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    out = str(tmp_path / "feats.h5")
    paths = [im.path for im in images[:2]]
    shapes = TL.extract_features(params, cfg, paths,
                                 ["conv4_3", "LFCN_1_5x5"], out)
    h, w = cfg.input_hw
    assert shapes["conv4_3"] == (h // 8, w // 8, 512)
    assert shapes["LFCN_1_5x5"][:2] == (h // 8, w // 8)
    with h5py.File(out, "r") as f:
        assert f["conv4_3"].shape == (2, h // 8, w // 8, 512)
        assert np.isfinite(f["conv4_3"][:]).all()
        assert np.isfinite(f["LFCN_1_5x5"][:]).all()


def test_blobproto_roundtrip():
    from mscnn_tpu.io import caffemodel as CM

    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    back = CM.blobproto_to_array(CM.array_to_blobproto(arr))
    np.testing.assert_array_equal(back, arr)
    assert back.shape == (2, 3, 4)


def test_cli_resize_images(tmp_path, capsys):
    import cv2
    from mscnn_tpu import cli

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i, (h, w) in enumerate([(40, 80), (80, 40), (64, 64)]):
        cv2.imwrite(str(src / f"im{i}.png"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
    rc = cli.main(["resize_images", str(src), "--output-dir", str(dst),
                   "--width", "32", "--height", "24"])
    assert rc == 0
    assert "Wrote 3/3" in capsys.readouterr().out
    for i in range(3):
        img = cv2.imread(str(dst / f"im{i}.png"))
        assert img.shape == (24, 32, 3)   # crop preserves aspect first

"""Auxiliary data sources: image-list / memory / HDF5 / window-crop."""

import numpy as np
import pytest

from mscnn_tpu.data import sources as S
from mscnn_tpu.data import window_file as W


def fake_loader(path):
    h = abs(hash(path)) % 200
    return np.full((40, 50, 3), h, np.uint8)


def test_transform_chain(rng):
    img = np.full((20, 30, 3), 100, np.uint8)
    spec = S.TransformSpec(scale=0.5, mean_values=(10, 20, 30), crop_size=16)
    out = S.transform(rng, img, spec)
    assert out.shape == (16, 16, 3)
    np.testing.assert_allclose(out[0, 0], [(100 - 10) / 2, 40, 35])
    # test-time crop is centered and deterministic
    a = S.transform(rng, img, spec, train=False)
    b = S.transform(rng, img, spec, train=False)
    np.testing.assert_array_equal(a, b)


def test_image_list_dataset(tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text("a.png 3\nb.png 1\nc.png 0\n")
    ds = S.ImageListDataset(str(lst), batch_size=2, shuffle=False,
                            image_loader=fake_loader)
    batch = ds.next_batch()
    assert batch["image"].shape == (2, 40, 50, 3)
    assert batch["label"].tolist() == [3, 1]
    batch2 = ds.next_batch()  # wraps around the epoch
    assert batch2["label"].tolist() == [0, 3]


def test_memory_dataset(rng):
    x = rng.randn(10, 4).astype(np.float32)
    y = np.arange(10)
    ds = S.MemoryDataset({"x": x, "y": y}, batch_size=4)
    b1 = ds.next_batch()
    np.testing.assert_allclose(b1["x"], x[:4])
    assert b1["y"].tolist() == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="mismatched"):
        S.MemoryDataset({"x": x, "y": y[:5]}, batch_size=2)


def test_hdf5_roundtrip(tmp_path, rng):
    data = {"data": rng.randn(6, 3).astype(np.float32),
            "label": np.arange(6, dtype=np.int64)}
    p1 = str(tmp_path / "a.h5")
    S.write_hdf5(p1, data)
    ds = S.HDF5Dataset([p1, p1], batch_size=3)  # two files concatenated
    b = ds.next_batch()
    assert b["data"].shape == (3, 3)
    total = 0
    for _ in range(4):
        total += ds.next_batch()["data"].shape[0]
    assert total == 12


def test_window_crop_dataset():
    # gts rows: (label, overlap, x1, y1, x2, y2)
    gts = np.array([[2, 1.0, 5, 5, 25, 30],
                    [0, 0.1, 0, 0, 10, 10]], np.float32)
    im = W.WindowImage("img.png", 3, 40, 50, gts, np.zeros((0, 4), np.float32))
    ds = S.WindowCropDataset([im], crop_size=32, batch_size=4,
                             fg_fraction=0.5, image_loader=fake_loader)
    batch = ds.next_batch()
    assert batch["image"].shape == (4, 32, 32, 3)
    assert set(batch["label"].tolist()) <= {0.0, 2.0}
    assert (batch["label"][:2] == 2.0).all()  # fg slots first

"""Window-file parsing, augmentation geometry, batch assembly, prefetch,
and the on-device label-rasterization path through the train step."""

import numpy as np
import pytest

from mscnn_tpu.data import augment as A
from mscnn_tpu.data import pipeline as P
from mscnn_tpu.data import window_file as W


def make_images(n=3, with_fg=True):
    out = []
    for i in range(n):
        gts = np.array([[1, 0, 10 + i, 20, 50 + i, 60],
                        [2, 1, 5, 5, 30, 40]], np.float32) \
            if with_fg else np.zeros((0, 6), np.float32)
        ronis = np.array([[0, 0, 8, 8]], np.float32) if i % 2 else \
            np.zeros((0, 4), np.float32)
        out.append(W.WindowImage(f"/data/img_{i}.png", 3, 96, 128, gts, ronis))
    return out


def test_window_file_roundtrip(tmp_path):
    images = make_images()
    path = tmp_path / "windows.txt"
    W.write_window_file(str(path), images)
    parsed = W.parse_window_file(str(path))
    assert len(parsed) == len(images)
    for a, b in zip(images, parsed):
        assert a.path == b.path
        assert (a.channels, a.height, a.width) == (b.channels, b.height, b.width)
        np.testing.assert_array_equal(a.gts, b.gts)
        np.testing.assert_array_equal(a.ronis, b.ronis)


def test_fg_oversampling_and_histogram():
    fg = make_images(2, with_fg=True)
    bg = make_images(1, with_fg=False)
    lst = W.build_image_list(fg + bg, fg_img_multiple=3)
    # 2 fg images x3 + 1 bg image x1
    assert len(lst) == 7
    assert (lst == 0).sum() == 3 and (lst == 2).sum() == 1
    hist = W.class_histogram(fg)
    assert hist[1] == 2 and hist[2] == 2


def _plain_spec(hw=(96, 128), **kw):
    kw.setdefault("mirror", False)
    return A.AugmentSpec(template_hw=hw, **kw)


def test_augment_identity_geometry(rng):
    """No mirror / resize / zoom and template == image: pure mean-subtract."""
    img = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
    gts = np.array([[1, 0, 10, 20, 50, 60]], np.float32)
    canvas, gts6, ronis, region = A.augment(
        rng, img, gts, np.zeros((0, 4), np.float32), _plain_spec())
    assert canvas.shape == (96, 128, 3)
    np.testing.assert_allclose(
        canvas, img.astype(np.float32) - np.array([104.0, 117.0, 123.0]),
        atol=1e-5)
    np.testing.assert_allclose(gts6[0, :4], [10, 20, 50, 60])
    assert gts6[0, 4] == 1 and gts6[0, 5] == 0
    assert region == (0, 0, 128, 96)


def test_augment_resize_scales_boxes(rng):
    img = np.full((48, 64, 3), 128, np.uint8)
    gts = np.array([[1, 0, 8, 8, 40, 40]], np.float32)
    spec = _plain_spec(hw=(96, 128), resize_hw=(96, 128))
    _, gts6, _, region = A.augment(rng, img, gts,
                                   np.zeros((0, 4), np.float32), spec)
    np.testing.assert_allclose(gts6[0, :4], [16, 16, 80, 80])
    assert region == (0, 0, 128, 96)


def test_augment_mirror_flips_boxes():
    class ForceMirror(np.random.RandomState):
        def randint(self, *a, **k):
            return 1 if a == (2,) else super().randint(*a, **k)

    rng = ForceMirror(0)
    img = np.zeros((96, 128, 3), np.uint8)
    img[:, :64] = 255  # left half bright
    gts = np.array([[1, 0, 10, 20, 50, 60]], np.float32)
    canvas, gts6, _, _ = A.augment(rng, img, gts,
                                   np.zeros((0, 4), np.float32),
                                   _plain_spec(mirror=True))
    # x-mirrored: x1' = W - x2, x2' = W - x1
    np.testing.assert_allclose(gts6[0, :4], [128 - 50, 20, 128 - 10, 60])
    # bright half moved to the right
    assert canvas[0, -1, 0] > canvas[0, 0, 0]


def test_augment_small_image_pastes_centered(rng):
    img = np.full((40, 60, 3), 200, np.uint8)
    spec = _plain_spec(hw=(96, 128))
    canvas, _, _, (sx, sy, cw, ch) = A.augment(
        rng, img, np.zeros((0, 6), np.float32),
        np.zeros((0, 4), np.float32), spec)
    assert (cw, ch) == (60, 40)
    assert 0 <= sx <= 128 - 60 and 0 <= sy <= 96 - 40
    # outside the copy region the canvas is zero
    assert canvas[0, 0, 0] == 0.0
    inside = canvas[sy + 5, sx + 5]
    np.testing.assert_allclose(inside, 200.0 - np.array([104.0, 117.0, 123.0]))


def test_augment_min_size_ignore(rng):
    img = np.zeros((96, 128, 3), np.uint8)
    gts = np.array([[1, 0, 10, 10, 20, 14]], np.float32)  # height 5 < 35
    spec = _plain_spec(min_gt_height=35.0)
    _, gts6, _, _ = A.augment(rng, img, gts, np.zeros((0, 4), np.float32), spec)
    assert gts6[0, 5] == 1  # flipped to ignore


def test_octave_zoom_runs(rng):
    img = np.full((96, 128, 3), 100, np.uint8)
    gts = np.array([[1, 0, 30, 30, 60, 60]], np.float32)
    spec = _plain_spec(do_multiple_scale=True, min_scale=24, max_scale=96)
    for seed in range(8):
        r = np.random.RandomState(seed)
        canvas, gts6, _, region = A.augment(
            r, img, gts.copy(), np.zeros((0, 4), np.float32), spec)
        assert canvas.shape == (96, 128, 3)
        assert np.isfinite(gts6).all()


def fake_loader(path: str) -> np.ndarray:
    h = abs(hash(path)) % 200
    return np.full((96, 128, 3), h, np.uint8)


def test_dataset_and_prefetcher():
    images = make_images(4)
    ds = P.MSCNNDataset(images, _plain_spec(), P.DatasetSpec(batch_size=2),
                        image_loader=fake_loader)
    batch = ds.next_batch()
    assert batch["image"].shape == (2, 96, 128, 3)
    assert batch["gt_boxes"].shape == (2, 64, 7)
    assert batch["gt_valid"].any()
    # gt img_id column matches position in batch
    assert (batch["gt_boxes"][1, batch["gt_valid"][1], 0] == 1).all()

    with P.Prefetcher(ds, depth=2) as pf:
        b1 = pf.get()
        b2 = pf.get()
        assert b1["image"].shape == b2["image"].shape


def test_prefetcher_propagates_errors():
    def bad_loader(path):
        raise RuntimeError("boom")

    ds = P.MSCNNDataset(make_images(2), _plain_spec(),
                        P.DatasetSpec(batch_size=1), image_loader=bad_loader)
    with P.Prefetcher(ds, depth=1) as pf:
        with pytest.raises(RuntimeError, match="boom"):
            pf.get(timeout=10.0)


def test_train_step_rasterizes_on_device():
    import jax
    import jax.numpy as jnp
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    from mscnn_tpu.train import train_step as T

    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    h, w = cfg.input_hw
    images = make_images(2)
    ds = P.MSCNNDataset(images, _plain_spec(hw=(h, w)),
                        P.DatasetSpec(batch_size=2, max_gts=8, max_ronis=4),
                        image_loader=lambda p: np.zeros((h, w, 3), np.uint8))
    batch = {k: jnp.asarray(v) for k, v in ds.next_batch().items()}
    tspec = T.TrainSpec(stage=2, roi_batch=16, with_metrics=False)
    loss, metrics = T.loss_fn(params, batch, jax.random.key(0), cfg, tspec)
    assert np.isfinite(float(loss))
    # labels really were rasterized: at least one positive cell across scales
    labels = T.rasterize_batch(batch, cfg, tspec)
    assert sum(float((lab[..., 0] > 0).sum()) for lab in labels) >= 0

"""Classifier/Detector drivers + Transformer (pycaffe classifier.py /
detector.py / io.py equivalents)."""

import numpy as np
import pytest

from mscnn_tpu import classify as CL
from mscnn_tpu.models import netspec

L = netspec.layers


def tiny_classifier_prototxt(h=12, w=12, classes=4):
    n = netspec.NetSpec()
    n.data = L.Input(input_param=dict(shape=dict(dim=[1, 3, h, w])))
    n.conv1 = L.Convolution(n.data, kernel_size=3, num_output=8, pad=1,
                            weight_filler=dict(type="xavier"))
    n.relu1 = L.ReLU(n.conv1, in_place=True)
    n.pool1 = L.Pooling(n.conv1, kernel_size=2, stride=2)
    n.ip = L.InnerProduct(n.pool1, num_output=classes,
                          weight_filler=dict(type="xavier"))
    n.prob = L.Softmax(n.ip)
    return n.to_prototxt(name="tinycls")


def test_oversample_crops_and_mirrors():
    img = np.arange(6 * 8 * 3, dtype=np.float32).reshape(6, 8, 3)
    crops = CL.oversample([img], (4, 4))
    assert crops.shape == (10, 4, 4, 3)
    # crop 0 = top-left corner; crop 5 = its mirror
    np.testing.assert_array_equal(crops[0], img[:4, :4])
    np.testing.assert_array_equal(crops[5], img[:4, :4][:, ::-1])
    # crop 4 = center
    np.testing.assert_array_equal(crops[4], img[1:5, 2:6])


def test_transformer_order_and_inverse():
    t = CL.Transformer({"data": (1, 4, 4, 3)})
    t.set_raw_scale("data", 255.0)
    t.set_channel_swap("data", (2, 1, 0))
    t.set_mean("data", np.array([10.0, 20.0, 30.0], np.float32))
    t.set_input_scale("data", 0.5)
    img = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    x = t.preprocess("data", img)
    # manual: *255, RGB->BGR, -mean, *0.5
    ref = (img * 255.0)[:, :, ::-1] - np.array([10.0, 20.0, 30.0])
    np.testing.assert_allclose(x, ref * 0.5, rtol=1e-6)
    back = t.deprocess("data", x)
    np.testing.assert_allclose(back, img, rtol=1e-4, atol=1e-4)


def test_transformer_validates():
    t = CL.Transformer({"data": (1, 4, 4, 3)})
    with pytest.raises(KeyError):
        t.set_raw_scale("nope", 1.0)
    with pytest.raises(ValueError):
        t.set_mean("data", np.zeros(2, np.float32))


def test_classifier_predict(tmp_path):
    proto = tmp_path / "net.prototxt"
    proto.write_text(tiny_classifier_prototxt())
    clf = CL.Classifier(str(proto), image_dims=(16, 16),
                        mean=np.array([100.0, 110.0, 120.0]),
                        channel_swap=(2, 1, 0))
    rng = np.random.RandomState(0)
    imgs = [rng.rand(20, 24, 3).astype(np.float32) * 255 for _ in range(3)]
    probs = clf.predict(imgs, oversample_crops=True)
    assert probs.shape == (3, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    # center-crop-only path
    probs1 = clf.predict(imgs, oversample_crops=False)
    assert probs1.shape == (3, 4)


def test_detector_windows(tmp_path):
    proto = tmp_path / "net.prototxt"
    proto.write_text(tiny_classifier_prototxt())
    det = CL.Detector(str(proto), context_pad=2)
    rng = np.random.RandomState(1)
    img = rng.rand(32, 40, 3).astype(np.float32)
    wins = [(0, 0, 10, 10), (5, 8, 30, 28)]
    out = det.detect_windows([(img, wins)])
    assert len(out) == 2
    assert out[0]["window"] == (0, 0, 10, 10)
    assert out[0]["prediction"].shape == (4,)
    np.testing.assert_allclose(out[1]["prediction"].sum(), 1.0, rtol=1e-4)


def test_classifier_loads_caffemodel_weights(tmp_path):
    """Classifier(weights=...) pulls conv/fc blobs from a .caffemodel with
    the caffe->NHWC layout transposes applied."""
    import jax
    import jax.numpy as jnp
    from mscnn_tpu.io import caffemodel as CM
    from mscnn_tpu.models.netbuilder import Net

    proto = tmp_path / "net.prototxt"
    proto.write_text(tiny_classifier_prototxt())
    net = Net(str(proto), phase="TEST")
    params = net.init(jax.random.key(7))
    path = str(tmp_path / "w.caffemodel")
    # export in true reference layout: the FC after the spatial blob gets
    # the NHWC->NCHW flatten inverse, so the file is what caffe would write
    hints = CM.net_layout_hints(net)
    CM.save_caffemodel({k: dict(v) for k, v in params.items()}, path,
                       fc_after_pool=hints["fc_after_pool"])

    clf = CL.Classifier(str(proto), weights=path, image_dims=(16, 16))
    for lname in ("conv1", "ip"):
        np.testing.assert_allclose(
            np.asarray(clf.params[lname]["w"]),
            np.asarray(params[lname]["w"]), atol=1e-6,
            err_msg=f"{lname} weights not restored")
    # and predictions equal a driver primed with the same params directly
    ref = CL.Classifier(str(proto), image_dims=(16, 16), seed=7)
    img = np.random.RandomState(0).rand(20, 20, 3).astype(np.float32)
    np.testing.assert_allclose(clf.predict([img], oversample_crops=False),
                               ref.predict([img], oversample_crops=False),
                               rtol=1e-4, atol=1e-5)

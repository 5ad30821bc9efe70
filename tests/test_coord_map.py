"""coord_map: FCN crop-alignment algebra over NetSpec graphs.

Mirrors the reference's pycaffe suite
(/root/reference/python/caffe/test/test_coord_map.py) case for case.
"""

import numpy as np
import pytest

from mscnn_tpu.models import netspec
from mscnn_tpu.models.coord_map import coord_map_from_to, crop

L = netspec.layers
P = netspec.params


def coord_net_spec(ks=3, stride=1, pad=0, pool=2, dstride=2, dpad=0):
    n = netspec.NetSpec()
    n.data = L.Input(shape=dict(dim=[2, 1, 100, 100]))
    n.aux = L.Input(shape=dict(dim=[2, 1, 20, 20]))
    n.conv = L.Convolution(n.data, num_output=10, kernel_size=ks,
                           stride=stride, pad=pad)
    n.pool = L.Pooling(n.conv, pool=P.Pooling.MAX, kernel_size=pool,
                       stride=pool, pad=0)
    deconv_ks = [s * 2 for s in dstride] if isinstance(dstride, list) \
        else dstride * 2
    n.deconv = L.Deconvolution(n.pool, num_output=10,
                               kernel_size=deconv_ks, stride=dstride,
                               pad=dpad)
    return n


def test_conv_pool_deconv():
    # identity for 2x pool, 2x deconv
    n = coord_net_spec()
    ax, a, b = coord_map_from_to(n.deconv, n.data)
    assert (ax, a, b) == (1, 1, 0)
    # shift-by-one for 4x pool, 4x deconv
    n = coord_net_spec(pool=4, dstride=4)
    ax, a, b = coord_map_from_to(n.deconv, n.data)
    assert (ax, a, b) == (1, 1, -1)


def test_pass_through_and_1x1():
    n = coord_net_spec()
    ax, a, b = coord_map_from_to(n.deconv, n.data)
    n.relu = L.ReLU(n.deconv)
    n.conv1x1 = L.Convolution(n.relu, num_output=10, kernel_size=1,
                              stride=1, pad=0)
    for top in (n.relu, n.conv1x1):
        assert coord_map_from_to(top, n.data) == (ax, a, b)


def test_padding():
    n = coord_net_spec()
    ax, a, b = coord_map_from_to(n.deconv, n.data)
    pad = 7
    n2 = coord_net_spec(pad=pad)
    _, a_p, b_p = coord_map_from_to(n2.deconv, n2.data)
    assert a_p == a and b_p == b - pad          # conv padding adds offset
    n3 = coord_net_spec(dpad=pad)
    _, a_d, b_d = coord_map_from_to(n3.deconv, n3.data)
    assert a_d == a and b_d == b + pad          # deconv padding subtracts
    n4 = coord_net_spec(pad=pad, dpad=pad)
    _, a_c, b_c = coord_map_from_to(n4.deconv, n4.data)
    assert a_c == a and b_c == b                # cancel out


def test_multi_bottom_top_identical():
    n = coord_net_spec()
    n.conv_data, n.conv_aux = L.Convolution(
        n.data, n.aux, ntop=2, num_output=10, kernel_size=5, stride=2,
        pad=0)
    m1 = coord_map_from_to(n.conv_data, n.data)
    m2 = coord_map_from_to(n.conv_aux, n.aux)
    assert m1 == m2


def test_rect_anisotropic():
    n3x3 = coord_net_spec(ks=3, stride=1, pad=0)
    n5x5 = coord_net_spec(ks=5, stride=2, pad=10)
    n3x5 = coord_net_spec(ks=[3, 5], stride=[1, 2], pad=[0, 10])
    ax33, a33, b33 = coord_map_from_to(n3x3.deconv, n3x3.data)
    ax55, a55, b55 = coord_map_from_to(n5x5.deconv, n5x5.data)
    ax35, a35, b35 = coord_map_from_to(n3x5.deconv, n3x5.data)
    assert ax33 == ax55 == ax35
    assert a33 == a35[0] and b33 == b35[0]
    assert a55 == a35[1] and b55 == b35[1]


def test_nd_conv():
    n = netspec.NetSpec()
    n.data = L.Input(shape=dict(dim=[2, 3, 100, 100, 100]))
    n.conv = L.Convolution(n.data, num_output=10, kernel_size=[3, 3, 3],
                           stride=[1, 1, 1], pad=[0, 1, 2])
    n.pool = L.Pooling(n.conv, pool=P.Pooling.MAX, kernel_size=2, stride=2,
                       pad=0)
    n.deconv = L.Deconvolution(n.pool, num_output=10, kernel_size=4,
                               stride=2, pad=0)
    ax, a, b = coord_map_from_to(n.deconv, n.data)
    assert ax == 1
    assert np.all(a == 1)
    assert b[0] - 1 == b[1] and b[1] - 1 == b[2]


def test_crop_of_crop():
    n = coord_net_spec()
    offset = 5
    ax, a, b = coord_map_from_to(n.deconv, n.data)
    n.crop = L.Crop(n.deconv, n.data, axis=2, offset=offset)
    assert coord_map_from_to(n.crop, n.data) == (ax, a, b + offset)


def test_crop_helper_emits_layer():
    n = coord_net_spec(pad=3)   # needs a real positive crop offset
    n.score = crop(n.deconv, n.data)
    msg = n.to_proto()
    crop_layer = [l for l in msg["layer"] if l["type"] == "Crop"][0]
    assert crop_layer["crop_param"]["axis"] == 2
    assert crop_layer["crop_param"]["offset"] == [3]
    assert crop_layer["bottom"] == ["deconv", "data"]


def test_catch_unconnected():
    n = coord_net_spec()
    n.ip = L.InnerProduct(n.deconv, num_output=10)
    with pytest.raises(RuntimeError):
        coord_map_from_to(n.ip, n.data)


def test_catch_scale_mismatch():
    n = coord_net_spec(pool=3, dstride=2)
    with pytest.raises(ValueError):
        crop(n.deconv, n.data)


def test_catch_negative_crop():
    n = coord_net_spec(dpad=10)
    with pytest.raises(ValueError):
        crop(n.deconv, n.data)

"""Im2col as a graph-dispatchable layer (im2col_layer.cpp, util/im2col.cpp).

The reference exposes im2col as a standalone layer producing NCHW
[B, C*kh*kw, OH, OW]; here it produces NHWC [B, OH, OW, C*kh*kw] with the
same Caffe channel-major patch order (c*kh*kw + ki*kw + kj), so each
output position carries an identical patch vector.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.models.netbuilder import Net, layer_type_list
from mscnn_tpu.ops import layers as LY
from mscnn_tpu.ops import conv as C


def _ref_im2col(x, kh, kw, stride, pad, dilation=1):
    """Numpy oracle in Caffe channel-major order (util/im2col.cpp:11-60)."""
    b, h, w, c = x.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ekh, ekw = dilation * (kh - 1) + 1, dilation * (kw - 1) + 1
    oh = (h + 2 * pad - ekh) // stride + 1
    ow = (w + 2 * pad - ekw) // stride + 1
    out = np.zeros((b, oh, ow, c * kh * kw), x.dtype)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride:i * stride + ekh:dilation,
                       j * stride:j * stride + ekw:dilation, :]
            out[:, i, j, :] = patch.transpose(0, 3, 1, 2).reshape(b, -1)
    return out


def test_im2col_matches_caffe_order(rng):
    x = rng.rand(2, 7, 9, 3).astype(np.float32)
    for k, s, p in [(3, 1, 0), (3, 2, 1), (5, 3, 2), (1, 1, 0)]:
        out = np.asarray(LY.im2col(jnp.asarray(x), k, stride=s, pad=p))
        np.testing.assert_allclose(out, _ref_im2col(x, k, k, s, p),
                                   rtol=0, atol=0)


def test_im2col_dilation(rng):
    x = rng.rand(1, 10, 10, 2).astype(np.float32)
    out = np.asarray(LY.im2col(jnp.asarray(x), 3, stride=1, pad=2,
                               dilation=2))
    np.testing.assert_allclose(out, _ref_im2col(x, 3, 3, 1, 2, 2))


def test_im2col_conv_identity(rng):
    """The defining identity: conv(x, W) == im2col(x) @ W.reshape
    (conv_layer.cpp routes every conv through im2col + sgemm)."""
    x = rng.rand(2, 8, 8, 4).astype(np.float32)
    w = rng.rand(3, 3, 4, 5).astype(np.float32)  # HWIO
    conv = np.asarray(C.conv2d(jnp.asarray(x), jnp.asarray(w), None,
                               stride=2, padding=1))
    cols = np.asarray(LY.im2col(jnp.asarray(x), 3, stride=2, pad=1))
    # HWIO -> caffe c-major rows (c*kh*kw + i*kw + j) to match im2col order
    w_rows = w.transpose(2, 0, 1, 3).reshape(-1, 5)
    np.testing.assert_allclose(cols @ w_rows, conv, rtol=1e-5, atol=1e-5)


IM2COL_NET = """
name: "im2col"
layer { name: "data" type: "Input" top: "x"
  input_param { shape { dim: 2 dim: 3 dim: 6 dim: 8 } } }
layer { name: "cols" type: "Im2col" bottom: "x" top: "xc"
  convolution_param { kernel_size: 3 stride: 2 pad: 1 } }
layer { name: "fc" type: "InnerProduct" bottom: "xc" top: "out"
  inner_product_param { num_output: 4 } }
"""


def test_im2col_netbuilder_dispatch(rng):
    net = Net(IM2COL_NET, phase="TEST")
    params = net.init(jax.random.key(0))
    x = rng.rand(2, 6, 8, 3).astype(np.float32)
    blobs = net.apply(params, {"x": jnp.asarray(x)})
    xc = np.asarray(blobs["xc"])
    assert xc.shape == (2, 3, 4, 27)
    np.testing.assert_allclose(xc, _ref_im2col(x, 3, 3, 2, 1))
    assert blobs["out"].shape == (2, 4)


def test_im2col_in_layer_type_list():
    assert "Im2col" in layer_type_list()
    assert "Filter" in layer_type_list()

"""Filter layer via the generic net builder (filter_layer.cpp:16-98).

TPU-native fixed-capacity form: kept rows (selector != 0) are compacted to
the front in bottom order, the dropped tail is zeroed, and every top keeps
its bottom's full first-dim capacity instead of the reference's dynamic
new_tops_num.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.models.netbuilder import Net

FILTER_NET = """
name: "filter"
layer { name: "data" type: "Input" top: "a"
  input_param { shape { dim: 6 dim: 3 } } }
layer { name: "data2" type: "Input" top: "b"
  input_param { shape { dim: 6 dim: 1 dim: 2 dim: 2 } } }
layer { name: "sel" type: "Input" top: "sel"
  input_param { shape { dim: 6 } } }
layer { name: "filt" type: "Filter" bottom: "a" bottom: "b" bottom: "sel"
  top: "a_f" top: "b_f" }
"""


def test_filter_compacts_and_zeroes(rng):
    net = Net(FILTER_NET, phase="TEST")
    params = net.init(jax.random.key(0))
    a = rng.rand(6, 3).astype(np.float32)
    b = rng.rand(6, 1, 2, 2).astype(np.float32)
    sel = np.array([1.0, 0.0, 2.0, 0.0, 0.0, 1.0], np.float32)
    blobs = net.apply(params, {"a": jnp.asarray(a),
                               "b": jnp.asarray(b.transpose(0, 2, 3, 1)),
                               "sel": jnp.asarray(sel)})
    a_f = np.asarray(blobs["a_f"])
    b_f = np.asarray(blobs["b_f"])
    # fixed capacity: first dim preserved
    assert a_f.shape == (6, 3) and b_f.shape == (6, 2, 2, 1)
    # kept rows (0, 2, 5) compacted to the front, bottom order preserved
    np.testing.assert_array_equal(a_f[:3], a[[0, 2, 5]])
    np.testing.assert_array_equal(
        b_f[:3], b.transpose(0, 2, 3, 1)[[0, 2, 5]])
    # dropped tail zeroed
    np.testing.assert_array_equal(a_f[3:], 0.0)
    np.testing.assert_array_equal(b_f[3:], 0.0)


def test_filter_all_kept_is_identity(rng):
    net = Net(FILTER_NET, phase="TEST")
    params = net.init(jax.random.key(0))
    a = rng.rand(6, 3).astype(np.float32)
    b = rng.rand(6, 2, 2, 1).astype(np.float32)
    blobs = net.apply(params, {"a": jnp.asarray(a), "b": jnp.asarray(b),
                               "sel": jnp.ones((6,), jnp.float32)})
    np.testing.assert_array_equal(np.asarray(blobs["a_f"]), a)
    np.testing.assert_array_equal(np.asarray(blobs["b_f"]), b)


def test_filter_jits_with_traced_selector(rng):
    """The fixed-shape form must stay jittable with a data-dependent
    selector — the whole point of the capacity+mask design."""
    net = Net(FILTER_NET, phase="TEST")
    params = net.init(jax.random.key(0))

    @jax.jit
    def run(a, b, sel):
        return net.apply(params, {"a": a, "b": b, "sel": sel})["a_f"]

    a = jnp.asarray(rng.rand(6, 3).astype(np.float32))
    b = jnp.zeros((6, 2, 2, 1), jnp.float32)
    out0 = run(a, b, jnp.asarray([0, 1, 0, 1, 0, 0], jnp.float32))
    out1 = run(a, b, jnp.asarray([1, 1, 1, 1, 1, 1], jnp.float32))
    np.testing.assert_array_equal(np.asarray(out0[:2]),
                                  np.asarray(a[jnp.asarray([1, 3])]))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(a))

"""mscnn-tpu: a TPU-native multi-scale detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of zhaoweicai/mscnn
(MS-CNN, ECCV 2016 -- a Caffe fork implementing a unified multi-scale
proposal + detection network, plus Cascade-R-CNN extensions).

Design: pure-functional models over params pytrees, fixed-shape masked box
ops (no data-dependent shapes anywhere under jit), on-device NMS/ROI kernels,
data-parallel training via shard_map over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"


def layer_type_list():
    """Every prototxt layer type the framework executes (pycaffe's
    caffe.layer_type_list() analog)."""
    from mscnn_tpu.models.netbuilder import layer_type_list as _ltl
    return _ltl()

from mscnn_tpu.ops import boxes, nms  # noqa: F401

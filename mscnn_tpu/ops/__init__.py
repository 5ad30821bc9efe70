from mscnn_tpu.ops import boxes, conv, losses, nms, roi  # noqa: F401

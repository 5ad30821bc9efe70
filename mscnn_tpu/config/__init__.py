from mscnn_tpu.config.prototxt import parse_prototxt, parse_prototxt_file  # noqa: F401

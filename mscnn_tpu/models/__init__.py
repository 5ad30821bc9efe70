from mscnn_tpu.models import mscnn, zoo  # noqa: F401

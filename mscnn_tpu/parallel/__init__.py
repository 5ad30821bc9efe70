from mscnn_tpu.parallel.mesh import (  # noqa: F401
    data_parallel_mesh, local_device_count, make_mesh,
)

"""Device-mesh construction for data-parallel (and beyond) scale-out.

The reference's only parallelism is single-host synchronous data parallelism
over a CUDA-P2P tree (/root/reference/src/caffe/parallel.cpp:117-185,
docs/multigpu.md). On TPU the equivalent — and its strict superset — is a
`jax.sharding.Mesh`: a 1-D "data" axis shards the batch, XLA lowers the
gradient `pmean` onto ICI all-reduce, and multi-host scaling over DCN falls
out of `jax.distributed` initialization with no framework changes.

A second optional "space" axis is reserved for spatial sharding of the conv
trunk at very large input resolutions (the sequence-parallel analog for this
workload; see SURVEY.md section 5), unused by the stock configs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    shape: per-axis sizes; defaults to all devices on one "data" axis.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, axis_names)


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh (the P2PSync replacement)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return make_mesh((len(devices),), ("data",), devices)

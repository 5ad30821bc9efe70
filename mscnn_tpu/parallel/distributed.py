"""Multi-host scale-out: jax.distributed plumbing.

The reference tops out at single-host multi-GPU (P2PSync); here multi-host
is the same data-parallel step over a global mesh — initialize the
distributed runtime, build the mesh over jax.devices() (all hosts), and the
shard_map train step's pmean rides ICI within a slice and DCN across
slices with no framework changes. Per-host data loading: each process runs
its own loader over a disjoint shard of the window file (`shard_window_file`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from mscnn_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the multi-process runtime (no-op when single-process args
    are absent and no cluster env is detected)."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()  # cluster auto-detection
        except ValueError as e:
            # no cluster env detected ("coordinator_address should be
            # defined") -> single-process; anything else is a real
            # cluster-bringup failure and must propagate
            if "coordinator_address" not in str(e):
                raise
            return
        except RuntimeError as e:
            # tolerated in the best-effort auto-detect path only: repeat
            # initialization ("should only be called once" on this jax;
            # older versions said "already initialized"), or a backend
            # brought up before us (the caller is already running
            # single/multi-process either way)
            if ("already initialized" not in str(e)
                    and "should only be called once" not in str(e)
                    and "must be called before" not in str(e)):
                raise
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def global_data_parallel_mesh():
    """1-D mesh over every device of every process."""
    return make_mesh((len(jax.devices()),), ("data",))


def process_info():
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count()}


def shard_window_file(images: Sequence, process_id: Optional[int] = None,
                      process_count: Optional[int] = None) -> list:
    """Disjoint per-host dataset shard (round-robin), the multi-host analog
    of P2PSync's shared data layer handing workers disjoint batches."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return [im for i, im in enumerate(images) if i % n == pid]

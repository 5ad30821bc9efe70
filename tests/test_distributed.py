"""Multi-host plumbing: single-process initialize() behavior, per-host
dataset sharding, and the global mesh helper."""

import numpy as np
import pytest

from mscnn_tpu.data import window_file as W
from mscnn_tpu.parallel import distributed as D


def _imgs(n):
    return [W.WindowImage(f"im_{i}.png", 3, 10, 10,
                          np.zeros((0, 6), np.float32),
                          np.zeros((0, 4), np.float32)) for i in range(n)]


def test_initialize_single_process_noop():
    """No cluster env -> silent no-op (not a blanket exception swallow:
    unrelated failures propagate, tested below)."""
    D.initialize()          # must not raise
    info = D.process_info()
    assert info["process_count"] == 1
    assert info["process_index"] == 0


def test_initialize_bad_explicit_args_propagate():
    with pytest.raises(Exception):
        # explicit args are forwarded verbatim; an unresolvable coordinator
        # must surface, not be swallowed
        D.initialize(coordinator_address="256.0.0.1:0",
                     num_processes=-3, process_id=99)


def test_shard_window_file_disjoint_cover():
    images = _imgs(10)
    shards = [D.shard_window_file(images, process_id=p, process_count=3)
              for p in range(3)]
    # round-robin: sizes differ by at most 1, union covers, disjoint
    assert [len(s) for s in shards] == [4, 3, 3]
    seen = [im.path for s in shards for im in s]
    assert sorted(seen) == sorted(im.path for im in images)
    assert len(set(seen)) == 10
    # deterministic round-robin assignment
    assert [im.path for im in shards[1]] == ["im_1.png", "im_4.png",
                                             "im_7.png"]


def test_shard_window_file_single_process_identity():
    images = _imgs(4)
    assert D.shard_window_file(images, process_id=0,
                               process_count=1) == images


def test_global_data_parallel_mesh():
    import jax
    mesh = D.global_data_parallel_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == jax.device_count()


def test_initialize_tolerates_repeat_init(monkeypatch):
    """jax 0.9's repeat-initialization RuntimeError ('should only be
    called once') is tolerated in the auto-detect path."""
    import jax

    def boom():
        raise RuntimeError("distributed.initialize should only be called "
                           "once.")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    D.initialize()          # must not raise

    def other():
        raise RuntimeError("backend exploded")
    monkeypatch.setattr(jax.distributed, "initialize", other)
    with pytest.raises(RuntimeError):
        D.initialize()

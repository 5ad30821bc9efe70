"""Profiling / tracing / debug utilities.

The reference ships three observability tools: `caffe time` per-layer
timings (/root/reference/tools/caffe.cpp:334-422), CUDA-event Timers
(util/benchmark.cpp), and the solver's `debug_info` mode that logs per-blob
data/diff abs-sums every pass (src/caffe/net.cpp:603-680). Their TPU
equivalents here: a wall-clock StepTimer with device sync, a context manager
around jax.profiler for Perfetto/XProf traces, and `debug_info` /
`grad_debug_info` pytree abs-mean reports usable as training-loop hooks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


class StepTimer:
    """Rolling per-step wall-time stats (device-synced)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Blocks on `result` (if given) so async dispatch is counted."""
        if result is not None:
            jax.block_until_ready(result)
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            if len(self.times) > self.window:
                self.times.pop(0)
            self._t0 = None

    @contextlib.contextmanager
    def measure(self):
        self.start()
        out = {}
        yield out
        self.stop(out.get("result"))

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in XProf/Perfetto (the `caffe time`
    analog at kernel granularity)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)


def debug_info(params, prefix: str = "param") -> Dict[str, float]:
    """Per-leaf mean-abs report (Net debug_info's asum/count analog)."""
    out = {}
    flat = jax.tree.leaves_with_path(params)
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        out[f"{prefix}/{name}"] = float(jax.numpy.abs(leaf).mean())
    return out


def make_debug_hook(log: Optional[Callable[[str], None]] = None,
                    every: int = 1):
    """Training-loop hook: log param abs-means each `every`-th display."""
    count = {"n": 0}

    def hook(it, metrics):
        count["n"] += 1
        if count["n"] % every:
            return
        emit = log or print
        for k in sorted(metrics):
            emit(f"    [debug] {k} = {metrics[k]}")

    return hook


def time_fn(fn, *args, iters: int = 10, warmup: int = 1) -> Dict[str, float]:
    """`caffe time`-style measurement of one jitted callable."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_ms": dt * 1e3, "iters_per_sec": 1.0 / dt}

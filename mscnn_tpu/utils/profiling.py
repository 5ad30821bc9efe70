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


def chain_time(make_f, x, args=(), n_lo: int = 6, n_hi: int = 26,
               reps: int = 3) -> float:
    """Per-iteration device ms of `y = make_f(x, *args)` via loop-slope.

    Tunnel-immune protocol (BENCH.md): jit ONE program running the
    subgraph N times inside lax.fori_loop with a data dependence between
    iterations (one output element folded back into the input), so the
    device must execute N serial iterations and host/tunnel effects
    (~25 ms RTT, execution caching) cannot contaminate the number.
    Per-iter time = slope between the N=n_lo and N=n_hi programs.

    Scope: validated for PALLAS single-op subgraphs only (BENCH.md conv1
    tables) — XLA cannot look inside a pallas_call, so the folded scalar
    forces the whole kernel.  For plain XLA ops it UNDERESTIMATES: XLA
    narrows the op to the one sliced element (a conv probed this way reads
    ~0 ms), and at whole-model scale it DCEs everything off the folded
    path (a full trunk measured 0.81 ms, >peak-FLOP impossible).  Use
    chain_time_full for plain ops and pipelined-dispatch timing
    (`mscnn time --stages`, bench.py) for whole graphs."""
    import jax.lax as lax
    import jax.numpy as jnp

    def looped(n):
        def body(i, xc):
            y = make_f(xc, *args)
            leaf = jax.tree.leaves(y)[0]
            upd = (leaf.reshape(-1)[0] * 1e-20).astype(xc.dtype)
            return xc.at[(0,) * xc.ndim].add(upd)

        return jax.jit(lambda xv: lax.fori_loop(0, n, body, xv))

    f_lo, f_hi = looped(n_lo), looped(n_hi)
    jax.block_until_ready(f_lo(x))
    jax.block_until_ready(f_hi(x))

    def t(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(f_hi) - t(f_lo)) / (n_hi - n_lo) * 1e3


def chain_time_full(make_f, x, args=(), n_lo: int = 10, n_hi: int = 60,
                    reps: int = 5) -> float:
    """chain_time for plain (non-Pallas) XLA ops: folds back a MAX
    reduction of the FULL output instead of one element, so XLA cannot
    narrow the op to a single sliced value (max has no algebraic
    shortcut through a conv/dot).  Same loop-slope protocol; the extra
    VPU reduce per iteration is noise next to an MXU op.  Scope remains
    single-op / small-block — whole-model graphs still need pipelined
    dispatch (bench.py)."""
    import jax.lax as lax
    import jax.numpy as jnp

    def looped(n):
        def body(i, xc):
            y = make_f(xc, *args)
            leaf = jax.tree.leaves(y)[0]
            upd = (jnp.max(leaf).astype(jnp.float32) * 1e-20).astype(
                xc.dtype)
            return xc.at[(0,) * xc.ndim].add(upd)

        return jax.jit(lambda xv: lax.fori_loop(0, n, body, xv))

    f_lo, f_hi = looped(n_lo), looped(n_hi)
    jax.block_until_ready(f_lo(x))
    jax.block_until_ready(f_hi(x))

    def t(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(f_hi) - t(f_lo)) / (n_hi - n_lo) * 1e3


# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def peak_flops(device=None) -> Optional[float]:
    """bf16 peak FLOP/s of the attached chip, or None if unknown."""
    import os
    if os.environ.get("MSCNN_PEAK_FLOPS"):
        return float(os.environ["MSCNN_PEAK_FLOPS"])
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for name, peak in PEAK_FLOPS.items():
        if kind.startswith(name):
            return peak
    return None


def cost_flops(fn, *args) -> Optional[float]:
    """XLA cost-analysis FLOPs of one call to jitted `fn` (the analytic
    FLOP count the MFU numbers divide by)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analyses = compiled.cost_analysis()
        if isinstance(analyses, (list, tuple)):
            analyses = analyses[0]
        return float(analyses["flops"])
    except Exception:
        return None


def mfu(flops_per_item: float, items_per_sec: float,
        device=None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1], or None if peak is unknown."""
    peak = peak_flops(device)
    if not peak or not flops_per_item:
        return None
    return flops_per_item * items_per_sec / peak

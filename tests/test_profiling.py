"""Profiling utilities: timers, loop-slope chain timing, FLOPs/MFU."""

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.utils import profiling as P


def test_step_timer_stats():
    t = P.StepTimer(window=4)
    for _ in range(6):
        with t.measure() as m:
            m["result"] = jnp.ones(4) * 2
    s = t.stats()
    assert len(t.times) == 4
    assert s["mean_ms"] > 0 and s["p95_ms"] >= s["p50_ms"]


def test_chain_time_runs():
    x = jnp.ones((8, 8), jnp.float32)
    w = jnp.ones((8, 8), jnp.float32) * 0.01
    ms = P.chain_time(lambda x, w: jnp.tanh(x @ w), x, (w,),
                      n_lo=2, n_hi=6, reps=2)
    assert np.isfinite(ms)  # slope can be ~0 on fast CPUs; just finite


def test_chain_time_full_runs():
    """Max-fold-back variant (plain XLA ops — the scalar fold-back lets
    XLA slice a conv to one element; BENCH.md r3)."""
    x = jnp.ones((8, 8), jnp.float32)
    w = jnp.ones((8, 8), jnp.float32) * 0.01
    ms = P.chain_time_full(lambda x, w: jnp.tanh(x @ w), x, (w,),
                           n_lo=2, n_hi=6, reps=2)
    assert np.isfinite(ms)


def test_cost_flops_matmul():
    """XLA cost analysis counts ~2*M*N*K for a matmul."""
    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 32), jnp.float32)
    fl = P.cost_flops(lambda a, b: a @ b, a, b)
    if fl is None:  # backend without cost analysis support
        return
    assert 0.5 * 2 * 64 * 128 * 32 <= fl <= 4 * 2 * 64 * 128 * 32


def test_peak_flops_env_override(monkeypatch):
    monkeypatch.setenv("MSCNN_PEAK_FLOPS", "1e12")
    assert P.peak_flops() == 1e12
    monkeypatch.delenv("MSCNN_PEAK_FLOPS")
    # CPU device kind is unknown -> None (no fake peaks)
    assert P.peak_flops() is None


def test_mfu(monkeypatch):
    monkeypatch.setenv("MSCNN_PEAK_FLOPS", "100.0")
    # 10 FLOP/item * 5 items/s = 50 FLOP/s on a 100 FLOP/s chip
    assert abs(P.mfu(10.0, 5.0) - 0.5) < 1e-9
    monkeypatch.delenv("MSCNN_PEAK_FLOPS")
    assert P.mfu(10.0, 5.0) is None


def test_debug_info_leaves():
    params = {"conv": {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}}
    info = P.debug_info(params)
    assert info["param/conv/w"] == 1.0
    assert info["param/conv/b"] == 0.0

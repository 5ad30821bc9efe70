"""Training loop: the Solver::Solve / Step equivalent.

Mirrors /root/reference/src/caffe/solver.cpp:194-323 — per-iteration
forward/backward/update with display-interval smoothed-loss logging, periodic
test evaluation that skips -1 metric values (the MS-CNN modification at
solver.cpp:368-394), periodic + final snapshots, and SIGINT/SIGHUP actions
(stop / snapshot, util/signal_handler.cpp) — with the train step a single
jitted XLA program and the data pipeline prefetching in the background.
"""

from __future__ import annotations

import dataclasses
import signal
import time
from typing import Callable, Optional

import jax
import numpy as np

from mscnn_tpu.config import prototxt as PB
from mscnn_tpu.io import checkpoint as CKPT
from mscnn_tpu.train import solver as S


@dataclasses.dataclass(frozen=True)
class LoopSpec:
    """SolverParameter loop-control subset."""
    max_iter: int
    display: int = 50
    average_loss: int = 1          # smoothed-loss window
    test_interval: int = 0         # 0 = never
    test_iter: int = 0
    snapshot: int = 0              # 0 = only at exit
    snapshot_prefix: str = "mscnn"
    snapshot_format: str = "orbax"  # orbax | binaryproto | hdf5 (reference)
    sigint_effect: str = "stop"    # stop | snapshot | none
    sighup_effect: str = "snapshot"
    snapshot_after_train: bool = True  # solver.cpp:294-299
    stepvalue: tuple = ()          # multistep lr boundaries (for the
    #                                solverstate current_step field)


class SignalActions:
    """SIGINT/SIGHUP -> solver action queue (signal_handler.cpp:14-45)."""

    def __init__(self, spec: LoopSpec):
        self.spec = spec
        self._got = []
        self._prev = {}

    def __enter__(self):
        for sig, effect in ((signal.SIGINT, self.spec.sigint_effect),
                            (signal.SIGHUP, self.spec.sighup_effect)):
            if effect != "none":
                self._prev[sig] = signal.signal(
                    sig, lambda s, f, e=effect: self._got.append(e))
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)

    def pop(self) -> Optional[str]:
        return self._got.pop(0) if self._got else None


def _logf(msg: str, log: Optional[Callable[[str], None]]):
    (log or print)(msg)


def _snapshot(spec: LoopSpec, train_state, it) -> str:
    """Dispatch on snapshot_format: our orbax train-state dir, or the
    reference's .caffemodel/.solverstate pair (Solver::Snapshot,
    solver.cpp:403-419).

    Multi-process discipline (the WorkerSolver analog: non-root solvers
    no-op Snapshot, solver.hpp:140-157): the plain-file formats write from
    process 0 only — N processes racing on a shared filesystem would write
    N copies of the same state. The orbax format is called from EVERY
    process: orbax's save is itself a cross-process barrier and writes
    each replicated array exactly once, so gating it on process 0 would
    deadlock the barrier instead."""
    if spec.snapshot_format in ("binaryproto", "hdf5"):
        if jax.process_index() != 0:
            return ""
        # current_step = multistep lr stage index (sgd_solver.cpp's
        # this->current_step_), so the reference resumes the lr schedule
        cur = sum(1 for sv in spec.stepvalue if it >= int(sv))
        writer = CKPT.snapshot_caffemodel \
            if spec.snapshot_format == "binaryproto" else CKPT.snapshot_hdf5
        return writer(spec.snapshot_prefix, train_state, it,
                      current_step=cur)
    return CKPT.snapshot(spec.snapshot_prefix, train_state, it)


def test_eval(eval_step, params, batches, key, *, log=None):
    """Test() with the ignore-negative-values averaging rule: a metric that
    returns -1 for an iteration (no valid samples) is excluded from that
    metric's mean (solver.cpp:368-394)."""
    sums: dict = {}
    counts: dict = {}
    for i, batch in enumerate(batches):
        metrics = jax.device_get(eval_step(params, batch,
                                           jax.random.fold_in(key, i)))
        for k, v in metrics.items():
            v = float(v)
            if v < 0 and not k.startswith("loss") and k != "loss":
                continue  # ignore_iters skip
            sums[k] = sums.get(k, 0.0) + v
            counts[k] = counts.get(k, 0) + 1
    out = {k: sums[k] / counts[k] for k in sums}
    for k in sorted(out):
        _logf(f"    Test net output: {k} = {out[k]:.6g}", log)
    return out


def solve(step_fn, train_state, batch_source, spec: LoopSpec, *,
          key=None, eval_step=None, test_batch_source=None,
          hooks=(), log: Optional[Callable[[str], None]] = None):
    """Run the training loop until max_iter (resumes from state's iter).

    step_fn(state, batch, key) -> (state, metrics); batch_source() -> batch
    (e.g. Prefetcher.get); hooks: callables (it, metrics) -> None run every
    display interval (profiling / tracing attach here).
    Returns the final train state.
    """
    key = jax.random.key(0) if key is None else key
    start_iter = int(jax.device_get(train_state["solver"]["it"]))
    loss_window: list = []
    t_last = time.perf_counter()
    it = start_iter

    with SignalActions(spec) as sigs:
        while it < spec.max_iter:
            action = sigs.pop()
            if action == "snapshot":
                _snapshot(spec, train_state, it)
            elif action == "stop":
                _logf(f"Optimization stopped early at iter {it}.", log)
                break

            if (eval_step is not None and spec.test_interval > 0
                    and it % spec.test_interval == 0
                    and (it > 0 or start_iter == it == 0)):
                batches = (test_batch_source() for _ in range(spec.test_iter))
                _logf(f"Iteration {it}, Testing net", log)
                test_eval(eval_step, train_state["params"], batches,
                          jax.random.fold_in(key, -it - 1), log=log)

            batch = batch_source()
            train_state, metrics = step_fn(train_state, batch,
                                           jax.random.fold_in(key, it))

            if spec.display and it % spec.display == 0:
                metrics = jax.device_get(metrics)
                loss = float(metrics["loss"])
                loss_window.append(loss)
                if len(loss_window) > spec.average_loss:
                    loss_window.pop(0)
                smoothed = float(np.mean(loss_window))
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                ips = spec.display / dt if it > start_iter else 0.0
                _logf(f"Iteration {it} ({ips:.2f} iter/s), "
                      f"loss = {smoothed:.6g}, lr = {float(metrics['lr']):.6g}",
                      log)
                for k in sorted(metrics):
                    if k not in ("loss", "lr"):
                        _logf(f"    Train net output: {k} = "
                              f"{float(metrics[k]):.6g}", log)
                for hook in hooks:
                    hook(it, metrics)

            it += 1
            if spec.snapshot and it % spec.snapshot == 0:
                _snapshot(spec, train_state, it)

    if spec.snapshot_prefix and spec.snapshot_after_train:
        path = _snapshot(spec, train_state, it)
        if path:
            _logf(f"Snapshotting to {path}", log)
    return train_state


def loop_spec_from_solver_fields(fields: dict,
                                 snapshot_prefix: Optional[str] = None
                                 ) -> LoopSpec:
    """LoopSpec from parsed solver-prototxt fields."""
    return LoopSpec(
        max_iter=int(fields.get("max_iter", 10000)),
        display=int(fields.get("display", 50)),
        average_loss=int(fields.get("average_loss", 1)),
        test_interval=int(fields.get("test_interval", 0)),
        test_iter=int(fields.get("test_iter", 0)),
        snapshot=int(fields.get("snapshot", 0)),
        snapshot_format={"BINARYPROTO": "binaryproto",
                         "HDF5": "hdf5"}.get(
            str(fields.get("snapshot_format", "")).upper(), "orbax"),
        snapshot_prefix=snapshot_prefix
        or str(fields.get("snapshot_prefix", "mscnn")),
        snapshot_after_train=str(fields.get(
            "snapshot_after_train", "true")).lower() != "false",
        stepvalue=tuple(int(v)
                        for v in PB.as_list(fields.get("stepvalue"))),
    )

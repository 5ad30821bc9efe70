"""True multi-process jax.distributed coverage: two OS processes, a
localhost coordinator, a global 4-device CPU mesh (2 local devices each),
one flagship DP train step.

Asserts (a) both processes compute bit-identical updated params — the
multi-host analog of P2PSync keeping workers in lockstep
(parallel.cpp:325-380) — and (b) the result matches a single-process run
over an identically-shaped 4-device mesh to collective-reassociation
tolerance.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CHILD = os.path.join(os.path.dirname(__file__), "_distrib_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    # children configure their own XLA_FLAGS / platform before importing jax
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_children(specs, timeout=420):
    procs = [subprocess.Popen([sys.executable, CHILD] + [str(a) for a in sp],
                              env=_env(), stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for sp in specs]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{o[-3000:]}"


def test_two_process_loop_snapshots_once_and_restores(tmp_path):
    """Run a few solve() iterations with snapshotting under a real
    2-process runtime: exactly one snapshot tree per interval must exist
    (WorkerSolver no-op discipline, solver.hpp:140-157 — here orbax's
    coordinated multi-host save), params stay in lockstep, and the final
    snapshot restores."""
    port = _free_port()
    snapdir = tmp_path / "snaps"
    snapdir.mkdir()
    p0 = tmp_path / "p0.npz"
    p1 = tmp_path / "p1.npz"
    _run_children([(0, 2, port, 2, p0, "loop", snapdir),
                   (1, 2, port, 2, p1, "loop", snapdir)])

    d0, d1 = np.load(p0), np.load(p1)
    assert int(d0["it"]) == 3
    for k in d0.files:
        np.testing.assert_array_equal(d0[k], d1[k], err_msg=k)

    # exactly one snapshot tree per interval: periodic at it=2 + final at 3
    trees = sorted(p.name for p in snapdir.iterdir())
    assert trees == ["snap_iter_2", "snap_iter_3"], trees

    # the final snapshot restores in a fresh single-process runtime
    import subprocess as sp
    code = f"""
import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
from mscnn_tpu.models import mscnn as M, zoo
from mscnn_tpu.train import solver as S
from mscnn_tpu.io import checkpoint as CKPT
cfg = zoo.tiny_test_config()
params = M.init_params(jax.random.key(0), cfg)
tmpl = {{'params': params, 'solver': S.init_state(params, S.SolverSpec(
    base_lr=1e-3, lr_policy='fixed', momentum=0.9))}}
st = CKPT.restore('{snapdir}/snap_iter_3', tmpl)
assert int(st['solver']['it']) == 3, st['solver']['it']
print('RESTORED OK')
"""
    r = sp.run([sys.executable, "-c", code], env=_env(),
               capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "RESTORED OK" in r.stdout, \
        r.stdout + r.stderr


def test_two_process_dp_step_matches_single_process(tmp_path):
    port = _free_port()
    base = tmp_path / "base.npz"
    p0 = tmp_path / "p0.npz"
    p1 = tmp_path / "p1.npz"
    # two processes x 2 devices, concurrently (they rendezvous)
    _run_children([(0, 2, port, 2, p0), (1, 2, port, 2, p1)])
    # single-process reference over the same 4-device global mesh
    _run_children([(0, 1, 0, 4, base)])

    db, d0, d1 = np.load(base), np.load(p0), np.load(p1)
    assert set(db.files) == set(d0.files) == set(d1.files)
    assert int(d0["it"]) == 1
    for k in db.files:
        # lockstep: the two processes hold bit-identical state
        np.testing.assert_array_equal(d0[k], d1[k], err_msg=k)
        # parity with single-process (different all-reduce grouping)
        np.testing.assert_allclose(db[k], d0[k], rtol=2e-5, atol=1e-7,
                                   err_msg=k)

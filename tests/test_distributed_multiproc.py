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

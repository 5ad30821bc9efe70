"""Snapshot/restore equivalence (the reference's TestSnapshot semantics:
train N iters, snapshot, restore, continue — must equal an uninterrupted
run) plus warm-start layer copying."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.io import checkpoint as CKPT
from mscnn_tpu.train import solver as S


@pytest.fixture
def tiny_problem(rng):
    x = jnp.asarray(rng.randn(16, 4), jnp.float32)
    y = jnp.asarray(rng.randn(16, 2), jnp.float32)
    params = {"fc": {"w": jnp.zeros((4, 2)), "b": jnp.zeros(2)}}

    def grads(p):
        def loss(p):
            return 0.5 * jnp.sum((x @ p["fc"]["w"] + p["fc"]["b"] - y) ** 2)
        return jax.grad(loss)(p)

    return params, grads


def _run(params, grads, spec, state, n):
    for _ in range(n):
        params, state, _ = S.apply_update(params, grads(params), state, spec)
    return params, state


def test_snapshot_restore_equivalence(tmp_path, tiny_problem):
    params, grads = tiny_problem
    spec = S.SolverSpec(type="sgd", base_lr=0.01, lr_policy="step",
                        stepsize=4, momentum=0.9)
    prefix = str(tmp_path / "ckpt")

    # uninterrupted 6-iter run
    p_full, s_full = _run(params, grads, spec,
                          S.init_state(params, spec), 6)

    # 3 iters -> snapshot -> restore -> 3 more
    p3, s3 = _run(params, grads, spec, S.init_state(params, spec), 3)
    path = CKPT.snapshot(prefix, {"params": p3, "solver": s3})
    assert path.endswith("_iter_3")

    template = {"params": jax.tree.map(jnp.zeros_like, params),
                "solver": S.init_state(params, spec)}
    restored = CKPT.restore(path, template)
    assert int(restored["solver"]["it"]) == 3
    p_resumed, s_resumed = _run(restored["params"], grads, spec,
                                restored["solver"], 3)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        p_full, p_resumed)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        s_full["h1"], s_resumed["h1"])


def test_restore_params_only(tmp_path, tiny_problem):
    params, grads = tiny_problem
    spec = S.SolverSpec(base_lr=0.01, lr_policy="fixed", momentum=0.9)
    p3, s3 = _run(params, grads, spec, S.init_state(params, spec), 3)
    path = CKPT.snapshot(str(tmp_path / "w"), {"params": p3, "solver": s3})

    template = {"fc": {"w": jnp.ones((4, 2)), "b": jnp.ones(2)},
                "extra": {"w": jnp.ones(3)}}
    out = CKPT.restore_params(path, template)
    np.testing.assert_allclose(out["fc"]["w"], p3["fc"]["w"], rtol=1e-6)
    # layer absent from the snapshot keeps its template values
    np.testing.assert_allclose(out["extra"]["w"], 1.0)


def test_copy_trained_layers_shape_rules():
    tgt = {"a": {"w": jnp.zeros((2, 2))}, "b": {"w": jnp.zeros(3)}}
    src = {"a": {"w": jnp.ones((2, 2))}, "b": {"w": jnp.ones(5)}}
    out = CKPT.copy_trained_layers(tgt, src)
    np.testing.assert_allclose(out["a"]["w"], 1.0)   # copied
    np.testing.assert_allclose(out["b"]["w"], 0.0)   # shape mismatch skipped
    with pytest.raises(ValueError, match="shape mismatch"):
        CKPT.copy_trained_layers(tgt, src, strict=True)


def test_latest_snapshot(tmp_path, tiny_problem):
    params, grads = tiny_problem
    spec = S.SolverSpec(base_lr=0.01, lr_policy="fixed")
    state = {"params": params, "solver": S.init_state(params, spec)}
    prefix = str(tmp_path / "run")
    assert CKPT.latest_snapshot(prefix) is None
    CKPT.snapshot(prefix, state, it=2)
    CKPT.snapshot(prefix, state, it=10)
    assert CKPT.latest_snapshot(prefix).endswith("_iter_10")


def test_snapshot_caffemodel_roundtrip(tmp_path, tiny_problem):
    """binaryproto snapshot (snapshot_format: BINARYPROTO): writes a
    .caffemodel + .solverstate pair; restore_params dispatches on the
    extension and restores identical weights."""
    params, grads = tiny_problem
    spec = S.SolverSpec(type="sgd", base_lr=0.01, lr_policy="fixed",
                        momentum=0.9)
    p3, s3 = _run(params, grads, spec, S.init_state(params, spec), 3)
    s3 = dict(s3, it=jnp.asarray(3, jnp.int32))
    prefix = str(tmp_path / "snap")
    path = CKPT.snapshot_caffemodel(prefix, {"params": p3, "solver": s3})
    assert path.endswith("_iter_3.caffemodel")
    import os
    assert os.path.exists(path)
    assert os.path.exists(path.replace(".caffemodel", ".solverstate"))

    restored = CKPT.restore_params(path, jax.tree.map(jnp.zeros_like, params))
    for k in ("w", "b"):
        np.testing.assert_array_equal(np.asarray(restored["fc"][k]),
                                      np.asarray(p3["fc"][k]))

    from mscnn_tpu.io import caffemodel as CM
    st = CM.parse_solverstate(path.replace(".caffemodel", ".solverstate"))
    assert st["iter"] == 3
    assert st["learned_net"] == "snap_iter_3.caffemodel"
    template = {"it": jnp.zeros((), jnp.int32),
                "h1": jax.tree.map(jnp.zeros_like, params)}
    hstate, it = CM.load_solverstate_history(
        path.replace(".caffemodel", ".solverstate"), template)
    assert it == 3
    np.testing.assert_array_equal(np.asarray(hstate["h1"]["fc"]["w"]),
                                  np.asarray(s3["h1"]["fc"]["w"]))


def test_loop_spec_snapshot_format():
    from mscnn_tpu.train import loop as LP
    spec = LP.loop_spec_from_solver_fields(
        {"max_iter": 10, "snapshot_format": "BINARYPROTO"})
    assert spec.snapshot_format == "binaryproto"
    spec = LP.loop_spec_from_solver_fields({"max_iter": 10})
    assert spec.snapshot_format == "orbax"

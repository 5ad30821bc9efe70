"""Solver tests, modeled on the reference's analytically-verified solver
suite (src/caffe/test/test_gradient_based_solver.cpp): each update rule is
checked against a hand-computed update on a tiny least-squares problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.train import solver as S


def quad_grad(params, x, y):
    """Gradient of 0.5 * ||w x + b - y||^2 for scalar-affine params."""
    def loss(p):
        pred = x @ p["w"] + p["b"]
        return 0.5 * jnp.sum((pred - y) ** 2)
    return jax.grad(loss)(params)


@pytest.fixture
def problem(rng):
    x = jnp.asarray(rng.randn(8, 3), jnp.float32)
    w_true = jnp.asarray(rng.randn(3), jnp.float32)
    y = x @ w_true + 0.5
    params = {"w": jnp.zeros(3), "b": jnp.zeros(())}
    return x, y, params


def test_lr_policies():
    spec = S.SolverSpec(base_lr=0.1, lr_policy="step", gamma=0.1, stepsize=10)
    assert np.isclose(S.learning_rate(spec, 0), 0.1)
    assert np.isclose(S.learning_rate(spec, 9), 0.1)
    assert np.isclose(S.learning_rate(spec, 10), 0.01)
    assert np.isclose(S.learning_rate(spec, 25), 0.001)

    fixed = S.SolverSpec(base_lr=0.3, lr_policy="fixed")
    assert np.isclose(S.learning_rate(fixed, 1000), 0.3)

    exp = S.SolverSpec(base_lr=1.0, lr_policy="exp", gamma=0.9)
    assert np.isclose(S.learning_rate(exp, 3), 0.9 ** 3)

    inv = S.SolverSpec(base_lr=1.0, lr_policy="inv", gamma=0.5, power=2.0)
    assert np.isclose(S.learning_rate(inv, 4), (1 + 0.5 * 4) ** -2.0)

    ms = S.SolverSpec(base_lr=1.0, lr_policy="multistep", gamma=0.1,
                      stepvalue=(5, 8))
    assert np.isclose(S.learning_rate(ms, 4), 1.0)
    assert np.isclose(S.learning_rate(ms, 5), 0.1)
    assert np.isclose(S.learning_rate(ms, 9), 0.01)

    poly = S.SolverSpec(base_lr=2.0, lr_policy="poly", power=0.5, max_iter=100)
    assert np.isclose(S.learning_rate(poly, 75), 2.0 * 0.25 ** 0.5)

    sig = S.SolverSpec(base_lr=1.0, lr_policy="sigmoid", gamma=1.0, stepsize=0)
    assert np.isclose(S.learning_rate(sig, 0), 0.5)


def test_sgd_matches_manual_momentum_history(problem):
    """Caffe folds lr into the history: h = m*h + lr*g; w -= h."""
    x, y, params = problem
    spec = S.SolverSpec(type="sgd", base_lr=0.01, lr_policy="fixed",
                        momentum=0.9, weight_decay=0.0)
    state = S.init_state(params, spec)
    h = {"w": jnp.zeros(3), "b": jnp.zeros(())}
    p_manual = dict(params)
    for _ in range(3):
        g = quad_grad(params, x, y)
        params, state, _ = S.apply_update(params, g, state, spec)
        gm = quad_grad(p_manual, x, y)
        h = {k: 0.9 * h[k] + 0.01 * gm[k] for k in h}
        p_manual = {k: p_manual[k] - h[k] for k in h}
    for k in params:
        np.testing.assert_allclose(params[k], p_manual[k], rtol=1e-5)


def test_weight_decay_l2_and_l1(problem):
    x, y, params = problem
    params = {"w": jnp.ones(3), "b": jnp.ones(())}
    g0 = {"w": jnp.zeros(3), "b": jnp.zeros(())}
    for reg, expect in (("L2", 0.5), ("L1", 0.5)):
        spec = S.SolverSpec(type="sgd", base_lr=1.0, lr_policy="fixed",
                            momentum=0.0, weight_decay=0.5,
                            regularization_type=reg)
        state = S.init_state(params, spec)
        new, _, _ = S.apply_update(params, g0, state, spec)
        # w=1: L2 grad = 0.5*1, L1 grad = 0.5*sign(1) -> both 0.5 here
        np.testing.assert_allclose(new["w"], 1.0 - expect, rtol=1e-6)


def test_lr_and_decay_multipliers(problem):
    params = {"w": jnp.ones(3), "b": jnp.ones(())}
    g = {"w": jnp.ones(3), "b": jnp.ones(())}
    spec = S.SolverSpec(type="sgd", base_lr=0.1, lr_policy="fixed",
                        momentum=0.0, weight_decay=0.0)
    state = S.init_state(params, spec)
    lm = {"w": 1.0, "b": 2.0}
    new, _, _ = S.apply_update(params, g, state, spec, lr_mults=lm)
    np.testing.assert_allclose(new["w"], 0.9, rtol=1e-6)
    np.testing.assert_allclose(new["b"], 0.8, rtol=1e-6)

    # frozen param: lr_mult 0 leaves the value untouched
    lm0 = {"w": 0.0, "b": 1.0}
    new, _, _ = S.apply_update(params, g, state, spec, lr_mults=lm0)
    np.testing.assert_allclose(new["w"], 1.0)


def test_clip_gradients():
    params = {"w": jnp.zeros(4)}
    g = {"w": jnp.full((4,), 10.0)}  # L2 norm 20
    spec = S.SolverSpec(type="sgd", base_lr=1.0, lr_policy="fixed",
                        momentum=0.0, weight_decay=0.0, clip_gradients=2.0)
    state = S.init_state(params, spec)
    new, _, _ = S.apply_update(params, g, state, spec)
    # clipped grad = 10 * (2/20) = 1 per element
    np.testing.assert_allclose(new["w"], -1.0, rtol=1e-5)


@pytest.mark.parametrize(
    "stype,lr,iters",
    [("sgd", 0.05, 60), ("nesterov", 0.05, 60), ("adagrad", 0.5, 60),
     ("rmsprop", 0.05, 60), ("adadelta", 0.1, 300), ("adam", 0.2, 60)])
def test_all_solvers_reduce_loss(problem, stype, lr, iters):
    x, y, params = problem
    # AdaDelta bootstraps its step size from delta (Caffe runs it with a
    # much larger delta than the adaptive-gradient solvers).
    spec = S.SolverSpec(type=stype, base_lr=lr, lr_policy="fixed",
                        momentum=0.9, weight_decay=0.0,
                        delta=1e-2 if stype == "adadelta" else 1e-8)
    state = S.init_state(params, spec)

    def loss(p):
        return 0.5 * jnp.sum((x @ p["w"] + p["b"] - y) ** 2)

    l0 = loss(params)
    step = jax.jit(lambda p, s, g: S.apply_update(p, g, s, spec))
    for _ in range(iters):
        g = quad_grad(params, x, y)
        params, state, _ = step(params, state, g)
    assert loss(params) < 0.5 * l0, f"{stype} failed to reduce loss"
    assert int(state["it"]) == iters


def test_adam_matches_manual(problem):
    x, y, params = problem
    spec = S.SolverSpec(type="adam", base_lr=0.01, lr_policy="fixed",
                        momentum=0.9, momentum2=0.999, delta=1e-8,
                        weight_decay=0.0)
    state = S.init_state(params, spec)
    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)
    p_manual = dict(params)
    for t in range(1, 4):
        g = quad_grad(params, x, y)
        params, state, _ = S.apply_update(params, g, state, spec)
        gm = quad_grad(p_manual, x, y)
        m = {k: 0.9 * m[k] + 0.1 * gm[k] for k in m}
        v = {k: 0.999 * v[k] + 0.001 * gm[k] ** 2 for k in v}
        corr = np.sqrt(1 - 0.999 ** t) / (1 - 0.9 ** t)
        p_manual = {k: p_manual[k] - 0.01 * corr * m[k] / (jnp.sqrt(v[k]) + 1e-8)
                    for k in m}
    for k in params:
        np.testing.assert_allclose(params[k], p_manual[k], rtol=1e-5)


def test_spec_from_prototxt_fields():
    spec = S.spec_from_prototxt_fields({
        "base_lr": "0.0005", "lr_policy": "step", "gamma": "0.1",
        "stepsize": "10000", "max_iter": "25000", "momentum": "0.9",
        "weight_decay": "0.0005",
    })
    assert spec.base_lr == 0.0005
    assert spec.lr_policy == "step"
    assert spec.stepsize == 10000
    assert spec.type == "sgd"

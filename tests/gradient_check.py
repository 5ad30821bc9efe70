"""Finite-difference gradient checker (GradientChecker equivalent,
include/caffe/test/test_gradient_check_util.hpp:19-71): compares analytic
grads against central differences with a `kink` escape hatch for
non-differentiable points (|x - kink| < kink_range is skipped)."""

import jax
import jax.numpy as jnp
import numpy as np


def check_gradient(fn, x, *, stepsize=1e-3, threshold=1e-2,
                   kink=None, kink_range=1e-2, max_checks=200, seed=0):
    """fn: x -> scalar. Checks d fn / d x at up to max_checks random
    positions of x (f64 central differences vs jax.grad)."""
    x = jnp.asarray(x, jnp.float32)
    analytic = np.asarray(jax.grad(fn)(x), np.float64)
    flat = x.reshape(-1)
    rng = np.random.RandomState(seed)
    n = flat.shape[0]
    idxs = rng.choice(n, size=min(max_checks, n), replace=False)

    for i in idxs:
        xi = float(flat[i])
        if kink is not None and abs(abs(xi) - kink) < kink_range:
            continue
        xp = flat.at[i].set(xi + stepsize).reshape(x.shape)
        xm = flat.at[i].set(xi - stepsize).reshape(x.shape)
        numeric = (float(fn(xp)) - float(fn(xm))) / (2 * stepsize)
        a = analytic.reshape(-1)[i]
        scale = max(abs(a), abs(numeric), 1.0)
        assert abs(a - numeric) <= threshold * scale, (
            f"grad mismatch at flat index {i}: analytic {a:.6g} "
            f"vs numeric {numeric:.6g} (x={xi:.6g})")

"""Weight initializers ("fillers" in the reference's vocabulary).

Covers the filler family from include/caffe/filler.hpp:19-244: constant,
uniform, gaussian (incl. sparse), positive-unitball, xavier, msra, bilinear.
All return jnp arrays for HWIO conv kernels or [in, out] dense weights.

Fan computation follows the reference: for a conv kernel HWIO,
fan_in = H*W*I and fan_out = H*W*O.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fans(shape):
    if len(shape) == 4:  # HWIO
        rf = shape[0] * shape[1]
        return rf * shape[2], rf * shape[3]
    if len(shape) == 2:  # [in, out]
        return shape[0], shape[1]
    n = 1
    for s in shape[:-1]:
        n *= s
    return n, shape[-1]


def constant(shape, value: float = 0.0, dtype=jnp.float32):
    return jnp.full(shape, value, dtype)


def uniform(key, shape, minval: float = 0.0, maxval: float = 1.0, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval, maxval)


def gaussian(key, shape, std: float = 0.01, mean: float = 0.0,
             sparsity: int = 0, dtype=jnp.float32):
    w = mean + std * jax.random.normal(key, shape, dtype)
    if sparsity > 0:
        fan_in, _ = _fans(shape)
        prob = sparsity / max(fan_in, 1)
        k2 = jax.random.fold_in(key, 1)
        mask = jax.random.bernoulli(k2, prob, shape)
        w = jnp.where(mask, w, 0.0)
    return w


def positive_unitball(key, shape, dtype=jnp.float32):
    w = jax.random.uniform(key, shape, dtype)
    if len(shape) == 4:
        denom = w.sum(axis=(0, 1, 2), keepdims=True)
    else:
        denom = w.sum(axis=0, keepdims=True)
    return w / denom


def xavier(key, shape, dtype=jnp.float32):
    """Uniform(-a, a) with a = sqrt(3 / fan_avg) - the reference averages
    fan_in and fan_out by default (VarianceNorm AVERAGE? no: FAN_IN)."""
    fan_in, _ = _fans(shape)
    a = math.sqrt(3.0 / max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -a, a)


def msra(key, shape, dtype=jnp.float32):
    """He-normal: N(0, sqrt(2 / fan_in))."""
    fan_in, _ = _fans(shape)
    std = math.sqrt(2.0 / max(fan_in, 1))
    return std * jax.random.normal(key, shape, dtype)


def bilinear(k: int, channels: int, dtype=jnp.float32):
    """Depthwise bilinear upsampling kernel [k, k, 1, C] (filler.hpp:244)."""
    from mscnn_tpu.ops.conv import bilinear_kernel
    return bilinear_kernel(k, channels, dtype)


FILLERS = {
    "constant": constant,
    "uniform": uniform,
    "gaussian": gaussian,
    "positive_unitball": positive_unitball,
    "xavier": xavier,
    "msra": msra,
}

"""Functional solver family mirroring the reference's 6 update rules.

The reference implements SGD/Nesterov/AdaGrad/RMSProp/AdaDelta/Adam as
mutable-blob updates (/root/reference/src/caffe/solvers/*.cpp) driven by
`SGDSolver::ApplyUpdate` (/root/reference/src/caffe/solvers/sgd_solver.cpp:
102-116): GetLearningRate -> ClipGradients -> per-param Normalize /
Regularize / ComputeUpdateValue -> Update. Here the whole pipeline is a pure
function over (params, grads, state) pytrees so it jit-compiles into the
training step and shards with the params; all six rules reproduce the
reference's exact update formulas, including Caffe's quirk of folding the
learning rate INTO the momentum history (sgd_solver.cpp:239-244).

Per-parameter learning-rate / weight-decay multipliers (the prototxt
`param { lr_mult / decay_mult }` blocks) are pytrees matching the params.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverSpec:
    """SolverParameter subset (caffe.proto:102-242) relevant to updates."""
    type: str = "sgd"              # sgd|nesterov|adagrad|rmsprop|adadelta|adam
    base_lr: float = 0.0005
    lr_policy: str = "step"        # fixed|step|exp|inv|multistep|poly|sigmoid
    gamma: float = 0.1
    power: float = 1.0
    stepsize: int = 10000
    stepvalue: Sequence[int] = ()
    max_iter: int = 25000
    momentum: float = 0.9
    momentum2: float = 0.999       # adam beta2
    rms_decay: float = 0.99
    delta: float = 1e-8            # adagrad/rmsprop/adadelta/adam epsilon
    weight_decay: float = 0.0005
    regularization_type: str = "L2"
    clip_gradients: float = -1.0   # <0 disables (sgd_solver.cpp:81-99)
    iter_size: int = 1

    def needs_second_history(self) -> bool:
        return self.type in ("adadelta", "adam")


def learning_rate(spec: SolverSpec, it):
    """GetLearningRate (sgd_solver.cpp:27-63) as a jnp function of the iter."""
    it = jnp.asarray(it, jnp.float32)
    p = spec.lr_policy
    if p == "fixed":
        return jnp.asarray(spec.base_lr, jnp.float32)
    if p == "step":
        cur = jnp.floor(it / spec.stepsize)
        return spec.base_lr * jnp.power(spec.gamma, cur)
    if p == "exp":
        return spec.base_lr * jnp.power(spec.gamma, it)
    if p == "inv":
        return spec.base_lr * jnp.power(1.0 + spec.gamma * it, -spec.power)
    if p == "multistep":
        steps = jnp.asarray(spec.stepvalue, jnp.float32)
        cur = (it >= steps).sum().astype(jnp.float32) if steps.size else 0.0
        return spec.base_lr * jnp.power(spec.gamma, cur)
    if p == "poly":
        return spec.base_lr * jnp.power(1.0 - it / spec.max_iter, spec.power)
    if p == "sigmoid":
        return spec.base_lr / (1.0 + jnp.exp(-spec.gamma * (it - spec.stepsize)))
    raise ValueError(f"unknown lr_policy {p!r}")


def init_state(params, spec: SolverSpec):
    """Solver state pytree: iteration counter + history blob(s) per param."""
    zeros = jax.tree.map(jnp.zeros_like, params)
    state = {"it": jnp.zeros((), jnp.int32), "h1": zeros}
    if spec.needs_second_history():
        state["h2"] = jax.tree.map(jnp.zeros_like, params)
    return state


def _clip_gradients(grads, clip: float):
    """Scale all grads so their global L2 norm is <= clip (sgd_solver.cpp:81)."""
    sumsq = jax.tree.reduce(
        lambda a, g: a + g, jax.tree.map(lambda g: jnp.sum(g * g), grads), 0.0)
    norm = jnp.sqrt(sumsq)
    scale = jnp.where(norm > clip, clip / jnp.maximum(norm, 1e-20), 1.0)
    return jax.tree.map(lambda g: g * scale, grads)


def _regularize(g, w, local_decay, reg_type: str):
    if reg_type == "L1":
        return g + local_decay * jnp.sign(w)
    return g + local_decay * w


def apply_update(params, grads, state, spec: SolverSpec,
                 lr_mults=None, decay_mults=None):
    """One solver step. Returns (new_params, new_state, global_lr).

    lr_mults / decay_mults: pytrees of scalars matching params (None = 1.0
    everywhere). Gradients are expected pre-accumulated over iter_size
    forward/backward passes (the Normalize step divides by iter_size).
    """
    it = state["it"]
    rate = learning_rate(spec, it)

    if spec.clip_gradients > 0:
        grads = _clip_gradients(grads, spec.clip_gradients)
    if spec.iter_size > 1:
        grads = jax.tree.map(lambda g: g / spec.iter_size, grads)

    ones = jax.tree.map(lambda _: 1.0, params)
    lr_mults = ones if lr_mults is None else lr_mults
    decay_mults = ones if decay_mults is None else decay_mults

    t = spec.type
    eps = spec.delta
    mom = spec.momentum

    def leaf_update(w, g, h1, h2, lm, dm):
        local_rate = rate * lm
        local_decay = spec.weight_decay * dm
        g = _regularize(g, w, local_decay, spec.regularization_type)
        if t == "sgd":
            h1n = mom * h1 + local_rate * g
            return w - h1n, h1n, h2
        if t == "nesterov":
            h1n = mom * h1 + local_rate * g
            upd = (1.0 + mom) * h1n - mom * h1
            return w - upd, h1n, h2
        if t == "adagrad":
            h1n = h1 + g * g
            return w - local_rate * g / (jnp.sqrt(h1n) + eps), h1n, h2
        if t == "rmsprop":
            h1n = spec.rms_decay * h1 + (1.0 - spec.rms_decay) * g * g
            return w - local_rate * g / (jnp.sqrt(h1n) + eps), h1n, h2
        if t == "adadelta":
            h1n = mom * h1 + (1.0 - mom) * g * g
            upd = g * jnp.sqrt((h2 + eps) / (h1n + eps))
            h2n = mom * h2 + (1.0 - mom) * upd * upd
            return w - local_rate * upd, h1n, h2n
        if t == "adam":
            b1, b2 = mom, spec.momentum2
            step = (it + 1).astype(jnp.float32)
            h1n = b1 * h1 + (1.0 - b1) * g
            h2n = b2 * h2 + (1.0 - b2) * g * g
            corr = jnp.sqrt(1.0 - jnp.power(b2, step)) / (1.0 - jnp.power(b1, step))
            return w - local_rate * corr * h1n / (jnp.sqrt(h2n) + eps), h1n, h2n
        raise ValueError(f"unknown solver type {t!r}")

    h2 = state.get("h2", jax.tree.map(lambda _: None, params))
    flat_w, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_h1 = treedef.flatten_up_to(state["h1"])
    flat_h2 = treedef.flatten_up_to(h2) if spec.needs_second_history() \
        else [None] * len(flat_w)
    flat_lm = treedef.flatten_up_to(lr_mults)
    flat_dm = treedef.flatten_up_to(decay_mults)

    new_w, new_h1, new_h2 = [], [], []
    for w, g, a, b, lm, dm in zip(flat_w, flat_g, flat_h1, flat_h2,
                                  flat_lm, flat_dm):
        wn, h1n, h2n = leaf_update(w, g, a, b, lm, dm)
        new_w.append(wn)
        new_h1.append(h1n)
        new_h2.append(h2n)

    new_state = {
        "it": it + 1,
        "h1": jax.tree.unflatten(treedef, new_h1),
    }
    if spec.needs_second_history():
        new_state["h2"] = jax.tree.unflatten(treedef, new_h2)
    return jax.tree.unflatten(treedef, new_w), new_state, rate


def spec_from_prototxt_fields(fields: dict) -> SolverSpec:
    """Build a SolverSpec from parsed solver-prototxt key/values."""
    type_map = {"SGD": "sgd", "Nesterov": "nesterov", "AdaGrad": "adagrad",
                "RMSProp": "rmsprop", "AdaDelta": "adadelta", "Adam": "adam"}
    kw = {}
    if "type" in fields:
        kw["type"] = type_map.get(fields["type"], str(fields["type"]).lower())
    for name in ("base_lr", "gamma", "power", "momentum", "momentum2",
                 "rms_decay", "delta", "weight_decay", "clip_gradients"):
        if name in fields:
            kw[name] = float(fields[name])
    for name in ("stepsize", "max_iter", "iter_size"):
        if name in fields:
            kw[name] = int(fields[name])
    if "lr_policy" in fields:
        kw["lr_policy"] = fields["lr_policy"]
    if "regularization_type" in fields:
        kw["regularization_type"] = fields["regularization_type"]
    if "stepvalue" in fields:
        v = fields["stepvalue"]
        kw["stepvalue"] = tuple(int(x) for x in (v if isinstance(v, list) else [v]))
    return SolverSpec(**kw)

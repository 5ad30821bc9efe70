"""GSPMD train step: data x spatial sharding on a 2-D mesh.

The spatial analog of sequence parallelism for this workload (SURVEY.md
section 5): at very large inputs the conv trunk's activations dominate HBM,
so the image H axis is sharded over a second mesh axis and XLA's SPMD
partitioner inserts the halo exchanges for every convolution/pooling window
automatically — no manual collectives, unlike the shard_map DP path
(train_step.make_train_step), which stays the default for stock resolutions.

Sharding layout: params + solver state replicated; image/label maps
P(data, space) over (batch, height); per-image box tensors P(data).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mscnn_tpu.train import solver as S
from mscnn_tpu.train import train_step as T


def batch_shardings(mesh: Mesh, batch_template: dict,
                    data_axis: str = "data", space_axis: str = "space"):
    """NamedShardings for a batch dict: 4-D image-like arrays shard over
    (batch, H); everything else shards over batch only."""

    space = mesh.shape[space_axis]

    def spec_for(x):
        # image-like [B, H, W, C] arrays shard over (batch, H); box/label
        # tables only over batch
        if hasattr(x, "ndim") and x.ndim == 4 and x.shape[1] % space == 0:
            return NamedSharding(mesh, P(data_axis, space_axis))
        return NamedSharding(mesh, P(data_axis))

    return jax.tree.map(spec_for, batch_template)


def make_train_step_spmd(cfg, tspec: T.TrainSpec, sspec: S.SolverSpec,
                         mesh: Mesh, lr_mults=None, decay_mults=None,
                         loss_function=None, donate: bool = True):
    """jit + sharding-annotation train step over a ("data", "space") mesh.

    Gradients reduce to replicated automatically (params are replicated, so
    GSPMD all-reduces the batch/space-partial gradients); the solver update
    is computed once per device on identical values, exactly like the
    shard_map path.
    """
    objective = loss_function if loss_function is not None else T.loss_fn

    def step(train_state, batch, key):
        (_, metrics), grads = jax.value_and_grad(
            objective, has_aux=True)(train_state["params"], batch, key,
                                     cfg, tspec)
        params, sstate, lr = S.apply_update(
            train_state["params"], grads, train_state["solver"], sspec,
            lr_mults, decay_mults)
        metrics["lr"] = lr
        return {"params": params, "solver": sstate}, metrics

    repl = NamedSharding(mesh, P())

    def compile_for(batch_template):
        in_shardings = (
            jax.tree.map(lambda _: repl, {"params": 0, "solver": 0}),
            batch_shardings(mesh, batch_template),
            repl,
        )
        # the state pytrees are nested; build matching sharding trees
        return jax.jit(
            step,
            in_shardings=(repl, batch_shardings(mesh, batch_template), repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )

    return compile_for


def place_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_shardings(mesh, batch))


def place_state(state, mesh: Mesh):
    return jax.device_put(state, NamedSharding(mesh, P()))

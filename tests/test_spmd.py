"""GSPMD data x spatial sharding on the virtual 8-device mesh (4 x 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from mscnn_tpu.data.synthetic import make_batch
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo
from mscnn_tpu.parallel import make_mesh
from mscnn_tpu.parallel import spmd as SP
from mscnn_tpu.train import solver as S
from mscnn_tpu.train import train_step as T


def test_spmd_data_space_step():
    cfg = zoo.tiny_test_config()
    mesh = make_mesh((4, 2), ("data", "space"))
    params = M.init_params(jax.random.key(0), cfg)
    tspec = T.TrainSpec(stage=2, roi_batch=16, with_metrics=False)
    sspec = S.SolverSpec(base_lr=1e-3, lr_policy="fixed", momentum=0.9)
    compile_for = SP.make_train_step_spmd(cfg, tspec, sspec, mesh,
                                          donate=False)
    batch = make_batch(cfg, batch=4)
    step = compile_for(batch)
    state = SP.place_state(
        {"params": params, "solver": S.init_state(params, sspec)}, mesh)
    batch = SP.place_batch(batch, mesh)
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # the image really is sharded over (batch, H)
    img_shard = SP.batch_shardings(mesh, batch)["image"]
    assert img_shard.spec == jax.sharding.PartitionSpec("data", "space")
    # params remain replicated and identical across devices
    w = state["params"]["cls_pred"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_spmd_matches_single_device():
    """Sharded and unsharded steps produce the same loss (same math)."""
    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    tspec = T.TrainSpec(stage=1, with_metrics=False)
    sspec = S.SolverSpec(base_lr=1e-3, lr_policy="fixed")
    batch = make_batch(cfg, batch=4)

    single = T.make_train_step(cfg, tspec, sspec, donate=False)
    s1, m1 = single({"params": params,
                     "solver": S.init_state(params, sspec)},
                    batch, jax.random.key(0))

    mesh = make_mesh((2, 2), ("data", "space"), jax.devices()[:4])
    compile_for = SP.make_train_step_spmd(cfg, tspec, sspec, mesh,
                                          donate=False)
    step = compile_for(batch)
    s2, m2 = step(SP.place_state({"params": params,
                                  "solver": S.init_state(params, sspec)},
                                 mesh),
                  SP.place_batch(batch, mesh), jax.random.key(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)

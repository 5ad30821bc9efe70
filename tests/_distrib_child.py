"""Subprocess body for the multi-process jax.distributed test.

Run as: python _distrib_child.py <pid> <nprocs> <port> <local_devices> <out>

Brings up the distributed runtime with a localhost coordinator, builds the
global data-parallel mesh, runs ONE flagship train step on a deterministic
batch (each process feeding its disjoint slice, the P2PSync analog of
parallel.cpp:325-380), and dumps the loss + updated params to <out>.

The parent test asserts both processes' dumps are identical to each other
and to a single-process run over the same 4-device global mesh.
"""

import os
import sys


def main():
    pid, nprocs, port, local_devices, out = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else "step"
    snapdir = sys.argv[7] if len(sys.argv) > 7 else ""
    pid, nprocs, local_devices = int(pid), int(nprocs), int(local_devices)
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        # XLA's CPU backend needs an explicit cross-process collectives
        # implementation (gloo ships with jaxlib). initialize() must be
        # the first backend-touching call, so it happens before the
        # package import below (which probes devices).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs, process_id=pid)

    import numpy as np

    from mscnn_tpu.data.synthetic import make_batch
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    from mscnn_tpu.parallel import distributed as D
    from mscnn_tpu.train import solver as S
    from mscnn_tpu.train import train_step as T
    info = D.process_info()
    assert info["process_count"] == nprocs, info
    assert info["global_devices"] == nprocs * local_devices, info

    mesh = D.global_data_parallel_mesh()
    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    tspec = T.TrainSpec(stage=2, roi_batch=32, with_metrics=False)
    sspec = S.SolverSpec(base_lr=1e-3, lr_policy="fixed", momentum=0.9)
    step = T.make_train_step(cfg, tspec, sspec, mesh=mesh, donate=False)

    per = 4 // nprocs

    def local_batch(seed):
        gb = make_batch(cfg, batch=4, seed=seed)
        local = jax.tree.map(
            lambda x: np.asarray(x)[pid * per:(pid + 1) * per], gb)
        return T.shard_batch(local, mesh)

    state = {"params": params, "solver": S.init_state(params, sspec)}
    state = T.replicate_state(state, mesh)

    if mode == "loop":
        # A few solve() iterations WITH snapshotting: pins the
        # root-guarded / orbax-coordinated snapshot discipline
        # (solver.hpp:140-157 WorkerSolver no-op) under a real
        # 2-process runtime. Both processes run the same loop; the
        # parent asserts exactly one snapshot tree per interval exists.
        from mscnn_tpu.train import loop as LP
        seeds = iter(range(100))
        spec = LP.LoopSpec(max_iter=3, display=0, snapshot=2,
                           snapshot_prefix=os.path.join(snapdir, "snap"),
                           snapshot_format="orbax",
                           sigint_effect="none", sighup_effect="none")
        state = LP.solve(lambda st, b, k: step(st, b, k), state,
                         lambda: local_batch(next(seeds)), spec,
                         key=jax.random.key(0), log=lambda m: None)
        metrics = {"loss": 0.0}
    else:
        state, metrics = step(state, local_batch(0), jax.random.key(0))

    dump = {"loss": np.float64(metrics["loss"]),
            "it": np.int64(state["solver"]["it"])}
    leaves = jax.tree_util.tree_leaves_with_path(state["params"])
    for path, leaf in leaves[:6] + leaves[-6:]:
        dump[jax.tree_util.keystr(path)] = np.asarray(leaf)
    np.savez(out, **dump)
    print(f"proc {pid}/{nprocs} ok loss={dump['loss']}")


if __name__ == "__main__":
    main()

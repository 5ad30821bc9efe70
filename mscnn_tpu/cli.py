"""Command-line interface: the `caffe <command>` equivalent.

Mirrors /root/reference/tools/caffe.cpp:424-453 (train / test / time /
device_query, flags -solver -model -weights -snapshot -gpu -iterations) with
TPU-native semantics: --devices picks the data-parallel mesh width, configs
are the same prototxt files the reference zoo ships, and `train2` runs the
two-step MS-CNN schedule (train_mscnn.sh) in one invocation.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import sys
import time as _time

import jax
import jax.numpy as jnp
import numpy as np


def _apply_conv1(cfg, args):
    """Resolve the --conv1 strategy flag onto a config. auto = the fused
    Pallas kernel on TPU at bf16 (BENCH.md: +5% deploy, train-neutral),
    EXCEPT when the int8 trunk is requested: there the plain path wins
    (the conv1 pair quantizes with the rest of the trunk; BENCH.md r3).
    The Pallas kernel computes in bf16, so an explicit 'pallas' at f32
    compute is rejected rather than silently degrading precision."""
    conv1 = getattr(args, "conv1", "auto") or "auto"
    if conv1 == "auto":
        conv1 = "pallas" if (jax.default_backend() == "tpu"
                             and cfg.compute_dtype == "bfloat16"
                             and not getattr(args, "int8", False)) \
            else "plain"
    elif conv1 == "pallas" and cfg.compute_dtype != "bfloat16":
        raise SystemExit("--conv1 pallas requires --bf16 (the fused "
                         "kernel computes in bfloat16)")
    return dataclasses.replace(cfg, pallas_conv1=conv1 == "pallas",
                               s2d_conv1=conv1 == "s2d")


def _cascade_objective(params, batch, key, cfg, tspec, *, ccfg, roi_batch):
    from mscnn_tpu.models import cascade as CC
    return CC.loss_fn(params, batch, key, ccfg, tspec, roi_batch=roi_batch)


class _PlainSource:
    """Context-manager adapter matching the prefetcher interface
    (`with make_batch_source() as src: src.get()`)."""

    def __init__(self, fn):
        self.get = fn

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _build_generic_training(args, fields, net_path, sspec, lspec):
    """Generic (non-MSCNN) prototxt training via train/generic.py.

    Returns the _build_training tuple with cfg=None (the generic marker)
    and the netbuilder Net in the tspec slot (cmd_test builds its eval
    step from it)."""
    from mscnn_tpu.io import checkpoint as CKPT
    from mscnn_tpu.parallel import data_parallel_mesh
    from mscnn_tpu.train import generic as G

    if args.bf16:
        raise SystemExit("--bf16 applies to the MSCNN compute-dtype "
                         "config; generic prototxt nets run f32")
    if getattr(args, "uint8_input", False):
        raise SystemExit("--uint8-input is the ImageGtData loader path; "
                         "generic prototxt nets read their own data "
                         "layers (no silent fallback)")
    mesh = data_parallel_mesh(args.devices) if args.devices > 1 else None
    phase = getattr(args, "phase", "TRAIN") or "TRAIN"
    state, step, batch_source, net = G.setup(
        net_path, sspec, phase=phase,
        seed=int(fields.get("random_seed", 0)),
        weights=args.weights or None, mesh=mesh,
        batch_size=args.batch_size or None)
    if args.snapshot:
        state = CKPT.restore(args.snapshot, state)
    return (state, step, lambda: _PlainSource(batch_source), lspec,
            None, net, mesh)


def _build_training(args, solver_path):
    from mscnn_tpu.config import zoo_import as Z
    from mscnn_tpu.config import prototxt as PB
    from mscnn_tpu.data import pipeline as P
    from mscnn_tpu.io import checkpoint as CKPT
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.parallel import data_parallel_mesh
    from mscnn_tpu.train import loop as LP
    from mscnn_tpu.train import solver as S
    from mscnn_tpu.train import train_step as T

    import os
    fields = PB.parse_prototxt_file(solver_path)
    sspec = S.spec_from_prototxt_fields(fields)
    lspec = LP.loop_spec_from_solver_fields(
        fields, snapshot_prefix=args.snapshot_prefix)
    net_path = args.model or os.path.join(
        os.path.dirname(solver_path), str(fields["net"]))

    ccfg = None
    loss_function = None
    if Z.is_cascade_prototxt(net_path):
        from mscnn_tpu.models import cascade as CC
        ccfg, tspec, aug, dspec, source = Z.cascade_from_prototxt(net_path)
        cfg = ccfg.base
        loss_function = functools.partial(
            _cascade_objective, ccfg=ccfg, roi_batch=tspec.roi_batch)
    else:
        try:
            cfg, tspec, aug, dspec, source = Z.model_from_prototxt(
                net_path, phase=getattr(args, "phase", "TRAIN"))
        except ValueError as e:
            if "ImageGtData" not in str(e):
                raise
            # not an MS-CNN net: generic-prototxt training (caffe train
            # accepts any NetParameter, tools/caffe.cpp:103-233)
            return _build_generic_training(args, fields, net_path,
                                           sspec, lspec)
    if args.batch_size:
        dspec = dataclasses.replace(dspec, batch_size=args.batch_size)
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    cfg = _apply_conv1(cfg, args)
    if ccfg is not None:
        ccfg = dataclasses.replace(ccfg, base=cfg)
    if getattr(args, "uint8_input", False):
        # raw uint8 canvases + device-side normalization (bit-identical,
        # 4x less H2D; tests/test_native_loader.py pins the equality)
        aug = dataclasses.replace(aug, emit_uint8=True)
        tspec = T.sync_input_norm(tspec, aug)

    window_file = args.window_file or os.path.join(
        os.path.dirname(net_path), source)

    mesh = None
    if args.devices > 1:
        mesh = data_parallel_mesh(args.devices)
        if dspec.batch_size % args.devices:
            raise SystemExit(
                f"batch_size {dspec.batch_size} not divisible by "
                f"{args.devices} devices")

    seed_key = jax.random.key(int(fields.get("random_seed", 0)))
    if ccfg is not None:
        from mscnn_tpu.models import cascade as CC
        params = CC.init_params(seed_key, ccfg)
        lr_mults = CC.param_lr_multipliers(params, ccfg)
    else:
        params = M.init_params(seed_key, cfg)
        lr_mults = M.param_lr_multipliers(params, cfg)
    if args.weights:
        params = CKPT.restore_params(args.weights, params)

    state = {"params": params, "solver": S.init_state(params, sspec)}
    if args.snapshot:
        state = CKPT.restore(args.snapshot, state)

    step = T.make_train_step(
        cfg, tspec, sspec,
        lr_mults=lr_mults,
        decay_mults=M.param_decay_multipliers(params, cfg),
        mesh=mesh, loss_function=loss_function)

    def device_put(batch):
        batch = jax.tree.map(jnp.asarray, batch)
        return T.shard_batch(batch, mesh) if mesh is not None else batch

    if mesh is not None:
        state = T.replicate_state(state, mesh)

    def make_batch_source():
        from mscnn_tpu.data import native_loader as NL
        return NL.make_loader(window_file, aug, dspec,
                              root_folder=args.root_folder,
                              prefer_native=not getattr(args, "no_native",
                                                        False),
                              device_put=device_put)

    return state, step, make_batch_source, lspec, cfg, tspec, mesh


def cmd_train(args):
    from mscnn_tpu.train import loop as LP

    state, step, make_batch_source, lspec, cfg, tspec, mesh = \
        _build_training(args, args.solver)
    if args.iterations:
        lspec = dataclasses.replace(lspec, max_iter=args.iterations)
    with make_batch_source() as src:
        LP.solve(step, state, src.get, lspec, key=jax.random.key(args.seed))
    print("Optimization Done.")
    return 0


def cmd_train2(args):
    """Two-step schedule (train_mscnn.sh): stage 1, then stage 2 warm-started
    from stage 1's final snapshot."""
    from mscnn_tpu.io import checkpoint as CKPT

    a1 = argparse.Namespace(**vars(args))
    a1.solver = args.solver1
    a1.snapshot = None
    rc = cmd_train(a1)
    if rc:
        return rc

    from mscnn_tpu.config import prototxt as PB
    fields = PB.parse_prototxt_file(args.solver1)
    prefix = args.snapshot_prefix or str(fields.get("snapshot_prefix", "mscnn"))
    stage1_ckpt = CKPT.latest_snapshot(prefix)
    if stage1_ckpt is None:
        raise SystemExit("stage-1 snapshot not found")

    a2 = argparse.Namespace(**vars(args))
    a2.solver = args.solver2
    a2.weights = stage1_ckpt
    a2.snapshot = None
    return cmd_train(a2)


def cmd_test(args):
    """Forward-only metric evaluation over --iterations batches (uses the
    prototxt's TEST-phase data/sampling parameters by default)."""
    from mscnn_tpu.train import loop as LP
    from mscnn_tpu.train import train_step as T

    state, _, make_batch_source, lspec, cfg, tspec, mesh = \
        _build_training(args, args.solver)
    if cfg is None:  # generic prototxt: tspec slot carries the Net
        from mscnn_tpu.train import generic as G
        eval_step = G.make_eval_step(tspec, mesh=mesh)
    else:
        eval_step = T.make_eval_step(cfg, tspec, mesh=mesh)
    n = args.iterations or lspec.test_iter or 50
    with make_batch_source() as src:
        out = LP.test_eval(eval_step, state["params"],
                           (src.get() for _ in range(n)),
                           jax.random.key(args.seed))
    print(json.dumps({k: round(v, 6) for k, v in out.items()}))
    return 0


def _time_layers(args):
    """Per-layer fwd/bwd wall times for a prototxt net — the `caffe time`
    per-layer table (/root/reference/tools/caffe.cpp:369-419).  Each layer
    runs as its own jitted subgraph on materialized bottom blobs, so
    cross-layer XLA fusion is deliberately broken: the table localizes
    cost, the whole-graph numbers above it measure the fused reality."""
    from mscnn_tpu.config import prototxt as PB
    from mscnn_tpu.models.netbuilder import Net
    from mscnn_tpu.train import generic as G

    _SOURCED = ("ImageData", "HDF5Data", "DummyData", "WindowData")
    net = Net(args.model, phase="TRAIN")
    data_layer = G.find_data_layer(net)
    inputs = {}
    if data_layer is not None:
        ltype = str(data_layer.get("type"))
        if ltype not in _SOURCED:
            print(f"time --layers cannot source a {ltype!r} layer "
                  "(no host reader; convert with `mscnn "
                  "convert_imageset` or use ImageData/HDF5Data)")
            return 1
        # nets fed by a readable data layer: probe one batch for the top
        # shapes and values, like caffe time running the net's own data
        # layer (and train/generic.setup)
        src = G.make_batch_source(net, data_layer, train=True)
        first = src()
        net = Net(args.model, phase="TRAIN",
                  input_shapes={k: tuple(v.shape)
                                for k, v in first.items()})
        inputs = {k: jnp.asarray(v) for k, v in first.items()}
    # Input-layer blobs (possibly alongside a data layer) zero-fill
    for n, sh in net.inputs().items():
        inputs.setdefault(n, jnp.zeros(sh, jnp.float32))
    params = net.init(jax.random.key(0))
    blobs = net.apply(params, inputs)
    iters = args.iterations or 10

    def timed(fn, *fargs):
        jax.block_until_ready(fn(*fargs))
        t0 = _time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (_time.perf_counter() - t0) / iters * 1e3

    print(f"{'layer':<24}{'type':<20}{'fwd ms':>10}{'bwd ms':>10}")
    tot_f = tot_b = 0.0
    for layer in net.layers:
        ltype = str(layer.get("type"))
        if ltype in ("Input", "Silence") or ltype in G.DATA_LAYER_TYPES:
            continue
        name = str(layer.get("name"))
        bots = [blobs[str(b)] for b in PB.as_list(layer.get("bottom"))]
        lp = params.get(name, {})

        def run(lp_, bb, layer=layer, name=name):
            p2 = {**params, name: lp_} if name in params else params
            return net.apply_layer(layer, p2, bb)[0]

        def back_scalar(lp_, bb, layer=layer, name=name):
            outs = run(lp_, bb, layer, name)
            s = 0.0
            for o in outs:
                if hasattr(o, "dtype") and \
                        jnp.issubdtype(o.dtype, jnp.floating):
                    s = s + o.sum()
            return s

        fwd_ms = timed(jax.jit(run), lp, bots)
        try:
            bwd_ms = timed(
                jax.jit(jax.grad(back_scalar, argnums=(0, 1))), lp, bots)
        except Exception:
            bwd_ms = float("nan")   # non-differentiable layer (ArgMax, ...)
        tot_f += fwd_ms
        tot_b += 0.0 if bwd_ms != bwd_ms else bwd_ms
        print(f"{name:<24}{ltype:<20}{fwd_ms:>10.3f}{bwd_ms:>10.3f}")
    print(f"{'TOTAL (unfused sum)':<44}{tot_f:>10.3f}{tot_b:>10.3f}")
    return 0


def cmd_time(args):
    """Per-stage wall times (the `caffe time` analog): data, forward,
    forward+backward+update."""
    from mscnn_tpu.train import train_step as T
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    from mscnn_tpu.train import solver as S
    from mscnn_tpu.config import zoo_import as Z

    if getattr(args, "layers", False):
        if not args.model:
            print("--layers needs --model <prototxt> (per-layer timing "
                  "runs on the generic net builder)")
            return 1
        return _time_layers(args)
    if getattr(args, "int8_heads", False) and not getattr(args, "int8",
                                                          False):
        print("--int8-heads extends the int8 trunk; pass --int8 too")
        return 1
    ccfg = None
    if args.model:
        cfg, tspec, _, _, _ = Z.model_from_prototxt(args.model)
    else:
        kwargs = {"deploy": True} if getattr(args, "deploy", False) else {}
        cfg = zoo.get(args.zoo or "kitti_car/mscnn-7s-576-2x", **kwargs)
        tspec = T.TrainSpec()
    from mscnn_tpu.models.cascade import CascadeConfig
    if isinstance(cfg, CascadeConfig):
        ccfg, cfg = cfg, cfg.base
    if getattr(args, "input_hw", None):
        cfg = dataclasses.replace(cfg,
                                  input_hw=tuple(args.input_hw))
    if getattr(args, "max_out", None):
        # post-NMS roi capacity (fixed TPU shape). The zoo default is 512;
        # bench.py's flagship protocol pins 256 — this flag makes capacity
        # an explicit axis when timing (every ROI-stage cost is linear in
        # it: gather rows AND head matmul rows)
        cfg = dataclasses.replace(cfg, proposal=dataclasses.replace(
            cfg.proposal, max_out=int(args.max_out)))
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    cfg = _apply_conv1(cfg, args)
    if ccfg is not None:
        ccfg = dataclasses.replace(ccfg, base=cfg)
    b = args.batch_size or 4
    h, w = cfg.input_hw

    sspec = S.SolverSpec()
    if ccfg is not None:
        from mscnn_tpu.models import cascade as CC
        params = CC.init_params(jax.random.key(0), ccfg)
    else:
        params = M.init_params(jax.random.key(0), cfg)
    if getattr(args, "int8", False):
        # timing-only PTQ: scales calibrated from synthetic images (the
        # numerics are covered by examples/synthetic_e2e*.py; perf is
        # identical for any scale values). The fwd timings below then run
        # the int8 trunk; the train step keeps the compute dtype (PTQ is
        # deploy-only, like the reference's deploy-time optimizations).
        import numpy as _np
        from mscnn_tpu.ops import quant as Q
        cal = _np.random.RandomState(0).rand(2, h, w, 3) \
            .astype(_np.float32) * 150.0 - 75.0
        scales = Q.calibrate_trunk_scales(
            params, cfg, cal,
            include_conv1=not (cfg.pallas_conv1 or cfg.s2d_conv1))
        params = Q.quantize_trunk(params, scales)
        cfg = dataclasses.replace(cfg, int8_trunk=True)
        if getattr(args, "int8_heads", False):
            params, cfg = _int8_quantize_heads(params, cfg, cal, ccfg=ccfg)
        if ccfg is not None:
            ccfg = dataclasses.replace(ccfg, base=cfg)
    if ccfg is not None:
        from mscnn_tpu import inference as I
        fwd = jax.jit(lambda p, x: I.cascade_deploy_outputs(p, x, ccfg))
        step = T.make_train_step(
            cfg, tspec, sspec, donate=False,
            loss_function=functools.partial(
                _cascade_objective, ccfg=ccfg, roi_batch=tspec.roi_batch))
    else:
        fwd = jax.jit(lambda p, x: M.deploy_forward(p, x, cfg))
        step = T.make_train_step(cfg, tspec, sspec, donate=False)

    from mscnn_tpu.data.synthetic import make_batch
    batch = make_batch(cfg, batch=b)
    images = batch["image"]
    state = {"params": params, "solver": S.init_state(params, sspec)}

    def bench(fn, *fargs, iters=args.iterations or 10):
        jax.block_until_ready(fn(*fargs))  # compile
        t0 = _time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (_time.perf_counter() - t0) / iters * 1e3

    fwd_ms = bench(fwd, params, images)
    print(f"Average Forward pass: {fwd_ms:.2f} ms ({b} images)")
    if getattr(args, "int8", False):
        # PTQ is deploy-only: int8 weights have no meaningful
        # fwd-bwd-update, so only the forward is timed
        print(f"Throughput: {b / (fwd_ms / 1e3):.2f} infer img/s "
              "(int8: train timing skipped)")
    else:
        step_ms = bench(lambda s: step(s, batch, jax.random.key(0))[1],
                        state)
        print(f"Average Forward-Backward-Update: {step_ms:.2f} ms")
        print(f"Throughput: {b / (step_ms / 1e3):.2f} train img/s, "
              f"{b / (fwd_ms / 1e3):.2f} infer img/s")

    if getattr(args, "stages", False):
        # per-stage time + MFU: pipelined-dispatch protocol (the only
        # trustworthy timing through the tunnel, BENCH.md) + XLA
        # cost-analysis FLOPs; the caffe-time per-layer table
        # (caffe.cpp:373-402) at subgraph granularity
        from mscnn_tpu.utils import profiling as P

        stages = {"full_deploy": fwd}
        if ccfg is None:
            stages = {
                "trunk": jax.jit(lambda p, x: M.trunk(p, x, cfg)),
                "full_deploy": fwd,
            }
        peak = P.peak_flops()
        print(f"{'stage':<14}{'ms/img':>10}{'GFLOP':>10}{'MFU':>8}")
        rows = {}
        for name, jfn in stages.items():
            try:  # same jit instance -> the timed calls reuse this compile
                analysis = jfn.lower(params, images).compile() \
                              .cost_analysis()
                if isinstance(analysis, (list, tuple)):
                    analysis = analysis[0]
                fl = float(analysis["flops"]) / b
            except Exception:
                fl = None
            ms = bench(jfn, params, images, iters=30) / b
            rows[name] = (ms, fl)
            util = (fl / (ms / 1e3) / peak) if (fl and peak) else None
            print(f"{name:<14}{ms:>10.2f}"
                  f"{(fl or 0) / 1e9:>10.1f}"
                  f"{('%.1f%%' % (100 * util)) if util else '   n/a':>8}")
        (t_ms, t_fl), (f_ms, f_fl) = rows.get("trunk", (None, None)), \
            rows["full_deploy"]
        if f_fl and t_fl:
            ms, fl = f_ms - t_ms, f_fl - t_fl
            util = fl / (ms / 1e3) / peak if (ms > 0 and peak) else None
            print(f"{'heads+nms+roi':<14}{ms:>10.2f}{fl / 1e9:>10.1f}"
                  f"{('%.1f%%' % (100 * util)) if util else '   n/a':>8}")
    return 0


def _int8_quantize(params, cfg, image_dir, ncal, *, ccfg=None,
                   heads=False):
    """PTQ int8 trunk calibration from the first images of a directory.
    Returns (params, cfg) or None when no image is readable.  With
    heads=True, additionally calibrates + quantizes the ROI-head matmuls
    (roi_c1/fc6 incl. cascade suffixes) on the already-int8 trunk."""
    import glob
    import os

    import cv2
    import numpy as _np

    from mscnn_tpu.ops import quant as Q

    cal_paths = sorted(
        glob.glob(os.path.join(image_dir, "*.png")) +
        glob.glob(os.path.join(image_dir, "*.jpg")))[:ncal]
    net_h, net_w = cfg.input_hw
    mean = _np.asarray([104.0, 117.0, 123.0], _np.float32)
    cals = []
    for p in cal_paths:
        im = cv2.imread(p, cv2.IMREAD_COLOR)
        if im is None:
            continue
        cals.append(cv2.resize(im, (net_w, net_h)).astype(_np.float32)
                    - mean)
    if not cals:
        return None
    scales = Q.calibrate_trunk_scales(
        params, cfg, _np.stack(cals),
        include_conv1=not (cfg.pallas_conv1 or cfg.s2d_conv1))
    params = Q.quantize_trunk(params, scales)
    cfg = dataclasses.replace(cfg, int8_trunk=True)
    print(f"int8 trunk: calibrated {len(scales)} layers from "
          f"{len(cals)} images")
    if heads:
        params, cfg = _int8_quantize_heads(params, cfg, _np.stack(cals),
                                           ccfg=ccfg)
    return params, cfg


def _int8_quantize_heads(params, cfg, cal_images, *, ccfg=None):
    """ROI-head PTQ on top of an (already-quantized) trunk: run the
    deploy graph capturing the roi_c1/fc6 input maxima, quantize those
    matmuls, and flip int8_roi_head."""
    from mscnn_tpu.ops import quant as Q

    hccfg = dataclasses.replace(ccfg, base=cfg) if ccfg is not None \
        else None
    hscales = Q.calibrate_roi_head_scales(params, cfg, cal_images,
                                          ccfg=hccfg)
    params = Q.quantize_roi_heads(params, hscales)
    cfg = dataclasses.replace(cfg, int8_roi_head=True)
    print(f"int8 ROI heads: calibrated {len(hscales)} matmuls")
    return params, cfg


def cmd_detect(args):
    """Batch detection over an image directory -> KITTI label files
    (the run_mscnn_detection.m + writeDetForEval.m pipeline)."""
    import glob
    import os

    if getattr(args, "int8_heads", False) \
            and not getattr(args, "int8", False) \
            and not getattr(args, "compiled", None):
        print("--int8-heads extends the int8 trunk; pass --int8 too")
        return 1

    import cv2

    from mscnn_tpu import inference as I
    from mscnn_tpu.config import zoo_import as Z
    from mscnn_tpu.io import checkpoint as CKPT
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    from mscnn_tpu.models.cascade import CascadeConfig

    compiled = None
    if getattr(args, "compiled", None):
        # AOT serving: the artifact carries program + weights + DetectSpec;
        # every model/weights/precision flag is baked in at compile time
        from mscnn_tpu.io import aot
        if int(getattr(args, "devices", 1) or 1) > 1:
            print("--compiled artifacts are single-program exports; "
                  "drop --devices")
            return 1
        compiled = aot.load_deploy(args.compiled)
        num_classes = int(compiled.meta["num_classes"])
        ignored = [f for f, on in (
            ("--model", args.model), ("--zoo", args.zoo),
            ("--weights", args.weights), ("--bf16", args.bf16),
            ("--int8", getattr(args, "int8", False)),
            ("--int8-heads", getattr(args, "int8_heads", False)),
            ("--conv1", args.conv1 != "auto"),
            ("--score-thr", bool(args.score_thr)),
        ) if on]
        if ignored:
            print(f"note: {', '.join(ignored)} ignored — the artifact "
                  "bakes model/weights/precision/DetectSpec at compile "
                  "time; recompile with `mscnn compile` to change them")

    if compiled is None:
        if args.model:
            cfg = Z.deploy_model_from_prototxt(args.model)
        else:
            cfg = zoo.get(args.zoo or "kitti_car/mscnn-7s-576-2x",
                          deploy=True)
        ccfg = cfg if isinstance(cfg, CascadeConfig) else None
        if ccfg is not None:
            cfg = ccfg.base
        if args.bf16:
            cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
        cfg = _apply_conv1(cfg, args)
        if ccfg is not None:
            ccfg = dataclasses.replace(ccfg, base=cfg)

        if ccfg is not None:
            from mscnn_tpu.models import cascade as CC
            params = CC.init_params(jax.random.key(0), ccfg)
        else:
            params = M.init_params(jax.random.key(0), cfg)
        if args.weights:
            params = CKPT.restore_params(args.weights, params)
        num_classes = cfg.num_classes

    if compiled is None and getattr(args, "int8", False):
        # cascades share the single-stage VGG trunk (CC.init_params wraps
        # M.init_params), so trunk-only PTQ applies unchanged; the ROI
        # stage heads stay in the compute dtype either way
        ncal = max(int(getattr(args, "calib_images", 4) or 4), 1)
        quantized = _int8_quantize(
            params, cfg, args.image_dir, ncal, ccfg=ccfg,
            heads=getattr(args, "int8_heads", False))
        if quantized is None:
            print("no readable calibration images")
            return 1
        params, cfg = quantized
        if ccfg is not None:
            ccfg = dataclasses.replace(ccfg, base=cfg)

    names = args.class_names.split(",") if args.class_names else \
        I.KITTI_CLASS_NAMES["kitti_car"][: num_classes]
    spec = I.DetectSpec(score_thr=args.score_thr)
    n_dev = int(getattr(args, "devices", 1) or 1)
    if compiled is not None:
        if compiled.batch > 1:
            # throughput artifact: reuse the grouped/padded batch loop
            n_dev = compiled.batch
            run_detect_batch = compiled.detect_many
        else:
            run_detect = compiled.detect
    elif n_dev > 1:
        # data-parallel serving: one sharded deploy call per n_dev images
        from mscnn_tpu.parallel import data_parallel_mesh
        mesh = data_parallel_mesh(n_dev)
        fwd = I.make_cascade_forward(params, ccfg, mesh=mesh) \
            if ccfg is not None else I.make_forward(params, cfg, mesh=mesh)

        def run_detect_batch(imgs):
            return I.detect_batch(params, imgs, cfg, spec, fwd=fwd,
                                  cascade=ccfg)
    elif ccfg is not None:
        fwd = I.make_cascade_forward(params, ccfg)

        def run_detect(img):
            return I.detect_cascade(params, img, ccfg, spec, fwd=fwd)
    else:
        # single-dispatch serving graph: uint8 transfer + in-graph decode
        fwd = I.make_e2e_forward(params, cfg, spec)

        def run_detect(img):
            return I.detect(params, img, cfg, spec, e2e_fwd=fwd)

    fmt = getattr(args, "format", "kitti") or "kitti"
    if fmt == "widerface":
        # the widerface layout nests images under event dirs
        # (run_mscnn_detection.m walks event_list/file_list)
        paths = sorted(
            glob.glob(os.path.join(args.image_dir, "**", "*.png"),
                      recursive=True) +
            glob.glob(os.path.join(args.image_dir, "**", "*.jpg"),
                      recursive=True))
    else:
        paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")) +
                       glob.glob(os.path.join(args.image_dir, "*.jpg")))
    if args.iterations:
        paths = paths[: args.iterations]
    buffered = {}  # i -> (path, det) for the whole-set writers below

    # prefetch image decode on worker threads so host IO overlaps device
    # compute (KITTI png decode is a similar magnitude to the forward)
    import collections
    import concurrent.futures as _cf
    import itertools

    depth = max(int(getattr(args, "loader_threads", 2) or 2), 1)
    pool = _cf.ThreadPoolExecutor(max_workers=depth)
    path_iter = iter(paths)
    pending = collections.deque(
        (p, pool.submit(cv2.imread, p, cv2.IMREAD_COLOR))
        for p in itertools.islice(path_iter, depth + 2))

    done = {"n": 0, "t_first": None}

    def write_one(i, path, det):
        done["n"] += 1
        if done["n"] == 1:
            done["t_first"] = _time.perf_counter()   # first call compiles
        if fmt != "kitti":
            buffered[i] = (path, det)
        else:
            stem = os.path.splitext(os.path.basename(path))[0]
            try:
                img_idx = int(stem)
            except ValueError:
                img_idx = i
            I.write_kitti_labels(I.detections_to_kitti(det, names),
                                 args.output_dir, img_idx)
        if (i + 1) % 100 == 0:
            avg = (_time.perf_counter() - t0) / (i + 1)
            print(f"idx {i + 1}/{len(paths)}, avgtime={avg:.4f}s")

    t0 = _time.perf_counter()
    i = -1
    group = []   # (i, path, img) accumulator for the sharded-batch path

    def flush_group():
        # pad the tail to the static batch, drop the extras
        imgs = [g[2] for g in group]
        imgs += [imgs[-1]] * (n_dev - len(imgs))
        dets = run_detect_batch(imgs)
        for (gi, gpath, _), det in zip(group, dets):
            write_one(gi, gpath, det)
        group.clear()

    try:
        while pending:
            i += 1
            path, fut = pending.popleft()
            img = fut.result()
            nxt = next(path_iter, None)
            if nxt is not None:
                pending.append(
                    (nxt, pool.submit(cv2.imread, nxt, cv2.IMREAD_COLOR)))
            if img is None:
                print(f"skipping unreadable image {path}")
                continue
            if n_dev > 1:
                group.append((i, path, img))
                if len(group) == n_dev:
                    flush_group()
            else:
                write_one(i, path, run_detect(img))
        # tail shorter than n_dev (or stranded by unreadable images)
        if group:
            flush_group()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)

    comp_id = getattr(args, "comp_id", None) or "mscnn"
    if fmt == "caltech":
        # one flat imgIdx,x,y,w,h,score file per class
        # (run_mscnn_detection.m:159-167; images keep paths order)
        from mscnn_tpu.evaluation import caltech_eval as CE
        os.makedirs(args.output_dir, exist_ok=True)
        for k, name in enumerate(names):
            if k == 0:
                continue  # background
            per_img = [I.detections_to_xywh(buffered[i][1], cls_id=k)
                       if i in buffered else np.zeros((0, 5))
                       for i in range(len(paths))]
            CE.write_detections(
                os.path.join(args.output_dir, f"{comp_id}_{name}.txt"),
                per_img)
    elif fmt == "widerface":
        # per-event dirs of per-image txts (run_mscnn_detection.m:173-199);
        # the event is the image's directory relative to --image-dir
        from mscnn_tpu.evaluation import widerface_eval as WE
        events = {}
        for i in range(len(paths)):
            if i not in buffered:
                continue
            path, det = buffered[i]
            rel = os.path.relpath(os.path.dirname(path), args.image_dir)
            event = "event0" if rel == "." else rel
            stem = os.path.splitext(os.path.basename(path))[0]
            events.setdefault(event, {})[stem] = \
                I.detections_to_xywh(det, cls_id=1)
        WE.write_detections(args.output_dir, comp_id, events)

    n = max(len(paths), 1)
    end = _time.perf_counter()
    msg = f"Done: {len(paths)} images, {(end - t0) / n:.4f} s/img"
    if done["n"] > 1 and done["t_first"] is not None:
        steady = (end - done["t_first"]) / (done["n"] - 1)
        msg += (f" ({steady:.4f} s/img steady-state; first call includes"
                f" compile)")
    print(msg + f", labels in {args.output_dir}")
    return 0


def cmd_parity(args):
    """One-shot AP-parity harness vs the pretrained reference model:
    .caffemodel import -> detect over the KITTI val split -> official
    KITTI AP -> ±0.5-pt verdict against the BASELINE.md target.

    Reference flow being replicated: run_mscnn_detection.m:24-162 (detect
    + KITTI txt write) followed by evaluate_object.cpp scoring.  Run this
    first when real weights/data land:

      mscnn parity --weights mscnn_kitti_trainval_2nd_iter_35000.caffemodel \\
                   --kitti-root /data/KITTI --zoo kitti_car/mscnn-8s-768-trainval
    """
    import argparse
    import glob
    import os
    import tempfile

    from mscnn_tpu.evaluation import kitti_eval as KE

    root = args.kitti_root
    img_dir = next((d for d in (os.path.join(root, "training", "image_2"),
                                os.path.join(root, "image_2"),
                                os.path.join(root, "images"), root)
                    if glob.glob(os.path.join(d, "*.png"))
                    or glob.glob(os.path.join(d, "*.jpg"))), None)
    gt_dir = next((d for d in (os.path.join(root, "training", "label_2"),
                               os.path.join(root, "label_2"),
                               os.path.join(root, "labels"), root)
                   if glob.glob(os.path.join(d, "*.txt"))), None)
    if img_dir is None or gt_dir is None:
        print(f"no images/labels under {root!r} (expected KITTI devkit "
              f"layout: training/image_2 + training/label_2)")
        return 1

    if args.image_set:
        ids = [int(l) for l in open(args.image_set).read().split()]
        subset = tempfile.mkdtemp(prefix="mscnn_parity_")
        for i in ids:
            for ext in (".png", ".jpg"):
                src = os.path.join(img_dir, f"{i:06d}{ext}")
                if os.path.exists(src):
                    os.symlink(src, os.path.join(subset, f"{i:06d}{ext}"))
        img_dir = subset

    out_dir = args.output_dir or tempfile.mkdtemp(prefix="mscnn_parity_out_")
    det = argparse.Namespace(
        model=args.model, zoo=args.zoo, weights=args.weights,
        bf16=args.bf16, conv1=getattr(args, "conv1", "auto"),
        image_dir=img_dir, output_dir=out_dir,
        class_names=args.class_names, score_thr=0.0,
        loader_threads=2, iterations=args.iterations,
        devices=getattr(args, "devices", 1))
    rc = cmd_detect(det)
    if rc:
        return rc

    ids = sorted(int(os.path.splitext(os.path.basename(p))[0])
                 for p in glob.glob(os.path.join(out_dir, "*.txt"))
                 if os.path.exists(os.path.join(
                     gt_dir, os.path.basename(p))))
    if not ids:
        print("no detection/gt id overlap to score")
        return 1
    classes = (args.class_names or "bg,car").lower().split(",")
    classes = [c for c in classes if c != "bg"][:1] if args.cls is None \
        else [args.cls.lower()]
    table = KE.evaluate(gt_dir, out_dir, ids, classes=classes)
    cls = classes[0]
    ap = table[cls]["moderate"]
    delta = ap - args.expected_ap
    verdict = "PASS" if delta >= -args.tolerance else "FAIL"
    print(json.dumps({
        "class": cls,
        "ap": {k: round(v, 2) for k, v in table[cls].items()},
        "moderate_ap": round(ap, 2),
        "expected_ap": args.expected_ap,
        "delta": round(delta, 2),
        "tolerance": args.tolerance,
        "images": len(ids),
        "verdict": verdict,
    }))
    print(f"KITTI {cls} moderate AP {ap:.2f} vs reference "
          f"{args.expected_ap:.2f} ({delta:+.2f} pt, tol "
          f"±{args.tolerance}) -> {verdict}")
    return 0 if verdict == "PASS" else 2


def cmd_eval(args):
    """Detection scoring: KITTI AP (default), caltech MR-2, or widerface
    AP — the three protocols the reference's zoo targets (KITTI via
    evaluate_object.cpp; caltech/widerface via external toolboxes the
    reference's READMEs point at, reimplemented natively here)."""
    dataset = getattr(args, "dataset", "kitti")
    required = {"kitti": ("gt_dir", "result_dir"),
                "caltech": ("gt_dir", "result_file"),
                "widerface": ("result_dir",)}[dataset]
    missing = [f"--{r.replace('_', '-')}" for r in required
               if not getattr(args, r, None)]
    if dataset == "widerface" and not (getattr(args, "gt_file", None)
                                       or getattr(args, "gt_mat", None)):
        missing.append("--gt-file or --gt-mat")
    if missing:
        raise SystemExit(
            f"eval --dataset {dataset} requires {' '.join(missing)}")
    if dataset == "caltech":
        from mscnn_tpu.evaluation import caltech_eval as CE

        setting = CE.REASONABLE if args.setting == "reasonable" else CE.ALL
        out = CE.evaluate_dirs(args.gt_dir, args.result_file,
                               setting=setting)
        print(json.dumps({"mr2": round(out["mr2"], 4),
                          "n_images": out["n_images"],
                          "n_pos": out["n_pos"]}))
        return 0
    if dataset == "widerface":
        from mscnn_tpu.evaluation import widerface_eval as WE

        keep = None
        if getattr(args, "gt_mat", None):
            # official devkit split (+ curated difficulty keep lists)
            gts, keep = WE.load_split_mat(
                args.gt_mat, getattr(args, "difficulty_mat", None))
        else:
            gts = WE.parse_gt(args.gt_file)
        dets = WE.read_detections(args.result_dir)
        out = WE.evaluate(dets, gts, keep=keep)
        print(json.dumps({"ap": round(out["ap"], 4),
                          "n_gt": out["n_gt"]}))
        return 0

    from mscnn_tpu.evaluation import kitti_eval as KE

    if args.image_set:
        ids = [int(l) for l in open(args.image_set).read().split()]
    else:
        import glob
        import os
        ids = sorted(int(os.path.splitext(os.path.basename(p))[0])
                     for p in glob.glob(os.path.join(args.gt_dir, "*.txt")))
    classes = (args.class_names or "car").split(",")
    out = KE.evaluate(args.gt_dir, args.result_dir, ids, classes=classes,
                      stats_dir=args.stats_dir)
    print(json.dumps({c: {k: round(v, 2) for k, v in d.items()}
                      for c, d in out.items()}))
    return 0


def cmd_export(args):
    """Export checkpoint params to the reference's .caffemodel wire format
    (NetParameter binaryproto, net.cpp:856-866) for two-way interop."""
    from mscnn_tpu.config import zoo_import as Z
    from mscnn_tpu.io import caffemodel as CM
    from mscnn_tpu.io import checkpoint as CKPT
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    from mscnn_tpu.models.cascade import CascadeConfig

    if args.model:
        # deploy prototxt if it has Input dims, else a trainval net
        try:
            cfg = Z.deploy_model_from_prototxt(args.model)
        except ValueError:
            if Z.is_cascade_prototxt(args.model):
                cfg = Z.cascade_from_prototxt(args.model)[0]
            else:
                cfg = Z.model_from_prototxt(args.model)[0]
    else:
        cfg = zoo.get(args.zoo or "kitti_car/mscnn-8s-768-trainval",
                      deploy=True)
    if isinstance(cfg, CascadeConfig):
        from mscnn_tpu.models import cascade as CC
        params = CC.init_params(jax.random.key(0), cfg)
    else:
        params = M.init_params(jax.random.key(0), cfg)
    if args.weights:
        params = CKPT.restore_params(args.weights, params)
    n = CM.save_caffemodel(jax.device_get(params), args.output)
    print(f"Wrote {n} layers to {args.output}")
    return 0


def cmd_compile(args):
    """AOT-compile the deploy serving graph to a portable artifact dir
    (io/aot.py): jax.export StableHLO program + weights + metadata.

    The TPU-native analog of shipping mscnn_deploy.prototxt +
    .caffemodel to a serving host (run_mscnn_detection.m:24-27) — except
    the host needs no model code, and the artifact can be cross-compiled
    for a platform the build machine lacks (--platforms tpu)."""
    if getattr(args, "int8_heads", False) and not getattr(args, "int8",
                                                          False):
        print("--int8-heads extends the int8 trunk; pass --int8 too")
        return 1
    from mscnn_tpu import inference as I
    from mscnn_tpu.config import zoo_import as Z
    from mscnn_tpu.io import aot
    from mscnn_tpu.io import checkpoint as CKPT
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo
    from mscnn_tpu.models.cascade import CascadeConfig

    if args.model:
        cfg = Z.deploy_model_from_prototxt(args.model)
    else:
        cfg = zoo.get(args.zoo or "kitti_car/mscnn-8s-768-trainval",
                      deploy=True)
    ccfg = cfg if isinstance(cfg, CascadeConfig) else None
    if ccfg is not None:
        cfg = ccfg.base
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    cfg = _apply_conv1(cfg, args)
    if ccfg is not None:
        ccfg = dataclasses.replace(ccfg, base=cfg)
        from mscnn_tpu.models import cascade as CC
        params = CC.init_params(jax.random.key(0), ccfg)
    else:
        params = M.init_params(jax.random.key(0), cfg)
    if args.weights:
        params = CKPT.restore_params(args.weights, params)
    if getattr(args, "int8", False):
        if not args.calib_dir:
            print("--int8 needs --calib-dir (images for PTQ calibration)")
            return 1
        quantized = _int8_quantize(
            params, cfg, args.calib_dir,
            max(int(args.calib_images or 4), 1), ccfg=ccfg,
            heads=getattr(args, "int8_heads", False))
        if quantized is None:
            print("no readable calibration images in --calib-dir")
            return 1
        params, cfg = quantized
        if ccfg is not None:
            # cascades share the single-stage trunk; trunk PTQ applies
            # unchanged (+ per-stage head matmuls under --int8-heads)
            ccfg = dataclasses.replace(ccfg, base=cfg)
    import os

    spec = I.DetectSpec(score_thr=args.score_thr)
    platforms = args.platforms.split(",") if args.platforms else None
    aot.export_deploy(params, cfg, args.output, spec=spec,
                      platforms=platforms,
                      batch=max(int(args.batch or 1), 1), cascade=ccfg)
    with open(os.path.join(args.output, "meta.json")) as f:
        meta = json.load(f)
    print(f"Wrote AOT artifact to {args.output} "
          f"(platforms={meta['platforms']}, "
          f"{meta['param_leaves']} param leaves); serve with "
          f"`mscnn detect --compiled {args.output} ...`")
    return 0


def cmd_serve(args):
    """HTTP serving endpoint over an AOT artifact (serve.py): GET
    /healthz, POST /detect with image bytes -> JSON detections."""
    from mscnn_tpu import serve as SV

    names = args.class_names.split(",") if args.class_names else None
    return SV.serve(args.compiled, args.port, class_names=names)


def cmd_resize_images(args):
    """Batch-resize an image dir/list to fixed geometry
    (tools/extra/resize_and_crop_images.py parity)."""
    import glob
    import os

    from mscnn_tpu import tools as TL

    if os.path.isdir(args.source):
        paths = sorted(sum((glob.glob(os.path.join(args.source, pat))
                            for pat in ("*.png", "*.jpg", "*.jpeg")), []))
    else:
        paths = [l.split()[0] for l in open(args.source)
                 if l.strip()]
    n = TL.resize_and_crop_images(paths, args.output_dir,
                                  width=args.width, height=args.height,
                                  crop=not args.no_crop,
                                  workers=args.workers)
    print(f"Wrote {n}/{len(paths)} images to {args.output_dir}")
    return 0


def cmd_summary(args):
    """Layer table of a net prototxt: name, type, output shape, param
    count (tools/extra/summarize.py parity, plus shapes via the generic
    netbuilder's shape inference)."""
    from mscnn_tpu.config import prototxt as PB
    from mscnn_tpu.models.netbuilder import Net

    net = Net(args.net, phase=args.phase)
    shapes, counts = {}, {}
    try:
        params = net.init(jax.random.key(0))
        shapes = net.shapes
        counts = {name: sum(int(v.size) for v in p.values())
                  for name, p in params.items()}
    except Exception as e:  # still print the topology for exotic nets
        print(f"(shape inference unavailable: {e})")
    total = 0
    print(f"{'layer':<24}{'type':<18}{'output shape':<22}{'params':>10}")
    for layer in net.layers:
        name = str(layer.get("name"))
        tops = [str(t) for t in PB.as_list(layer.get("top"))]
        shape = shapes.get(tops[0]) if tops else None
        n = counts.get(name, 0)
        total += n
        print(f"{name:<24}{str(layer.get('type')):<18}"
              f"{str(shape or ''):<22}{n:>10,}")
    print(f"{'TOTAL':<64}{total:>10,}")
    return 0


def cmd_plot_log(args):
    """Training curves from a Solve-loop log -> png
    (tools/extra/plot_training_log.py.example parity)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mscnn_tpu.utils import parse_log as PL

    rows = PL.parse_log_file(args.log)
    if not rows:
        print("no iterations found in log")
        return 1
    keys = sorted({k for r in rows for k in r}
                  - {"iteration", "iters_per_sec"})
    wanted = args.keys.split(",") if args.keys else ["loss"]
    fig, ax = plt.subplots(figsize=(8, 5))
    for key in wanted:
        if key not in keys:
            print(f"(no values for {key!r}; available: {', '.join(keys)})")
            continue
        pts = [(r["iteration"], r[key]) for r in rows if key in r]
        ax.plot([p[0] for p in pts], [p[1] for p in pts], label=key)
    ax.set_xlabel("iteration")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"Wrote {args.out} ({len(rows)} points)")
    return 0


def cmd_upgrade_proto(args):
    """Migrate a legacy V0/V1 net or solver prototxt to the modern schema
    (tools/upgrade_net_proto_text.cpp / upgrade_solver_proto_text.cpp)."""
    from mscnn_tpu.config import prototxt as PB
    from mscnn_tpu.config import upgrade as UP

    msg = PB.parse_prototxt_file(args.input)
    out = UP.upgrade_solver(msg) if args.kind == "solver" \
        else UP.upgrade_net(msg)
    text = PB.emit_prototxt(out) + "\n"
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"Wrote upgraded {args.kind} prototxt to {args.output}")
    else:
        print(text, end="")
    return 0


def cmd_draw(args):
    """Net topology -> Graphviz DOT (python/caffe/draw.py equivalent;
    render with `dot -Tpng out.dot` wherever graphviz is installed)."""
    from mscnn_tpu.config import prototxt as PB
    from mscnn_tpu.utils import draw as DR

    net = PB.parse_prototxt_file(args.net)
    DR.draw_net_to_file(net, args.out, rankdir=args.rankdir,
                        phase=args.phase)
    print(f"Wrote {args.out} ({len(PB.layers(net))} layers)")
    return 0


def cmd_convert_imageset(args):
    """Pack a window file / image list into one record shard (the
    tools/convert_imageset.cpp analog; see data/records.py)."""
    from mscnn_tpu import tools as TL

    n = TL.convert_imageset(
        args.output, window_file=args.window_file, listfile=args.listfile,
        from_lmdb=args.from_lmdb, from_leveldb=args.from_leveldb,
        root_folder=args.root_folder,
        shuffle=args.shuffle, seed=args.seed,
        encode=args.encode, quality=args.quality, backend=args.backend)
    print(f"Packed {n} records into {args.output}")
    return 0


def cmd_vbb2bbgt(args):
    """Convert Caltech .vbb video annotations to per-frame bbGt v3 txts at
    the standard sampling stride, so `mscnn eval --dataset caltech` can
    score against the ORIGINAL annotation release (Dollar's vbb format);
    default stride/offset = the devkit's 1 Hz extraction (every 30th
    frame, first at frame index 29, matching I00029.jpg naming)."""
    import glob
    import os

    from mscnn_tpu.evaluation import caltech_eval as CE

    if os.path.isdir(args.vbb):
        vbbs = sorted(glob.glob(os.path.join(args.vbb, "**", "*.vbb"),
                                recursive=True))
    else:
        vbbs = [args.vbb]
    if not vbbs:
        print(f"no .vbb files under {args.vbb}")
        return 1
    os.makedirs(args.output_dir, exist_ok=True)
    n_files = 0
    for vp in vbbs:
        stem = os.path.splitext(os.path.basename(vp))[0]
        parent = os.path.basename(os.path.dirname(os.path.abspath(vp)))
        prefix = f"{parent}_{stem}" if parent.startswith("set") else stem
        frames = CE.load_vbb(vp)
        for f in range(args.offset, len(frames), args.stride):
            CE.write_bbgt(
                os.path.join(args.output_dir, f"{prefix}_I{f:05d}.txt"),
                frames[f])
            n_files += 1
    print(f"Wrote {n_files} bbGt files from {len(vbbs)} vbb(s) "
          f"to {args.output_dir}")
    return 0


def cmd_compute_mean(args):
    """Dataset mean (tools/compute_image_mean.cpp analog): prints the BGR
    mean_value triple; optionally writes a BlobProto binaryproto."""
    from mscnn_tpu import tools as TL

    bgr, pixel = TL.compute_image_mean(args.source,
                                       root_folder=args.root_folder,
                                       output=args.output)
    print(f"mean_value (BGR): {bgr[0]:.4f} {bgr[1]:.4f} {bgr[2]:.4f}")
    if args.output:
        kind = "per-pixel" if pixel is not None else "per-channel"
        print(f"Wrote {kind} mean BlobProto to {args.output}")
    return 0


def cmd_extract_features(args):
    """Dump named activations over an image dir to HDF5
    (tools/extract_features.cpp analog)."""
    import glob
    import os

    from mscnn_tpu import tools as TL
    from mscnn_tpu.config import zoo_import as Z
    from mscnn_tpu.io import checkpoint as CKPT
    from mscnn_tpu.models import mscnn as M
    from mscnn_tpu.models import zoo

    if args.model:
        cfg = Z.deploy_model_from_prototxt(args.model)
    else:
        cfg = zoo.get(args.zoo or "kitti_car/mscnn-8s-768-trainval",
                      deploy=True)
    # feature extraction reads trunk blobs only; a cascade's base config
    # and params carry the full trunk
    cfg = getattr(cfg, "base", cfg)
    params = M.init_params(jax.random.key(0), cfg)
    if args.weights:
        params = CKPT.restore_params(args.weights, params)
    paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")) +
                   glob.glob(os.path.join(args.image_dir, "*.jpg")))
    if args.iterations:
        paths = paths[: args.iterations]
    shapes = TL.extract_features(params, cfg, paths,
                                 args.blobs.split(","), args.output)
    for name, shape in shapes.items():
        print(f"{name}: {(len(paths),) + shape}")
    return 0


def cmd_device_query(args):
    for i, d in enumerate(jax.devices()):
        print(f"Device {i}: {d.device_kind} ({d.platform}), "
              f"process {d.process_index}")
    return 0


def _add_common(p):
    p.add_argument("--model", help="trainval prototxt (overrides solver's net:)")
    p.add_argument("--weights", help="checkpoint to warm-start params from")
    p.add_argument("--snapshot", help="checkpoint to resume full state from")
    p.add_argument("--snapshot-prefix", default=None)
    p.add_argument("--window-file", help="override the net's data source path")
    p.add_argument("--root-folder", default="", help="image path prefix")
    p.add_argument("--devices", type=int, default=1,
                   help="data-parallel mesh width")
    p.add_argument("--iterations", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--conv1", default="auto",
                   choices=["auto", "plain", "s2d", "pallas"],
                   help="conv1 strategy (auto: fused Pallas kernel on "
                        "TPU at bf16, else plain)")
    p.add_argument("--no-native", action="store_true",
                   help="use the Python data pipeline instead of the "
                        "C++ loader")
    p.add_argument("--uint8-input", action="store_true",
                   help="ship raw uint8 image canvases and normalize on "
                        "device (bit-identical; 4x less host->device "
                        "traffic)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--zoo", help="built-in zoo config name (cmd_time)")


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="mscnn", description="TPU-native MS-CNN framework CLI")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a model from a solver prototxt")
    p_train.add_argument("--solver", required=True)
    _add_common(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_train2 = sub.add_parser("train2", help="two-step MS-CNN schedule")
    p_train2.add_argument("--solver1", required=True)
    p_train2.add_argument("--solver2", required=True)
    _add_common(p_train2)
    p_train2.set_defaults(fn=cmd_train2)

    p_test = sub.add_parser("test", help="evaluate metrics on the TEST config")
    p_test.add_argument("--solver", required=True)
    p_test.add_argument("--phase", default="TEST",
                        help="NetState phase for data/sampling params")
    _add_common(p_test)
    p_test.set_defaults(fn=cmd_test)

    p_time = sub.add_parser("time", help="benchmark fwd / fwd-bwd times")
    _add_common(p_time)
    p_time.add_argument("--deploy", action="store_true",
                        help="build the zoo config in deploy geometry "
                             "(native/full-res input, deploy fg_thr)")
    p_time.add_argument("--input-hw", type=int, nargs=2, metavar=("H", "W"),
                        help="override the input size, e.g. 1024 1024")
    p_time.add_argument("--max-out", type=int,
                        help="post-NMS roi capacity (zoo default 512; "
                             "bench.py's flagship protocol uses 256)")
    p_time.add_argument("--int8", action="store_true",
                        help="post-training int8 trunk (deploy forward "
                             "only; calibration from synthetic images — "
                             "timing-valid, numerics covered by the "
                             "synthetic e2e quality loops)")
    p_time.add_argument("--int8-heads", action="store_true",
        help="additionally quantize the ROI-head matmuls (roi_c1/fc6, "
             "incl. cascade stages); requires --int8")
    p_time.add_argument("--stages", action="store_true",
                        help="per-stage device time + MFU table "
                             "(loop-slope protocol)")
    p_time.add_argument("--layers", action="store_true",
                        help="per-layer fwd/bwd table for a --model "
                             "prototxt (caffe time parity; each layer is "
                             "jitted in isolation, so the column sum "
                             "exceeds the fused whole-graph time)")
    p_time.set_defaults(fn=cmd_time)

    p_det = sub.add_parser("detect", help="run detection over an image dir")
    p_det.add_argument("--image-dir", required=True)
    p_det.add_argument("--output-dir", required=True)
    p_det.add_argument("--class-names",
                       help="comma list incl. bg, e.g. bg,Car,Van,Truck,Tram")
    p_det.add_argument("--score-thr", type=float, default=0.0)
    p_det.add_argument("--loader-threads", type=int, default=2,
                       help="image-decode prefetch threads (IO overlaps "
                            "device compute)")
    p_det.add_argument("--int8", action="store_true",
                       help="post-training int8 trunk (ops/quant.py), "
                            "calibrated from the first --calib-images")
    p_det.add_argument("--int8-heads", action="store_true",
        help="additionally quantize the ROI-head matmuls (roi_c1/fc6, "
             "incl. cascade stages); requires --int8")
    p_det.add_argument("--calib-images", type=int, default=4)
    p_det.add_argument("--compiled",
                       help="serve from an AOT artifact directory "
                            "(mscnn compile); model/weights flags are "
                            "baked into the artifact")
    p_det.add_argument("--format", default="kitti",
                       choices=["kitti", "caltech", "widerface"],
                       help="output layout: per-image KITTI labels, the "
                            "flat caltech file, or per-event widerface "
                            "txts (feeds `mscnn eval --dataset ...`)")
    p_det.add_argument("--comp-id", default="mscnn",
                       help="caltech/widerface result file prefix")
    _add_common(p_det)
    p_det.set_defaults(fn=cmd_detect)

    p_eval = sub.add_parser(
        "eval", help="detection scoring: KITTI AP / caltech MR-2 / "
        "widerface AP")
    p_eval.add_argument("--dataset", default="kitti",
                        choices=["kitti", "caltech", "widerface"])
    p_eval.add_argument("--gt-dir",
                        help="kitti: label dir; caltech: bbGt v3 dir")
    p_eval.add_argument("--result-dir",
                        help="kitti: per-image txt dir; widerface: "
                        "per-event detection tree")
    p_eval.add_argument("--image-set", help="file of image ids, one per line")
    p_eval.add_argument("--class-names", default="car")
    p_eval.add_argument("--stats-dir", default=None,
                        help="write devkit-layout stats_/plot files here")
    p_eval.add_argument("--result-file",
                        help="caltech: flat imgIdx,x,y,w,h,score file")
    p_eval.add_argument("--gt-file",
                        help="widerface: wider_face_*_bbx_gt.txt")
    p_eval.add_argument("--gt-mat",
                        help="widerface: official wider_face_val.mat "
                             "(alternative to --gt-file)")
    p_eval.add_argument("--difficulty-mat",
                        help="widerface: wider_{easy,medium,hard}_val.mat "
                             "curated keep list (requires --gt-mat)")
    p_eval.add_argument("--setting", default="reasonable",
                        choices=["reasonable", "all"],
                        help="caltech gt filter")
    p_eval.set_defaults(fn=cmd_eval)

    p_par = sub.add_parser(
        "parity", help="one-shot AP parity vs the pretrained reference "
                       "(.caffemodel import -> detect -> KITTI AP -> "
                       "±0.5-pt verdict)")
    p_par.add_argument("--weights", required=True,
                       help=".caffemodel (reference) or checkpoint dir")
    p_par.add_argument("--kitti-root", required=True,
                       help="KITTI devkit root (training/image_2 + "
                            "training/label_2)")
    p_par.add_argument("--model", help="deploy prototxt")
    p_par.add_argument("--zoo", default="kitti_car/mscnn-8s-768-trainval")
    p_par.add_argument("--image-set", help="file of val-split image ids")
    p_par.add_argument("--output-dir", help="keep detection txts here")
    p_par.add_argument("--class-names",
                       help="comma list incl. bg (default bg,car)")
    p_par.add_argument("--cls", help="class to score (default: first "
                                     "non-bg class)")
    p_par.add_argument("--expected-ap", type=float, default=89.0,
                       help="reference moderate AP (BASELINE.md: ≈89-90 "
                            "for the 576/768 KITTI car models)")
    p_par.add_argument("--tolerance", type=float, default=0.5)
    p_par.add_argument("--iterations", type=int, default=0,
                       help="cap the number of images (smoke runs)")
    p_par.add_argument("--bf16", action="store_true")
    p_par.add_argument("--devices", type=int, default=1)
    p_par.add_argument("--conv1", default="auto",
                       choices=["auto", "plain", "s2d", "pallas"])
    p_par.set_defaults(fn=cmd_parity)

    p_conv = sub.add_parser(
        "convert_imageset",
        help="pack a window file / image list into a record shard")
    p_conv.add_argument("--window-file")
    p_conv.add_argument("--listfile", help="`path label` lines")
    p_conv.add_argument("--from-lmdb",
                        help="migrate an existing Caffe LMDB env")
    p_conv.add_argument("--from-leveldb",
                        help="migrate an existing Caffe LevelDB dir")
    p_conv.add_argument("--backend", default="records",
                        choices=["records", "lmdb", "leveldb"],
                        help="output format (lmdb/leveldb = Caffe "
                             "Datum databases)")
    p_conv.add_argument("--root-folder", default="")
    p_conv.add_argument("--shuffle", action="store_true")
    p_conv.add_argument("--seed", type=int, default=0)
    p_conv.add_argument("--encode", default=None,
                        help="re-encode as .png/.jpg (default: raw bytes)")
    p_conv.add_argument("--quality", type=int, default=95)
    p_conv.add_argument("-o", "--output", required=True)
    p_conv.set_defaults(fn=cmd_convert_imageset)

    p_vbb = sub.add_parser(
        "vbb2bbgt", help="convert Caltech .vbb annotations to per-frame "
        "bbGt v3 txts (eval --dataset caltech input)")
    p_vbb.add_argument("vbb", help=".vbb file or directory tree")
    p_vbb.add_argument("--output-dir", required=True)
    p_vbb.add_argument("--stride", type=int, default=30,
                       help="frame sampling stride (devkit default 30)")
    p_vbb.add_argument("--offset", type=int, default=29,
                       help="first sampled frame index (default 29 = "
                            "I00029, the devkit 1 Hz convention)")
    p_vbb.set_defaults(fn=cmd_vbb2bbgt)

    p_mean = sub.add_parser(
        "compute_mean", help="dataset BGR mean (+ BlobProto output)")
    p_mean.add_argument("source",
                        help="window file, record shard, or image list")
    p_mean.add_argument("--root-folder", default="")
    p_mean.add_argument("-o", "--output", default=None,
                        help="write mean as BlobProto binaryproto")
    p_mean.set_defaults(fn=cmd_compute_mean)

    p_feat = sub.add_parser(
        "extract_features", help="dump named activations to HDF5")
    _add_common(p_feat)
    p_feat.add_argument("--image-dir", required=True)
    p_feat.add_argument("--blobs", default="conv4_3",
                        help="comma-separated blob names")
    p_feat.add_argument("-o", "--output", required=True)
    p_feat.set_defaults(fn=cmd_extract_features)

    p_exp = sub.add_parser(
        "export", help="export checkpoint weights to .caffemodel")
    _add_common(p_exp)
    p_exp.add_argument("-o", "--output", required=True,
                       help="output .caffemodel path")
    p_exp.set_defaults(fn=cmd_export)

    p_cmp = sub.add_parser(
        "compile", help="AOT-compile the deploy graph to a portable "
                        "serving artifact (jax.export StableHLO + weights)")
    _add_common(p_cmp)
    p_cmp.add_argument("-o", "--output", required=True,
                       help="artifact output directory")
    p_cmp.add_argument("--platforms",
                       help="comma list of target platforms for "
                            "cross-compilation, e.g. tpu or tpu,cpu "
                            "(default: this host's platform)")
    p_cmp.add_argument("--score-thr", type=float, default=0.0)
    p_cmp.add_argument("--batch", type=int, default=1,
                       help="images per serving call baked into the "
                            "program (1 = latency shape; bench.py's "
                            "throughput protocol uses 4)")
    p_cmp.add_argument("--int8", action="store_true",
                       help="post-training int8 trunk; needs --calib-dir")
    p_cmp.add_argument("--int8-heads", action="store_true",
        help="additionally quantize the ROI-head matmuls (roi_c1/fc6, "
             "incl. cascade stages); requires --int8")
    p_cmp.add_argument("--calib-dir",
                       help="image directory for int8 PTQ calibration")
    p_cmp.add_argument("--calib-images", type=int, default=4)
    p_cmp.set_defaults(fn=cmd_compile)

    p_srv = sub.add_parser(
        "serve", help="HTTP detection endpoint over an AOT artifact")
    p_srv.add_argument("--compiled", required=True,
                       help="artifact directory from `mscnn compile`")
    p_srv.add_argument("--port", type=int, default=8437)
    p_srv.add_argument("--class-names",
                       help="comma list incl. bg for named detections")
    p_srv.set_defaults(fn=cmd_serve)

    p_rs = sub.add_parser(
        "resize_images", help="batch resize/center-crop an image dir or "
                              "list to fixed geometry")
    p_rs.add_argument("source", help="image directory or list file")
    p_rs.add_argument("--output-dir", required=True)
    p_rs.add_argument("--width", type=int, required=True)
    p_rs.add_argument("--height", type=int, required=True)
    p_rs.add_argument("--no-crop", action="store_true",
                      help="plain resize (do not preserve aspect + crop)")
    p_rs.add_argument("--workers", type=int, default=4)
    p_rs.set_defaults(fn=cmd_resize_images)

    p_sum = sub.add_parser(
        "summary", help="layer table of a net prototxt (name/type/shape/"
                        "params)")
    p_sum.add_argument("--net", required=True)
    p_sum.add_argument("--phase", default="TRAIN",
                       choices=["TRAIN", "TEST"])
    p_sum.set_defaults(fn=cmd_summary)

    p_plot = sub.add_parser(
        "plot_log", help="plot training curves from a solve log")
    p_plot.add_argument("--log", required=True)
    p_plot.add_argument("--out", required=True, help="output .png path")
    p_plot.add_argument("--keys", default=None,
                        help="comma list of metric keys (default: loss)")
    p_plot.set_defaults(fn=cmd_plot_log)

    for kind in ("net", "solver"):
        p_up = sub.add_parser(
            f"upgrade_{kind}_proto",
            help=f"migrate a legacy {kind} prototxt to the modern schema")
        p_up.add_argument("input")
        p_up.add_argument("output", nargs="?", default=None,
                          help="output path (default: stdout)")
        p_up.set_defaults(fn=cmd_upgrade_proto, kind=kind)

    p_draw = sub.add_parser(
        "draw", help="render a net prototxt's topology to Graphviz DOT")
    p_draw.add_argument("--net", required=True, help="net prototxt path")
    p_draw.add_argument("--out", required=True, help="output .dot path")
    p_draw.add_argument("--rankdir", default="LR",
                        choices=["LR", "TB", "RL", "BT"])
    p_draw.add_argument("--phase", default=None, choices=["TRAIN", "TEST"])
    p_draw.set_defaults(fn=cmd_draw)

    p_dq = sub.add_parser("device_query", help="list accelerator devices")
    p_dq.set_defaults(fn=cmd_device_query)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

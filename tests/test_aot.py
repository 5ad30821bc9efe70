"""AOT deploy artifact (io/aot.py): jax.export round-trip of the
single-dispatch serving graph + raw-byte param serialization.

Reference analog: the shipped deploy bundle mscnn_deploy.prototxt +
.caffemodel that run_mscnn_detection.m loads (examples/kitti_car/
run_mscnn_detection.m:24-27); here the serialized artifact carries the
whole compiled program, not just the config."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu import inference as I
from mscnn_tpu.io import aot
from mscnn_tpu.models import mscnn as M
from mscnn_tpu.models import zoo


@pytest.fixture(scope="module")
def tiny():
    cfg = zoo.tiny_test_config()
    params = M.init_params(jax.random.key(0), cfg)
    return cfg, params


def test_params_raw_byte_roundtrip_preserves_bf16(tmp_path):
    # 'inception_3a/1x1' exercises separator characters in layer names
    tree = {"conv": {"w": jnp.ones((2, 3), jnp.bfloat16) * 1.5,
                     "b": jnp.arange(3, dtype=jnp.float32)},
            "inception_3a/1x1": {"w": jnp.full((4,), 7, jnp.int8)}}
    n = aot.save_params(tree, str(tmp_path / "p.npz"),
                        str(tmp_path / "p.json"))
    assert n == 3
    back = aot.load_params(str(tmp_path / "p.npz"), str(tmp_path / "p.json"))
    for path_a, path_b in zip(jax.tree_util.tree_flatten_with_path(tree)[0],
                              jax.tree_util.tree_flatten_with_path(back)[0]):
        assert path_a[0] == path_b[0]
        a, b = np.asarray(path_a[1]), path_b[1]
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(a, b)


def test_export_load_detect_matches_inference(tiny, tmp_path):
    cfg, params = tiny
    spec = I.DetectSpec(max_per_class=8)
    out = str(tmp_path / "artifact")
    aot.export_deploy(params, cfg, out, spec=spec)
    for f in ("deploy.stablehlo", "params.npz", "params_meta.json",
              "meta.json"):
        assert os.path.isfile(os.path.join(out, f)), f

    compiled = aot.load_deploy(out)
    assert compiled.meta["format"] == "mscnn-tpu-aot-v1"
    assert compiled.meta["input_hw"] == list(cfg.input_hw)

    rng = np.random.RandomState(0)
    e2e = I.make_e2e_forward(params, cfg, spec)
    for shape in ((80, 120, 3), (64, 96, 3)):
        img = rng.randint(0, 255, shape).astype(np.uint8)
        ref = I.detect(params, img, cfg, spec, e2e_fwd=e2e)
        got = compiled.detect(img)
        for k in ("boxes", "scores", "valid", "proposals",
                  "proposal_scores", "proposal_valid"):
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-5,
                                       atol=1e-5, err_msg=f"aot {k}")


def test_batched_export_matches_detect_batch(tiny, tmp_path):
    """batch>1 artifact (throughput serving shape): per-image results
    match inference.detect_batch, including the padded tail group."""
    cfg, params = tiny
    spec = I.DetectSpec(max_per_class=8)
    out = str(tmp_path / "b2")
    aot.export_deploy(params, cfg, out, spec=spec, batch=2)
    compiled = aot.load_deploy(out)
    assert compiled.batch == 2

    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 255, (60 + 4 * i, 90, 3)).astype(np.uint8)
            for i in range(3)]   # 3 images -> one full + one padded group
    ref = I.detect_batch(params, imgs, cfg, spec)
    got = compiled.detect_many(imgs)
    assert len(got) == 3
    for r, g in zip(ref, got):
        for k in ("boxes", "scores", "valid", "proposals",
                  "proposal_scores", "proposal_valid"):
            np.testing.assert_allclose(g[k], r[k], rtol=1e-4, atol=1e-4,
                                       err_msg=f"batched aot {k}")
    # single-image entry point routes through the batched program
    one = compiled.detect(imgs[0])
    for k in ("boxes", "scores", "valid"):
        np.testing.assert_allclose(one[k], ref[0][k], rtol=1e-4, atol=1e-4)


def test_cascade_export_matches_detect_cascade(tmp_path):
    """Cascade artifact: staged DecodeBBox refinement + last-stage/
    ensemble scoring in one serialized program, per-image results match
    inference.detect_cascade."""
    from mscnn_tpu.models import cascade as CC

    ccfg = CC.CascadeConfig(base=zoo.tiny_test_config())
    params = CC.init_params(jax.random.key(0), ccfg)
    spec = I.DetectSpec(max_per_class=8)
    out = str(tmp_path / "casc")
    aot.export_deploy(params, ccfg.base, out, spec=spec, cascade=ccfg)
    compiled = aot.load_deploy(out)
    assert compiled.meta["cascade"] is True

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (70, 100, 3)).astype(np.uint8)
    ref = I.detect_cascade(params, img, ccfg, spec)
    got = compiled.detect(img)
    for k in ("boxes", "scores", "valid"):
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-4,
                                   err_msg=f"cascade aot {k}")

    # batched cascade artifact: same per-image results, padded tail
    out2 = str(tmp_path / "casc_b2")
    aot.export_deploy(params, ccfg.base, out2, spec=spec, cascade=ccfg,
                      batch=2)
    compiled2 = aot.load_deploy(out2)
    imgs = [img, rng.randint(0, 255, (64, 96, 3)).astype(np.uint8),
            rng.randint(0, 255, (80, 110, 3)).astype(np.uint8)]
    got_many = compiled2.detect_many(imgs)
    for im, g in zip(imgs, got_many):
        r = I.detect_cascade(params, im, ccfg, spec)
        for k in ("boxes", "scores", "valid"):
            np.testing.assert_allclose(g[k], r[k], rtol=1e-4, atol=1e-4,
                                       err_msg=f"batched cascade aot {k}")


def test_cli_compile_then_detect_compiled(tmp_path, capsys):
    """`mscnn compile` -> `mscnn detect --compiled`: the AOT serving path
    writes the same KITTI label files as the regular detect path."""
    import cv2

    from mscnn_tpu import cli

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    for i in range(2):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)

    art = str(tmp_path / "artifact")
    rc = cli.main(["compile", "--zoo", "tiny-test", "-o", art])
    assert rc == 0
    assert "Wrote AOT artifact" in capsys.readouterr().out

    out_ref = tmp_path / "out_ref"
    out_aot = tmp_path / "out_aot"
    base = ["--image-dir", str(img_dir), "--class-names", "bg,car,van"]
    assert cli.main(["detect", "--output-dir", str(out_ref),
                     "--zoo", "tiny-test"] + base) == 0
    assert cli.main(["detect", "--output-dir", str(out_aot),
                     "--compiled", art] + base) == 0
    for i in range(2):
        ref = (out_ref / f"{i:06d}.txt").read_text()
        got = (out_aot / f"{i:06d}.txt").read_text()
        assert got == ref, f"image {i} labels diverge"

    # batch-2 artifact: cmd_detect routes through the grouped/padded
    # loop (n_dev = artifact batch); 3rd image exercises the padded tail
    img3 = (np.random.RandomState(4).rand(64, 96, 3) * 255).astype(
        np.uint8)
    cv2.imwrite(str(img_dir / "000002.png"), img3)
    art2 = str(tmp_path / "artifact_b2")
    assert cli.main(["compile", "--zoo", "tiny-test", "--batch", "2",
                     "-o", art2]) == 0
    out_ref3 = tmp_path / "out_ref3"
    out_b2 = tmp_path / "out_b2"
    assert cli.main(["detect", "--output-dir", str(out_ref3),
                     "--zoo", "tiny-test"] + base) == 0
    assert cli.main(["detect", "--output-dir", str(out_b2),
                     "--compiled", art2] + base) == 0
    for i in range(3):
        ref = (out_ref3 / f"{i:06d}.txt").read_text()
        got = (out_b2 / f"{i:06d}.txt").read_text()
        assert got == ref, f"batched artifact image {i} labels diverge"

    # ignored runtime flags are called out, not silently dropped
    capsys.readouterr()
    assert cli.main(["detect", "--output-dir", str(tmp_path / "o_ign"),
                     "--compiled", art, "--bf16"] + base) == 0
    assert "--bf16 ignored" in capsys.readouterr().out


def test_cli_compile_int8_matches_detect_int8(tmp_path, capsys):
    """`mscnn compile --int8 --calib-dir` bakes the same PTQ trunk the
    live `detect --int8` path calibrates (same images, same scales)."""
    import cv2

    from mscnn_tpu import cli

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(6)
    for i in range(3):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)

    art = str(tmp_path / "artifact_int8")
    rc = cli.main(["compile", "--zoo", "tiny-test", "--int8",
                   "--calib-dir", str(img_dir), "-o", art])
    assert rc == 0

    base = ["--image-dir", str(img_dir), "--class-names", "bg,car,van"]
    out_live = tmp_path / "out_live"
    out_aot = tmp_path / "out_aot"
    assert cli.main(["detect", "--output-dir", str(out_live),
                     "--zoo", "tiny-test", "--int8"] + base) == 0
    assert cli.main(["detect", "--output-dir", str(out_aot),
                     "--compiled", art] + base) == 0
    for i in range(3):
        ref = (out_live / f"{i:06d}.txt").read_text()
        got = (out_aot / f"{i:06d}.txt").read_text()
        assert got == ref, f"int8 artifact image {i} labels diverge"


def test_serve_http_endpoint(tiny, tmp_path):
    """`mscnn serve`: /healthz + /detect over a compiled artifact return
    the same detections inference.detect computes (above score_thr)."""
    import threading
    import urllib.request

    import cv2

    from mscnn_tpu import serve as SV

    cfg, params = tiny
    spec = I.DetectSpec(max_per_class=8)
    art = str(tmp_path / "srv_art")
    aot.export_deploy(params, cfg, art, spec=spec)

    boot = {}
    ev = threading.Event()

    def started(httpd):
        boot["httpd"] = httpd
        ev.set()

    t = threading.Thread(
        target=SV.serve, args=(art, 0),
        kwargs={"class_names": ["bg", "car", "van"], "started": started},
        daemon=True)
    t.start()
    assert ev.wait(60), "server did not start"
    port = boot["httpd"].server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["meta"]["num_classes"] == 3

        rng = np.random.RandomState(8)
        img = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect?score_thr=0.1",
            data=png.tobytes(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())

        ref = I.detect(params, img, cfg, spec)
        want = []
        for c in range(ref["boxes"].shape[0]):
            for k in range(ref["boxes"].shape[1]):
                if bool(ref["valid"][c, k]) and \
                        float(ref["scores"][c, k]) >= 0.1:
                    want.append((c + 1, float(ref["scores"][c, k]),
                                 [float(v) for v in ref["boxes"][c, k]]))
        want.sort(key=lambda d: -d[1])
        assert out["num"] == len(want)
        for got, (cid, score, bbox) in zip(out["detections"], want):
            assert got["class_id"] == cid
            assert got["class"] == ["bg", "car", "van"][cid]
            np.testing.assert_allclose(got["score"], score, rtol=1e-5)
            np.testing.assert_allclose(got["bbox"], bbox, rtol=1e-4,
                                       atol=1e-3)
    finally:
        boot["httpd"].shutdown()


def test_serve_concurrent_clients_microbatch(tiny, tmp_path):
    """ThreadingHTTPServer + MicroBatcher: concurrent POSTs against a
    batch-2 artifact all succeed, per-image results match the
    single-client path, and /healthz shows fewer device dispatches than
    images served (requests actually coalesced into batched calls)."""
    import threading
    import urllib.request

    import cv2

    from mscnn_tpu import serve as SV

    cfg, params = tiny
    spec = I.DetectSpec(max_per_class=8)
    art = str(tmp_path / "srv_mb")
    aot.export_deploy(params, cfg, art, spec=spec, batch=2)

    boot = {}
    ev = threading.Event()

    def started(httpd):
        boot["httpd"] = httpd
        ev.set()

    t = threading.Thread(
        target=SV.serve, args=(art, 0),
        kwargs={"started": started, "linger_ms": 200.0},  # deterministic
        daemon=True)
    t.start()
    assert ev.wait(60), "server did not start"
    port = boot["httpd"].server_address[1]

    rng = np.random.RandomState(9)
    imgs = [rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
            for _ in range(6)]
    payloads = []
    for im in imgs:
        ok, png = cv2.imencode(".png", im)
        assert ok
        payloads.append(png.tobytes())

    try:
        # warm the program cache so the timed burst isn't one compile
        req = urllib.request.Request(f"http://127.0.0.1:{port}/detect",
                                     data=payloads[0], method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            json.loads(r.read())

        results = [None] * len(imgs)
        errs = []
        barrier = threading.Barrier(len(imgs))

        def client(i):
            try:
                barrier.wait()
                rq = urllib.request.Request(
                    f"http://127.0.0.1:{port}/detect",
                    data=payloads[i], method="POST")
                with urllib.request.urlopen(rq, timeout=300) as r:
                    results[i] = json.loads(r.read())
            except Exception as e:  # noqa: BLE001
                errs.append((i, e))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(imgs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(300)
        assert not errs, errs
        assert all(r is not None for r in results)

        # every concurrent answer matches the direct artifact result
        compiled = aot.load_deploy(art)
        for i, im in enumerate(imgs):
            ref = compiled.detect(im)
            want = sorted(
                (float(ref["scores"][c, k])
                 for c in range(ref["scores"].shape[0])
                 for k in range(ref["scores"].shape[1])
                 if bool(ref["valid"][c, k])), reverse=True)
            got = [d["score"] for d in results[i]["detections"]]
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["served"] == len(imgs) + 1
        # coalescing happened: strictly fewer dispatches than images
        assert health["dispatches"] < health["served"]
    finally:
        boot["httpd"].shutdown()


def test_cross_platform_export_targets_tpu_from_cpu(tiny, tmp_path):
    """Cross-lowering: a CPU build host can emit the TPU serving artifact
    (jax.export platforms=- the serving fleet never needs model code)."""
    cfg, params = tiny
    out = str(tmp_path / "tpu_artifact")
    aot.export_deploy(params, cfg, out, platforms=("tpu",))
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["platforms"] == ["tpu"]
    # deserializes fine; calling it on CPU must fail with a platform error
    compiled = aot.load_deploy(out)
    assert compiled.exported.platforms == ("tpu",)

"""Pin the standard op library against the REFERENCE'S OWN layer code.

Same discipline as tests/test_golden_ref.py: every expected array was
produced by executing the reference's unmodified layer sources (compiled
out of /root/reference by native/oracle/gen_fixtures.cc — see the
`scenario_pooling` .. `scenario_losses_std` drivers). These pin the
rounding/edge quirks that analytic tests can only self-confirm:

  Pooling MAX/AVE            pooling_layer.cpp:129-217 — ceil-mode output
                             clipping; the AVE divisor counts pad cells but
                             not the ceil-mode overhang past size+pad;
                             rectangular kernel_h/w, stride_h/w, pad_h/w;
                             global pooling
  LRN ACROSS/WITHIN          lrn_layer.cpp:24-64 — within-channel is the
                             AVE-pool(x^2) o power composition
  MVN (4 modes)              mvn_layer.cpp:30-71 — biased variance,
                             eps added to sqrt(var)
  BNLL / ELU / Power / PReLU bnll/elu/power/prelu_layer.cpp
  Eltwise SUM-coeff/PROD/MAX eltwise_layer.cpp
  SPP                        spp_layer.cpp:14-61 — kernel = ceil(dim/bins),
                             stride = kernel, pad = (remainder+1)/2
  Contrastive (+legacy)      contrastive_loss_layer.cpp
  Hinge L1/L2                hinge_loss_layer.cpp
  Accuracy (top_k/ignore)    accuracy_layer.cpp

Regenerate with:
    cmake -S native/oracle -B native/oracle/build -G Ninja
    cmake --build native/oracle/build --target gen_fixtures
    ./native/oracle/build/gen_fixtures tests/assets/golden_ref
"""

import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from mscnn_tpu.ops import conv as C
from mscnn_tpu.ops import layers as LY

DIR = pathlib.Path(__file__).parent / "assets" / "golden_ref"
MANIFEST = json.loads((DIR / "manifest.json").read_text())


def L(name):
    return np.load(DIR / f"{name}.npy")


def nchw(name):
    return jnp.asarray(np.transpose(L(name), (0, 2, 3, 1)))


def check(got, want_name, rtol=1e-5, atol=1e-6, transpose=True):
    want = L(want_name)
    if transpose and want.ndim == 4:
        want = np.transpose(want, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)


# ------------------------------------------------------------------ pooling

POOL_SCENARIOS = [k for k in MANIFEST if k.startswith("pool_")]


@pytest.mark.parametrize("scenario", POOL_SCENARIOS)
def test_pooling(scenario):
    p = MANIFEST[scenario]
    x = nchw(f"{scenario}.bottom0")
    if p["global"]:
        got = (x.max(axis=(1, 2), keepdims=True) if p["method"] == "MAX"
               else x.mean(axis=(1, 2), keepdims=True))
    else:
        fn = C.max_pool if p["method"] == "MAX" else C.avg_pool
        got = fn(x, (p["kh"], p["kw"]), (p["sh"], p["sw"]),
                 (p["ph"], p["pw"]))
    check(got, f"{scenario}.top0")


# ---------------------------------------------------------------------- LRN

def test_lrn_across():
    p = MANIFEST["lrn_across"]
    got = LY.lrn(nchw("lrn_across.bottom0"), p["size"], p["alpha"],
                 p["beta"], p["k"])
    check(got, "lrn_across.top0")


def test_lrn_within():
    p = MANIFEST["lrn_within"]
    got = LY.lrn_within(nchw("lrn_within.bottom0"), p["size"], p["alpha"],
                        p["beta"])
    check(got, "lrn_within.top0")


# ---------------------------------------------------------------------- MVN

@pytest.mark.parametrize(
    "scenario", ["mvn_var_within", "mvn_var_across",
                 "mvn_mean_within", "mvn_mean_across"])
def test_mvn(scenario):
    p = MANIFEST[scenario]
    got = LY.mvn(nchw(f"{scenario}.bottom0"),
                 normalize_variance=p["normalize_variance"],
                 across_channels=p["across_channels"])
    check(got, f"{scenario}.top0", atol=1e-5)


# ------------------------------------------------------------------ neurons

def test_bnll():
    check(LY.bnll(nchw("bnll.bottom0")), "bnll.top0", rtol=1e-5, atol=1e-5)


def test_elu():
    check(LY.elu(nchw("elu_a05.bottom0"), alpha=0.5), "elu_a05.top0")


def test_power():
    p = MANIFEST["power_frac"]
    got = LY.power(nchw("power_frac.bottom0"), power=p["power"],
                   scale=p["scale"], shift=p["shift"])
    check(got, "power_frac.top0")


@pytest.mark.parametrize("scenario,shared", [
    ("prelu_perchannel", False), ("prelu_shared", True)])
def test_prelu(scenario, shared):
    slopes = jnp.asarray(L(f"{scenario}.slopes").ravel())
    got = LY.prelu(nchw(f"{scenario}.bottom0"),
                   slopes[0] if shared else slopes, channel_shared=shared)
    check(got, f"{scenario}.top0")


# ------------------------------------------------------------------ eltwise

def test_eltwise_sum_coeff():
    p = MANIFEST["eltwise_sum_coeff"]
    got = LY.eltwise([nchw("eltwise_sum_coeff.bottom0"),
                      nchw("eltwise_sum_coeff.bottom1")], "sum", p["coeff"])
    check(got, "eltwise_sum_coeff.top0")


def test_eltwise_prod3():
    got = LY.eltwise([nchw(f"eltwise_prod3.bottom{i}") for i in range(3)],
                     "prod")
    check(got, "eltwise_prod3.top0")


def test_eltwise_max():
    got = LY.eltwise([nchw("eltwise_max.bottom0"),
                      nchw("eltwise_max.bottom1")], "max")
    check(got, "eltwise_max.top0")


# ---------------------------------------------------------------------- SPP

def test_spp():
    """The reference flattens each level's [N, C, bins, bins] pooled map
    C-major; ours is [N, bins, bins, C] — compare per level after
    reshaping both to [N, bins, bins, C]."""
    x = nchw("spp_h3_max.bottom0")
    got = np.asarray(LY.spp(x, pyramid_height=3, pool="max"))
    want = L("spp_h3_max.top0")
    n, c = x.shape[0], x.shape[3]
    off_got = off_want = 0
    for level in range(3):
        bins = 2 ** level
        g = got[:, off_got:off_got + bins * bins * c]
        g = g.reshape(n, bins, bins, c)
        w = want[:, off_want:off_want + c * bins * bins]
        w = w.reshape(n, c, bins, bins).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6,
                                   err_msg=f"level {level}")
        off_got += bins * bins * c
        off_want += c * bins * bins


# --------------------------------------------------------------------- losses

@pytest.mark.parametrize("scenario,legacy", [
    ("contrastive", False), ("contrastive_legacy", True)])
def test_contrastive(scenario, legacy):
    a = jnp.asarray(L(f"{scenario}.bottom0").reshape(8, 4))
    b = jnp.asarray(L(f"{scenario}.bottom1").reshape(8, 4))
    y = jnp.asarray(L(f"{scenario}.bottom2").ravel())
    got = LY.contrastive_loss(a, b, y, margin=1.0, legacy=legacy)
    np.testing.assert_allclose(float(got), float(L(f"{scenario}.top0")),
                               rtol=1e-5)


@pytest.mark.parametrize("scenario,norm", [
    ("hinge_l1", "L1"), ("hinge_l2", "L2")])
def test_hinge(scenario, norm):
    scores = jnp.asarray(L(f"{scenario}.bottom0").reshape(8, 5))
    labels = jnp.asarray(L(f"{scenario}.bottom1").ravel().astype(np.int32))
    got = LY.hinge_loss(scores, labels, norm=norm)
    np.testing.assert_allclose(float(got), float(L(f"{scenario}.top0")),
                               rtol=1e-5)


@pytest.mark.parametrize("scenario,top_k,ignore", [
    ("accuracy_top3", 3, None), ("accuracy_ignore2", 1, 2)])
def test_accuracy(scenario, top_k, ignore):
    scores = jnp.asarray(L(f"{scenario}.bottom0").reshape(16, 6))
    labels = jnp.asarray(L(f"{scenario}.bottom1").ravel().astype(np.int32))
    got = LY.accuracy(scores, labels, top_k=top_k, ignore_label=ignore)
    np.testing.assert_allclose(float(got), float(L(f"{scenario}.top0")),
                               rtol=1e-6)

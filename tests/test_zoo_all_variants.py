"""Import EVERY reference model-zoo variant (VERDICT r1 item 4).

Parametrized over all `examples/<dataset>/<model>/` directories in the
reference repo: solver_1st/solver_2nd, trainval_1st/trainval_2nd (cascade
prototxts route through cascade_from_prototxt), and mscnn_deploy import,
plus a tiny-input forward shape check for one representative per dataset
family (full-size forwards live in the TPU bench, not the CPU suite).
"""

import dataclasses
import glob
import os

import pytest

from mscnn_tpu.config import zoo_import as Z

REF = "/root/reference/examples"

VARIANTS = sorted(
    os.path.relpath(d, REF)
    for d in glob.glob(f"{REF}/*/*/")
    if os.path.isfile(os.path.join(d, "trainval_2nd.prototxt"))
)

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference repo not mounted")


def _expected_num_classes(variant):
    ds = variant.split("/")[0]
    return {"kitti_car": 5, "kitti_ped_cyc": 3, "caltech": 2,
            "citypersons": 2, "widerface": 2}[ds]


@needs_ref
def test_variant_census():
    """All five dataset families are present with the README's model count
    (/root/reference/examples: 8+6+3+3+3 model dirs)."""
    families = {}
    for v in VARIANTS:
        families.setdefault(v.split("/")[0], []).append(v)
    assert set(families) == {"kitti_car", "kitti_ped_cyc", "caltech",
                             "citypersons", "widerface"}
    assert len(VARIANTS) >= 22


@needs_ref
@pytest.mark.parametrize("variant", VARIANTS)
def test_solvers_import(variant):
    for stage in ("solver_1st", "solver_2nd"):
        spec = Z.solver_from_prototxt(f"{REF}/{variant}/{stage}.prototxt")
        assert spec.base_lr > 0
        assert spec.max_iter > 0
        assert spec.momentum == 0.9
        assert spec.lr_policy in ("step", "fixed", "exp", "inv", "multistep",
                                  "poly", "sigmoid")


@needs_ref
@pytest.mark.parametrize("variant", VARIANTS)
def test_trainval_1st_imports(variant):
    cfg, tspec, aug, ds, source = Z.model_from_prototxt(
        f"{REF}/{variant}/trainval_1st.prototxt")
    assert cfg.num_classes == _expected_num_classes(variant)
    assert tspec.stage == 1
    assert len(cfg.branches) in (7, 8, 12)
    assert ds.batch_size >= 1
    assert aug.mean_values == (104.0, 117.0, 123.0)


@needs_ref
@pytest.mark.parametrize("variant", VARIANTS)
def test_trainval_2nd_imports(variant):
    path = f"{REF}/{variant}/trainval_2nd.prototxt"
    if Z.is_cascade_prototxt(path):
        assert "cascade" in variant
        casc, tspec, aug, ds, source = Z.cascade_from_prototxt(path)
        cfg = casc.base
        assert len(casc.stages) == 3
        # Cascade-R-CNN staged IoU thresholds (cascade trainval_2nd
        # ProposalTarget fg_thr chain): 0.5/0.6/0.7 on kitti,
        # 0.45/0.65/0.75 on citypersons/widerface
        thrs = [s.fg_thr for s in casc.stages]
        assert thrs in ([0.5, 0.6, 0.7], [0.45, 0.65, 0.75])
    else:
        assert "cascade" not in variant
        cfg, tspec, aug, ds, source = Z.model_from_prototxt(path)
        assert tspec.stage == 2
        assert tspec.sample_mode == "bootstrap"
    assert cfg.num_classes == _expected_num_classes(variant)
    # branch strides are the per-scale downsample rates, ascending
    strides = [b.stride for b in cfg.branches]
    assert strides == sorted(strides)
    assert all(b.field_w > 0 and b.field_h > 0 for b in cfg.branches)
    # "-2x" model names carry the deconv feature-upsample branch
    assert cfg.use_2x_upsample == ("2x" in variant.split("/")[1])


@needs_ref
@pytest.mark.parametrize("variant", VARIANTS)
def test_deploy_imports(variant):
    cfg = Z.deploy_model_from_prototxt(
        f"{REF}/{variant}/mscnn_deploy.prototxt")
    if "cascade" in variant:
        # cascade deploys import as CascadeConfig: stages with the
        # DecodeBBox bbox_stds, ensemble flag from the *_avg blob
        assert len(cfg.stages) == 3
        assert cfg.stages[1].suffix == "_2nd"
        assert cfg.ensemble_avg == (
            "kitti" not in variant)   # KITTI reads plain cls_prob_3rd
        cfg = cfg.base
    assert cfg.num_classes == _expected_num_classes(variant)
    assert cfg.proposal.max_nms_num > 0
    assert len(cfg.branches) in (7, 8, 12)


# One representative per family (+ the two cascade forms) gets a real
# tiny-input forward through init_params/trunk/heads.
FORWARD_REPS = [
    "kitti_car/mscnn-7s-576-2x",
    "kitti_ped_cyc/mscnn-8s-768-trainval",
    "caltech/mscnn-7s-720",
    "citypersons/mscnn-8s-1344-2x",
    "widerface/mscnn-12s-2x",
    "kitti_car/cascade-mscnn-7s-576-2x",
    "widerface/cascade-mscnn-12s-align",
]


@needs_ref
@pytest.mark.parametrize("variant", FORWARD_REPS)
def test_tiny_forward_shapes(variant):
    import jax
    import jax.numpy as jnp
    from mscnn_tpu.models import mscnn as M

    path = f"{REF}/{variant}/trainval_2nd.prototxt"
    if Z.is_cascade_prototxt(path):
        casc, _, _, _, _ = Z.cascade_from_prototxt(path)
        cfg = casc.base
    else:
        cfg, _, _, _, _ = Z.model_from_prototxt(path)
    max_stride = max(b.stride for b in cfg.branches)
    side = 2 * max_stride
    cfg = dataclasses.replace(cfg, input_hw=(side, side))
    params = M.init_params(jax.random.key(0), cfg)
    feats = M.trunk(params, jnp.zeros((1, side, side, 3)), cfg)
    outs = M.heads(params, feats, cfg)
    assert len(outs) == len(cfg.branches)
    for br, out in zip(cfg.branches, outs):
        assert out.shape == (1, side // br.stride, side // br.stride,
                             cfg.num_classes + 4)

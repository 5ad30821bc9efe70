"""Prototxt parsing + model-zoo import. When /root/reference is present, the
importer is checked against the actual reference model zoo files."""

import os

import pytest

from mscnn_tpu.config import prototxt as PB
from mscnn_tpu.config import zoo_import as Z

REF = "/root/reference/examples"


def test_parse_scalars_and_messages():
    msg = PB.parse_prototxt('''
        # a comment
        name: "net"   # trailing comment
        base_lr: 0.001
        max_iter: 100
        mirror: true
        solver_mode: GPU
        layer { name: "a" type: "Convolution"
                convolution_param { kernel_size: 3 num_output: 16 } }
        layer { name: "b" type: "ReLU" bottom: "a" top: "b" }
    ''')
    assert msg["name"] == "net"
    assert msg["base_lr"] == 0.001
    assert msg["max_iter"] == 100
    assert msg["mirror"] is True
    assert msg["solver_mode"] == "GPU"
    ls = PB.layers(msg)
    assert len(ls) == 2
    assert ls[0]["convolution_param"]["kernel_size"] == 3


def test_repeated_fields_and_phase():
    msg = PB.parse_prototxt('''
        layer {
          name: "d" type: "ImageGtData"
          include { phase: TRAIN }
          image_gt_data_param { field_w: 60 field_w: 84 field_w: 120 }
        }
    ''')
    layer = PB.layers(msg)[0]
    assert PB.as_list(layer["image_gt_data_param"]["field_w"]) == [60, 84, 120]
    assert PB.layer_phase(layer) == "TRAIN"


def test_unbalanced_braces_raises():
    with pytest.raises(ValueError):
        PB.parse_prototxt("layer { name: 'x' ")


needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference repo not mounted")


@needs_ref
def test_solver_import_kitti():
    spec = Z.solver_from_prototxt(
        f"{REF}/kitti_car/mscnn-7s-576-2x/solver_2nd.prototxt")
    assert spec.base_lr == 0.0005
    assert spec.lr_policy == "step"
    assert spec.gamma == 0.1
    assert spec.stepsize == 10000
    assert spec.max_iter == 25000
    assert spec.momentum == 0.9
    assert spec.weight_decay == 0.0005
    assert spec.type == "sgd"


@needs_ref
def test_trainval_import_kitti_car():
    cfg, tspec, aug, ds, source = Z.model_from_prototxt(
        f"{REF}/kitti_car/mscnn-7s-576-2x/trainval_2nd.prototxt")
    assert cfg.num_classes == 5
    assert cfg.input_hw == (576, 768)
    assert len(cfg.branches) == 7
    assert [b.stride for b in cfg.branches] == [8, 8, 16, 16, 32, 32, 64]
    assert [b.field_w for b in cfg.branches] == [60, 84, 120, 168, 240, 336, 480]
    assert [b.kernel for b in cfg.branches] == [5, 7, 5, 7, 5, 7, 5]
    assert cfg.branches[0].source == "loss1_conv1"
    assert cfg.branches[2].source == "conv5_3"
    assert cfg.branches[6].source == "pool6"
    assert cfg.use_2x_upsample
    assert cfg.proposal.fg_thr == -8.0
    assert cfg.proposal.max_nms_num == 3000
    assert cfg.bbox_std == (0.1, 0.1, 0.2, 0.2)
    assert not cfg.roi_align

    assert tspec.stage == 2
    assert tspec.sample_mode == "bootstrap"
    assert tspec.pos_neg_weighted
    assert tspec.branch_loss_weight == 0.9
    assert tspec.roi_batch == 256
    assert tspec.roi_bg_thr_hg == 0.49

    assert aug.resize_hw == (576, 1920)
    assert aug.template_hw == (576, 768)
    assert aug.mirror
    assert aug.mean_values == (104.0, 117.0, 123.0)
    assert aug.do_multiple_scale and aug.min_scale == 60 and aug.max_scale == 480
    assert aug.min_gt_height == 35.0

    assert ds.batch_size == 4
    assert ds.shuffle
    assert "kitti" in source


@needs_ref
def test_trainval_import_stage1():
    cfg, tspec, _, _, _ = Z.model_from_prototxt(
        f"{REF}/kitti_car/mscnn-7s-576-2x/trainval_1st.prototxt")
    assert tspec.stage == 1
    assert tspec.sample_mode == "random"
    # the reference keeps pos_neg_weighted on in stage 1 too
    # (trainval_1st.prototxt:394)
    assert tspec.pos_neg_weighted
    assert len(cfg.branches) == 7


@needs_ref
def test_trainval_import_ped_cyc():
    cfg, _, aug, _, _ = Z.model_from_prototxt(
        f"{REF}/kitti_ped_cyc/mscnn-7s-576-2x/trainval_2nd.prototxt")
    assert cfg.num_classes == 3
    ws = [b.field_w for b in cfg.branches]
    hs = [b.field_h for b in cfg.branches]
    assert all(h == 1.5 * w for w, h in zip(ws, hs))


@needs_ref
def test_trainval_import_citypersons_asymmetric():
    cfg, _, aug, _, _ = Z.model_from_prototxt(
        f"{REF}/citypersons/mscnn-8s-1344-2x/trainval_2nd.prototxt")
    assert cfg.num_classes == 2
    assert len(cfg.branches) == 8
    assert cfg.branches[0].kernel == (5, 3)   # kernel_h 5, kernel_w 3
    assert aug.resize_hw == (1344, 2688)
    names = [l[1] for l in cfg.extra_layers]
    assert "loss1_conv1" in names and "conv6_1" in names


@needs_ref
def test_trainval_import_widerface_rpn_trunk():
    cfg, _, aug, _, _ = Z.model_from_prototxt(
        f"{REF}/widerface/mscnn-12s-2x/trainval_2nd.prototxt")
    assert len(cfg.branches) == 12
    assert cfg.branches[0].source == "rpn_1_conv"
    assert aug.resize_hw is None              # native resolution crops
    assert aug.min_gt_width == 8.0
    layers = {l[1]: l for l in cfg.extra_layers}
    assert layers["pool6"][3] == "ave"        # AVE-pooled pool6
    assert layers["rpn_3_conv"][2] == "pool5"
    # the imported config builds and runs at a reduced input size
    import dataclasses
    import jax
    import jax.numpy as jnp
    from mscnn_tpu.models import mscnn as M
    small = dataclasses.replace(cfg, input_hw=(128, 128))
    params = M.init_params(jax.random.key(0), small)
    outs = M.heads(params, M.trunk(params, jnp.zeros((1, 128, 128, 3)),
                                   small), small)
    assert len(outs) == 12


@needs_ref
def test_deploy_import_kitti_car():
    cfg = Z.deploy_model_from_prototxt(
        f"{REF}/kitti_car/mscnn-7s-576-2x/mscnn_deploy.prototxt")
    assert cfg.num_classes == 5
    assert len(cfg.branches) == 7
    assert cfg.proposal.fg_thr == -5.0
    assert cfg.proposal.max_nms_num == 2000
    assert cfg.use_2x_upsample


@needs_ref
def test_config_matches_handwritten_zoo():
    """Imported prototxt config == the hand-written zoo entry."""
    from mscnn_tpu.models import zoo
    cfg, _, _, _, _ = Z.model_from_prototxt(
        f"{REF}/kitti_car/mscnn-7s-576-2x/trainval_2nd.prototxt")
    ours = zoo.kitti_car_7s_576_2x()
    assert cfg.num_classes == ours.num_classes
    assert cfg.input_hw == ours.input_hw
    assert [(b.source, b.kernel, b.stride, b.field_w, b.field_h)
            for b in cfg.branches] == \
           [(b.source, b.kernel, b.stride, b.field_w, b.field_h)
            for b in ours.branches]
    assert cfg.proposal.fg_thr == ours.proposal.fg_thr
    assert cfg.proposal.iou_thr == ours.proposal.iou_thr


@needs_ref
def test_cascade_import_kitti():
    cfg_c, tspec, aug, ds, source = Z.cascade_from_prototxt(
        f"{REF}/kitti_car/cascade-mscnn-7s-576-2x/trainval_2nd.prototxt")
    assert Z.is_cascade_prototxt(
        f"{REF}/kitti_car/cascade-mscnn-7s-576-2x/trainval_2nd.prototxt")
    assert not Z.is_cascade_prototxt(
        f"{REF}/kitti_car/mscnn-7s-576-2x/trainval_2nd.prototxt")
    stages = cfg_c.stages
    assert len(stages) == 3
    assert [s.fg_thr for s in stages] == [0.5, 0.6, 0.7]
    assert [s.bg_thr_lw for s in stages] == [0.1, 0.0, 0.0]
    assert stages[1].bbox_std == (0.05, 0.05, 0.1, 0.1)
    assert stages[2].bbox_std == (0.033, 0.033, 0.067, 0.067)
    assert [s.loss_weight for s in stages] == [1.0, 0.5, 0.25]
    assert [s.keep_all for s in stages] == [False, True, True]
    assert [s.lr_mult for s in stages] == [1.0, 2.0, 4.0]
    assert cfg_c.base.num_classes == 5


@needs_ref
def test_8s_768_import_matches_zoo():
    """The BASELINE benchmark model imports with the right geometry and
    matches the hand-written zoo entry."""
    from mscnn_tpu.models import zoo
    cfg, _, aug, _, _ = Z.model_from_prototxt(
        f"{REF}/kitti_car/mscnn-8s-768-trainval/trainval_2nd.prototxt")
    assert len(cfg.branches) == 8
    assert not cfg.use_2x_upsample
    assert cfg.roi_spatial_scale == 0.125
    assert aug.resize_hw == (768, 2560)
    ours = zoo.kitti_car_8s_768()
    assert [(b.source, b.kernel, b.stride, b.field_w) for b in cfg.branches] \
        == [(b.source, b.kernel, b.stride, b.field_w) for b in ours.branches]
    assert cfg.input_hw == ours.input_hw
    assert cfg.roi_spatial_scale == ours.roi_spatial_scale


@needs_ref
def test_7s_384_import_matches_zoo():
    from mscnn_tpu.models import zoo
    cfg, _, _, _, _ = Z.model_from_prototxt(
        f"{REF}/kitti_car/mscnn-7s-384/trainval_2nd.prototxt")
    ours = zoo.kitti_car_7s_384()
    assert [(b.field_w, b.stride) for b in cfg.branches] == \
        [(b.field_w, b.stride) for b in ours.branches]
    assert cfg.input_hw == ours.input_hw
    assert not cfg.use_2x_upsample


@needs_ref
def test_phase_filtering_selects_test_params():
    """NetState filtering: TEST phase picks the eval-time data/sampling
    params (batch 2, roi batch 128; trainval_2nd.prototxt:76-112,1058)."""
    _, ts_tr, _, ds_tr, _ = Z.model_from_prototxt(
        f"{REF}/kitti_car/mscnn-7s-576-2x/trainval_2nd.prototxt")
    _, ts_te, _, ds_te, _ = Z.model_from_prototxt(
        f"{REF}/kitti_car/mscnn-7s-576-2x/trainval_2nd.prototxt",
        phase="TEST")
    assert ds_tr.batch_size == 4 and ds_te.batch_size == 2
    assert ts_tr.roi_batch == 256 and ts_te.roi_batch == 128

"""Model zoo: configs matching the reference's example prototxts.

Variant matrix from /root/reference/examples/*/; anchor fields, strides and
class counts mirror each dataset's trainval_2nd.prototxt (see SURVEY.md
section 2.6b). Deploy variants widen the input and use the deploy-time
BoxOutput parameters (fg_thr -5, max_nms_num 2000).
"""

from __future__ import annotations

import dataclasses

from mscnn_tpu.models.mscnn import BranchSpec, MSCNNConfig, ProposalSpec


def _branches(fields_w, fields_h, strides, kernels, sources):
    out = []
    counters = {}
    for fw, fh, st, k, src in zip(fields_w, fields_h, strides, kernels, sources):
        group = counters.setdefault(src, len(counters) + 1)
        out.append(BranchSpec(f"LFCN_{group}_{k}x{k}", src, k, st, fw, fh))
    return tuple(out)


_SOURCES_7S = ("loss1_conv1", "loss1_conv1", "conv5_3", "conv5_3",
               "conv6_1", "conv6_1", "pool6")
_STRIDES_7S = (8, 8, 16, 16, 32, 32, 64)
_KERNELS_7S = (5, 7, 5, 7, 5, 7, 5)


def kitti_car_7s_576_2x(*, deploy: bool = False, max_out: int = 512) -> MSCNNConfig:
    """kitti_car/mscnn-7s-576-2x: 5 classes, 7 square anchor fields 60-480."""
    fields = (60.0, 84.0, 120.0, 168.0, 240.0, 336.0, 480.0)
    prop = ProposalSpec(
        fg_thr=-5.0 if deploy else -8.0,
        iou_thr=0.65, nms_mode="iou",
        max_nms_num=2000 if deploy else 3000,
        max_out=max_out, min_size=15.0,
    )
    return MSCNNConfig(
        name="kitti_car/mscnn-7s-576-2x",
        num_classes=5,
        input_hw=(576, 1920) if deploy else (576, 768),
        branches=_branches(fields, fields, _STRIDES_7S, _KERNELS_7S, _SOURCES_7S),
        proposal=prop,
    )


def kitti_ped_cyc_7s_576_2x(*, deploy: bool = False, max_out: int = 512) -> MSCNNConfig:
    """kitti_ped_cyc/mscnn-7s-576-2x: 3 classes, tall 1.5:1 anchor fields."""
    fw = (40.0, 56.0, 80.0, 112.0, 160.0, 224.0, 320.0)
    fh = (60.0, 84.0, 120.0, 168.0, 240.0, 336.0, 480.0)
    prop = ProposalSpec(
        fg_thr=-5.0 if deploy else -8.0,
        iou_thr=0.65, nms_mode="iou",
        max_nms_num=2000 if deploy else 3000,
        max_out=max_out, min_size=15.0,
    )
    return MSCNNConfig(
        name="kitti_ped_cyc/mscnn-7s-576-2x",
        num_classes=3,
        input_hw=(576, 1920) if deploy else (576, 768),
        branches=_branches(fw, fh, _STRIDES_7S, _KERNELS_7S, _SOURCES_7S),
        proposal=prop,
    )


def caltech_7s_480_2x(*, deploy: bool = False, max_out: int = 512) -> MSCNNConfig:
    """caltech/mscnn-7s-480-2x: pedestrians, 2:1 anchor fields."""
    fw = (20.0, 28.0, 40.0, 56.0, 80.0, 112.0, 160.0)
    fh = (40.0, 56.0, 80.0, 112.0, 160.0, 224.0, 320.0)
    prop = ProposalSpec(
        fg_thr=-5.0 if deploy else -8.0,
        iou_thr=0.65, nms_mode="iou",
        max_nms_num=2000 if deploy else 3000,
        max_out=max_out, min_size=8.0,
    )
    return MSCNNConfig(
        name="caltech/mscnn-7s-480-2x",
        num_classes=2,
        input_hw=(480, 640) if deploy else (448, 448),
        branches=_branches(fw, fh, _STRIDES_7S, _KERNELS_7S, _SOURCES_7S),
        proposal=prop,
    )


def tiny_test_config(num_classes: int = 3, max_out: int = 32) -> MSCNNConfig:
    """Small config for unit tests: 2 branches, 64x96 input."""
    branches = (
        BranchSpec("LFCN_1_5x5", "loss1_conv1", 5, 8, 24.0, 24.0),
        BranchSpec("LFCN_2_5x5", "conv5_3", 5, 16, 48.0, 48.0),
    )
    prop = ProposalSpec(fg_thr=-8.0, iou_thr=0.65, max_nms_num=64,
                        max_out=max_out, min_size=4.0)
    return MSCNNConfig(
        name="tiny-test", num_classes=num_classes, input_hw=(64, 96),
        branches=branches, proposal=prop,
    )


REGISTRY = {
    "kitti_car/mscnn-7s-576-2x": kitti_car_7s_576_2x,
    "kitti_ped_cyc/mscnn-7s-576-2x": kitti_ped_cyc_7s_576_2x,
    "caltech/mscnn-7s-480-2x": caltech_7s_480_2x,
}


def get(name: str, **kwargs) -> MSCNNConfig:
    return REGISTRY[name](**kwargs)


def with_dtype(cfg: MSCNNConfig, compute_dtype: str) -> MSCNNConfig:
    return dataclasses.replace(cfg, compute_dtype=compute_dtype)

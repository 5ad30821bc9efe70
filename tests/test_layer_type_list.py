"""Parity with pycaffe's caffe.layer_type_list()
(/root/reference/python/caffe/test/test_layer_type_list.py): the
framework enumerates every layer type it can execute.
"""

import re

import mscnn_tpu
from mscnn_tpu.models import netbuilder as NB


def test_standard_types_listed():
    # the reference test's exact check, plus the MS-CNN custom layers
    types = mscnn_tpu.layer_type_list()
    assert "Convolution" in types
    for t in ("InnerProduct", "Pooling", "ReLU", "SoftmaxWithLoss",
              "Python", "LSTM", "DetectionLoss", "BoxOutput",
              "ProposalTarget", "ROIPooling", "ROIAlign", "DecodeBBox",
              "ImageGtData"):
        assert t in types, t
    assert types == sorted(types)
    assert len(types) == len(set(types))


def test_list_covers_builder_dispatch():
    """Every type the builder's source dispatches on is advertised."""
    with open(NB.__file__) as f:
        src = f.read()
    # ltype == "X"  /  ltype in ("X", "Y", ...)
    listed = set(mscnn_tpu.layer_type_list())
    for m in re.finditer(r'ltype == "(\w+)"', src):
        assert m.group(1) in listed, m.group(1)
    for m in re.finditer(r'ltype in \(([^)]*)\)', src):
        for t in re.findall(r'"(\w+)"', m.group(1)):
            assert t in listed, t


def test_all_listed_types_have_a_handler():
    """No advertised type is vapor: it must appear in the builder's
    dispatch/tables or in the detection-path modules."""
    with open(NB.__file__) as f:
        nb_src = f.read()
    from mscnn_tpu.config import zoo_import
    from mscnn_tpu.models import cascade, mscnn
    from mscnn_tpu.ops import losses, roi
    other = ""
    for mod in (zoo_import, mscnn, cascade, losses, roi):
        with open(mod.__file__) as f:
            other += f.read()
    for t in mscnn_tpu.layer_type_list():
        assert (f'"{t}"' in nb_src or t in other), t

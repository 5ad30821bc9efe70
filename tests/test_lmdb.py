"""Pure-Python LMDB (io/lmdb.py): on-disk format round-trip, Datum wire
round-trip, the Data-layer ingestion path, and the convert_imageset
migration flows (util/db_lmdb.cpp:1-113, data_reader.cpp:1-119,
tools/convert_imageset.cpp:95-124).

No liblmdb exists in this container, so cross-validation against the C
library is impossible here; the writer and reader implement mdb.c's
documented layout independently of each other's in-memory structures
(reader: mmap walk; writer: bottom-up bulk build) and the structural
assertions below check the format invariants (meta magic/version, page
flags, sorted keys, overflow chains) rather than just writer==reader.
"""

import os
import struct

import numpy as np
import pytest

from mscnn_tpu.io import lmdb as L


def _fill(tmp_path, items, name="env"):
    p = str(tmp_path / name)
    with L.LMDBWriter(p) as db:
        for k, v in items:
            db.put(k, v)
    return p


def test_roundtrip_small(tmp_path):
    items = [(f"k{i:03d}".encode(), bytes([i]) * (i + 1)) for i in range(20)]
    p = _fill(tmp_path, items[::-1])  # unsorted insertion order
    with L.LMDBReader(p) as db:
        got = list(db.items())
        assert len(db) == 20
    assert got == sorted(items)       # cursor walks in key order


def test_roundtrip_multilevel_tree(tmp_path):
    """2000 records forces multiple leaves + at least one branch level."""
    items = [(f"{i:08d}_img.png".encode(), os.urandom(40 + i % 160))
             for i in range(2000)]
    p = _fill(tmp_path, items)
    with L.LMDBReader(p) as db:
        assert db.main.depth >= 2
        got = list(db.items())
    assert got == sorted(items)


def test_roundtrip_overflow_values(tmp_path):
    """Values above half a page go to overflow chains (F_BIGDATA)."""
    rng = np.random.RandomState(0)
    items = [(f"big{i}".encode(), rng.bytes(3000 + 5000 * i))
             for i in range(4)]
    p = _fill(tmp_path, items)
    with L.LMDBReader(p) as db:
        got = dict(db.items())
    for k, v in items:
        assert got[k] == v, k


def test_on_disk_format_invariants(tmp_path):
    p = _fill(tmp_path, [(b"a", b"1"), (b"b", b"2")])
    raw = open(os.path.join(p, "data.mdb"), "rb").read()
    # meta pages 0/1: P_META flag, MDB_MAGIC, data version 1
    for pg in (0, 1):
        pgno, _, flags, _, _ = struct.unpack_from("<QHHHH", raw, pg * 4096)
        assert pgno == pg and flags & 0x08
        magic, version = struct.unpack_from("<II", raw, pg * 4096 + 16)
        assert magic == 0xBEEFC0DE and version == 1
    # page 2 is the leaf root: P_LEAF
    _, _, flags, lower, upper = struct.unpack_from("<QHHHH", raw, 2 * 4096)
    assert flags & 0x02
    assert lower == 16 + 2 * 2 and upper <= 4096
    assert os.path.exists(os.path.join(p, "lock.mdb"))


def test_reader_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.mdb"
    bad.write_bytes(b"\x00" * 8192)
    with pytest.raises(L.LMDBError):
        L.LMDBReader(str(bad))


def test_writer_rejects_duplicates_and_long_keys(tmp_path):
    w = L.LMDBWriter(str(tmp_path / "dup"))
    w.put(b"k", b"1")
    w.put(b"k", b"2")
    with pytest.raises(L.LMDBError, match="duplicate"):
        w.close()
    with pytest.raises(L.LMDBError, match="maxkeysize"):
        L.LMDBWriter(str(tmp_path / "lk")).put(b"x" * 512, b"")


def test_datum_roundtrip():
    img = np.arange(2 * 4 * 5, dtype=np.uint8).reshape(2, 4, 5)
    d = L.Datum(channels=2, height=4, width=5, data=img.tobytes(), label=7)
    d2 = L.decode_datum(L.encode_datum(d))
    assert (d2.channels, d2.height, d2.width, d2.label) == (2, 4, 5, 7)
    np.testing.assert_array_equal(d2.array(), img)
    df = L.Datum(channels=1, height=1, width=3,
                 float_data=(1.5, -2.0, 0.25), label=1)
    df2 = L.decode_datum(L.encode_datum(df))
    assert df2.float_data == (1.5, -2.0, 0.25)
    np.testing.assert_array_equal(df2.array().ravel(), [1.5, -2.0, 0.25])


def _caffe_style_env(tmp_path, n=12, hw=(6, 8)):
    """An LMDB shaped like convert_imageset output: raw BGR Datums."""
    rng = np.random.RandomState(1)
    p = str(tmp_path / "caffe_lmdb")
    truth = []
    with L.LMDBWriter(p) as db:
        for i in range(n):
            chw = rng.randint(0, 255, (3,) + hw, dtype=np.uint8)
            d = L.Datum(channels=3, height=hw[0], width=hw[1],
                        data=chw.tobytes(), label=i % 4)
            db.put(f"{i:08d}_im{i}.jpg".encode(), L.encode_datum(d))
            truth.append((chw, i % 4))
    return p, truth


def test_lmdb_dataset_batches(tmp_path):
    from mscnn_tpu.data import sources as SRC
    p, truth = _caffe_style_env(tmp_path)
    ds = SRC.LMDBDataset(p, batch_size=5, seed=0)
    assert len(ds) == 12
    b = ds.next_batch(train=False)
    assert b["data"].shape == (5, 6, 8, 3)
    assert b["data"].dtype == np.float32
    np.testing.assert_array_equal(
        b["data"][0], truth[0][0].transpose(1, 2, 0).astype(np.float32))
    np.testing.assert_array_equal(b["label"], [t[1] for t in truth[:5]])
    # cyclic wrap (data_reader.cpp wraps the cursor)
    ds.next_batch(train=False)
    b3 = ds.next_batch(train=False)
    np.testing.assert_array_equal(b3["label"],
                                  [truth[i % 12][1] for i in range(10, 15)])
    ds.close()


def test_generic_train_on_lmdb(tmp_path):
    """A prototxt `Data` layer trains end-to-end from an LMDB env."""
    import jax

    from mscnn_tpu.models.netbuilder import Net
    from mscnn_tpu.train import generic as G
    from mscnn_tpu.train import solver as S

    p, _ = _caffe_style_env(tmp_path, n=16)
    net_txt = f"""
name: "lmdbnet"
layer {{ name: "data" type: "Data" top: "data" top: "label"
  data_param {{ source: "{p}" backend: LMDB batch_size: 8 }}
  transform_param {{ scale: 0.00390625 }} }}
layer {{ name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
  inner_product_param {{ num_output: 4
    weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
  top: "loss" }}
"""
    probe = Net(net_txt, phase="TRAIN")
    src = G.make_batch_source(probe, G.find_data_layer(probe))
    b = src()
    assert b["data"].shape == (8, 6, 8, 3)
    assert float(np.abs(b["data"]).max()) <= 1.0  # scale applied
    net = Net(net_txt, phase="TRAIN",
              input_shapes={k: tuple(v.shape) for k, v in b.items()})
    step = G.make_train_step(net, S.SolverSpec(base_lr=0.05,
                                               lr_policy="fixed"))
    params = net.init(jax.random.key(0))
    state = {"params": params, "solver": S.init_state(params, S.SolverSpec(
        base_lr=0.05, lr_policy="fixed"))}
    losses = []
    for i in range(8):
        state, m = step(state, src(), jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0]


def test_convert_imageset_lmdb_backends(tmp_path):
    """images -> LMDB -> record shard migration through the CLI."""
    import cv2

    from mscnn_tpu import cli
    from mscnn_tpu.data import records as R

    rng = np.random.RandomState(2)
    lst = tmp_path / "list.txt"
    lines = []
    for i in range(4):
        img = rng.randint(0, 255, (10, 12, 3), dtype=np.uint8)
        f = tmp_path / f"im{i}.png"
        cv2.imwrite(str(f), img)
        lines.append(f"{f} {i}")
    lst.write_text("\n".join(lines) + "\n")

    env = tmp_path / "out_lmdb"
    rc = cli.main(["convert_imageset", "--listfile", str(lst),
                   "--backend", "lmdb", "-o", str(env)])
    assert rc == 0
    got = list(L.iter_datums(str(env)))
    assert len(got) == 4
    assert [d.label for _, d in got] == [0, 1, 2, 3]
    img0 = cv2.imread(str(tmp_path / "im0.png"), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(got[0][1].array(),
                                  img0.transpose(2, 0, 1))

    shard = tmp_path / "migrated.rec"
    rc = cli.main(["convert_imageset", "--from-lmdb", str(env),
                   "-o", str(shard)])
    assert rc == 0
    rs = R.RecordShard(str(shard))
    assert len(rs) == 4
    np.testing.assert_array_equal(rs.read_image(0), img0)
    rs.close()

"""Pure-Python LevelDB (io/leveldb.py): on-disk format round-trip, snappy
block decode, the Data-layer ingestion path, and the convert_imageset
migration flows (util/db_leveldb.cpp:1-23, data_reader.cpp:1-119,
tools/convert_imageset.cpp:95-124).

No leveldb library exists in this container, so cross-validation against
the C++ library is impossible here; like tests/test_lmdb.py, the
structural assertions below check format invariants (table magic, block
trailers and restart arrays, masked crc32c, log fragmentation, MANIFEST
VersionEdit tags) rather than just writer==reader, and the snappy decoder
is additionally pinned against hand-assembled streams exercising copy ops
the literal-only writer never emits.
"""

import os
import struct

import numpy as np
import pytest

from mscnn_tpu.io import leveldb as LDB
from mscnn_tpu.io import lmdb as L  # Datum codec (format-neutral)


def _fill(tmp_path, items, name="db", **kw):
    p = str(tmp_path / name)
    with LDB.LevelDBWriter(p, **kw) as db:
        for k, v in items:
            db.put(k, v)
    return p


def test_roundtrip_small(tmp_path):
    items = [(f"k{i:03d}".encode(), bytes([i]) * (i + 1)) for i in range(20)]
    p = _fill(tmp_path, items[::-1])  # unsorted insertion order
    with LDB.LevelDBReader(p, verify_checksums=True) as db:
        got = list(db.items())
        assert len(db) == 20
    assert got == sorted(items)       # cursor walks in key order


def test_roundtrip_large_values_and_many_blocks(tmp_path):
    """Values larger than a data block and enough keys for several blocks
    + several restart intervals; compressed and uncompressed variants."""
    rng = np.random.RandomState(0)
    items = [(f"{i:08d}_im".encode(), rng.bytes(int(rng.randint(10, 9000))))
             for i in range(150)]
    for compress in (True, False):
        p = _fill(tmp_path, items, name=f"db_{compress}", compress=compress,
                  log_tail=5)
        with LDB.LevelDBReader(p, verify_checksums=True) as db:
            assert list(db.items()) == sorted(items)


def test_log_only_db(tmp_path):
    """A DB whose entries all still sit in the tail log (memtable never
    flushed — what a small freshly-written leveldb looks like)."""
    items = [(b"a", b"1"), (b"b", b"2"), (b"c", b"3")]
    p = _fill(tmp_path, items, log_tail=99)
    assert not any(f.endswith(".ldb") for f in os.listdir(p))
    with LDB.LevelDBReader(p, verify_checksums=True) as db:
        assert list(db.items()) == items


def test_log_record_fragmentation():
    """Records larger than the 32 KiB log block split into FIRST/MIDDLE/
    LAST fragments and reassemble."""
    rec = bytes(range(256)) * 400           # ~100 KiB > 3 blocks
    data = LDB._log_write([b"small", rec, b"tail"])
    assert len(data) > 3 * 32768
    got = list(LDB._log_records(data, verify=True))
    assert got == [b"small", rec, b"tail"]


def test_on_disk_format_invariants(tmp_path):
    items = [(f"key{i:04d}".encode(), b"v" * i) for i in range(40)]
    p = _fill(tmp_path, items, compress=False, log_tail=2)
    # CURRENT names the manifest
    assert (open(os.path.join(p, "CURRENT"), "rb").read()
            == b"MANIFEST-000002\n")
    table = open(os.path.join(p, "000005.ldb"), "rb").read()
    # footer magic (table/format.h kTableMagicNumber)
    assert struct.unpack("<Q", table[-8:])[0] == 0xDB4775248B80FB57
    # every entry of every data block carries an 8-byte internal-key
    # trailer with kTypeValue
    n = 0
    for k, seq, t, v in LDB._iter_table(table, verify=True):
        assert t == 1
        n += 1
    assert n == 38  # 40 minus the 2 log-tail entries
    # MANIFEST decodes as VersionEdits naming the table at level 0
    manifest = open(os.path.join(p, "MANIFEST-000002"), "rb").read()
    v = LDB._read_manifest(manifest, verify=True)
    assert v.files[0] == [(5, len(table))]
    assert v.log_number == 3


def test_snappy_copy_ops():
    """Decoder handles all three copy encodings + overlapping copies —
    paths a literal-only compressor never produces, pinned against
    hand-assembled streams (snappy format_description.txt)."""
    # 'abab' literal then copy1(len=4, offset=4) -> 'abababab'
    s = bytes([8, (4 - 1) << 2]) + b"abab" + bytes([(0 << 2) | 1, 4])
    assert LDB.snappy_decompress(s) == b"abababab"
    # overlapping copy: 'ab' then copy1(len=6, offset=2) -> 'abababab'
    s = bytes([8, (2 - 1) << 2]) + b"ab" + bytes([(2 << 2) | 1, 2])
    assert LDB.snappy_decompress(s) == b"abababab"
    # copy2: 70-byte literal, copy2(len=64 — the 6-bit tag max, offset=70);
    # 134 needs a 2-byte varint preamble
    lit = bytes(range(70))
    s = LDB._put_varint(134) + bytes([60 << 2, 69]) + lit \
        + bytes([((64 - 1) << 2) | 2]) + struct.pack("<H", 70)
    assert LDB.snappy_decompress(s) == lit + lit[:64]
    # copy4
    s = bytes([8, (4 - 1) << 2]) + b"wxyz" \
        + bytes([((4 - 1) << 2) | 3]) + struct.pack("<I", 4)
    assert LDB.snappy_decompress(s) == b"wxyzwxyz"
    # round-trip through the literal-only compressor at every length class
    for n in (1, 59, 60, 61, 200, 257, 70000):
        data = bytes(np.random.RandomState(n % 97).bytes(n))
        assert LDB.snappy_decompress(
            LDB._snappy_compress_literal(data)) == data


def test_reader_rejects_garbage(tmp_path):
    d = tmp_path / "not_a_db"
    d.mkdir()
    with pytest.raises(LDB.LevelDBError):
        LDB.LevelDBReader(str(d))
    (d / "CURRENT").write_bytes(b"MANIFEST-000002\n")
    # a well-framed log record that is not a valid VersionEdit
    (d / "MANIFEST-000002").write_bytes(LDB._log_write([b"\xff\xff\x7f"]))
    with pytest.raises(LDB.LevelDBError):
        LDB.LevelDBReader(str(d))


def test_deletion_and_overwrite_semantics(tmp_path):
    """Newest sequence wins; deletions drop keys — exercised through a
    hand-written tail log over a table (the merge path a real compacting
    leveldb produces)."""
    p = _fill(tmp_path, [(b"a", b"old"), (b"b", b"keep"), (b"c", b"dead")],
              log_tail=0)
    # append a log with: overwrite a, delete c, insert d
    recs = []
    body = struct.pack("<Q", 100) + struct.pack("<I", 3)
    body += bytes([1]) + bytes([1]) + b"a" + bytes([3]) + b"new"
    body += bytes([0]) + bytes([1]) + b"c"
    body += bytes([1]) + bytes([1]) + b"d" + bytes([2]) + b"dd"
    recs.append(body)
    with open(os.path.join(p, "000007.log"), "wb") as f:
        f.write(LDB._log_write(recs))
    with LDB.LevelDBReader(p, verify_checksums=True) as db:
        assert list(db.items()) == [(b"a", b"new"), (b"b", b"keep"),
                                    (b"d", b"dd")]


def _caffe_style_db(tmp_path, n=12, hw=(6, 8)):
    """A LevelDB shaped like convert_imageset output: raw BGR Datums."""
    rng = np.random.RandomState(1)
    p = str(tmp_path / "caffe_leveldb")
    truth = []
    with LDB.LevelDBWriter(p) as db:
        for i in range(n):
            chw = rng.randint(0, 255, (3,) + hw, dtype=np.uint8)
            d = L.Datum(channels=3, height=hw[0], width=hw[1],
                        data=chw.tobytes(), label=i % 4)
            db.put(f"{i:08d}_im{i}.jpg".encode(), L.encode_datum(d))
            truth.append((chw, i % 4))
    return p, truth


def test_leveldb_dataset_batches(tmp_path):
    from mscnn_tpu.data import sources as SRC
    p, truth = _caffe_style_db(tmp_path)
    ds = SRC.LevelDBDataset(p, batch_size=5, seed=0)
    assert len(ds) == 12
    b = ds.next_batch(train=False)
    assert b["data"].shape == (5, 6, 8, 3)
    np.testing.assert_array_equal(
        b["data"][0], truth[0][0].transpose(1, 2, 0).astype(np.float32))
    np.testing.assert_array_equal(b["label"], [t[1] for t in truth[:5]])
    ds.close()


def test_generic_train_on_leveldb(tmp_path):
    """A prototxt `Data` layer with backend LEVELDB trains end-to-end
    from a LevelDB directory — the path that previously raised with
    convert-first advice."""
    import jax

    from mscnn_tpu.models.netbuilder import Net
    from mscnn_tpu.train import generic as G
    from mscnn_tpu.train import solver as S

    p, _ = _caffe_style_db(tmp_path, n=16)
    net_txt = f"""
name: "ldbnet"
layer {{ name: "data" type: "Data" top: "data" top: "label"
  data_param {{ source: "{p}" backend: LEVELDB batch_size: 8 }}
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
    assert float(np.abs(b["data"]).max()) <= 1.0
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


def test_convert_imageset_leveldb_backends(tmp_path):
    """images -> LevelDB -> record shard migration through the CLI."""
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

    db = tmp_path / "out_leveldb"
    rc = cli.main(["convert_imageset", "--listfile", str(lst),
                   "--backend", "leveldb", "-o", str(db)])
    assert rc == 0
    with LDB.LevelDBReader(str(db)) as r:
        got = [(k, L.decode_datum(v)) for k, v in r.items()]
    assert len(got) == 4
    assert [d.label for _, d in got] == [0, 1, 2, 3]
    img0 = cv2.imread(str(tmp_path / "im0.png"), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(got[0][1].array(),
                                  img0.transpose(2, 0, 1))

    shard = tmp_path / "migrated.rec"
    rc = cli.main(["convert_imageset", "--from-leveldb", str(db),
                   "-o", str(shard)])
    assert rc == 0
    rs = R.RecordShard(str(shard))
    assert len(rs) == 4

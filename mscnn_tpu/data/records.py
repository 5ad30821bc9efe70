"""Packed record shards: the LMDB/LevelDB-equivalent sequential data path.

The reference streams training data from packed key-value databases so input
is one sequential read instead of one filesystem open per image
(/root/reference/src/caffe/data_reader.cpp:1-119, util/db_lmdb.cpp). This is
the TPU-native counterpart: a single-file shard holding each sample's
encoded image bytes (as on disk — no re-encode, lossless) plus its window
annotations (gts/ronis), with an offset index in the footer for O(1) random
access during shuffled epochs. Written by `mscnn convert_imageset`
(tools/convert_imageset.cpp analog); consumed by both the Python pipeline
(RecordShard.dataset) and the native C++ loader (records= path).

Wire layout (little-endian):
  header  := "MSCR" u32 version(=1)
  record  := u32 meta_len, meta, u32 img_len, img_bytes
  meta    := u16 path_len, path utf-8, u16 channels, u32 height, u32 width,
             u32 num_gts, num_gts * 6 f32 (label, ignore, x1, y1, x2, y2),
             u32 num_ronis, num_ronis * 4 f32 (x1, y1, x2, y2)
  footer  := u64 offsets[count] (absolute offset of each record), u64 count,
             "MSCX"
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mscnn_tpu.data import window_file as W

MAGIC = b"MSCR"
END_MAGIC = b"MSCX"
VERSION = 1


def _pack_meta(im: W.WindowImage) -> bytes:
    path = im.path.encode("utf-8")
    parts = [struct.pack("<H", len(path)), path,
             struct.pack("<HII", im.channels, im.height, im.width)]
    gts = np.ascontiguousarray(im.gts, np.float32).reshape(-1, 6)
    parts.append(struct.pack("<I", gts.shape[0]))
    parts.append(gts.astype("<f4").tobytes())
    ronis = np.ascontiguousarray(im.ronis, np.float32).reshape(-1, 4)
    parts.append(struct.pack("<I", ronis.shape[0]))
    parts.append(ronis.astype("<f4").tobytes())
    return b"".join(parts)


def _unpack_meta(buf: bytes) -> W.WindowImage:
    pos = 0
    (plen,) = struct.unpack_from("<H", buf, pos)
    pos += 2
    path = buf[pos: pos + plen].decode("utf-8")
    pos += plen
    channels, height, width = struct.unpack_from("<HII", buf, pos)
    pos += 10
    (ng,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    gts = np.frombuffer(buf, "<f4", ng * 6, pos).reshape(ng, 6).copy()
    pos += ng * 24
    (nr,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    ronis = np.frombuffer(buf, "<f4", nr * 4, pos).reshape(nr, 4).copy()
    return W.WindowImage(path, channels, height, width, gts, ronis)


def write_records(path: str, images: Sequence[W.WindowImage],
                  root_folder: str = "", *,
                  encode: Optional[str] = None, quality: int = 95) -> int:
    """Pack window images + their on-disk encoded bytes into one shard.

    encode=None stores the original file bytes unchanged (lossless, no
    decode). encode=".png"/".jpg" re-encodes through OpenCV (the reference
    tool's --encode_type), e.g. to normalize formats or trade size.
    Returns the record count.
    """
    offsets: List[int] = []
    with open(path, "wb") as f:
        f.write(MAGIC + struct.pack("<I", VERSION))
        for im in images:
            src = os.path.join(root_folder, im.path) if root_folder else im.path
            if encode is None:
                with open(src, "rb") as imf:
                    img_bytes = imf.read()
            else:
                import cv2
                arr = cv2.imread(src, cv2.IMREAD_COLOR)
                if arr is None:
                    raise FileNotFoundError(f"could not read image {src}")
                flags = ([cv2.IMWRITE_JPEG_QUALITY, quality]
                         if encode in (".jpg", ".jpeg") else [])
                ok, enc = cv2.imencode(encode, arr, flags)
                if not ok:
                    raise ValueError(f"could not encode {src} as {encode}")
                img_bytes = enc.tobytes()
            meta = _pack_meta(im)
            offsets.append(f.tell())
            f.write(struct.pack("<I", len(meta)))
            f.write(meta)
            f.write(struct.pack("<I", len(img_bytes)))
            f.write(img_bytes)
        for off in offsets:
            f.write(struct.pack("<Q", off))
        f.write(struct.pack("<Q", len(offsets)))
        f.write(END_MAGIC)
    return len(offsets)


class RecordShard:
    """Random-access reader over one packed shard.

    `images` carries the annotations (same WindowImage type the window-file
    parser yields); `read_image(i)` decodes record i's image bytes.
    """

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        head = self._f.read(8)
        if head[:4] != MAGIC:
            raise ValueError(f"{path}: not a record shard (bad magic)")
        (version,) = struct.unpack("<I", head[4:])
        if version != VERSION:
            raise ValueError(f"{path}: unsupported shard version {version}")
        self._f.seek(-12, os.SEEK_END)
        tail = self._f.read(12)
        if tail[8:] != END_MAGIC:
            raise ValueError(f"{path}: truncated shard (bad end magic)")
        (count,) = struct.unpack("<Q", tail[:8])
        self._f.seek(-(12 + 8 * count), os.SEEK_END)
        self._offsets = list(struct.unpack(f"<{count}Q",
                                           self._f.read(8 * count)))
        self.images: List[W.WindowImage] = []
        self._img_spans: List[Tuple[int, int]] = []
        for off in self._offsets:
            self._f.seek(off)
            (meta_len,) = struct.unpack("<I", self._f.read(4))
            meta = self._f.read(meta_len)
            (img_len,) = struct.unpack("<I", self._f.read(4))
            self._img_spans.append((self._f.tell(), img_len))
            self.images.append(_unpack_meta(meta))

    def __len__(self) -> int:
        return len(self.images)

    def read_bytes(self, i: int) -> bytes:
        off, n = self._img_spans[i]
        return os.pread(self._f.fileno(), n, off)

    def read_image(self, i: int) -> np.ndarray:
        import cv2
        arr = cv2.imdecode(np.frombuffer(self.read_bytes(i), np.uint8),
                           cv2.IMREAD_COLOR)
        if arr is None:
            raise ValueError(f"record {i}: image bytes failed to decode")
        return arr

    def close(self):
        self._f.close()

    def dataset(self, aug, spec):
        """MSCNNDataset view over the shard (images decoded from the pack,
        never from the filesystem)."""
        from mscnn_tpu.data import pipeline as P

        return P.MSCNNDataset(self.images, aug, spec,
                              index_loader=self.read_image)

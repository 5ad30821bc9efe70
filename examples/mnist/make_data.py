"""Generate an MNIST-shaped dataset for the LeNet example.

The container has no MNIST download path (zero egress), so this renders
digit glyphs with cv2 at random shift/scale/thickness into 28x28 gray
images — a stand-in with the same tensor shapes and a learnable
10-class problem.  Writes train.h5 / test.h5 (+ the HDF5Data listing
files) next to this script; when real MNIST is available, convert it
with `mscnn convert_imageset` or write the same /data /label layout.

Usage: python examples/mnist/make_data.py [--train N] [--test N]
"""

import argparse
import os

import cv2
import h5py
import numpy as np


def write_hdf5(path, arrays):
    # self-contained (runs without mscnn_tpu on sys.path); same layout
    # as data/sources.write_hdf5
    with h5py.File(path, "w") as f:
        for k, v in arrays.items():
            f.create_dataset(k, data=np.asarray(v))


def render_digit(rng: np.random.RandomState, digit: int) -> np.ndarray:
    img = np.zeros((28, 28), np.uint8)
    scale = rng.uniform(0.55, 0.85)
    thickness = rng.randint(1, 3)
    ((tw, th), _) = cv2.getTextSize(str(digit), cv2.FONT_HERSHEY_SIMPLEX,
                                    scale, thickness)
    x = (28 - tw) // 2 + rng.randint(-3, 4)
    y = (28 + th) // 2 + rng.randint(-3, 4)
    cv2.putText(img, str(digit), (x, y), cv2.FONT_HERSHEY_SIMPLEX,
                scale, 255, thickness, cv2.LINE_AA)
    return img


def make_split(rng, n):
    data = np.zeros((n, 1, 28, 28), np.float32)   # NCHW like real Caffe h5
    label = np.zeros((n,), np.float32)
    for i in range(n):
        d = rng.randint(10)
        # the reference lenet scales [0,255] bytes by 1/256
        data[i, 0] = render_digit(rng, d) / 256.0
        label[i] = d
    return data, label


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", type=int, default=4096)
    ap.add_argument("--test", type=int, default=512)
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    rng = np.random.RandomState(0)
    for split, n in (("train", args.train), ("test", args.test)):
        data, label = make_split(rng, n)
        h5 = os.path.join(here, f"{split}.h5")
        write_hdf5(h5, {"data": data, "label": label})
        with open(os.path.join(here, f"{split}.txt"), "w") as f:
            f.write(h5 + "\n")
        print(f"{split}: {n} images -> {h5}")


if __name__ == "__main__":
    main()

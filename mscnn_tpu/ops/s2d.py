"""Space-to-depth acceleration for the early VGG convs.

The first two 64-channel convolutions at full input resolution run at <10%
MXU utilization (the 128-lane systolic array is half-empty at C=64, and the
huge spatial extent defeats XLA's tiling), costing ~10 ms of a ~27 ms deploy
graph at 768x2560. The standard TPU remedy: operate on the 2x2
space-to-depth transform of the image, where a stride-1 SAME 3x3 conv at
full resolution is EXACTLY a stride-1 SAME 3x3 conv over the s2d tensor
with a structured [3, 3, 4*Cin, 4*Cout] kernel built from the original
weights (each output phase reads each input phase at one specific tap).
Channels go 3 -> 12 and 64 -> 256, quadrupling MXU occupancy, and pool1
collapses to a free max over the 4 phase channels.

Numerics are bit-identical to the plain path up to float reassociation;
imported VGG weights need no changes (the transform is applied to the
params inside jit and constant-folds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mscnn_tpu.ops import conv as C


def space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel order (p, q, c) with
    p/q the row/col phase."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y):
    """Inverse of space_to_depth."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    x = y.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def s2d_conv_kernel(k):
    """Transform a stride-1 SAME 3x3 kernel [3, 3, Cin, Cout] into its
    space-to-depth equivalent [3, 3, 4Cin, 4Cout].

    For output phase (a, b), tap (dy, dx) reads input phase
    ((a+dy) mod 2, (b+dx) mod 2) at cell offset (floor((a+dy)/2),
    floor((b+dx)/2)); each (phase, tap) pair lands on a unique kernel slot,
    so the construction is a pure scatter of the original taps.
    """
    kh, kw, cin, cout = k.shape
    assert kh == 3 and kw == 3, "s2d transform assumes 3x3 SAME stride-1"
    zero = jnp.zeros((cin, cout), k.dtype)
    # tap table: taps[u][v][(p,q)][(a,b)] = original tap or zero; assembled
    # with pure stacking so XLA sees one fused gather/concat, not a chain
    # of dynamic-update-slices.
    tap = {}
    for a in range(2):
        for b in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    p = (a + dy) % 2
                    q = (b + dx) % 2
                    u = (a + dy - p) // 2 + 1
                    v = (b + dx - q) // 2 + 1
                    tap[(u, v, p * 2 + q, a * 2 + b)] = k[dy + 1, dx + 1]
    rows = []
    for u in range(3):
        cols = []
        for v in range(3):
            blocks = [[tap.get((u, v, pq, ab), zero) for ab in range(4)]
                      for pq in range(4)]
            cols.append(jnp.concatenate(
                [jnp.concatenate(r, axis=1) for r in blocks], axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def s2d_bias(bias):
    """[Cout] -> [4 Cout] (each phase gets the same bias)."""
    return jnp.tile(bias, 4)


def phase_max(y):
    """Max over the 4 phase groups: [B, h, w, 4C] -> [B, h, w, C].
    Equals a 2x2 stride-2 max pool of the full-resolution tensor (exact for
    even input sizes, which the zoo geometries guarantee)."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    return y.reshape(b, h, w, 4, c).max(axis=3)


def conv1_block_s2d(x, w1, b1, w2, b2):
    """s2d-accelerated conv1_1 -> relu -> conv1_2 -> relu -> pool1.

    x: [B, H, W, 3] (even H, W). Returns pool1 output [B, H/2, W/2, 64],
    exactly matching the plain path (conv SAME pad 1, 2x2/2 max pool).
    """
    xs = space_to_depth(x)
    y = C.conv2d(xs, s2d_conv_kernel(w1.astype(xs.dtype)),
                 s2d_bias(b1), padding=1)
    y = jax.nn.relu(y)
    y = C.conv2d(y, s2d_conv_kernel(w2.astype(y.dtype)),
                 s2d_bias(b2), padding=1)
    y = jax.nn.relu(y)
    return phase_max(y)

"""Pallas TPU kernel: fused conv1_1 + conv1_2 + pool1 in VMEM, pair layout.

The VGG conv1 block is the trunk's utilization floor (BENCH.md: 8.3 ms of a
~25 ms image): XLA lowers the C=3 / C=64 full-resolution convolutions at
2-12% MXU utilization and round-trips two 252 MB activation tensors through
HBM. Design:

  * PAIR LAYOUT — adjacent image columns (2k, 2k+1) are stacked in lanes.
    Both convolutions become dense [N, 128] @ [128, 128] tap matmuls (full
    MXU depth and width; the natural [N, 64] @ [64, 64] form runs at
    <= 25%): per kernel row dy the three column taps collapse into TWO
    dense dots — a "center" tap and a "mixed" tap whose K rows blend the
    left/right neighbours' disjoint lane halves (a lane select, not a
    relayout).  The 2x2 pool's column max is a lane-half max.
  * FUSION — conv1_1 output never touches HBM: each grid step DMAs one raw
    pair-x halo block, runs conv1_1 as 6 tap matmuls, conv1_2 as 6 more on
    the VMEM-resident result, pools, and writes only the pooled block.
  * The ONLY XLA pre-step is pad+reshape of the input to the pair layout
    padded to 128 lanes (~253 MB at bf16).  An im2col pre-step was tried
    first and rejected: XLA builds the 27-lane tap tensor through a chain
    of minor-dim concats that costs ~8 ms by itself — more than the whole
    convolution (see BENCH.md round-2 notes).

Mosaic constraints baked into the shapes (this toolchain, measured):
  * sliced-source DMAs require a 128-lane minor dim (hence the lane pad);
  * shape casts must merge dims in multiples of the bf16 tile, so the tile
    width is 16-aligned and tap dots run at full padded width (junk
    columns cost FLOPs, not relayouts);
  * i1 vectors cannot be sliced or minor-dim-broadcast: masks are built as
    right-sized i32 iotas, applied as f32 arithmetic, and only on tiles
    that touch an image edge (pl.when) — interior tiles skip them.

Semantics pinned to the reference VGG trunk (both convs pad 1 "SAME",
/root/reference/examples/kitti_car/mscnn_deploy.prototxt conv1_1/conv1_2 +
pool1 2x2/2 ceil-mode): conv1_2's zero padding is reproduced exactly by
masking the out-of-image ring of the extended conv1_1 plane, and
out-of-image conv1_2 values take the pool's padding identity (a large
negative) before the max.

Backward: custom_vjp recomputes through the XLA reference formulation
(ops.conv), so training gets the fused forward and an exact gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # pool identity (bf16-safe stand-in for -inf)


def _kernel(xp_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xbuf, sem,
            *, tile_h: int, tile_q: int, img_h: int, img_w: int, twp: int):
    """One (tile_h x tile_q-pair-columns) tile.

    xp_hbm: [B, H+4, Qp, 128] raw pair planes (see _pair_input): raw local
    index r holds global raw pair j*tq + r - 1 = image cols
    (2*(j*tq+r-1) - 2, ... - 1).  w1_ref/w2_ref: [6, 128, 128] tap weights
    (dy-major: center, mixed).  twp: 16-aligned dot width (>= tile_q + 4).
    """
    th, tq = tile_h, tile_q
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)
    step = (b * ni + i) * nj + j
    total = pl.num_programs(0) * ni * nj
    slot = jax.lax.rem(step, 2)

    def dma_for(s):
        sl = jax.lax.rem(s, 2)
        bb = s // (ni * nj)
        rem = jax.lax.rem(s, ni * nj)
        ii = rem // nj
        jj = jax.lax.rem(rem, nj)
        return pltpu.make_async_copy(
            xp_hbm.at[bb, pl.ds(ii * th, th + 4), pl.ds(jj * tq, twp), :],
            xbuf.at[sl], sem.at[sl])

    @pl.when(step == 0)
    def _():
        dma_for(0).start()

    @pl.when(step + 1 < total)
    def _():
        dma_for(step + 1).start()

    dma_for(step).wait()

    def shifts(y, width):
        """(plane, shift+1, mixed-of-(0,+2)) for the center/mixed taps."""
        y_r = jnp.concatenate([y[:, 1: width], y[:, width - 1: width]],
                              axis=1)
        y_rr = jnp.concatenate([y[:, 2: width], y[:, width - 2: width]],
                               axis=1)
        return y_r, y_rr

    def tap_dots(planes, w_ref, rows, width):
        acc = jnp.zeros((rows * width, 128), jnp.float32)
        for dy in range(3):
            for t, plane in enumerate(planes):
                lhs = plane[dy: dy + rows].reshape(rows * width, 128)
                acc += jax.lax.dot_general(
                    lhs, w_ref[2 * dy + t], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return acc.reshape(rows, width, 128)

    # conv1_1: raw pair planes -> extended y1 (rows th+2: one halo row
    # each side for conv1_2's vertical taps)
    x = xbuf[slot]                                  # [th+4, twp, 128] bf16
    x_r, x_rr = shifts(x, twp)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (th + 4, twp, 128), 2) < 3
    x_mix = jnp.where(lane3, x_rr, x)
    y1 = tap_dots((x_r, x_mix), w1_ref, th + 2, twp)
    y1 = jnp.maximum(y1 + b1_ref[0], 0.0)

    # conv1_2's zero padding only matters on image-edge tiles.  y1 local
    # (r, q, l) -> global y1 (i*th + r - 1, 2*(j*tq + q - 1) + (l >= 64)).
    on_edge = ((i == 0) | (i == ni - 1) | (j == 0)
               | ((j + 1) * tq * 2 + 2 * (twp - tq) >= img_w))

    def masked(y, rows, row0):
        g_row = (jax.lax.broadcasted_iota(jnp.int32, (rows, twp, 128), 0)
                 + row0)
        g_col = (jax.lax.broadcasted_iota(jnp.int32, (rows, twp, 128), 1)
                 * 2
                 + (jax.lax.broadcasted_iota(
                        jnp.int32, (rows, twp, 128), 2) // 64)
                 + (j * tq - 1) * 2)
        ok = ((g_row >= 0) & (g_row < img_h)
              & (g_col >= 0) & (g_col < img_w)).astype(jnp.float32)
        return y * ok, ok

    y1 = jax.lax.cond(
        on_edge, lambda y: masked(y, th + 2, i * th - 1)[0],
        lambda y: y, y1)
    y1 = y1.astype(jnp.bfloat16)

    # conv1_2: y1 plane q holds global pair j*tq + q - 1; output pair m
    # lives at plane q = m + 1, so taps are plane shifts (+1, mixed(0,+2))
    y1_r, y1_rr = shifts(y1, twp)
    lane_lo = (jax.lax.broadcasted_iota(jnp.int32, (th + 2, twp, 128), 2)
               < 64)
    y1_mix = jnp.where(lane_lo, y1_rr, y1)
    y2 = tap_dots((y1_r, y1_mix), w2_ref, th, twp)
    y2 = jnp.maximum(y2 + b2_ref[0], 0.0)

    def neg_masked(y):
        # output local m -> global (i*th + row, 2*(j*tq + m) + parity):
        # out-of-image outputs must lose the pool max
        o_row = (jax.lax.broadcasted_iota(jnp.int32, (th, twp, 128), 0)
                 + i * th)
        o_col = (jax.lax.broadcasted_iota(jnp.int32, (th, twp, 128), 1) * 2
                 + (jax.lax.broadcasted_iota(
                        jnp.int32, (th, twp, 128), 2) // 64) + j * tq * 2)
        ok = ((o_row < img_h) & (o_col < img_w)).astype(jnp.float32)
        return y * ok + (1.0 - ok) * NEG

    y2 = jax.lax.cond(on_edge, neg_masked, lambda y: y, y2)

    # pool1 2x2/2: column-pair max = lane-half max; row-pair max = flatten
    # to (th/2, 2*twp, 64) and max the two tile-aligned sublane halves
    colmax = jnp.maximum(y2[:, :, 0:64], y2[:, :, 64:128])
    colmax = colmax.reshape(th // 2, 2 * twp, 64)
    pooled = jnp.maximum(colmax[:, 0: twp], colmax[:, twp: 2 * twp])
    out_ref[0] = jnp.maximum(pooled[:, 0: tq], 0.0).astype(out_ref.dtype)


def _pair_input(x, dtype):
    """[B, H, W, 3] -> [B, H+4, (W+4)/2 + 1, 128] raw pair planes.

    xpad col c holds image col c - 2; raw pair a = xpad cols (2a, 2a+1) =
    image cols (2a-2, 2a-1), lanes [even-col 3ch | odd-col 3ch | zeros].
    One zero pair is prepended so array index r holds raw pair r - 1
    (the kernel's left halo; its columns are never read)."""
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0))).astype(dtype)
    pairs = xp.reshape(B, H + 4, (W + 4) // 2, 6)
    pairs = jnp.pad(pairs, ((0, 0), (0, 0), (1, 0), (0, 122)))
    return pairs


def _tap_weights(w, dtype, in_ch):
    """[3, 3, in_ch, 64] HWIO -> [6, 128, 128] (per dy: center, mixed).

    Output pair lanes [even col 2m | odd col 2m+1]; input pair lanes
    [even-col in_ch | odd-col in_ch] at stride `half` = 64 for y1 inputs,
    3 for raw-x inputs.  CENTER tap (plane shift +1, the pair holding cols
    (2m, 2m+1)): col 2m -> even out (dx=1), col 2m+1 -> even out (dx=2),
    col 2m -> odd out (dx=0), col 2m+1 -> odd out (dx=1).  MIXED tap:
    lanes 0:in_ch come from plane shift +2 (col 2m+2 -> odd out, dx=2),
    lanes half:half+in_ch from shift 0 (col 2m-1 -> even out, dx=0)."""
    w = w.astype(dtype)
    half = 64 if in_ch == 64 else in_ch
    taps = []
    for dy in range(3):
        center = jnp.zeros((128, 128), dtype)
        center = center.at[0: in_ch, 0:64].set(w[dy, 1])
        center = center.at[half: half + in_ch, 0:64].set(w[dy, 2])
        center = center.at[0: in_ch, 64:128].set(w[dy, 0])
        center = center.at[half: half + in_ch, 64:128].set(w[dy, 1])
        mixed = jnp.zeros((128, 128), dtype)
        mixed = mixed.at[0: in_ch, 64:128].set(w[dy, 2])
        mixed = mixed.at[half: half + in_ch, 0:64].set(w[dy, 0])
        taps.extend([center, mixed])
    return jnp.stack(taps)


def _conv1_pool_pallas(x, w1, b1, w2, b2, *, tile_h: int, tile_q: int,
                       interpret: bool = False):
    """x [B, H, W, 3] -> pooled [B, ceil(H/2), ceil(W/2), 64]."""
    B, H, W, _ = x.shape
    out_h, out_w = (H + 1) // 2, (W + 1) // 2
    tw = tile_q * 2
    ph = -H % tile_h
    pw = -W % tw
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = x.shape[1], x.shape[2]

    dtype = jnp.bfloat16
    xpair = _pair_input(x, dtype)                   # [B, Hp+4, Qp, 128]
    ni, nj = Hp // tile_h, Wp // tw
    twp = tile_q + 4 + (-(tile_q + 4) % 16)         # 16-aligned dot width
    need = (nj - 1) * tile_q + twp
    if xpair.shape[2] < need:                       # right halo + pad cols
        xpair = jnp.pad(xpair, ((0, 0), (0, 0),
                                (0, need - xpair.shape[2]), (0, 0)))

    w1p = _tap_weights(w1, dtype, 3)
    w2p = _tap_weights(w2, dtype, 64)
    b1r = jnp.tile(b1.reshape(1, 64), (1, 2)).astype(jnp.float32)
    b2r = jnp.tile(b2.reshape(1, 64), (1, 2)).astype(jnp.float32)

    kernel = functools.partial(_kernel, tile_h=tile_h, tile_q=tile_q,
                               img_h=H, img_w=W, twp=twp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hp // 2, Wp // 2, 64), dtype),
        grid=(B, ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # manual halo DMA
            pl.BlockSpec((6, 128, 128), lambda b, i, j: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda b, i, j: (0, 0)),
            pl.BlockSpec((6, 128, 128), lambda b, i, j: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h // 2, tile_q, 64),
            lambda b, i, j: (b, i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 4, twp, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xpair, w1p, b1r, w2p, b2r)
    if (Hp // 2, Wp // 2) != (out_h, out_w):
        out = out[:, :out_h, :out_w, :]
    return out


def _conv1_pool_xla(x, w1, b1, w2, b2):
    """Reference XLA formulation (the comparison oracle + VJP source)."""
    from mscnn_tpu.ops import conv as C

    dtype = jnp.bfloat16
    y = C.conv2d(x.astype(dtype), w1.astype(dtype), b1, padding=1)
    y = jax.nn.relu(y)
    y = C.conv2d(y, w2.astype(dtype), b2, padding=1)
    y = jax.nn.relu(y)
    return C.max_pool(y, 2, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv1_pool_fused(x, w1, b1, w2, b2, tile_h=32, tile_q=128):
    """Fused conv1 block. Forward = Pallas kernel (TPU) / XLA elsewhere;
    backward = exact VJP of the XLA formulation."""
    if jax.default_backend() == "tpu":
        return _conv1_pool_pallas(x, w1, b1, w2, b2,
                                  tile_h=tile_h, tile_q=tile_q)
    return _conv1_pool_xla(x, w1, b1, w2, b2)


def _fwd(x, w1, b1, w2, b2, tile_h, tile_q):
    out = conv1_pool_fused(x, w1, b1, w2, b2, tile_h, tile_q)
    return out, (x, w1, b1, w2, b2)


def _bwd(tile_h, tile_q, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_conv1_pool_xla, x, w1, b1, w2, b2)
    return vjp(g)


conv1_pool_fused.defvjp(_fwd, _bwd)

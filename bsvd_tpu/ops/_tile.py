"""Shared VMEM tile plumbing for the 3x3-conv Pallas kernel family.

Every kernel in the family (ops/conv3x3 frame-minor + NT=1 variants,
ops/bibuffer_conv, ops/conv_chain) stages (bh+2)-row input tiles the same
way: three clamped async copies per input (main rows + one-row top/bottom
halos), a zero-fix for the rows/columns the clamped copies filled with
in-image garbage, and a 9-tap MXU contraction with fp32 accumulation and
a fused bias+activation epilogue. This module is the single definition of
those pieces — a fix to the clamp, the halo zeroing, or the epilogue
semantics lands in every kernel at once. (ops/conv_s2 stages 2bh-row
stride-2 tiles with a top halo only and keeps its own variants.)
"""

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Data column offset inside input tiles: VMEM DMA destinations must start
# at a multiple of the 8-element sublane tile, so the 1-column 3x3 halo
# lives at COL0 - 1 / COL0 + w inside a (bh + 2, w + 2*COL0, C) tile.
COL0 = 8


def halo_row_dmas(src, dst, sems, sem_idx, row0, bh, h, w):
    """Three unconditional clamped copies for one (bh+2)-row input tile.

    main rows ``[row0, row0+bh)`` -> dst rows [1, bh+1), and one-row
    top/bottom halos -> dst rows 0 and bh+1, clamped at the image
    boundaries (``zero_halo`` re-zeroes the clamp garbage). ``src`` is the
    HBM frame ref (already frame-indexed), ``dst`` the tile ref (already
    slot-indexed); ``sem_idx`` is the index prefix of the 3-semaphore
    group inside ``sems``.
    """
    return [
        pltpu.make_async_copy(
            src.at[pl.ds(row0, bh), :, :],
            dst.at[pl.ds(1, bh), pl.ds(COL0, w), :],
            sems.at[(*sem_idx, 0)]),
        pltpu.make_async_copy(
            src.at[pl.ds(jnp.maximum(row0 - 1, 0), 1), :, :],
            dst.at[pl.ds(0, 1), pl.ds(COL0, w), :],
            sems.at[(*sem_idx, 1)]),
        pltpu.make_async_copy(
            src.at[pl.ds(jnp.minimum(row0 + bh, h - 1), 1), :, :],
            dst.at[pl.ds(bh + 1, 1), pl.ds(COL0, w), :],
            sems.at[(*sem_idx, 2)]),
    ]


def zero_halo(ring, slot, i, hb, nhb, bh, w, c):
    """Zero the tile rows/cols the clamped ``halo_row_dmas`` filled with
    in-image garbage: the top halo row of row block 0, the bottom halo row
    of the last block, and the one-column 3x3 halo just outside the data
    columns (both sides, every block)."""
    wp = w + 2 * COL0

    @pl.when(hb == 0)
    def _():
        ring[slot, i, 0:1] = jnp.zeros((1, wp, c), ring.dtype)

    @pl.when(hb == nhb - 1)
    def _():
        ring[slot, i, bh + 1:bh + 2] = jnp.zeros((1, wp, c), ring.dtype)
    ring[slot, i, :, COL0 - 1:COL0] = jnp.zeros((bh + 2, 1, c), ring.dtype)
    ring[slot, i, :, COL0 + w:COL0 + w + 1] = jnp.zeros((bh + 2, 1, c),
                                                        ring.dtype)


def dots9(tile, w_ref, b_ref, bh, w, col0, act):
    """3x3 conv of one (bh+2, >=w+2, C) tile as 9 MXU contractions with
    fp32 accumulation; bias and activation fused into the epilogue.
    ``col0`` is the tile's data column offset. Returns (bh, w, Cout) fp32
    (callers cast on write)."""
    a = jnp.zeros((bh, w, w_ref.shape[-1]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = tile[ky:ky + bh, col0 - 1 + kx:col0 - 1 + kx + w, :]
            a = a + lax.dot_general(
                patch, w_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    a = a + b_ref[...].astype(jnp.float32)
    if act == 'relu':
        a = jnp.maximum(a, 0)
    elif act == 'relu6':
        a = jnp.clip(a, 0, 6)
    return a


def dedup_folded_weights(w2):
    """Split a width-folded 3x3 weight (ops/conv3x3.fold_width_weights
    output, (3, 3, 2C, 2Cout)) into the dedup form consumed by
    ``dots_folded``: (w_dense (3, 2C, 2Cout), w_comb (3, 2C, 2Cout)).

    The folded taps kx=0 and kx=2 are 75% structural zeros (kx=0 maps only
    odd-half inputs to even-half outputs, kx=2 only even->odd), so the two
    sparse MXU contractions per row collapse into ONE dense dot against a
    lane-spliced input (see dots_folded): w_comb carries kx=0's block at
    input rows [0, C) and kx=2's at [C, 2C) — a roll of their (disjoint)
    sum. Runs on weights at trace time (tiny; jit-cached)."""
    c = w2.shape[2] // 2
    w_dense = w2[:, 1]
    w_comb = jnp.roll(w2[:, 0] + w2[:, 2], c, axis=1)
    return w_dense, w_comb


def dots_folded(tile, wd_ref, wc_ref, b_ref, bh, w, col0, act):
    """Width-folded 3x3 conv of one (bh+2, >=w+2, 2C) tile as SIX MXU
    contractions instead of dots9's nine — the fold's 2x MAC duplication
    drops to 1.33x. Per row ky: one dense dot (tap kx=1) plus one dot of
    the lane-spliced input V = [odd(col-1) | even(col+1)] against the
    block-diagonal ``wc_ref`` (see dedup_folded_weights). The splice is a
    half-lane rotation (lowered by Mosaic as a lane concat) and one
    iota-masked select, both VPU ops costing ~15% of the saved MXU work.
    Same fp32 accumulation / bias / act semantics as dots9."""
    c2 = tile.shape[-1]
    half = c2 // 2
    tt = tile[:, col0 - 1:col0 + w + 1, :]            # (bh+2, w+2, 2C)
    rot = jnp.concatenate([tt[..., half:], tt[..., :half]], axis=-1)
    lane = lax.broadcasted_iota(jnp.int32, (tt.shape[0], w, c2), 2)
    v = jnp.where(lane < half, rot[:, 0:w], rot[:, 2:w + 2])
    a = jnp.zeros((bh, w, wd_ref.shape[-1]), jnp.float32)
    for ky in range(3):
        a = a + lax.dot_general(
            tt[ky:ky + bh, 1:w + 1], wd_ref[ky],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = a + lax.dot_general(
            v[ky:ky + bh], wc_ref[ky],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    a = a + b_ref[...].astype(jnp.float32)
    if act == 'relu':
        a = jnp.maximum(a, 0)
    elif act == 'relu6':
        a = jnp.clip(a, 0, 6)
    return a

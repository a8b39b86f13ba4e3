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

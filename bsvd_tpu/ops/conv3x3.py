"""Pallas TPU kernel family: pipelined 3x3 conv (+ optional temporal shift)
+ bias + activation, NHWC, stride 1.

This is the generation-2 kernel behind BSVD's hot ops (the reference's
ShiftConv sites, bsvd_arch.py:21-51 / temporal_shift.py:40-47, plus the
plain 3x3 conv sites of the WNet stages). Design, per the TPU hardware
model:

- **Ring-buffered HBM->VMEM DMA.** The grid iterates (row-block, frame)
  with the frame axis minor, so consecutive steps reuse frame tiles: an
  nring-slot VMEM ring holds the frames in use plus one in flight, and
  each step DMAs exactly ONE new frame tile — 1x HBM traffic, overlapped
  with the 9 MXU contractions of the current frame (software pipelining
  with lookahead L: shift modes L=2/nring=4, plain conv L=1/nring=2).
- **Zero fills only where needed**: the row/column halos, not whole tiles.
- **Temporal shift as a lane select** on [0, 2*fold) with clip-boundary
  masking (zeros at clip edges, exactly the reference semantics).
- **fp32 accumulation** over 9 (M=bh*W, K=C, N=Cout) MXU dots, bias + act
  fused in the epilogue.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsvd_tpu.ops._tile import (COL0 as _COL0, dedup_folded_weights,
                                dots9, dots_folded, halo_row_dmas, zero_halo)


def _ring_size(shift):
    return 4 if shift != 'none' else 2


def _pick_bh(h, w, c, cout, shift, itemsize=2,
             vmem_budget=15 * 1024 * 1024, n_in=1, folded=False):
    """Largest divisor of H whose working set fits in VMEM.

    Calibrated against Mosaic's observed allocations (see the fp32 OOM in
    the git history): ring slots, ~2.5/1 tile equivalents of assembly
    temporaries, DOUBLE the weight block (input-spec buffering) and double
    the fp32 accumulator (the unrolled 9-dot chain keeps extra copies
    live). ``itemsize`` is the input/output dtype width — fp32 tiles are
    twice bf16's. ``folded`` = the dedup 6-dot path: 6 weight taps instead
    of 9 but two extra tile temporaries (the rotation and the splice)."""
    nring = _ring_size(shift)
    tmp_tiles = 2.5 if shift != 'none' else 1.0
    if folded:
        tmp_tiles += 2.0
    # VMEM buffers are lane-padded to multiples of 128 (observed: a Cout=6
    # output block allocates 128 lanes)
    c_pad = -(-c // 128) * 128
    cout_pad = -(-cout // 128) * 128
    n_taps = 6 if folded else 9
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0),
                     reverse=True):
        tile = (bh + 2) * (w + 2 * _COL0) * c_pad * itemsize
        acc = bh * w * cout_pad * 4
        out = 2 * bh * w * cout_pad * itemsize
        wts = n_taps * c_pad * cout_pad * itemsize + cout_pad * 4
        total = int((nring * n_in + tmp_tiles) * tile) + 2 * acc + out + 2 * wts
        if total <= vmem_budget and bh * w >= 512:
            return bh
    return None



# Activations the kernel epilogues implement. Entry points raise on anything
# else (rather than silently skipping the activation); arch-level gates
# (wnet_arch.KERNEL_ACTS re-exports this) route unsupported acts to XLA.
KERNEL_ACTS = ('relu', 'relu6', 'none')


def check_act(act):
    if act not in KERNEL_ACTS:
        raise ValueError(
            f'Pallas conv kernels implement acts {KERNEL_ACTS}, got {act!r}; '
            'route this site through the XLA path instead')


def _epilogue(o_ref, a, ps_half=None, ps_nat=None):
    """Write the (bh, w, cout) fp32 accumulator (bias/act already applied).

    ``ps_half``: pixel-shuffle-folded write — the conv's output channels
    were pre-permuted (psfold_weights) to lane order di*2c + dj*c + k, so
    the r=2-shuffled, width-folded output is TWO tile-aligned lane-slice
    writes: out row 2i+di <- a[i, :, di*2c:(di+1)*2c]. The o_ref block is
    (1, bh, 2, w, 2c) over an (nt, h, 2, w, 2c) array whose reshape to
    (nt, 2h, w, 2c) is free (leading-dim merge above the sublane dim).

    ``ps_nat``: pixel-shuffle write in NATURAL layout (up2's site, whose
    consumers are natural C>=128 shift convs): same weight permutation,
    but dj additionally splits off the lane axis into the o_ref block's
    (w, 2, c) sublane structure — four lane-slice writes, each 128-aligned
    when c (= ps_nat) is a multiple of 128. The (nt, h, 2, w, 2, c) array
    reshapes to the shuffled (nt, 2h, 2w, c) for free (row-major merges
    above the lane dim). Requires c % 128 == 0 — up1's c=64 case stays on
    the ps-fold form (its sub-128 slices would need the lane->sublane move
    Mosaic cannot lower; see the round-3 notes below).

    NOTE a direct in-kernel r=2 shuffle write via value-level reshapes was
    built in round 3 and REMOVED: its (w, 2c) -> (2w, c) lane->sublane
    move has no Mosaic lowering. The block-structured forms sidestep that
    entirely — di/dj ride ref dimensions, so only tile-aligned slices
    remain."""
    if ps_nat is not None:
        c = ps_nat
        for di in range(2):
            for dj in range(2):
                k = (di * 2 + dj) * c
                o_ref[0, :, di, :, dj, :] = a[:, :, k:k + c].astype(
                    o_ref.dtype)
    elif ps_half is None:
        o_ref[...] = a.astype(o_ref.dtype)[None]
    else:
        o_ref[0, :, 0] = a[:, :, :ps_half].astype(o_ref.dtype)
        o_ref[0, :, 1] = a[:, :, ps_half:].astype(o_ref.dtype)


def _kernel(*refs, nt, t_len, bh, h, w, c, cout, fold, act, shift, n_in=1,
            ps_half=None, ps_nat=None, folded=False):
    xs = refs[:n_in]
    w_ref, b_ref, o_ref, ring, sems = refs[n_in:]
    hb = pl.program_id(0)
    t = pl.program_id(1)
    nhb = pl.num_programs(0)
    nring = _ring_size(shift)
    lookahead = 2 if shift != 'none' else 1
    row0 = hb * bh

    def frame_dmas(frame, slot):
        """Clamped copies per input for one frame tile (see _tile)."""
        f_idx = jnp.clip(frame, 0, nt - 1)
        out = []
        for i, x_hbm in enumerate(xs):
            out += halo_row_dmas(x_hbm.at[f_idx], ring.at[slot, i], sems,
                                 (slot, i), row0, bh, h, w)
        return out

    def start(frame):
        for d in frame_dmas(frame, (frame % nring)):
            d.start()

    def wait_fix(frame):
        slot = frame % nring
        for d in frame_dmas(frame, slot):
            d.wait()
        for i in range(n_in):
            zero_halo(ring, slot, i, hb, nhb, bh, w, c)

    @pl.when(t == 0)
    def _():   # prologue for this row block
        for fr in range(lookahead):
            start(fr)
        for fr in range(lookahead - 1):
            wait_fix(fr)

    # exactly one start per step except the last, so starts and waits
    # balance per row block (a leaked signal would corrupt the next block)
    @pl.when(t + 1 < nt)
    def _():
        start(t + lookahead)

    wait_fix(t + lookahead - 1)

    def summed(slot, lane_lo=None, lane_hi=None):
        """Sum of the n_in input tiles for a ring slot (lane range opt.)."""
        if lane_lo is None:
            v = ring[slot, 0]
            for i in range(1, n_in):
                v = v + ring[slot, i]
            return v
        v = ring[slot, 0, :, :, lane_lo:lane_hi]
        for i in range(1, n_in):
            v = v + ring[slot, i, :, :, lane_lo:lane_hi]
        return v

    if shift == 'none':
        tile = summed(t % nring)
    else:
        # assemble the shifted tile: lanes [0, fold) from frame t+1,
        # [fold, 2*fold) from t-1 (causal: [0, 2*fold) from t-1), rest from
        # t — with zeros at clip boundaries. Slicing BEFORE the boundary
        # select keeps the temporaries at 2*fold lanes, not full tiles.
        in_clip = t % t_len
        has_fut = in_clip < (t_len - 1)
        has_pst = in_clip > 0
        cur = summed(t % nring)
        if shift == 'causal':
            head = summed((t + nring - 1) % nring, 0, 2 * fold)
            head = jnp.where(has_pst, head, jnp.zeros_like(head))
        else:
            f1 = summed((t + 1) % nring, 0, fold)
            f1 = jnp.where(has_fut, f1, jnp.zeros_like(f1))
            f2 = summed((t + nring - 1) % nring, fold, 2 * fold)
            f2 = jnp.where(has_pst, f2, jnp.zeros_like(f2))
            head = jnp.concatenate([f1, f2], axis=-1)
        tile = jnp.concatenate([head, cur[:, :, 2 * fold:]], axis=-1)

    if folded:
        # width-folded dedup: w_ref is the stacked (2, 3, 2C, 2Cout)
        # [dense, combined] pair (see _tile.dots_folded)
        a = dots_folded(tile, w_ref[0], w_ref[1], b_ref, bh, w, _COL0, act)
    else:
        a = dots9(tile, w_ref, b_ref, bh, w, _COL0, act)
    _epilogue(o_ref, a, ps_half, ps_nat)


def _kernel_nt1(*refs, bh, h, w, c, cout, act, n_in=1, ps_half=None,
                ps_nat=None, folded=False):
    """Single-frame (NT=1) variant: the ROW-BLOCK axis carries the software
    pipeline. grid=(nhb,); a 2-slot VMEM ring double-buffers row-block tiles
    so block hb+1's DMA overlaps block hb's 9 MXU dots (the frame-minor
    kernel serializes its DMA prologue at NT=1 — measured regression, see
    PERF.md). With ``n_in=2`` a second input is DMAed alongside and summed
    before the taps — the skip-add (e.g. outc's x0+x1u) fuses for free."""
    xs = refs[:n_in]
    w_ref, b_ref, o_ref, ring, sems = refs[n_in:]
    hb = pl.program_id(0)
    nhb = pl.num_programs(0)

    def block_dmas(blk, slot):
        """Clamped copies for row-block ``blk`` (see _tile)."""
        row0 = blk * bh
        out = []
        for i, x_hbm in enumerate(xs):
            out += halo_row_dmas(x_hbm.at[0], ring.at[slot, i], sems,
                                 (slot, i), row0, bh, h, w)
        return out

    def start(blk):
        for d in block_dmas(blk, blk % 2):
            d.start()

    @pl.when(hb == 0)
    def _():
        start(0)

    @pl.when(hb + 1 < nhb)
    def _():
        start(hb + 1)

    slot = hb % 2
    for d in block_dmas(hb, slot):
        d.wait()
    for i in range(n_in):
        zero_halo(ring, slot, i, hb, nhb, bh, w, c)

    tile = ring[slot, 0]
    for i in range(1, n_in):
        tile = tile + ring[slot, i]
    if folded:
        a = dots_folded(tile, w_ref[0], w_ref[1], b_ref, bh, w, _COL0, act)
    else:
        a = dots9(tile, w_ref, b_ref, bh, w, _COL0, act)
    _epilogue(o_ref, a, ps_half, ps_nat)


def fold_width_weights(w, b):
    """Width-fold a stride-1 3x3 conv's weights: (3, 3, C, Cout) ->
    (3, 3, 2C, 2Cout) operating on the (H, W/2, 2C) view of the input (a
    FREE reshape of the row-major NHWC buffer; folded lane = (w%2)*C + c).

    The folded kernel W2[dy, dj, hh*C+c, b*Cout+c'] carries the original
    tap W[dy, dx, c, c'] wherever 2*dj + hh - b == dx — exact, at 2x the
    FLOPs but with a dense, 128-lane-friendly contraction."""
    kh, kw, c, cout = w.shape
    w2 = jnp.zeros((kh, 3, 2, c, 2, cout), w.dtype)
    # output parity b=0: taps x(2j-1)=(dj-1,hh1), x(2j)=(0,0), x(2j+1)=(0,1)
    w2 = w2.at[:, 0, 1, :, 0, :].set(w[:, 0])
    w2 = w2.at[:, 1, 0, :, 0, :].set(w[:, 1])
    w2 = w2.at[:, 1, 1, :, 0, :].set(w[:, 2])
    # output parity b=1: taps x(2j)=(0,0), x(2j+1)=(0,1), x(2j+2)=(+1,0)
    w2 = w2.at[:, 1, 0, :, 1, :].set(w[:, 0])
    w2 = w2.at[:, 1, 1, :, 1, :].set(w[:, 1])
    w2 = w2.at[:, 2, 0, :, 1, :].set(w[:, 2])
    w2 = w2.reshape(kh, 3, 2 * c, 2 * cout)
    b2 = jnp.concatenate([b, b], axis=0)   # out lane (b, c') is b-major
    return w2, b2


def fold_width_stride2_weights(w, b):
    """Width-fold a stride-(2,2) 3x3 conv (pad 1): (3, 3, C, Cout) ->
    (3, 2, 2C, Cout) consumed as an H-stride-2, W-stride-1 conv on the
    (H, W/2, 2C) view with padding ((1,1),(1,0)) — the W stride folds away:
    output col q taps folded cols {q-1 (half 1), q (halves 0,1)}."""
    kh, kw, c, cout = w.shape
    w2 = jnp.zeros((kh, 2, 2, c, cout), w.dtype)
    w2 = w2.at[:, 0, 1].set(w[:, 0])    # x(2q-1) = (q-1, h1)
    w2 = w2.at[:, 1, 0].set(w[:, 1])    # x(2q)   = (q,   h0)
    w2 = w2.at[:, 1, 1].set(w[:, 2])    # x(2q+1) = (q,   h1)
    return w2.reshape(kh, 2, 2 * c, cout), b


def _fold_width(x, w, b):
    """(see fold_width_weights) — x view + weight fold in one step, used
    by the kernel's internal C=64 path."""
    nt, h, width, c = x.shape
    w2, b2 = fold_width_weights(w, b)
    return x.reshape(nt, h, width // 2, 2 * c), w2, b2


@functools.partial(jax.jit,
                   static_argnames=('t_len', 'shift', 'fold_div', 'act',
                                    'bh', 'folded', 'interpret'))
def conv3x3_pallas(x, w, b, x2=None, *, t_len=None, shift='none', fold_div=8,
                   act='relu6', bh=None, folded=False, interpret=False):
    """Fused (temporal-shift +) 3x3 conv (stride 1, pad 1) + bias + act.

    Args:
        x: (N*T, H, W, C) NHWC; for shift modes, clips of ``t_len`` frames
            concatenated along axis 0. C must be a multiple of 128, or 64
            (width-folded internally).
        w: (3, 3, C, Cout); b: (Cout,).
        x2: optional second input (same shape as x, plain conv only): the
            kernel computes conv(x + x2) with the add fused into tile
            assembly — skip-adds cost no extra HBM round trip.
        shift: 'none' | 'tsm' | 'causal'.
        folded: ``w`` is a width-folded weight (fold_width_weights layout)
            and ``x`` the folded view — run the 6-dot dedup contraction
            (see _tile.dots_folded) instead of 9 dots, cutting the fold's
            2x MAC duplication to 1.33x. Plain conv only.
    Returns:
        (N*T, H, W, Cout) in x.dtype.
    """
    check_act(act)
    nt, h, w_, c = x.shape
    cout = w.shape[-1]
    if c == 64 and shift == 'none' and w_ % 2 == 0 and not folded:
        xf, w2, b2 = _fold_width(x, w, b)
        x2f = None if x2 is None else x2.reshape(nt, h, w_ // 2, 2 * c)
        y = conv3x3_pallas(xf, w2, b2, x2f, t_len=t_len, shift='none',
                           act=act, bh=bh, folded=True, interpret=interpret)
        return y.reshape(nt, h, w_, cout)
    assert not (folded and shift != 'none'), 'dedup is plain-conv only'
    fold = c // fold_div
    if shift != 'none':
        assert t_len is not None and nt % t_len == 0, (nt, t_len)
    xs = (x,) if x2 is None else (x, x2)
    n_in = len(xs)
    if bh is None:
        bh = _pick_bh(h, w_, c, cout, shift, jnp.dtype(x.dtype).itemsize,
                      n_in=n_in, folded=folded)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh
    nring = _ring_size(shift)

    if folded:
        w_op = jnp.stack(dedup_folded_weights(w))     # (2, 3, C, Cout)
        n_taps = 6
    else:
        w_op, n_taps = w, 9

    flops = 2 * n_taps * c * cout * h * w_ * nt
    oblock, oshape = (1, bh, w_, cout), (nt, h, w_, cout)
    common = dict(
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in + [
            pl.BlockSpec(memory_space=pltpu.VMEM),    # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),    # bias
        ],
        out_shape=jax.ShapeDtypeStruct(oshape, x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=x.size * 2 * 2 * n_in,
                                      transcendentals=0),
        interpret=interpret,
    )

    if nt == 1 and shift == 'none':
        # single frame: pipeline over row blocks instead (see _kernel_nt1)
        kern = functools.partial(_kernel_nt1, bh=bh, h=h, w=w_, c=c,
                                 cout=cout, act=act, n_in=n_in,
                                 folded=folded)
        return pl.pallas_call(
            kern,
            grid=(nhb,),
            out_specs=pl.BlockSpec(oblock,
                                   lambda hb: (0, hb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, n_in, bh + 2, w_ + 2 * _COL0, c), x.dtype),
                pltpu.SemaphoreType.DMA((2, n_in, 3)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            **common,
        )(*xs, w_op, b.reshape(1, cout))

    kern = functools.partial(
        _kernel, nt=nt, t_len=t_len if t_len else nt, bh=bh, h=h, w=w_, c=c,
        cout=cout, fold=fold, act=act, shift=shift, n_in=n_in, folded=folded)

    return pl.pallas_call(
        kern,
        grid=(nhb, nt),
        out_specs=pl.BlockSpec(oblock,
                               lambda hb, t: (t, hb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nring, n_in, bh + 2, w_ + 2 * _COL0, c), x.dtype),
            pltpu.SemaphoreType.DMA((nring, n_in, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        **common,
    )(*xs, w_op, b.reshape(1, cout))


def _pick_bh_dw(h, w, c, cout, itemsize=2,
                vmem_budget=13 * 1024 * 1024):
    acc = 9 * c * cout * 4
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0),
                     reverse=True):
        tile = (bh + 2) * (w + 2 * _COL0) * c * itemsize
        dzt = bh * w * cout * itemsize
        # xs/dz flattened-operand temporaries ~2 tile equivalents
        total = 2 * tile + 2 * dzt + acc + int(2 * tile)
        if total <= vmem_budget and bh * w >= 512:
            return bh
    return None


def _kernel_dw(x_hbm, dz_hbm, dw_ref, ring, rsems, dzb, dsems, *, nt, bh, h,
               w, c, cout):
    """Weight-grad accumulation kernel: natural-layout tiles of x
    (halo-extended) and dz stream through VMEM once; each step adds nine
    shifted (bh*w, C)^T @ (bh*w, Cout) MXU contractions into the fp32
    (9, C, Cout) accumulator that IS the output block (constant index_map,
    sequential grid)."""
    hb = pl.program_id(0)
    t = pl.program_id(1)
    nhb = pl.num_programs(0)
    row0 = hb * bh

    def dmas(slot, tt):
        return halo_row_dmas(x_hbm.at[tt], ring.at[slot, 0], rsems,
                             (slot, 0), row0, bh, h, w) + [
            pltpu.make_async_copy(dz_hbm.at[tt, pl.ds(row0, bh)],
                                  dzb.at[slot], dsems.at[slot])]

    @pl.when(t == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(t + 1 < nt)
    def _():
        for d in dmas((t + 1) % 2, t + 1):
            d.start()

    for d in dmas(t % 2, t):
        d.wait()
    zero_halo(ring, t % 2, 0, hb, nhb, bh, w, c)

    @pl.when((hb == 0) & (t == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    tile = ring[t % 2, 0]                          # (bh+2, w+2*COL0, c)
    dzt = dzb[t % 2].reshape(bh * w, cout)
    for ky in range(3):
        for kx in range(3):
            xs = tile[ky:ky + bh,
                      _COL0 - 1 + kx:_COL0 - 1 + kx + w, :]
            acc = lax.dot_general(
                xs.reshape(bh * w, c), dzt,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw_ref[ky * 3 + kx] += acc


@functools.partial(jax.jit, static_argnames=('bh', 'interpret'))
def conv3x3_dw_pallas(x, dz, *, bh=None, interpret=False):
    """Weight gradient of a stride-1 pad-1 3x3 NHWC conv in ONE kernel.

    dw[ky,kx,ci,co] = sum_{n,y,x} pad(x)[n,y+ky,x+kx,ci] * dz[n,y,x,co].
    XLA's conv_grad_weights lowering relayouts BOTH operands batch-minor
    per site (measured 48% of the bf16 train step in transpose/copy), and
    the 9-slice dot_general formulation re-reads both tensors nine times;
    this kernel reads each ONCE in the natural C-minor layout and keeps
    the 9-tap fp32 accumulator resident in VMEM.

    Returns (3, 3, Ci, Co) float32.
    """
    nt, h, w_, c = x.shape
    cout = dz.shape[-1]
    if bh is None:
        bh = _pick_bh_dw(h, w_, c, cout, jnp.dtype(x.dtype).itemsize)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh
    kern = functools.partial(_kernel_dw, nt=nt, bh=bh, h=h, w=w_, c=c,
                             cout=cout)
    dw = pl.pallas_call(
        kern,
        grid=(nhb, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((9, c, cout), lambda hb, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, c, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1, bh + 2, w_ + 2 * _COL0, c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 1, 3)),
            pltpu.VMEM((2, bh, w_, cout), dz.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(flops=2 * 9 * c * cout * h * w_ * nt,
                                      bytes_accessed=(x.size + dz.size) * 2,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x, dz)
    return dw.reshape(3, 3, c, cout)


def conv3x3_dw_supported(x_shape, dz_shape, dtype):
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    try:
        if jax.devices()[0].platform not in ('tpu', 'TPU', 'axon'):
            return False
    except Exception:
        return False
    nt, h, w_, c = x_shape
    cout = dz_shape[-1]
    if c % 128 != 0 or cout % 128 != 0 or w_ % 8 != 0:
        return False
    return _pick_bh_dw(h, w_, c, cout,
                       jnp.dtype(dtype).itemsize) is not None


def conv3x3_dw(x, dz, w_dtype=None):
    """Weight gradient of a stride-1 pad-1 3x3 NHWC conv via XLA's
    conv_grad_weights. Returns (3, 3, Ci, Co) in ``w_dtype``.

    Negative results so round 6 doesn't re-try them (measured at the
    (176,96,48,128) flagship train site, bf16):
    - 9 C-minor dot_generals over slices of pad(x): re-reads both tensors
      nine times — bf16 step 6.99 -> 4.53 it/s.
    - one-pass Pallas accumulation kernel (conv3x3_dw_pallas, kept below):
      natural-layout streaming, (9,Ci,Co) fp32 VMEM accumulator — but the
      K-major (bh*w, C)^T contraction forces a Mosaic relayout per tap:
      44.6 ms vs XLA's 3.7 ms. A lane-roll/transposed-dz reformulation
      might close it; untried.
    XLA's batch-minor relayout + conv (the ~1.25 ms/site transpose pairs
    in the train trace) remains the fastest known form."""
    w_dtype = w_dtype or x.dtype

    def conv_w(v):
        return lax.conv_general_dilated(
            x, v, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    wspec = jax.ShapeDtypeStruct((3, 3, x.shape[-1], dz.shape[-1]), x.dtype)
    return jax.linear_transpose(conv_w, wspec)(dz)[0].astype(w_dtype)


def _conv3x3_xla(x, w, b, act):
    """XLA composite with identical semantics (oracle + backward)."""
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y + b.astype(y.dtype)
    if act == 'relu':
        y = jnp.maximum(y, 0)
    elif act == 'relu6':
        y = jnp.clip(y, 0, jnp.asarray(6, y.dtype))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3(x, w, b, act='relu6', folded=False):
    """Differentiable fused 3x3 conv + bias + act: Pallas forward on TPU,
    XLA composite backward (same math). ``folded``: w/x are width-folded —
    engage the 6-dot dedup contraction."""
    return conv3x3_pallas(x, w, b, shift='none', act=act, folded=folded)


def _c3_fwd(x, w, b, act, folded):
    y = conv3x3_pallas(x, w, b, shift='none', act=act, folded=folded)
    return y, (x, w, b, y)


def _c3_bwd(act, folded, res, g):
    """Direct backward from saved (x, w, b, y): the activation mask comes
    from the saved output, so the forward conv is never recomputed; the
    weight grad runs as layout-preserving dots (conv3x3_dw)."""
    from bsvd_tpu.ops.shift_conv import act_mask
    x, w, b, y = res
    mask = act_mask(y, act)
    dz = g if mask is None else g * mask
    db = dz.sum((0, 1, 2)).astype(b.dtype)

    def conv_x(v):
        return lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    dx = jax.linear_transpose(conv_x, x)(dz)[0]
    dw = conv3x3_dw(x, dz).astype(w.dtype)
    return dx, dw, db


conv3x3.defvjp(_c3_fwd, _c3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3x3_add2(x, x2, w, b, act='relu6', folded=False):
    """conv3x3(x + x2) with the skip-add fused into the kernel's tile
    assembly (outc's x0 + x1u site). Same backward as conv3x3 with the
    input gradient fanned out to both addends."""
    return conv3x3_pallas(x, w, b, x2, shift='none', act=act, folded=folded)


def _c3a_fwd(x, x2, w, b, act, folded):
    y = conv3x3_pallas(x, w, b, x2, shift='none', act=act, folded=folded)
    return y, (x, x2, w, b, y)


def _c3a_bwd(act, folded, res, g):
    from bsvd_tpu.ops.shift_conv import act_mask
    x, x2, w, b, y = res
    mask = act_mask(y, act)
    dz = g if mask is None else g * mask
    db = dz.sum((0, 1, 2)).astype(b.dtype)

    def conv_x(v):
        return lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    dx = jax.linear_transpose(conv_x, x)(dz)[0]
    dw = conv3x3_dw(x + x2, dz).astype(w.dtype)
    return dx, dx, dw, db


conv3x3_add2.defvjp(_c3a_fwd, _c3a_bwd)


def psfold_weights(w, b):
    """Permute an r=2 up-conv's output channels from torch PixelShuffle
    order (k*4 + di*2 + dj) to ps-fold lane order (di*2c + dj*c + k), so
    that the shuffled+width-folded output row 2i+di is the contiguous lane
    slice [di*2c, (di+1)*2c) of the conv result (see _epilogue ps_half)."""
    kh, kw, cin, c4 = w.shape
    c = c4 // 4
    wp = w.reshape(kh, kw, cin, c, 2, 2).transpose(0, 1, 2, 4, 5, 3)
    bp = b.reshape(c, 2, 2).transpose(1, 2, 0)
    return wp.reshape(kh, kw, cin, c4), bp.reshape(c4)


@functools.partial(jax.jit, static_argnames=('bh', 'interpret'))
def conv_ps_fold_pallas(x, w, b, *, bh=None, interpret=False):
    """Fused 3x3 conv + bias + r=2 pixel shuffle + width-fold, one kernel.

    Equivalent to ``fold2(pixel_shuffle(conv(x) + b, 2))`` — the up-path
    site whose XLA lowering costs three full-tensor relayout copies
    (pre-shuffle layout copy, the 7-D shuffle transpose, and the re-fold
    into the outc consumer; ~6.4 ms/stage on the 540p flagship trace).
    Here the shuffle+fold is free: output rows carry di, lanes carry dj.

    Args:
        x: (NT, H, W, C), C multiple of 128.
        w: (3, 3, C, 4*half) in torch PixelShuffle channel order; b: (4*half,).
    Returns:
        (NT, 2H, W, 2*half) in x.dtype — the width-folded view of the
        shuffled (NT, 2H, 2W, half) output. 2*half must be a multiple
        of 128.
    """
    nt, h, w_, c = x.shape
    cout = w.shape[-1]
    ps_half = cout // 2
    wp, bp = psfold_weights(w, b)
    if bh is None:
        bh = _pick_bh(h, w_, c, cout, 'none', jnp.dtype(x.dtype).itemsize)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh

    common = dict(
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((nt, h, 2, w_, ps_half), x.dtype),
        cost_estimate=pl.CostEstimate(flops=2 * 9 * c * cout * h * w_ * nt,
                                      bytes_accessed=x.size * 2 * 2,
                                      transcendentals=0),
        interpret=interpret,
    )
    oblock = (1, bh, 2, w_, ps_half)
    if nt == 1:
        kern = functools.partial(_kernel_nt1, bh=bh, h=h, w=w_, c=c,
                                 cout=cout, act='none', ps_half=ps_half)
        y = pl.pallas_call(
            kern,
            grid=(nhb,),
            out_specs=pl.BlockSpec(oblock, lambda hb: (0, hb, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, bh + 2, w_ + 2 * _COL0, c), x.dtype),
                pltpu.SemaphoreType.DMA((2, 1, 3)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            **common,
        )(x, wp, bp.reshape(1, cout))
    else:
        kern = functools.partial(_kernel, nt=nt, t_len=nt, bh=bh, h=h, w=w_,
                                 c=c, cout=cout, fold=c // 8, act='none',
                                 shift='none', ps_half=ps_half)
        y = pl.pallas_call(
            kern,
            grid=(nhb, nt),
            out_specs=pl.BlockSpec(oblock, lambda hb, t: (t, hb, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, bh + 2, w_ + 2 * _COL0, c), x.dtype),
                pltpu.SemaphoreType.DMA((2, 1, 3)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary', 'arbitrary')),
            **common,
        )(x, wp, bp.reshape(1, cout))
    return y.reshape(nt, 2 * h, w_, ps_half)


def _conv_ps_fold_xla(x, w, b):
    """XLA composite oracle/backward: conv + bias, r=2 shuffle, width-fold."""
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b.astype(x.dtype)
    nt, h, w_, c4 = y.shape
    c = c4 // 4
    y = y.reshape(nt, h, w_, c, 2, 2)               # (k, di, dj)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))        # (nt, h, di, w, dj, k)
    return y.reshape(nt, 2 * h, w_, 2 * c)


@jax.custom_vjp
def conv_ps_fold(x, w, b):
    """Differentiable fused up-conv + pixel shuffle + width-fold (Pallas
    forward on TPU, XLA composite backward)."""
    return conv_ps_fold_pallas(x, w, b)


def _cpf_fwd(x, w, b):
    return conv_ps_fold_pallas(x, w, b), (x, w, b)


def _ps_post(z, fold):
    """Post-conv linear part of the ps kernels: r=2 shuffle (+ width-fold).
    Its linear_transpose is the exact unshuffle the direct backwards use."""
    nt, h, w_, c4 = z.shape
    c = c4 // 4
    z = z.reshape(nt, h, w_, c, 2, 2)               # (k, di, dj)
    z = jnp.transpose(z, (0, 1, 4, 2, 5, 3))        # (nt, h, di, w, dj, k)
    return (z.reshape(nt, 2 * h, w_, 2 * c) if fold
            else z.reshape(nt, 2 * h, 2 * w_, c))


def _ps_direct_bwd(x, w, b, g, fold):
    """Direct backward for conv+shuffle(+fold): ONE unshuffle transpose of
    the cotangent, then a plain conv_grad_data and the layout-preserving
    dot-based weight grad — instead of vjp through the composite, whose
    conv_grad_weights relayouts both operands batch-minor."""
    nt, h, w_, c_in = x.shape
    cout = w.shape[-1]
    zspec = jax.ShapeDtypeStruct((nt, h, w_, cout), g.dtype)
    dz = jax.linear_transpose(lambda z: _ps_post(z, fold), zspec)(g)[0]
    db = dz.sum((0, 1, 2)).astype(b.dtype)

    def conv_x(v):
        return lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    dx = jax.linear_transpose(conv_x, x)(dz)[0]
    dw = conv3x3_dw(x, dz).astype(w.dtype)
    return dx, dw, db


def _cpf_bwd(res, g):
    x, w, b = res
    return _ps_direct_bwd(x, w, b, g, fold=True)


conv_ps_fold.defvjp(_cpf_fwd, _cpf_bwd)


@functools.partial(jax.jit, static_argnames=('bh', 'interpret'))
def conv_ps_natural_pallas(x, w, b, *, bh=None, interpret=False):
    """Fused 3x3 conv + bias + r=2 pixel shuffle in NATURAL output layout,
    one kernel — up2's site, whose consumer (up1's shift convs) reads the
    natural C>=128 layout. Equivalent to ``pixel_shuffle(conv(x) + b, 2)``,
    whose XLA lowering costs a full-tensor 7-D shuffle transpose (~1.3 ms
    per stage on the 540p flagship trace, the last XLA shuffle left).

    The shuffled write is block-structured (see _epilogue ps_nat): output
    channels pre-permuted to (di, dj, k) lane order, di riding the row
    axis and dj a sublane-level ref dimension, so all four plane writes
    are 128-aligned lane slices.

    Args:
        x: (NT, H, W, C), C multiple of 128.
        w: (3, 3, C, 4c) in torch PixelShuffle channel order, c % 128 == 0;
        b: (4c,).
    Returns:
        (NT, 2H, 2W, c) in x.dtype.
    """
    nt, h, w_, c_in = x.shape
    cout = w.shape[-1]
    c = cout // 4
    wp, bp = psfold_weights(w, b)
    if bh is None:
        bh = _pick_bh(h, w_, c_in, cout, 'none', jnp.dtype(x.dtype).itemsize)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh

    common = dict(
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((nt, h, 2, w_, 2, c), x.dtype),
        cost_estimate=pl.CostEstimate(flops=2 * 9 * c_in * cout * h * w_ * nt,
                                      bytes_accessed=x.size * 2 * 2,
                                      transcendentals=0),
        interpret=interpret,
    )
    oblock = (1, bh, 2, w_, 2, c)
    if nt == 1:
        kern = functools.partial(_kernel_nt1, bh=bh, h=h, w=w_, c=c_in,
                                 cout=cout, act='none', ps_nat=c)
        y = pl.pallas_call(
            kern,
            grid=(nhb,),
            out_specs=pl.BlockSpec(oblock, lambda hb: (0, hb, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, bh + 2, w_ + 2 * _COL0, c_in), x.dtype),
                pltpu.SemaphoreType.DMA((2, 1, 3)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            **common,
        )(x, wp, bp.reshape(1, cout))
    else:
        kern = functools.partial(_kernel, nt=nt, t_len=nt, bh=bh, h=h, w=w_,
                                 c=c_in, cout=cout, fold=c_in // 8,
                                 act='none', shift='none', ps_nat=c)
        y = pl.pallas_call(
            kern,
            grid=(nhb, nt),
            out_specs=pl.BlockSpec(oblock,
                                   lambda hb, t: (t, hb, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, bh + 2, w_ + 2 * _COL0, c_in), x.dtype),
                pltpu.SemaphoreType.DMA((2, 1, 3)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary', 'arbitrary')),
            **common,
        )(x, wp, bp.reshape(1, cout))
    return y.reshape(nt, 2 * h, 2 * w_, c)


def _conv_ps_natural_xla(x, w, b):
    """XLA composite oracle/backward: conv + bias + r=2 pixel shuffle."""
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b.astype(x.dtype)
    nt, h, w_, c4 = y.shape
    c = c4 // 4
    y = y.reshape(nt, h, w_, c, 2, 2)               # (k, di, dj)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))        # (nt, h, di, w, dj, k)
    return y.reshape(nt, 2 * h, 2 * w_, c)


@jax.custom_vjp
def conv_ps_natural(x, w, b):
    """Differentiable fused up-conv + natural-layout pixel shuffle (Pallas
    forward on TPU, XLA composite backward)."""
    return conv_ps_natural_pallas(x, w, b)


def _cpn_fwd(x, w, b):
    return conv_ps_natural_pallas(x, w, b), (x, w, b)


def _cpn_bwd(res, g):
    x, w, b = res
    return _ps_direct_bwd(x, w, b, g, fold=False)


conv_ps_natural.defvjp(_cpn_fwd, _cpn_bwd)


def conv_ps_natural_supported(x_shape, w_shape, dtype):
    """Whether the natural-layout fused shuffle kernel applies."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    try:
        if jax.devices()[0].platform not in ('tpu', 'TPU', 'axon'):
            return False
    except Exception:
        return False
    nt, h, w_, c = x_shape
    cout = w_shape[-1]
    if w_shape[:2] != (3, 3) or c % 128 != 0 or w_ % 8 != 0:
        return False
    if cout % 512 != 0:             # each (di, dj) plane must be 128-lane
        return False
    return _pick_bh(h, w_, c, cout, 'none',
                    jnp.dtype(dtype).itemsize) is not None


def conv_ps_fold_supported(x_shape, w_shape, dtype):
    """Whether the fused ps-fold kernel applies on this backend/shape."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    try:
        if jax.devices()[0].platform not in ('tpu', 'TPU', 'axon'):
            return False
    except Exception:
        return False
    nt, h, w_, c = x_shape
    cout = w_shape[-1]
    if w_shape[:2] != (3, 3) or c % 128 != 0 or w_ % 8 != 0:
        return False
    if cout % 256 != 0:             # folded half must be lane-aligned
        return False
    return _pick_bh(h, w_, c, cout, 'none',
                    jnp.dtype(dtype).itemsize) is not None


def conv3x3_supported(x_shape, w_shape, dtype, shift='none', n_in=1,
                      folded=False):
    """Whether the fused kernel applies on this backend/shape.

    Mosaic DMAs need 128-lane granularity: C must be a multiple of 128, or
    exactly 64 for the plain conv (width-folded to 128). ``n_in`` must match
    the number of inputs the call site passes (a second fused-add input
    enlarges the VMEM working set, so a block that fits at n_in=1 may not
    fit at n_in=2). ``folded``: the call site passes width-folded weights
    (the 6-dot dedup path; slightly different VMEM footprint)."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    try:
        if jax.devices()[0].platform not in ('tpu', 'TPU', 'axon'):
            return False
    except Exception:
        return False
    nt, h, w_, c = x_shape
    if w_shape[0] != 3 or w_shape[1] != 3:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if c == 64 and shift == 'none' and w_ % 2 == 0 and not folded:
        c, w_ = 128, w_ // 2
        if w_ % 8 != 0:      # HBM row DMAs need an 8-aligned logical width
            return False
        return _pick_bh(h, w_, c, 2 * w_shape[-1], shift,
                        itemsize, n_in=n_in, folded=True) is not None
    if c % 128 != 0 or w_ % 8 != 0:
        return False
    return _pick_bh(h, w_, c, w_shape[-1], shift, itemsize,
                    n_in=n_in, folded=folded) is not None

"""Pallas TPU kernel: fused streaming BiBufferConv step (NT=1).

The per-frame streaming step spends ~3.6 ms/frame (measured, round 3) in
XLA materializations around its 16 buffered temporal convs: assembling each
conv input ``concat(x[:f], left, center[2f:])`` and updating the carried
buffers. With the buffer state PACKED as ``B = [left, center[f:]]`` (the
never-read ``center[:f]`` dropped — exactly C lanes), both the conv input
and the next state become pure lane slices of (x, B):

    inp    = [x[:f],  B[:f],  B[2f:]]
    B_next = [B[f:2f], x[f:]]

so one kernel DMAs the two tiles, assembles the input with an in-VMEM lane
concat, runs the 9 MXU dots, and emits (y, B_next) — zero XLA glue.
Row-block-pipelined like the NT=1 plain-conv kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsvd_tpu.ops._tile import COL0 as _COL0, dots9, halo_row_dmas, zero_halo


def _pick_bh(h, w, c, cout, itemsize=2, vmem_budget=15 * 1024 * 1024):
    c_pad = -(-c // 128) * 128
    cout_pad = -(-cout // 128) * 128
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0),
                     reverse=True):
        tile = (bh + 2) * (w + 2 * _COL0) * c_pad * itemsize
        acc = bh * w * cout_pad * 4
        out = 2 * bh * w * (cout_pad + c_pad) * itemsize
        wts = 9 * c_pad * cout_pad * itemsize + cout_pad * 4
        total = int(5.0 * tile) + 2 * acc + out + 2 * wts
        if total <= vmem_budget and bh * w >= 512:
            return bh
    return None


def _kernel_bibuf(x_hbm, s_hbm, w_ref, b_ref, y_ref, bn_ref, ring, sems, *,
                  bh, h, w, c, cout, fold, act, causal=False):
    hb = pl.program_id(0)
    nhb = pl.num_programs(0)

    def block_dmas(blk, slot):
        row0 = blk * bh
        out = []
        for i, src_hbm in enumerate((x_hbm, s_hbm)):
            out += halo_row_dmas(src_hbm.at[0], ring.at[slot, i], sems,
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
    for i in range(2):
        zero_halo(ring, slot, i, hb, nhb, bh, w, c)

    xt = ring[slot, 0]
    st = ring[slot, 1]
    if causal:
        # inp = [left (2f), x[2f:]]; state carries left padded to C lanes
        tile = jnp.concatenate([st[:, :, :2 * fold], xt[:, :, 2 * fold:]],
                               axis=-1)
    else:
        tile = jnp.concatenate([xt[:, :, :fold], st[:, :, :fold],
                                st[:, :, 2 * fold:]], axis=-1)
    a = dots9(tile, w_ref, b_ref, bh, w, _COL0, act)
    y_ref[...] = a.astype(y_ref.dtype)[None]
    if causal:
        # next left = x[:2f] (kept C-lane padded; tail lanes are don't-care
        # but must be deterministic — carry x through)
        bn_ref[...] = xt[1:bh + 1, _COL0:_COL0 + w, :][None]
    else:
        bn_ref[...] = jnp.concatenate(
            [st[1:bh + 1, _COL0:_COL0 + w, fold:2 * fold],
             xt[1:bh + 1, _COL0:_COL0 + w, fold:]], axis=-1)[None]


@functools.partial(jax.jit,
                   static_argnames=('fold_div', 'act', 'bh', 'causal',
                                    'interpret'))
def bibuffer_conv_pallas(x, state, w, b, *, fold_div=8, act='relu6', bh=None,
                         causal=False, interpret=False):
    """One fused streaming BiBufferConv step (steady state, NT=1).

    Args:
        x: (1, H, W, C) live frame; state: (1, H, W, C) packed buffer
            ``[left, center[f:]]``.
        w: (3, 3, C, Cout); b: (Cout,).
    Returns:
        (y (1, H, W, Cout), new_state (1, H, W, C)).
    """
    from bsvd_tpu.ops.conv3x3 import check_act
    check_act(act)
    nt, h, w_, c = x.shape
    assert nt == 1
    cout = w.shape[-1]
    fold = c // fold_div
    if bh is None:
        bh = _pick_bh(h, w_, c, cout, jnp.dtype(x.dtype).itemsize)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh

    kern = functools.partial(_kernel_bibuf, bh=bh, h=h, w=w_, c=c, cout=cout,
                             fold=fold, act=act, causal=causal)
    return pl.pallas_call(
        kern,
        grid=(nhb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bh, w_, cout), lambda hb: (0, hb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w_, c), lambda hb: (0, hb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, h, w_, cout), x.dtype),
            jax.ShapeDtypeStruct((1, h, w_, c), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, bh + 2, w_ + 2 * _COL0, c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2, 3)),
        ],
        cost_estimate=pl.CostEstimate(flops=2 * 9 * c * cout * h * w_,
                                      bytes_accessed=x.size * 2 * 3,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x, state, w, b.reshape(1, cout))


def bibuffer_conv_reference(x, state, w, b, fold_div=8, act='relu6',
                            causal=False):
    """XLA composite with identical semantics (oracle + CPU fallback)."""
    c = x.shape[-1]
    fold = c // fold_div
    if causal:
        inp = jnp.concatenate([state[..., :2 * fold], x[..., 2 * fold:]],
                              axis=-1)
    else:
        inp = jnp.concatenate([x[..., :fold], state[..., :fold],
                               state[..., 2 * fold:]], axis=-1)
    y = lax.conv_general_dilated(inp, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y + b.astype(y.dtype)
    if act == 'relu':
        y = jnp.maximum(y, 0)
    elif act == 'relu6':
        y = jnp.clip(y, 0, jnp.asarray(6, y.dtype))
    if causal:
        new_state = x
    else:
        new_state = jnp.concatenate([state[..., fold:2 * fold],
                                     x[..., fold:]], axis=-1)
    return y, new_state


def bibuffer_conv_supported(x_shape, w_shape, dtype):
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    try:
        if jax.devices()[0].platform not in ('tpu', 'TPU', 'axon'):
            return False
    except Exception:
        return False
    nt, h, w_, c = x_shape
    if nt != 1 or w_shape[0] != 3 or w_shape[1] != 3 or c % 128 != 0 \
            or w_ % 8 != 0:
        return False
    return _pick_bh(h, w_, c, w_shape[-1],
                    jnp.dtype(dtype).itemsize) is not None


# ---------------------------------------------------------------------------
# chained MemCvBlock step: BOTH buffered convs of a block in ONE kernel
# ---------------------------------------------------------------------------

def _pick_bh_bichain(h, w, c, c1, cout, itemsize=2, vmem_budget=None):
    # budget calibrated on-chip at the flagship 270p/128ch streaming site:
    # bh=5 (est 18.3 MiB) compiles and is the measured optimum (0.842 ms vs
    # 0.986 ms two-step); bh=6 (est 21.4 MiB) is past the Mosaic ceiling.
    # Calibration is bf16; the estimate->actual ratio is dtype-dependent
    # (see ops/conv_chain._pick_bh_chain), so fp32 keeps the conservative
    # budget.
    if vmem_budget is None:
        vmem_budget = int((19.5 if itemsize == 2 else 15.0) * 1024 * 1024)
    c_pad = -(-c // 128) * 128
    c1_pad = -(-c1 // 128) * 128
    cout_pad = -(-cout // 128) * 128
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0),
                     reverse=True):
        tile1 = (bh + 2) * (w + 2 * _COL0) * c_pad * itemsize
        tile2 = (bh + 2) * (w + 2 * _COL0) * c1_pad * itemsize
        interm = 3 * bh * (w + 2 * _COL0) * c1_pad * itemsize
        acc = bh * w * (c1_pad + cout_pad) * 4
        out = 2 * bh * w * (cout_pad + c_pad + c1_pad) * itemsize
        wts = 9 * (c_pad * c1_pad + c1_pad * cout_pad) * itemsize * 2
        # ~2.5 tile equivalents of lane-concat assembly temporaries
        # (same allowance as conv3x3's shift path)
        total = int(2 * 2 * tile1 + 2 * tile2 + 2.5 * tile2) \
            + interm + 2 * acc + out + wts
        if total <= vmem_budget and bh * w >= 512:
            return bh
    return None


def _kernel_bibuf_chain(x_hbm, s1_hbm, s2_hbm, w1_ref, b1_ref, w2_ref, b2_ref,
                        y_ref, s1n_ref, s2n_ref, ring, sems, ring2, sems2,
                        interm, *, bh, h, w, c, c1, cout, fold1, fold2,
                        act, act2, causal):
    """Rolling-intermediate chain of two streaming BiBufferConv steps —
    conv_chain._kernel_chain's structure (grid (nhb+1,), 3-slot VMEM
    intermediate ring, one drain step) with bibuffer lane assembly on both
    convs and the three state outputs:

        y1, s1' = bibuf(x, s1, w1);  y2, s2' = bibuf(y1, s2, w2)

    y1 never touches HBM as a conv input; its lanes that form s2' are
    emitted straight from the intermediate ring."""
    hb = pl.program_id(0)
    nhb = pl.num_programs(0) - 1

    def tile_dmas(blk, slot):
        row0 = blk * bh
        out = []
        for i, src_hbm in enumerate((x_hbm, s1_hbm)):
            out += halo_row_dmas(src_hbm.at[0], ring.at[slot, i], sems,
                                 (slot, i), row0, bh, h, w)
        return out

    def s2_dmas(blk, slot):
        return halo_row_dmas(s2_hbm.at[0], ring2.at[slot, 0], sems2,
                             (slot, 0), blk * bh, bh, h, w)

    # ---- conv1 (+ s1' emit) for row block hb ----
    @pl.when(hb < nhb)
    def _():
        @pl.when(hb == 0)
        def _():
            for d in tile_dmas(0, 0):
                d.start()

        @pl.when(hb + 1 < nhb)
        def _():
            for d in tile_dmas(hb + 1, (hb + 1) % 2):
                d.start()

        # s2's tile for block hb is consumed by conv2 one step later —
        # starting it here gives a full step of DMA/compute overlap
        for d in s2_dmas(hb, hb % 2):
            d.start()

        slot = hb % 2
        for d in tile_dmas(hb, slot):
            d.wait()
        for i in range(2):
            zero_halo(ring, slot, i, hb, nhb, bh, w, c)

        xt = ring[slot, 0]
        st = ring[slot, 1]
        if causal:
            tile = jnp.concatenate([st[:, :, :2 * fold1],
                                    xt[:, :, 2 * fold1:]], axis=-1)
        else:
            tile = jnp.concatenate([xt[:, :, :fold1], st[:, :, :fold1],
                                    st[:, :, 2 * fold1:]], axis=-1)
        a1 = dots9(tile, w1_ref, b1_ref, bh, w, _COL0, act)
        islot = hb % 3
        interm[islot, :, _COL0:_COL0 + w, :] = a1.astype(interm.dtype)
        # zero only the 1-column halo dots9 actually reads (col0-1 / col0+w)
        interm[islot, :, _COL0 - 1:_COL0, :] = jnp.zeros((bh, 1, c1),
                                                         interm.dtype)
        interm[islot, :, _COL0 + w:_COL0 + w + 1, :] = jnp.zeros(
            (bh, 1, c1), interm.dtype)
        if causal:
            s1n_ref[...] = xt[1:bh + 1, _COL0:_COL0 + w, :][None]
        else:
            s1n_ref[...] = jnp.concatenate(
                [st[1:bh + 1, _COL0:_COL0 + w, fold1:2 * fold1],
                 xt[1:bh + 1, _COL0:_COL0 + w, fold1:]], axis=-1)[None]

    # ---- conv2 (+ s2' emit) for row block hb - 1 ----
    @pl.when(hb > 0)
    def _():
        ob = hb - 1
        slot2 = ob % 2
        for d in s2_dmas(ob, slot2):
            d.wait()
        zero_halo(ring2, slot2, 0, ob, nhb, bh, w, c1)

        top = interm[(hb + 1) % 3, bh - 1:bh]          # == (hb-2) % 3
        top = jnp.where(ob > 0, top, jnp.zeros_like(top))
        mid = interm[(hb + 2) % 3]                     # == (hb-1) % 3
        bot = interm[hb % 3, 0:1]
        bot = jnp.where(hb < nhb, bot, jnp.zeros_like(bot))
        # full-width (w + 2*COL0) tiles keep every concat operand at
        # sublane offset 0 — Mosaic rejects lane concats whose operands
        # disagree on the non-concat (column) offset
        itile = jnp.concatenate([top, mid, bot], axis=0)  # (bh+2, wp, c1)
        s2t = ring2[slot2, 0]
        if causal:
            tile = jnp.concatenate([s2t[:, :, :2 * fold2],
                                    itile[:, :, 2 * fold2:]], axis=-1)
        else:
            tile = jnp.concatenate([itile[:, :, :fold2], s2t[:, :, :fold2],
                                    s2t[:, :, 2 * fold2:]], axis=-1)
        a2 = dots9(tile, w2_ref, b2_ref, bh, w, _COL0, act2)
        y_ref[...] = a2.astype(y_ref.dtype)[None]
        y1_main = mid[:, _COL0:_COL0 + w, :]
        if causal:
            s2n_ref[...] = y1_main[None]
        else:
            s2n_ref[...] = jnp.concatenate(
                [s2t[1:bh + 1, _COL0:_COL0 + w, fold2:2 * fold2],
                 y1_main[:, :, fold2:]], axis=-1)[None]


@functools.partial(jax.jit,
                   static_argnames=('fold_div', 'act', 'act2', 'bh', 'causal',
                                    'interpret'))
def bibuffer_chain_pallas(x, s1, s2, w1, b1, w2, b2, *, fold_div=8,
                          act='relu6', act2='relu6', bh=None, causal=False,
                          interpret=False):
    """One fused streaming MemCvBlock step (steady state, NT=1): BOTH
    buffered shift-convs chained in one kernel, the intermediate frame
    rolling through VMEM (reference MemCvBlock, bsvd_arch.py:116-149;
    sequential-step semantics == two bibuffer_conv_pallas calls).

    Args:
        x: (1, H, W, C) live frame.
        s1: (1, H, W, C) conv1's packed buffer; s2: (1, H, W, C1) conv2's.
        w1: (3, 3, C, C1); w2: (3, 3, C1, Cout).
    Returns:
        (y (1, H, W, Cout), s1' (1, H, W, C), s2' (1, H, W, C1)).
    """
    from bsvd_tpu.ops.conv3x3 import check_act
    check_act(act)
    check_act(act2)
    nt, h, w_, c = x.shape
    assert nt == 1
    c1 = w1.shape[-1]
    cout = w2.shape[-1]
    assert s2.shape == (1, h, w_, c1), (s2.shape, c1)
    fold1 = c // fold_div
    fold2 = c1 // fold_div
    if bh is None:
        bh = _pick_bh_bichain(h, w_, c, c1, cout,
                              jnp.dtype(x.dtype).itemsize)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh

    kern = functools.partial(_kernel_bibuf_chain, bh=bh, h=h, w=w_, c=c,
                             c1=c1, cout=cout, fold1=fold1, fold2=fold2,
                             act=act, act2=act2, causal=causal)
    last = nhb - 1
    return pl.pallas_call(
        kern,
        grid=(nhb + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3 + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec((1, bh, w_, cout),
                         lambda hb: (0, jnp.maximum(hb - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w_, c),
                         lambda hb: (0, jnp.minimum(hb, last), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w_, c1),
                         lambda hb: (0, jnp.maximum(hb - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, h, w_, cout), x.dtype),
            jax.ShapeDtypeStruct((1, h, w_, c), x.dtype),
            jax.ShapeDtypeStruct((1, h, w_, c1), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, bh + 2, w_ + 2 * _COL0, c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2, 3)),
            pltpu.VMEM((2, 1, bh + 2, w_ + 2 * _COL0, c1), x.dtype),
            pltpu.SemaphoreType.DMA((2, 1, 3)),
            pltpu.VMEM((3, bh, w_ + 2 * _COL0, c1), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * (c * c1 + c1 * cout) * h * w_,
            bytes_accessed=x.size * 2 * 3,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x, s1, s2, w1, b1.reshape(1, c1), w2, b2.reshape(1, cout))


def bibuffer_chain_reference(x, s1, s2, w1, b1, w2, b2, fold_div=8,
                             act='relu6', act2='relu6', causal=False):
    """XLA composite with identical semantics (oracle + CPU fallback)."""
    y1, s1n = bibuffer_conv_reference(x, s1, w1, b1, fold_div, act, causal)
    y2, s2n = bibuffer_conv_reference(y1, s2, w2, b2, fold_div, act2, causal)
    return y2, s1n, s2n


# ---------------------------------------------------------------------------
# multi-frame streaming step (F >= 1): weight-shared micro-batch
# ---------------------------------------------------------------------------
#
# With the PACKED buffer state B = [left, center[f:]], the state recurrence
# is pure lane slices of the inputs: B_{i+1} = [B_i[f:2f], x_i[f:]], so for
# i >= 2 the conv input collapses to the MIMO temporal-shift pattern
#     inp_i = [x_i[:f], x_{i-2}[f:2f], x_{i-1}[2f:]]
# and the whole F-frame advance is the frame-minor MIMO shift kernel over a
# virtual sequence Z = [z0, z1, x_0..x_{F-1}] where z0/z1 carry B's lanes
# (z0[f:2f] = B[:f]; z1 = B), evaluated at positions 1..F with NO clip-
# boundary masking. One kernel loads the weights ONCE for all F frames —
# this closes the NT=1 kernel's per-frame DMA-prologue overhead (PERF.md
# round-5 headroom 3). Causal: Z = [B, x] and inp_i = [x_{i-1}[:2f],
# x_i[2f:]] (reference semantics: bsvd_arch.py:53-114 / temporal_shift.py:46,
# advanced F frames at a time).


def _pick_bh_multi(h, w, c, cout, itemsize=2, vmem_budget=15 * 1024 * 1024):
    c_pad = -(-c // 128) * 128
    cout_pad = -(-cout // 128) * 128
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0),
                     reverse=True):
        tile = (bh + 2) * (w + 2 * _COL0) * c_pad * itemsize
        acc = bh * w * cout_pad * 4
        out = 2 * bh * w * (cout_pad + c_pad) * itemsize
        wts = 9 * c_pad * cout_pad * itemsize + cout_pad * 4
        total = int((4 + 2.5) * tile) + 2 * acc + out + 2 * wts
        if total <= vmem_budget and bh * w >= 512:
            return bh
    return None


def _kernel_bibuf_multi(x_hbm, s_hbm, w_ref, b_ref, y_ref, bn_ref, ring, sems,
                        *, nf, bh, h, w, c, cout, fold, act, causal):
    hb = pl.program_id(0)
    t = pl.program_id(1)
    nhb = pl.num_programs(0)
    ns = 1 if causal else 2          # state frames prepended to the sequence
    row0 = hb * bh

    def dmas(src, slot):
        return halo_row_dmas(src, ring.at[slot, 0], sems, (slot, 0),
                             row0, bh, h, w)

    def fix(slot):
        zero_halo(ring, slot, 0, hb, nhb, bh, w, c)

    @pl.when(t == 0)
    def _():
        # prologue: the packed state B verbatim into the ns virtual-frame
        # slots + x[0]; wait the state frames, leave x[0] in flight for the
        # common wait below. Slot 0 (bidir) nominally holds z0 with
        # z0[f:2f] = B[:f] — instead of materializing that roll in HBM
        # (measured 2.0 ms/frame of XLA roll+concat at the 540p sites), B
        # is DMAed as-is and the t == 0 assembly reads the past slice at
        # lanes [:f] via a lane-offset select.
        for k in range(ns):
            for d in dmas(s_hbm.at[0], k % 4):
                d.start()
        for d in dmas(x_hbm.at[0], ns % 4):
            d.start()
        for k in range(ns):
            for d in dmas(s_hbm.at[0], k % 4):
                d.wait()
            fix(k % 4)

    @pl.when(t + 1 < nf)
    def _():                          # Z_{t+ns+1} = x[t+1], one in flight
        for d in dmas(x_hbm.at[t + 1], (t + ns + 1) % 4):
            d.start()

    for d in dmas(x_hbm.at[t], (t + ns) % 4):   # wait Z_{t+ns} = x[t]
        d.wait()
    fix((t + ns) % 4)

    # output position p = t + 1 over Z: cur = Z_{t+1}, past = Z_t,
    # future = Z_{t+2} (bidirectional) — no boundary masking: the block is
    # interior by construction (state supplies the past, x[t] the future)
    zt = ring[t % 4, 0]
    z1 = ring[(t + 1) % 4, 0]
    if causal:
        tile = jnp.concatenate([zt[:, :, :2 * fold], z1[:, :, 2 * fold:]],
                               axis=-1)
    else:
        z2 = ring[(t + 2) % 4, 0]
        # past slice: Z_t[f:2f]; at t == 0 slot 0 holds B verbatim, whose
        # carried past lives at lanes [:f] (see the prologue note)
        past = jnp.where(t == 0, zt[:, :, :fold], zt[:, :, fold:2 * fold])
        tile = jnp.concatenate([z2[:, :, :fold], past,
                                z1[:, :, 2 * fold:]], axis=-1)
    a = dots9(tile, w_ref, b_ref, bh, w, _COL0, act)
    y_ref[...] = a.astype(y_ref.dtype)[None]

    @pl.when(t == nf - 1)
    def _():
        # next packed state: [x_{F-2}[f:2f], x_{F-1}[f:]] = [Z_{nf}[f:2f],
        # Z_{nf+1}[f:]] (bidir); causal: the last frame verbatim
        zl = ring[(t + 1) % 4, 0]
        if causal:
            bn_ref[...] = zl[1:bh + 1, _COL0:_COL0 + w, :][None]
        else:
            zf = ring[(t + 2) % 4, 0]
            bn_ref[...] = jnp.concatenate(
                [zl[1:bh + 1, _COL0:_COL0 + w, fold:2 * fold],
                 zf[1:bh + 1, _COL0:_COL0 + w, fold:]], axis=-1)[None]


@functools.partial(jax.jit,
                   static_argnames=('fold_div', 'act', 'bh', 'causal',
                                    'interpret'))
def bibuffer_multi_pallas(x, state, w, b, *, fold_div=8, act='relu6', bh=None,
                          causal=False, interpret=False):
    """Advance one streaming BiBufferConv by F frames in ONE kernel.

    Exactly F sequential ``bibuffer_conv_pallas`` steps (same packed-state
    protocol), but the weights are DMAed once and the frame-minor ring
    pipeline amortizes the per-frame prologue — MIMO-kernel throughput for
    streaming blocks (StreamDenoiser.push_block).

    Args:
        x: (F, H, W, C) stacked live frames; state: (1, H, W, C) packed
            buffer ``[left, center[f:]]`` (causal: the previous frame).
        w: (3, 3, C, Cout); b: (Cout,).
    Returns:
        (y (F, H, W, Cout), new_state (1, H, W, C)).
    """
    from bsvd_tpu.ops.conv3x3 import check_act
    check_act(act)
    nf, h, w_, c = x.shape
    cout = w.shape[-1]
    fold = c // fold_div
    if bh is None:
        bh = _pick_bh_multi(h, w_, c, cout, jnp.dtype(x.dtype).itemsize)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh

    kern = functools.partial(_kernel_bibuf_multi, nf=nf, bh=bh, h=h, w=w_,
                             c=c, cout=cout, fold=fold, act=act,
                             causal=causal)
    return pl.pallas_call(
        kern,
        grid=(nhb, nf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bh, w_, cout), lambda hb, t: (t, hb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w_, c), lambda hb, t: (0, hb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nf, h, w_, cout), x.dtype),
            jax.ShapeDtypeStruct((1, h, w_, c), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 1, bh + 2, w_ + 2 * _COL0, c), x.dtype),
            pltpu.SemaphoreType.DMA((4, 1, 3)),
        ],
        cost_estimate=pl.CostEstimate(flops=2 * 9 * c * cout * h * w_ * nf,
                                      bytes_accessed=x.size * 2 * 2,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x, state, w, b.reshape(1, cout))


def bibuffer_multi_reference(x, state, w, b, fold_div=8, act='relu6',
                             causal=False):
    """XLA composite with identical semantics: F sequential streaming steps
    (oracle + CPU fallback)."""
    def body(s, xi):
        y, sn = bibuffer_conv_reference(xi[None], s, w, b, fold_div, act,
                                        causal)
        return sn, y[0]
    sn, ys = lax.scan(body, state, x)
    return ys, sn


def bibuffer_multi_supported(x_shape, w_shape, dtype):
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    try:
        if jax.devices()[0].platform not in ('tpu', 'TPU', 'axon'):
            return False
    except Exception:
        return False
    nf, h, w_, c = x_shape
    if (nf < 1 or w_shape[0] != 3 or w_shape[1] != 3 or c % 128 != 0
            or w_ % 8 != 0):
        return False
    return _pick_bh_multi(h, w_, c, w_shape[-1],
                          jnp.dtype(dtype).itemsize) is not None


def bibuffer_chain_supported(x_shape, w1_shape, w2_shape, dtype):
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    try:
        if jax.devices()[0].platform not in ('tpu', 'TPU', 'axon'):
            return False
    except Exception:
        return False
    nt, h, w_, c = x_shape
    c1 = w1_shape[-1]
    if nt != 1 or w1_shape[:2] != (3, 3) or w2_shape[:2] != (3, 3):
        return False
    if c % 128 != 0 or c1 % 128 != 0 or w_ % 8 != 0:
        return False
    # measured on-chip: the chain wins at 128-lane sites (270p down0,
    # 1.17x over two sequential bibuffer kernels) but loses at 256-lane
    # sites (135p down1, 0.96x — the 3-slot c1 intermediate ring caps bh
    # at 3). Keep wide sites on the two-step path.
    if c > 128 or c1 > 128:
        return False
    return _pick_bh_bichain(h, w_, c, c1, w2_shape[-1],
                            jnp.dtype(dtype).itemsize) is not None

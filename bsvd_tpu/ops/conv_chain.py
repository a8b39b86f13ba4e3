"""Pallas TPU kernel: TWO chained 3x3 convs (conv1+act1 -> conv2+act2) in
one pass — the intermediate NEVER touches HBM.

Sites: the WNet inc pair (c1 -> c2) and outc pair (c1 -> c2, with the
skip-add fused into conv1's input). Chaining classically costs halo
recompute; this kernel avoids it entirely with a ROLLING intermediate:

- the grid is (nt, nhb + 1) with the row-block axis MINOR, so consecutive
  steps walk consecutive row blocks of one frame;
- step (t, hb) runs conv1 on row block hb (bh fresh rows into a 3-slot
  VMEM intermediate ring) and conv2 on row block hb-1, whose +-1-row halo
  is already present in the neighbouring ring slots;
- one drain step per frame (hb == nhb) finishes the last conv2 block.

Zero redundant FLOPs, one DMA stream (double-buffered input tiles), fp32
accumulation in both convs, bias+act fused.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsvd_tpu.ops._tile import (COL0 as _COL0, dedup_folded_weights,
                                dots9, dots_folded, halo_row_dmas, zero_halo)


def _pick_bh_chain(h, w, c, c1, cout, itemsize=2, n_in=1, has_res=False,
                   folded=False, vmem_budget=None, res_lanes=None):
    # vmem_budget is calibrated in *estimate* space against the real chip
    # (tools/sweep_chain_bh.py, v5e): the flagship folded 540x480xC128
    # shapes compile at an estimated 24.72 MiB (n_in=1, bh=10) and fail
    # Mosaic allocation at 25.13 MiB (n_in=2, bh=9), so 24.9 MiB admits
    # every measured-good block height (bh=10/6/6, ~1.2 ms/run faster
    # than the old 15 MiB picks of 5/4/4) while rejecting the overflows.
    # The estimate->actual ratio is DTYPE-dependent (fp32 packs none of the
    # bf16 (2,1) tiling slack): at 24.9 the fp32 train step's 96x48 outc
    # chain picked bh=32 and overran the 16 MiB scoped-vmem stack by 648 KiB
    # at compile. fp32 keeps the conservative budget that always held.
    if vmem_budget is None:
        vmem_budget = int((24.9 if itemsize == 2 else 15.0) * 1024 * 1024)
    c_pad = -(-c // 128) * 128
    c1_pad = -(-c1 // 128) * 128
    cout_pad = -(-cout // 128) * 128
    n_taps = 6 if folded else 9
    tmp = 4.0 if folded else 2.0       # dedup: rotation+splice per conv
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0),
                     reverse=True):
        tile = (bh + 2) * (w + 2 * _COL0) * c_pad * itemsize
        interm = 3 * bh * (w + 2) * c1_pad * itemsize
        acc = bh * w * (c1_pad + cout_pad) * 4
        out = 2 * bh * w * cout_pad * itemsize
        wts = n_taps * (c_pad * c1_pad + c1_pad * cout_pad) * itemsize * 2
        res_pad = (-(-res_lanes // 128) * 128 if res_lanes is not None
                   else cout_pad)
        res = 2 * bh * w * res_pad * itemsize if has_res else 0
        if has_res:
            # the fp32 residual tile (cast or projection output) — the
            # H=544 burn-in shapes picked bh=8 without this and overran
            # the 16 MiB scoped-vmem stack by 712 KiB at compile
            res += bh * w * cout_pad * 4
        if has_res and res_lanes is not None:
            # in-kernel projection: the (bh*w, res_lanes) operand view
            res += bh * w * res_pad * itemsize
        total = (int(2 * n_in * tile + tmp * tile) + interm + 2 * acc + out
                 + wts + res)
        if total <= vmem_budget and bh * w >= 512:
            return bh
    return None


def _kernel_chain(*refs, nt, bh, h, w, c, c1, cout, act1, act2, n_in,
                  res_ch=None, folded=False, res_proj=False):
    xs = refs[:n_in]
    proj_ref = None
    if res_ch is None:
        x_res = res_ring = res_sems = None
        (w1_ref, b1_ref, w2_ref, b2_ref, o_ref, ring, sems,
         interm) = refs[n_in:]
    elif res_proj:
        # residual source arrives in a WIDER lane layout (e.g. the folded
        # stage input, 128 lanes) and is projected to the output's lane
        # layout in-kernel via a 0/1 matrix — the tail stage's sub-128-lane
        # embed+subtract XLA fusion (2.9 ms on the 540p flagship trace)
        # never materializes.
        (x_res, w1_ref, b1_ref, w2_ref, b2_ref, proj_ref, o_ref, ring, sems,
         interm, res_ring, res_sems) = refs[n_in:]
    else:
        (x_res, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, ring, sems, interm,
         res_ring, res_sems) = refs[n_in:]
    t = pl.program_id(0)
    hb = pl.program_id(1)
    nhb = pl.num_programs(1) - 1
    k = t * nhb + hb                      # global tile counter (hb < nhb)

    def res_dma(kk, slot):
        """Residual-source tile for block kk (main rows only, no halo):
        consumed one step later by conv2's epilogue, so a 2-slot ring gives
        a full step of DMA/compute overlap."""
        tt = kk // nhb
        row0 = (kk % nhb) * bh
        return pltpu.make_async_copy(
            x_res.at[tt].at[pl.ds(row0, bh), :, :],
            res_ring.at[slot],
            res_sems.at[slot])

    def tile_dmas(kk, slot):
        tt = kk // nhb
        row0 = (kk % nhb) * bh
        out = []
        for i, x_hbm in enumerate(xs):
            out += halo_row_dmas(x_hbm.at[tt], ring.at[slot, i], sems,
                                 (slot, i), row0, bh, h, w)
        return out

    def start(kk):
        for d in tile_dmas(kk, kk % 2):
            d.start()

    # ---- conv1 for row block hb ----
    @pl.when(hb < nhb)
    def _():
        @pl.when(k == 0)
        def _():
            start(0)

        @pl.when(k + 1 < nt * nhb)
        def _():
            start(k + 1)

        if res_ch is not None:
            res_dma(k, k % 2).start()

        slot = k % 2
        for d in tile_dmas(k, slot):
            d.wait()
        for i in range(n_in):
            zero_halo(ring, slot, i, hb, nhb, bh, w, c)

        tile = ring[slot, 0]
        for i in range(1, n_in):
            tile = tile + ring[slot, i]
        if folded:
            # width-folded dedup: w refs are stacked (2, 3, 2C, 2Cout)
            # [dense, combined] pairs (see _tile.dots_folded)
            a1 = dots_folded(tile, w1_ref[0], w1_ref[1], b1_ref, bh, w,
                             _COL0, act1)
        else:
            a1 = dots9(tile, w1_ref, b1_ref, bh, w, _COL0, act1)
        islot = hb % 3
        interm[islot, :, 1:w + 1, :] = a1.astype(interm.dtype)
        interm[islot, :, 0:1, :] = jnp.zeros((bh, 1, c1), interm.dtype)
        interm[islot, :, w + 1:w + 2, :] = jnp.zeros((bh, 1, c1),
                                                     interm.dtype)

    # ---- conv2 for row block hb - 1 ----
    @pl.when(hb > 0)
    def _():
        ob = hb - 1
        top = interm[(hb + 1) % 3, bh - 1:bh]          # == (hb-2) % 3
        top = jnp.where(ob > 0, top, jnp.zeros_like(top))
        mid = interm[(hb + 2) % 3]                     # == (hb-1) % 3
        bot = interm[hb % 3, 0:1]
        bot = jnp.where(hb < nhb, bot, jnp.zeros_like(bot))
        itile = jnp.concatenate([top, mid, bot], axis=0)   # (bh+2, w+2, c1)
        if folded:
            a2 = dots_folded(itile, w2_ref[0], w2_ref[1], b2_ref, bh, w, 1,
                             act2)
        else:
            a2 = dots9(itile, w2_ref, b2_ref, bh, w, 1, act2)
        if res_ch is not None:
            # per-stage residual fused into the epilogue: the first res_ch
            # lanes of each folded half become x_res - y (reference
            # wnet_models.py:181 ``in[:, :rc] - out``), selected by a
            # static lane mask — no XLA select/pad/layout round trip.
            ob_slot = (k - 1) % 2
            res_dma(k - 1, ob_slot).wait()
            if proj_ref is not None:
                # 0/1 lane projection — exact in the input dtype, so the
                # (bh, w, res_lanes) tile is never cast up; only the tiny
                # projected result accumulates in fp32
                rt_n = res_ring[ob_slot]
                rt = lax.dot_general(
                    rt_n.reshape(bh * w, rt_n.shape[-1]), proj_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(bh, w, cout)
            else:
                rt = res_ring[ob_slot].astype(jnp.float32)
            lane = lax.broadcasted_iota(jnp.int32, (bh, w, cout), 2)
            a2 = jnp.where((lane % (cout // 2)) < res_ch, rt - a2, a2)
        o_ref[...] = a2.astype(o_ref.dtype)[None]


def res_embed_matrix(in_c, s_out, dtype=np.float32):
    """0/1 projection from folded-input lanes (dj*in_c + ch) to folded-
    output lanes (dj*s_out + ch), ch < min(in_c, s_out) — exactly
    wnet_arch.embed_half_lanes's map, as a matrix the chain kernel can
    apply in VMEM."""
    emb = np.zeros((2 * in_c, 2 * s_out), dtype)
    for dj in range(2):
        for ch in range(min(in_c, s_out)):
            emb[dj * in_c + ch, dj * s_out + ch] = 1.0
    return emb


@functools.partial(jax.jit,
                   static_argnames=('act1', 'act2', 'res_ch', 'bh', 'folded',
                                    'res_embed', 'interpret'))
def conv_chain_pallas(x, w1, b1, w2, b2, x2=None, x_res=None, *, act1='relu6',
                      act2='none', res_ch=None, bh=None, folded=False,
                      res_embed=None, interpret=False):
    """Chained 3x3 convs: act2(conv2(act1(conv1(x (+x2))))), one kernel.

    Args:
        x: (NT, H, W, C); x2: optional second addend for conv1's input.
        w1: (3, 3, C, C1); w2: (3, 3, C1, Cout). C, C1 multiples of 128.
        x_res: optional residual source; with ``res_ch`` set, output lanes
            l with l % (Cout/2) < res_ch become x_res - y (the folded
            per-stage residual combine, fused). Shape (NT, H, W, Cout) —
            or, with ``res_embed``, the RAW folded stage input.
        res_embed: optional static (in_c, s_out): x_res has 2*in_c lanes
            (a multiple of 128) and is projected to the output lane layout
            IN KERNEL via the 0/1 embed matrix — serves the tail stage
            whose 2*s_out < 128 output lanes would otherwise force the
            embed+subtract onto a sub-128-lane XLA fusion.
        folded: BOTH weights are width-folded (fold_width_weights layout)
            on folded views — both convs run the 6-dot dedup contraction
            (_tile.dots_folded) instead of 9 dots each.
    Returns:
        (NT, H, W, Cout) in x.dtype.
    """
    from bsvd_tpu.ops.conv3x3 import check_act
    check_act(act1)
    check_act(act2)
    nt, h, w_, c = x.shape
    c1 = w1.shape[-1]
    cout = w2.shape[-1]
    xs = (x,) if x2 is None else (x, x2)
    n_in = len(xs)
    has_res = res_ch is not None
    res_lanes = None
    if has_res:
        if res_embed is not None:
            res_lanes = 2 * res_embed[0]
            assert x_res is not None and x_res.shape == (nt, h, w_, res_lanes)
            assert cout == 2 * res_embed[1]
        else:
            assert x_res is not None and x_res.shape == (nt, h, w_, cout)
    if bh is None:
        bh = _pick_bh_chain(h, w_, c, c1, cout, jnp.dtype(x.dtype).itemsize,
                            n_in, has_res, folded, res_lanes=res_lanes)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh

    if folded:
        w1 = jnp.stack(dedup_folded_weights(w1))
        w2 = jnp.stack(dedup_folded_weights(w2))

    kern = functools.partial(_kernel_chain, nt=nt, bh=bh, h=h, w=w_, c=c,
                             c1=c1, cout=cout, act1=act1, act2=act2,
                             n_in=n_in, res_ch=res_ch, folded=folded,
                             res_proj=res_embed is not None)
    scratch = [
        pltpu.VMEM((2, n_in, bh + 2, w_ + 2 * _COL0, c), x.dtype),
        pltpu.SemaphoreType.DMA((2, n_in, 3)),
        pltpu.VMEM((3, bh, w_ + 2, c1), x.dtype),
    ]
    operands = list(xs)
    weights = [w1, b1.reshape(1, c1), w2, b2.reshape(1, cout)]
    if has_res:
        operands.append(x_res)
        if res_embed is not None:
            weights.append(jnp.asarray(
                res_embed_matrix(*res_embed), x.dtype))
        scratch += [
            pltpu.VMEM((2, bh, w_, res_lanes or cout), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    return pl.pallas_call(
        kern,
        grid=(nt, nhb + 1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(operands) + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec(
            (1, bh, w_, cout),
            lambda t, hb: (t, jnp.maximum(hb - 1, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, h, w_, cout), x.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * (6 if folded else 9) * (c * c1 + c1 * cout) * h * w_ * nt,
            bytes_accessed=x.size * 2 * 2 * n_in,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(*operands, *weights)


def _chain_xla(x, w1, b1, w2, b2, act1, act2, x2=None):
    """XLA composite oracle / backward."""
    def site(v, w, b, act):
        y = lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b.astype(v.dtype)
        if act == 'relu':
            return jnp.maximum(y, 0)
        if act == 'relu6':
            return jnp.clip(y, 0, jnp.asarray(6, y.dtype))
        return y
    v = x if x2 is None else x + x2
    return site(site(v, w1, b1, act1).astype(x.dtype), w2, b2, act2)


def _conv_nhwc(v, w):
    return lax.conv_general_dilated(
        v, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _chain_direct_bwd(x, x2, w1, b1, w2, b2, y2, g2, act1, act2):
    """Direct chain backward from the saved endpoints: the act2 mask comes
    from the saved OUTPUT and only the never-stored intermediate h is
    recomputed (ONE forward conv) — a vjp through the XLA composite
    re-runs BOTH forward convs (6 conv ops vs 5 here).

    Args:
        y2: conv2's post-act output (for the act2 mask).
        g2: cotangent of y2.
    Returns (dx, dw1, db1, dw2, db2); dx is the cotangent of the conv1
    input v = x (+ x2) — callers fan it out to both addends.
    """
    from bsvd_tpu.ops.shift_conv import act_mask
    v = x if x2 is None else x + x2
    h = _conv_nhwc(v, w1) + b1.astype(x.dtype)
    if act1 == 'relu':
        h = jnp.maximum(h, 0)
    elif act1 == 'relu6':
        h = jnp.clip(h, 0, jnp.asarray(6, h.dtype))

    from bsvd_tpu.ops.conv3x3 import conv3x3_dw
    m2 = act_mask(y2, act2)
    dz2 = g2 if m2 is None else g2 * m2
    db2 = dz2.sum((0, 1, 2)).astype(b2.dtype)
    dw2 = conv3x3_dw(h, dz2).astype(w2.dtype)
    dh = jax.linear_transpose(lambda v_: _conv_nhwc(v_, w2), h)(dz2)[0]

    m1 = act_mask(h, act1)
    dz1 = dh if m1 is None else dh * m1
    db1 = dz1.sum((0, 1, 2)).astype(b1.dtype)
    dw1 = conv3x3_dw(v, dz1).astype(w1.dtype)
    dx = jax.linear_transpose(lambda v_: _conv_nhwc(v_, w1), x)(dz1)[0]
    return dx, dw1, db1, dw2, db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv_chain(x, w1, b1, w2, b2, act1='relu6', act2='none', folded=False):
    """Differentiable chained convs: Pallas forward, direct backward (act2
    mask from the saved output; only the intermediate is recomputed)."""
    return conv_chain_pallas(x, w1, b1, w2, b2, act1=act1, act2=act2,
                             folded=folded)


def _cc_fwd(x, w1, b1, w2, b2, act1, act2, folded):
    y = conv_chain_pallas(x, w1, b1, w2, b2, act1=act1, act2=act2,
                          folded=folded)
    return y, (x, w1, b1, w2, b2, y)


def _cc_bwd(act1, act2, folded, res, g):
    x, w1, b1, w2, b2, y = res
    return _chain_direct_bwd(x, None, w1, b1, w2, b2, y, g, act1, act2)


conv_chain.defvjp(_cc_fwd, _cc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def conv_chain_add2(x, x2, w1, b1, w2, b2, act1='relu6', act2='none',
                    folded=False):
    """Chained convs of (x + x2) — outc's skip-add + c1 + c2 in one kernel."""
    return conv_chain_pallas(x, w1, b1, w2, b2, x2, act1=act1, act2=act2,
                             folded=folded)


def _cca_fwd(x, x2, w1, b1, w2, b2, act1, act2, folded):
    y = conv_chain_pallas(x, w1, b1, w2, b2, x2, act1=act1, act2=act2,
                          folded=folded)
    return y, (x, x2, w1, b1, w2, b2, y)


def _cca_bwd(act1, act2, folded, res, g):
    x, x2, w1, b1, w2, b2, y = res
    dx, dw1, db1, dw2, db2 = _chain_direct_bwd(x, x2, w1, b1, w2, b2, y, g,
                                               act1, act2)
    return dx, dx, dw1, db1, dw2, db2


conv_chain_add2.defvjp(_cca_fwd, _cca_bwd)


def _chain_res_xla(x, x2, x_res, w1, b1, w2, b2, act1, act2, res_ch,
                   res_embed=None):
    """XLA oracle for the residual-fused chain."""
    y = _chain_xla(x, w1, b1, w2, b2, act1, act2, x2=x2)
    cout = y.shape[-1]
    if res_embed is not None:
        emb = jnp.asarray(res_embed_matrix(*res_embed), x_res.dtype)
        x_res = jnp.einsum('...i,ij->...j', x_res, emb)
    lane = jnp.arange(cout) % (cout // 2)
    return jnp.where(lane < res_ch, x_res - y, y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def conv_chain_add2_res(x, x2, x_res, w1, b1, w2, b2, act1='relu6',
                        act2='none', res_ch=3, folded=False, res_embed=None):
    """outc's full folded epilogue in ONE kernel: skip-add + c1 + c2 +
    the per-stage residual combine (lanes l%half < res_ch become
    x_res - y). Replaces an XLA pad/select/layout-copy complex worth
    ~8 ms on the 540p flagship trace. ``res_embed``: see
    conv_chain_pallas — x_res is the raw folded stage input, projected to
    the output lane layout in-kernel (the tail stage's path)."""
    return conv_chain_pallas(x, w1, b1, w2, b2, x2, x_res, act1=act1,
                             act2=act2, res_ch=res_ch, folded=folded,
                             res_embed=res_embed)


def _ccr_fwd(x, x2, x_res, w1, b1, w2, b2, act1, act2, res_ch, folded,
             res_embed):
    y = conv_chain_pallas(x, w1, b1, w2, b2, x2, x_res, act1=act1,
                          act2=act2, res_ch=res_ch, folded=folded,
                          res_embed=res_embed)
    return y, (x, x2, x_res, w1, b1, w2, b2, y)


def _ccr_bwd(act1, act2, res_ch, folded, res_embed, res, g):
    x, x2, x_res, w1, b1, w2, b2, y = res
    # undo the residual combine: saved y = where(lane, x_res - y2, y2),
    # so y2 (conv2's post-act output, the act2-mask source) and the
    # cotangents of (y2, x_res) are pure lane selects on the saved output
    cout = y.shape[-1]
    lane = jnp.arange(cout) % (cout // 2) < res_ch
    if res_embed is not None:
        emb = jnp.asarray(res_embed_matrix(*res_embed), x_res.dtype)
        xpad = jnp.einsum('...i,ij->...j', x_res, emb)
    else:
        xpad = x_res
    y2 = jnp.where(lane, xpad - y, y)
    g2 = jnp.where(lane, -g, g)
    dxpad = jnp.where(lane, g, jnp.zeros((), g.dtype))
    if res_embed is not None:
        dxres = jnp.einsum('...j,ij->...i', dxpad, emb)
    else:
        dxres = dxpad
    dx, dw1, db1, dw2, db2 = _chain_direct_bwd(x, x2, w1, b1, w2, b2, y2,
                                               g2, act1, act2)
    return dx, dx, dxres, dw1, db1, dw2, db2


conv_chain_add2_res.defvjp(_ccr_fwd, _ccr_bwd)


def conv_chain_supported(x_shape, w1_shape, w2_shape, dtype, n_in=1,
                         has_res=False, folded=False, res_lanes=None):
    """Whether the chained kernel applies on this backend/shape.
    ``res_lanes``: the residual source's lane count when it arrives in the
    in-kernel-projection layout (res_embed path) — must be 128-aligned;
    without it the residual source must match Cout, itself 128-aligned."""
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
    if w1_shape[:2] != (3, 3) or w2_shape[:2] != (3, 3):
        return False
    if c % 128 != 0 or c1 % 128 != 0 or w_ % 8 != 0:
        return False
    if has_res:
        if res_lanes is not None:
            if res_lanes % 128 != 0:
                return False
        elif w2_shape[-1] % 128 != 0:
            return False
    return _pick_bh_chain(h, w_, c, c1, w2_shape[-1],
                          jnp.dtype(dtype).itemsize, n_in,
                          has_res, folded, res_lanes=res_lanes) is not None

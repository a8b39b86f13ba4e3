"""Pallas TPU kernel: stride-2 3x3 down-conv on the WIDTH-FOLDED domain.

The WNet stride-2 down convs (reference wnet_models.py DownBlock) resisted
Pallas because Mosaic supports neither strided ref reads nor sub-128-lane
DMA. Both constraints dissolve on the (H, W/2, 2C) width-folded view
(ops/conv3x3.fold_width_stride2_weights): the W stride folds away (kernel
(3, 2, 2C, Cout), W-stride 1, pad (1, 0)), and the H stride needs no strided
read at all — the input tile's ROW axis is an outer dim, so splitting it
(2*bh, w, c) -> (bh, 2, w, c) is a free reshape and even/odd row planes are
plain outer indexing:

    out[i] taps tile rows 2i, 2i+1, 2i+2  (ky = 0, 1, 2)
    ky=0: tile[0:2bh]  as (bh,2,..)[:, 0]     ky=1: ...[:, 1]
    ky=2: tile[2:2bh+2] as (bh,2,..)[:, 0]

Same DMA discipline as the gen-2 conv3x3 kernels: ring-buffered HBM->VMEM
copies (frame-minor grid for MIMO, row-block pipeline for NT=1), halos
zeroed in place, fp32 accumulation over 6 (M=bh*w, K=2C, N=Cout) MXU dots,
bias+act in the epilogue.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COL0 = 8          # data column offset inside the tile (sublane alignment)


def _pick_bh_s2(ho, w, c, cout, itemsize=2, vmem_budget=15 * 1024 * 1024):
    """Largest divisor of the OUTPUT height whose working set fits VMEM."""
    c_pad = -(-c // 128) * 128
    cout_pad = -(-cout // 128) * 128
    for bh in sorted((d for d in range(1, ho + 1) if ho % d == 0),
                     reverse=True):
        tile = (2 * bh + 2) * (w + 2 * _COL0) * c_pad * itemsize
        acc = bh * w * cout_pad * 4
        out = 2 * bh * w * cout_pad * itemsize
        wts = 6 * c_pad * cout_pad * itemsize + cout_pad * 4
        total = int(3.0 * tile) + 2 * acc + out + 2 * wts
        if total <= vmem_budget and bh * w >= 512:
            return bh
    return None


def _s2_compute(tile_ref, w_ref, b_ref, o_ref, *, bh, w, c, cout, act):
    """6-dot stride-2 contraction from one (2bh+2)-row tile."""
    wp = w + 2 * _COL0
    main = tile_ref[0:2 * bh].reshape(bh, 2, wp, c)
    planes = (main[:, 0], main[:, 1],
              tile_ref[2:2 * bh + 2].reshape(bh, 2, wp, c)[:, 0])
    a = jnp.zeros((bh, w, cout), jnp.float32)
    for ky in range(3):
        v = planes[ky]
        for kx in range(2):
            patch = v[:, _COL0 - 1 + kx:_COL0 - 1 + kx + w, :]
            a = a + lax.dot_general(
                patch, w_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    a = a + b_ref[...].astype(jnp.float32)
    if act == 'relu':
        a = jnp.maximum(a, 0)
    elif act == 'relu6':
        a = jnp.clip(a, 0, 6)
    o_ref[...] = a.astype(o_ref.dtype)[None]


def _tile_dmas(x_hbm, ring, sems, frame, slot, row0, bh, w, h):
    """Copies for one tile: 2bh contiguous main input rows + 1 top halo
    (stride-2 pad (1,1) never reads the bottom pad row)."""
    src = x_hbm.at[frame]
    dst = ring.at[slot]
    return (
        pltpu.make_async_copy(
            src.at[pl.ds(2 * row0, 2 * bh), :, :],
            dst.at[pl.ds(1, 2 * bh), pl.ds(_COL0, w), :],
            sems.at[slot, 0]),
        pltpu.make_async_copy(
            src.at[pl.ds(jnp.maximum(2 * row0 - 1, 0), 1), :, :],
            dst.at[pl.ds(0, 1), pl.ds(_COL0, w), :],
            sems.at[slot, 1]),
    )


def _fix_tile(ring, slot, hb, bh, w, c):
    """Zero the clamp-garbage top halo row (block 0) and the left pad col."""
    wp = w + 2 * _COL0

    @pl.when(hb == 0)
    def _():
        ring[slot, 0:1] = jnp.zeros((1, wp, c), ring.dtype)
    ring[slot, :, _COL0 - 1:_COL0] = jnp.zeros((2 * bh + 2, 1, c), ring.dtype)


def _kernel_s2(x_hbm, w_ref, b_ref, o_ref, ring, sems, *, nt, bh, h, w, c,
               cout, act):
    """Frame-minor grid (nhb, nt): ring of 2 frame tiles per row block."""
    hb = pl.program_id(0)
    t = pl.program_id(1)
    row0 = hb * bh

    def start(frame):
        for d in _tile_dmas(x_hbm, ring, sems, frame, frame % 2, row0, bh,
                            w, h):
            d.start()

    @pl.when(t == 0)
    def _():
        start(0)

    @pl.when(t + 1 < nt)
    def _():
        start(t + 1)

    slot = t % 2
    for d in _tile_dmas(x_hbm, ring, sems, t, slot, row0, bh, w, h):
        d.wait()
    _fix_tile(ring, slot, hb, bh, w, c)
    _s2_compute(ring.at[slot], w_ref, b_ref, o_ref, bh=bh, w=w, c=c,
                cout=cout, act=act)


def _kernel_s2_nt1(x_hbm, w_ref, b_ref, o_ref, ring, sems, *, bh, h, w, c,
                   cout, act):
    """NT=1: row-block-pipelined grid (nhb,), double-buffered tiles."""
    hb = pl.program_id(0)
    nhb = pl.num_programs(0)

    def start(blk):
        for d in _tile_dmas(x_hbm, ring, sems, 0, blk % 2, blk * bh, bh,
                            w, h):
            d.start()

    @pl.when(hb == 0)
    def _():
        start(0)

    @pl.when(hb + 1 < nhb)
    def _():
        start(hb + 1)

    slot = hb % 2
    for d in _tile_dmas(x_hbm, ring, sems, 0, slot, hb * bh, bh, w, h):
        d.wait()
    _fix_tile(ring, slot, hb, bh, w, c)
    _s2_compute(ring.at[slot], w_ref, b_ref, o_ref, bh=bh, w=w, c=c,
                cout=cout, act=act)


@functools.partial(jax.jit, static_argnames=('act', 'bh', 'interpret'))
def conv_s2_pallas(x, w, b, *, act='relu6', bh=None, interpret=False):
    """Width-folded stride-2 down conv + bias + act.

    Args:
        x: (NT, H, Wf, C) folded input (H even; C = 2 * original channels,
            a multiple of 128).
        w: (3, 2, C, Cout) folded weights (fold_width_stride2_weights).
        b: (Cout,).
    Returns:
        (NT, H // 2, Wf, Cout) in x.dtype — the NATURAL half-res output.
    """
    from bsvd_tpu.ops.conv3x3 import check_act
    check_act(act)
    nt, h, w_, c = x.shape
    cout = w.shape[-1]
    ho = h // 2
    if bh is None:
        bh = _pick_bh_s2(ho, w_, c, cout, jnp.dtype(x.dtype).itemsize)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = ho // bh

    common = dict(
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((nt, ho, w_, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * bh + 2, w_ + 2 * _COL0, c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(flops=2 * 6 * c * cout * ho * w_ * nt,
                                      bytes_accessed=x.size * 2 * 2,
                                      transcendentals=0),
        interpret=interpret,
    )
    if nt == 1:
        kern = functools.partial(_kernel_s2_nt1, bh=bh, h=h, w=w_, c=c,
                                 cout=cout, act=act)
        return pl.pallas_call(
            kern, grid=(nhb,),
            out_specs=pl.BlockSpec((1, bh, w_, cout), lambda hb: (0, hb, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            **common)(x, w, b.reshape(1, cout))
    kern = functools.partial(_kernel_s2, nt=nt, bh=bh, h=h, w=w_, c=c,
                             cout=cout, act=act)
    return pl.pallas_call(
        kern, grid=(nhb, nt),
        out_specs=pl.BlockSpec((1, bh, w_, cout), lambda hb, t: (t, hb, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        **common)(x, w, b.reshape(1, cout))


def _conv_s2_xla(x, w, b, act):
    """XLA composite with identical semantics (oracle + backward)."""
    y = lax.conv_general_dilated(
        x, w, (2, 1), ((1, 1), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y + b.astype(y.dtype)
    if act == 'relu':
        y = jnp.maximum(y, 0)
    elif act == 'relu6':
        y = jnp.clip(y, 0, jnp.asarray(6, y.dtype))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_s2(x, w, b, act='relu6'):
    """Differentiable folded stride-2 conv: Pallas forward, XLA composite
    backward (same math; activation mask derived from the saved output)."""
    return conv_s2_pallas(x, w, b, act=act)


def _s2_fwd(x, w, b, act):
    y = conv_s2_pallas(x, w, b, act=act)
    return y, (x, w, b, y)


def _s2_bwd(act, res, g):
    from bsvd_tpu.ops.shift_conv import act_mask
    x, w, b, y = res
    mask = act_mask(y, act)
    dz = g if mask is None else g * mask
    db = dz.sum((0, 1, 2)).astype(b.dtype)

    def conv_x(v):
        return lax.conv_general_dilated(
            v, w, (2, 1), ((1, 1), (1, 0)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def conv_w(v):
        return lax.conv_general_dilated(
            x, v, (2, 1), ((1, 1), (1, 0)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    dx = jax.linear_transpose(conv_x, x)(dz)[0]
    dw = jax.linear_transpose(conv_w, w)(dz)[0]
    return dx, dw, db


conv_s2.defvjp(_s2_fwd, _s2_bwd)


def conv_s2_supported(x_shape, w_shape, dtype):
    """Whether the folded stride-2 kernel applies on this backend/shape."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    try:
        if jax.devices()[0].platform not in ('tpu', 'TPU', 'axon'):
            return False
    except Exception:
        return False
    nt, h, w_, c = x_shape
    if w_shape[0] != 3 or w_shape[1] != 2 or h % 2 != 0 or c % 128 != 0:
        return False
    if w_ % 8 != 0:     # HBM row DMAs need an 8-aligned logical width
        return False
    return _pick_bh_s2(h // 2, w_, c, w_shape[-1],
                       jnp.dtype(dtype).itemsize) is not None

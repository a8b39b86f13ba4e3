"""Pallas TPU kernel: fused temporal-shift + 3x3 conv + bias + activation.

The temporal-shift conv is BSVD's hot op (16 sites per forward). XLA cannot
fuse a producer into a convolution input, so the shifted tensor is fully
materialized in HBM before every conv (~3.7 ms extra per 128-ch site at
540p). This kernel reads the three temporal sources (frame t-1, t, t+1)
straight from HBM, assembles the shifted input in VMEM with a lane select,
and performs the 3x3 conv as 9 MXU contractions with fp32 accumulation,
fusing bias + activation into the epilogue.

Semantics match bsvd_tpu.nn.shift.temporal_shift + conv2d(pad=1, stride=1):
output channels [:C/8] see frame t+1, [C/8:2C/8] see t-1 (zeros at clip
boundaries), rest see t (reference: temporal_shift.py:40-47 + the ShiftConv
gather, bsvd_arch.py:42-50).

Used on the inference path for bf16; training keeps the XLA composite (a
custom_vjp with an XLA backward would be the next step).
"""

import functools


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bh(h, w, c, cout, vmem_budget=10 * 1024 * 1024):
    """Largest divisor BH of H whose working set fits in VMEM.

    Accounts for: 3 input tiles, the assembled (select) temporary, the fp32
    accumulator, and the double-buffered output block."""
    for bh in sorted((d for d in range(1, h + 1) if h % d == 0), reverse=True):
        itile = (bh + 2) * (w + 16) * c * 2
        tiles = 4 * itile                                # cur/fut/past + select
        acc = bh * w * cout * 4                          # fp32 accumulator
        out = 2 * bh * w * cout * 2                      # double-buffered out
        wts = 9 * c * cout * 2 + cout * 4
        if tiles + acc + out + wts <= vmem_budget and bh * w >= 1024:
            return bh
    return None


def _kernel(x_hbm, w_ref, b_ref, o_ref, cur, fut, pst, sems, *,
            t_len, bh, h, w, c, cout, fold, act, causal):
    t = pl.program_id(0)
    hb = pl.program_id(1)
    nhb = pl.num_programs(1)
    row0 = hb * bh

    # Column halo is 8 wide (not 1): VMEM DMA destinations must start at a
    # multiple of the 8-element sublane tile.
    def dma_rows(dst, src_t, dst_row, src_row, nrows, sem):
        return pltpu.make_async_copy(
            x_hbm.at[src_t, pl.ds(src_row, nrows), :, :],
            dst.at[pl.ds(dst_row, nrows), pl.ds(8, w), :],
            sem)

    in_clip = t % t_len
    has_fut = in_clip < (t_len - 1)
    has_pst = in_clip > 0

    # zero all three tiles first (cheap VPU fill; covers halos + boundaries)
    cur[...] = jnp.zeros_like(cur)
    fut[...] = jnp.zeros_like(fut)
    pst[...] = jnp.zeros_like(pst)

    # interior rows
    dma_c = dma_rows(cur, t, 1, row0, bh, sems.at[0])
    dma_c.start()
    fut_t = jnp.where(has_fut, t + 1, t)
    pst_t = jnp.where(has_pst, t - 1, t)
    dma_f = dma_rows(fut, fut_t, 1, row0, bh, sems.at[1])
    dma_p = dma_rows(pst, pst_t, 1, row0, bh, sems.at[2])
    dma_f.start()
    dma_p.start()

    # halo rows (1 row each, when they exist in the image)
    def halo(dst, src_t, sem_idx, dst_row, src_row):
        return pltpu.make_async_copy(
            x_hbm.at[src_t, pl.ds(src_row, 1), :, :],
            dst.at[pl.ds(dst_row, 1), pl.ds(8, w), :],
            sems.at[sem_idx])

    def top_halos():
        return (halo(cur, t, 3, 0, row0 - 1),
                halo(fut, fut_t, 4, 0, row0 - 1),
                halo(pst, pst_t, 5, 0, row0 - 1))

    def bot_halos():
        return (halo(cur, t, 6, bh + 1, row0 + bh),
                halo(fut, fut_t, 7, bh + 1, row0 + bh),
                halo(pst, pst_t, 8, bh + 1, row0 + bh))

    @pl.when(hb > 0)
    def _():
        for d in top_halos():
            d.start()

    @pl.when(hb < nhb - 1)
    def _():
        for d in bot_halos():
            d.start()

    dma_c.wait()
    dma_f.wait()
    dma_p.wait()

    @pl.when(hb > 0)
    def _():
        for d in top_halos():
            d.wait()

    @pl.when(hb < nhb - 1)
    def _():
        for d in bot_halos():
            d.wait()

    # assemble the shifted tile with a lane select
    lane = lax.broadcasted_iota(jnp.int32, (bh + 2, w + 16, c), 2)
    fut_v = jnp.where(has_fut, fut[...], jnp.zeros_like(fut))
    pst_v = jnp.where(has_pst, pst[...], jnp.zeros_like(pst))
    if causal:
        tile = jnp.where(lane < 2 * fold, pst_v, cur[...])
    else:
        tile = jnp.where(lane < fold, fut_v,
                         jnp.where(lane < 2 * fold, pst_v, cur[...]))

    # 3x3 conv as 9 MXU contractions, fp32 accumulation
    a = jnp.zeros((bh, w, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = tile[ky:ky + bh, 7 + kx:7 + kx + w, :]
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


def shift_conv_fused(x, w, b, *, t_len, fold_div=8, act='relu6',
                     causal=False, bh=None, interpret=False, x2=None):
    """Fused temporal-shift + 3x3 conv (stride 1, pad 1) + bias + act.

    Delegates to the generation-2 ring-buffered kernel
    (bsvd_tpu/ops/conv3x3.py); this module keeps the public API, the
    XLA-composite oracle and the custom_vjp wrapper.

    Args:
        x: (N*T, H, W, C) — clips of length ``t_len`` concatenated on axis 0.
        w: (3, 3, C, Cout); b: (Cout,).
        x2: optional second addend — shift+conv of (x + x2) with the add
            fused into the kernel's tile assembly (up1's x1 + x2 site).
    Returns:
        (N*T, H, W, Cout) in x.dtype.
    """
    from bsvd_tpu.ops.conv3x3 import conv3x3_pallas
    return conv3x3_pallas(x, w, b, x2, t_len=t_len,
                          shift='causal' if causal else 'tsm',
                          fold_div=fold_div, act=act, bh=bh,
                          interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=('t_len', 'fold_div', 'act', 'causal',
                                    'bh', 'interpret'))
def _shift_conv_fused_v1(x, w, b, *, t_len, fold_div=8, act='relu6',
                         causal=False, bh=None, interpret=False):
    """Generation-1 kernel (serialized 3-tile DMA + full-tile select); kept
    as a reference implementation for A/B timing in tools/."""
    nt, h, w_, c = x.shape
    cout = w.shape[-1]
    fold = c // fold_div
    if bh is None:
        bh = _pick_bh(h, w_, c, cout)
    if bh is None:
        raise ValueError(f'no valid row block for H={h}')
    nhb = h // bh

    kern = functools.partial(
        _kernel, t_len=t_len, bh=bh, h=h, w=w_, c=c, cout=cout, fold=fold,
        act=act, causal=causal)

    flops = 2 * 9 * c * cout * h * w_ * nt
    return pl.pallas_call(
        kern,
        grid=(nt, nhb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),    # bias
        ],
        out_specs=pl.BlockSpec((1, bh, w_, cout),
                               lambda t, hb: (t, hb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, h, w_, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, w_ + 16, c), x.dtype),  # cur
            pltpu.VMEM((bh + 2, w_ + 16, c), x.dtype),  # fut
            pltpu.VMEM((bh + 2, w_ + 16, c), x.dtype),  # past
            pltpu.SemaphoreType.DMA((9,)),
        ],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=x.size * 2 * 3,
                                      transcendentals=0),
        interpret=interpret,
    )(x, w, b.reshape(1, cout))


def shift_conv_reference(x, w, b, *, t_len, fold_div=8, act='relu6',
                         causal=False):
    """XLA composite with identical semantics (correctness oracle + fallback)."""
    from bsvd_tpu.nn.shift import temporal_shift
    nt, h, w_, c = x.shape
    x5 = x.reshape(nt // t_len, t_len, h, w_, c)
    mode = 'TSM_toFutureOnly' if causal else 'TSM'
    sh = temporal_shift(x5, fold_div, mode).reshape(nt, h, w_, c)
    y = lax.conv_general_dilated(sh, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y + b.astype(y.dtype)
    if act == 'relu':
        y = jnp.maximum(y, 0)
    elif act == 'relu6':
        y = jnp.clip(y, 0, jnp.asarray(6, y.dtype))
    return y


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, XLA backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def shift_conv(x, w, b, t_len, fold_div=8, act='relu6', causal=False):
    """Differentiable fused temporal-shift conv: Pallas forward on TPU,
    XLA composite backward (exact same math)."""
    return shift_conv_fused(x, w, b, t_len=t_len, fold_div=fold_div, act=act,
                            causal=causal)


def _sc_fwd(x, w, b, t_len, fold_div, act, causal):
    y = shift_conv_fused(x, w, b, t_len=t_len, fold_div=fold_div, act=act,
                         causal=causal)
    return y, (x, w, b, y)


def act_mask(y, act):
    """Activation derivative recovered from the saved OUTPUT — no forward
    recompute. (At the exact clip boundaries z==0/6 this is 0 where jax's
    min/max tie convention gives 0.5 — a measure-zero difference.)"""
    if act == 'relu':
        return (y > 0).astype(y.dtype)
    if act == 'relu6':
        return jnp.logical_and(y > 0, y < jnp.asarray(6, y.dtype)).astype(
            y.dtype)
    return None


def _sc_bwd(t_len, fold_div, act, causal, res, g):
    """Direct backward from saved (x, w, b, y): unlike a vjp through the
    composite it does NOT re-run the forward conv — only the two transposed
    convs (dx, dw) plus cheap data movement, ~1/3 less backward work at
    every shift site."""
    from bsvd_tpu.nn.shift import temporal_shift
    x, w, b, y = res
    nt, h, w_, c = x.shape
    mode = 'TSM_toFutureOnly' if causal else 'TSM'

    def shift_fn(v):
        v5 = v.reshape(nt // t_len, t_len, h, w_, c)
        return temporal_shift(v5, fold_div, mode).reshape(nt, h, w_, c)

    xs = shift_fn(x)
    mask = act_mask(y, act)
    dz = g if mask is None else g * mask
    db = dz.sum((0, 1, 2)).astype(b.dtype)

    def conv_x(v):
        return lax.conv_general_dilated(
            v, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    from bsvd_tpu.ops.conv3x3 import conv3x3_dw
    dxs = jax.linear_transpose(conv_x, xs)(dz)[0]
    dw = conv3x3_dw(xs, dz).astype(w.dtype)
    dx = jax.linear_transpose(shift_fn, x)(dxs)[0]
    return dx, dw, db


shift_conv.defvjp(_sc_fwd, _sc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def shift_conv_add2(x, x2, w, b, t_len, fold_div=8, act='relu6',
                    causal=False):
    """Differentiable fused shift+conv of (x + x2): the skip-add is fused
    into the kernel's tile assembly (up1's x1 + x2 site)."""
    return shift_conv_fused(x, w, b, t_len=t_len, fold_div=fold_div, act=act,
                            causal=causal, x2=x2)


def _sca_fwd(x, x2, w, b, t_len, fold_div, act, causal):
    y = shift_conv_fused(x, w, b, t_len=t_len, fold_div=fold_div, act=act,
                         causal=causal, x2=x2)
    return y, (x, x2, w, b, y)


def _sca_bwd(t_len, fold_div, act, causal, res, g):
    x, x2, w, b, y = res
    dx, dw, db = _sc_bwd(t_len, fold_div, act, causal, (x + x2, w, b, y), g)
    return dx, dx, dw, db


shift_conv_add2.defvjp(_sca_fwd, _sca_bwd)


def shift_conv_supported(x_shape, w_shape, dtype, norm, n_in=1):
    """Whether the fused kernel applies: TPU backend, identity norm (act is
    fused into the kernel epilogue), a valid row block, bf16/f32. ``n_in``
    must match the call site (2 when the skip-add input is fused)."""
    if norm != 'none':
        return False
    from bsvd_tpu.ops.conv3x3 import conv3x3_supported
    return conv3x3_supported(x_shape, w_shape, dtype, shift='tsm', n_in=n_in)

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
    if nt != 1 or w_shape[0] != 3 or w_shape[1] != 3 or c % 128 != 0:
        return False
    return _pick_bh(h, w_, c, w_shape[-1],
                    jnp.dtype(dtype).itemsize) is not None

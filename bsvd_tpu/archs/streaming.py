"""Streaming (pipeline) inference with explicit scan-carried buffer state.

This is the TPU-native re-design of the reference's stateful None-propagating
module pipeline (reference semantics: bsvd_arch.py:53-114 BiBufferConv,
:308-322 MemSkip, :325-414 streaming DenBlock, :501-552 fill/drain loop):

- every temporal conv holds a (left_fold, center, has_center) buffer; one
  streaming step advances the whole 16-deep pipeline by one frame,
- U-Net skip connections cross the pipeline delay through fixed-depth ring
  buffers (replacing the unbounded-list MemSkip),
- the fill/drain None-logic becomes validity flags threaded through the step
  (garbage is never committed to buffers: invalid inputs are masked),
- a clip is processed by ``jax.lax.scan`` over T + shift_num steps and the
  first shift_num outputs are dropped — bit-identical (in exact arithmetic)
  to whole-clip MIMO ``wnet_apply`` because both use zero temporal
  boundaries (property-tested in tests/test_streaming.py).

The low-latency frame-by-frame client API is ``StreamDenoiser``.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bsvd_tpu.nn.layers import conv2d, get_act, norm_apply, pixel_shuffle
from bsvd_tpu.archs.wnet_arch import WNetConfig  # noqa: F401  (re-export for typing)


def _conv_act_fused(conv_p, norm, norm_p, act, x, act_name):
    """Streaming conv site: the fused Pallas plain-conv kernel when it
    applies (identity norm, C >= 128 — the per-frame shift assembly already
    happened via the carried buffers, so the conv itself is plain), XLA
    otherwise. ``act_name=None`` forces the XLA path."""
    from bsvd_tpu.ops.conv3x3 import KERNEL_ACTS
    if (act_name in KERNEL_ACTS and norm == 'none'
            and 'b' in conv_p and conv_p['w'].shape[0] == 3):
        from bsvd_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_supported
        n, h, w, c = x.shape
        if c >= 128 and conv3x3_supported((n, h, w, c), conv_p['w'].shape,
                                          x.dtype):
            return conv3x3_pallas(x, conv_p['w'], conv_p['b'], shift='none',
                                  act=act_name)
    y = conv2d(conv_p, x)
    if norm_p is not None:
        y = norm_apply(norm, norm_p, y)
    if act_name == 'none':
        return y
    return act(y)


# ---------------------------------------------------------------------------
# buffered temporal conv (BiBufferConv equivalent)
# ---------------------------------------------------------------------------

def _bibuffer_init(n, h, w, c, fold_div, dtype, causal=False):
    # Both modes carry one C-lane packed frame. Bidirectional: PACKED state
    # [left, center[f:]] — center[:f] is never read by the step, so the pack
    # is lossless and exactly C lanes; both the conv input and the next state
    # are pure lane slices of (x, B), which lets the steady-state path fuse
    # the whole step into ONE kernel (ops/bibuffer_conv). Causal: the
    # previous frame, full C lanes (only [:2f] is read; full width keeps the
    # fused kernel's DMA at 128-lane granularity).
    return {
        'packed': jnp.zeros((n, h, w, c), dtype),
        'has_center': jnp.zeros((), jnp.bool_),
    }


def _sel(cond, a, b):
    """Select that folds away when ``cond`` is a static Python bool — the
    client streaming path (push: always valid, flush: always invalid) then
    compiles without any masking copies."""
    if isinstance(cond, bool):
        return a if cond else b
    return jnp.where(cond, a, b)


def _is_true(cond):
    return isinstance(cond, bool) and cond


def _bibuffer_step(conv_p, norm, norm_p, act, state, x, valid, fold_div,
                   causal=False, assume_filled=False, act_name=None,
                   mask1=None):
    """One streaming step of shift-conv(+norm+act).

    Returns (new_state, out, out_valid). Bidirectional: conv input =
    [right[:fold], left(past f:2f), center[2f:]] (bsvd_arch.py:42-50).
    Causal (toFutureOnly): conv input = [past[:2f], center[2f:]] — no future
    dependency, so the output corresponds to the *current* frame with no
    added latency (temporal_shift.py:46).

    ``valid`` and ``state['has_center']`` may be traced bools (scan path) or
    static Python bools (client path — compiles mask-free).

    ``mask1``: optional level-bound row-validity hook (spatially-sharded
    streaming, parallel/spatial.py) applied to the conv OUTPUT; the carried
    state is pure lane slices of the (already masked) inputs, so it needs
    no masking of its own.
    """
    m = (lambda v: v) if mask1 is None else mask1
    c = x.shape[-1]
    fold = c // fold_div
    can_compute = True if assume_filled else state['has_center']
    xz = _sel(valid, x, jnp.zeros_like(x))

    if causal:
        # out_t = conv([x_{t-1}[:2f], x_t[2f:]]) — operate on the live frame.
        B = state['packed']
        from bsvd_tpu.ops.conv3x3 import KERNEL_ACTS
        if (_is_true(valid) and norm == 'none'
                and act_name in KERNEL_ACTS and 'b' in conv_p):
            from bsvd_tpu.ops.bibuffer_conv import (bibuffer_conv_pallas,
                                                    bibuffer_conv_supported)
            if bibuffer_conv_supported(x.shape, conv_p['w'].shape, x.dtype):
                out, new_b = bibuffer_conv_pallas(
                    x, B, conv_p['w'], conv_p['b'], fold_div=fold_div,
                    act=act_name, causal=True)
                return ({'packed': new_b,
                         'has_center': state['has_center']}, m(out), True)
        inp = jnp.concatenate([B[..., :2 * fold], xz[..., 2 * fold:]],
                              axis=-1)
        out = m(_conv_act_fused(conv_p, norm, norm_p, act, inp, act_name))
        new_b = _sel(valid, x, B)
        return ({'packed': new_b,
                 'has_center': state['has_center']}, out, valid)

    B = state['packed']                      # [left, center[f:]]
    from bsvd_tpu.ops.conv3x3 import KERNEL_ACTS
    if (_is_true(valid) and assume_filled and norm == 'none'
            and act_name in KERNEL_ACTS and 'b' in conv_p):
        # steady-state client path: the whole step is ONE fused kernel —
        # input assembly, 9 MXU dots, act, and the next packed state
        from bsvd_tpu.ops.bibuffer_conv import (bibuffer_conv_pallas,
                                                bibuffer_conv_supported)
        if bibuffer_conv_supported(x.shape, conv_p['w'].shape, x.dtype):
            out, new_b = bibuffer_conv_pallas(x, B, conv_p['w'], conv_p['b'],
                                              fold_div=fold_div,
                                              act=act_name)
            return ({'packed': new_b,
                     'has_center': state['has_center']}, m(out), True)

    inp = jnp.concatenate([
        xz[..., :fold],                      # future slice from the live frame
        B[..., :fold],                       # past slice (frame t-2)
        B[..., 2 * fold:],                   # current frame (t-1) body
    ], axis=-1)
    out = m(_conv_act_fused(conv_p, norm, norm_p, act, inp, act_name))
    out_valid = can_compute

    new_b = jnp.concatenate([
        _sel(can_compute, B[..., fold:2 * fold], B[..., :fold]),
        _sel(valid, x[..., fold:], B[..., fold:]),
    ], axis=-1)
    if isinstance(can_compute, bool) and isinstance(valid, bool):
        new_has_center = jnp.full((), valid if can_compute else (can_compute or valid))
    else:
        new_has_center = jnp.where(can_compute, valid,
                                   jnp.logical_or(state['has_center'], valid))
    return ({'packed': new_b, 'has_center': new_has_center}, out, out_valid)


# ---------------------------------------------------------------------------
# skip ring buffers (MemSkip equivalent, fixed depth)
# ---------------------------------------------------------------------------

def _ring_init(depth, n, h, w, c, dtype):
    return {'buf': jnp.zeros((depth, n, h, w, c), dtype),
            'w': jnp.zeros((), jnp.int32), 'r': jnp.zeros((), jnp.int32)}


def _ring_push(state, x, valid):
    depth = state['buf'].shape[0]
    idx = state['w'] % depth
    x = x.astype(state['buf'].dtype)
    if isinstance(valid, bool):
        if not valid:
            return state
        new_buf = lax.dynamic_update_index_in_dim(state['buf'], x, idx, 0)
        return {'buf': new_buf, 'w': state['w'] + 1, 'r': state['r']}
    # traced validity: write the slot unconditionally but keep its old value
    # when invalid — only one slot is touched, so no full-ring copy
    old = lax.dynamic_index_in_dim(state['buf'], idx, 0, keepdims=False)
    new_val = jnp.where(valid, x, old)
    new_buf = lax.dynamic_update_index_in_dim(state['buf'], new_val, idx, 0)
    return {'buf': new_buf, 'w': state['w'] + valid.astype(jnp.int32),
            'r': state['r']}


def _ring_pop(state, valid):
    depth = state['buf'].shape[0]
    val = lax.dynamic_index_in_dim(state['buf'], state['r'] % depth, 0,
                                   keepdims=False)
    adv = 1 if _is_true(valid) else (
        0 if isinstance(valid, bool) else valid.astype(jnp.int32))
    return ({'buf': state['buf'], 'w': state['w'],
             'r': state['r'] + adv}, val)


# ---------------------------------------------------------------------------
# streaming DenBlock stage
# ---------------------------------------------------------------------------

def _stage_stream_init(cfg, stage_idx, n, h, w, dtype):
    """State pytree for one DenBlock stage at input resolution (h, w)."""
    assert h % 4 == 0 and w % 4 == 0, 'streaming needs H, W multiples of 4'
    s_in, _, blind = cfg.stage_io(stage_idx)
    if blind:
        s_in = 3
    c0, c1, c2 = cfg.chns
    fd, dt = cfg.fold_div, dtype
    causal = 'toFutureOnly' in cfg.shift_mode
    d_inc = 2 if cfg.shift_input else 0
    if causal:
        d_inc = 0
    st = {}
    if cfg.shift_input:
        st['inc'] = [_bibuffer_init(n, h, w, s_in, fd, dt, causal),
                     _bibuffer_init(n, h, w, c0, fd, dt, causal)]
    h2, w2, h4, w4 = h // 2, w // 2, h // 4, w // 4
    st['down0'] = [_bibuffer_init(n, h2, w2, c1, fd, dt, causal),
                   _bibuffer_init(n, h2, w2, c1, fd, dt, causal)]
    st['down1'] = [_bibuffer_init(n, h4, w4, c2, fd, dt, causal),
                   _bibuffer_init(n, h4, w4, c2, fd, dt, causal)]
    st['up2'] = [_bibuffer_init(n, h4, w4, c2, fd, dt, causal),
                 _bibuffer_init(n, h4, w4, c2, fd, dt, causal)]
    st['up1'] = [_bibuffer_init(n, h2, w2, c1, fd, dt, causal),
                 _bibuffer_init(n, h2, w2, c1, fd, dt, causal)]
    # ring depths = pipeline in-flight count + 1 (see delays in module doc).
    # On the folded path the full-res rings store the WIDTH-FOLDED view
    # (same element count) so the step never unfolds between stages.
    if _fold_active(cfg, w):
        s_out = cfg.stage_io(stage_idx)[1]
        if 2 * s_out < 128 and (2 * s_in) % 128 == 0:
            # tail stage: store the FULL folded input so the outc chain-res
            # kernel can project it to output lanes in VMEM (res_embed) —
            # physically free: T(8,128) tiling pads a 2*rc-lane slot to 128
            # lanes anyway
            sk1_dims = (n, h, w // 2, 2 * s_in)
        else:
            sk1_dims = (n, h, w // 2, 2 * cfg.residual_ch)
        sk2_dims = (n, h, w // 2, 2 * c0)
    else:
        sk1_dims = (n, h, w, cfg.residual_ch)
        sk2_dims = (n, h, w, c0)
    if causal:
        st['skip1'] = _ring_init(1, *sk1_dims, dt)
        st['skip2'] = _ring_init(1, *sk2_dims, dt)
        st['skip3'] = _ring_init(1, n, h2, w2, c1, dt)
    else:
        st['skip1'] = _ring_init(d_inc + 9, *sk1_dims, dt)
        st['skip2'] = _ring_init(9, *sk2_dims, dt)
        st['skip3'] = _ring_init(5, n, h2, w2, c1, dt)
    return st


def _memcv_step(p, norm, act, st_pair, x, valid, fold_div, causal,
                assume_filled=False, act_name=None, mask1=None):
    """MemCvBlock: two buffered shift-convs (bsvd_arch.py:116-149).
    ``mask1``: level-bound row-validity hook (spatial sharding) — applied
    after EACH conv, so the chained two-conv kernel (which cannot mask its
    VMEM intermediate) is bypassed in favor of two single-conv kernels."""
    # steady-state client path: BOTH convs + both state updates chain as
    # ONE kernel (ops/bibuffer_conv.bibuffer_chain_pallas) — the
    # intermediate frame never round-trips HBM and the block costs one
    # dispatch instead of two. Causal fuses on any valid frame (no fill
    # masking: the causal output tracks the live frame).
    from bsvd_tpu.ops.conv3x3 import KERNEL_ACTS
    if (mask1 is None and _is_true(valid) and (assume_filled or causal)
            and norm == 'none'
            and act_name in KERNEL_ACTS and 'b' in p['c1'] and 'b' in p['c2']):
        from bsvd_tpu.ops.bibuffer_conv import (bibuffer_chain_pallas,
                                                bibuffer_chain_supported)
        if bibuffer_chain_supported(x.shape, p['c1']['w'].shape,
                                    p['c2']['w'].shape, x.dtype):
            y, s1n, s2n = bibuffer_chain_pallas(
                x, st_pair[0]['packed'], st_pair[1]['packed'],
                p['c1']['w'], p['c1']['b'], p['c2']['w'], p['c2']['b'],
                fold_div=fold_div, act=act_name, act2=act_name,
                causal=causal)
            return ([{'packed': s1n, 'has_center': st_pair[0]['has_center']},
                     {'packed': s2n, 'has_center': st_pair[1]['has_center']}],
                    y, True)
    s1, o1, v1 = _bibuffer_step(p['c1'], norm, p['n1'], act, st_pair[0], x,
                                valid, fold_div, causal, assume_filled,
                                act_name, mask1)
    s2, o2, v2 = _bibuffer_step(p['c2'], norm, p['n2'], act, st_pair[1], o1,
                                v1, fold_div, causal, assume_filled,
                                act_name, mask1)
    return [s1, s2], o2, v2



def _fold2s(x):
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def _unfold2s(x):
    n, h, w2, c2 = x.shape
    return x.reshape(n, h, w2 * 2, c2 // 2)


def _on_tpu():
    try:
        return jax.devices()[0].platform in ('tpu', 'TPU', 'axon')
    except Exception:
        return False


# Width-folded-path gate: the SAME predicate as the MIMO path
# (wnet_arch.fold_gate) so streaming and whole-clip MIMO always take the
# same kernels for the same config, and the skip-ring shapes chosen at
# state-init time agree with the step.
from bsvd_tpu.archs.wnet_arch import (embed_half_lanes,  # noqa: E402
                                      fold_gate as _fold_active,
                                      pad_in_channels)


def _xla_site_folded(conv_p, x_f, act, act_name='act', kernel_act=None,
                     x2_f=None):
    """Width-folded conv site for the per-frame step. ``kernel_act``: an act
    name ('relu6'/'relu'/'none') routes the folded conv through the NT=1
    row-block-pipelined Pallas kernel when the shape qualifies (the gen-2
    frame-minor kernel regressed at NT=1; the row-block variant wins —
    see PERF.md round-3 streaming table)."""
    from bsvd_tpu.ops.conv3x3 import fold_width_weights
    w2, b2 = fold_width_weights(conv_p['w'], conv_p['b'])
    if kernel_act is not None:
        from bsvd_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_supported
        if (x_f.shape[-1] >= 128
                and conv3x3_supported(x_f.shape, w2.shape, x_f.dtype,
                                      n_in=1 if x2_f is None else 2,
                                      folded=True)):
            return conv3x3_pallas(x_f, w2, b2, x2_f, shift='none',
                                  act=kernel_act, folded=True)
    xin = x_f if x2_f is None else x_f + x2_f
    y = conv2d({'w': w2, 'b': b2}, xin)
    return y if act_name == 'none' else act(y)


def _xla_down_folded(conv_p, x_f, act, kernel_act=None):
    """Folded stride-2 down conv: the Pallas s2 kernel (ops/conv_s2) when
    an act name is given and the shape qualifies, folded XLA otherwise."""
    from bsvd_tpu.ops.conv3x3 import fold_width_stride2_weights
    w2, b2 = fold_width_stride2_weights(conv_p['w'], conv_p['b'])
    if kernel_act is not None:
        from bsvd_tpu.ops.conv_s2 import conv_s2_pallas, conv_s2_supported
        if conv_s2_supported(x_f.shape, w2.shape, x_f.dtype):
            return conv_s2_pallas(x_f, w2, b2, act=kernel_act)
    y = lax.conv_general_dilated(
        x_f, w2, (2, 1), ((1, 1), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return act(y + b2.astype(y.dtype))


def _pair_folded_stream(p1, p2, x_f, act, act_name2, kernel_act, x2_f=None):
    """Chained folded conv pair for the per-frame step (ops/conv_chain);
    falls back to two single sites."""
    if kernel_act is not None and x_f.shape[-1] >= 128:
        from bsvd_tpu.ops.conv3x3 import fold_width_weights
        from bsvd_tpu.ops.conv_chain import (conv_chain_pallas,
                                             conv_chain_supported)
        w1, b1 = fold_width_weights(p1['w'], p1['b'])
        w2, b2 = fold_width_weights(p2['w'], p2['b'])
        n_in = 1 if x2_f is None else 2
        if conv_chain_supported(x_f.shape, w1.shape, w2.shape, x_f.dtype,
                                n_in, folded=True):
            return conv_chain_pallas(x_f, w1, b1, w2, b2, x2_f,
                                     act1=kernel_act, act2=act_name2,
                                     folded=True)
    y = _xla_site_folded(p1, x_f, act, kernel_act=kernel_act, x2_f=x2_f)
    return _xla_site_folded(p2, y, act, act_name=act_name2,
                            kernel_act=act_name2 if kernel_act else None)


def _up_conv_ps_stream(conv_p, x, act, use_k=True):
    """Per-frame up conv (Pallas when supported AND fused kernels enabled —
    ``use_k=False`` honors cfg.use_fused's opt-out) + pixel shuffle: one
    fused natural-layout kernel when each shuffle plane is 128-lane
    (ops/conv3x3.conv_ps_natural, up2's site), XLA shuffle otherwise.
    The up conv carries no norm/activation (reference UpBlock: conv +
    shuffle only, wnet_models.py UpBlock)."""
    if not use_k:
        return pixel_shuffle(conv2d(conv_p, x), 2)
    from bsvd_tpu.ops.conv3x3 import (conv_ps_natural,
                                      conv_ps_natural_supported)
    if conv_ps_natural_supported(x.shape, conv_p['w'].shape, x.dtype):
        return conv_ps_natural(x, conv_p['w'], conv_p['b'])
    return pixel_shuffle(_conv_act_fused(conv_p, 'none', None, act, x,
                                         'none'), 2)


def _up_conv_psfold_stream(conv_p, x, act):
    """Per-frame up conv emitting the shuffled+width-folded output directly
    (ops/conv3x3.conv_ps_fold NT=1 variant) — no XLA relayout copies."""
    n, h, w, c = x.shape
    from bsvd_tpu.ops.conv3x3 import conv_ps_fold, conv_ps_fold_supported
    if conv_ps_fold_supported((n, h, w, c), conv_p['w'].shape, x.dtype):
        return conv_ps_fold(x, conv_p['w'], conv_p['b'])
    return _fold2s(_up_conv_ps_stream(conv_p, x, act))


def _stage_stream_step(p, st, x, valid, cfg, act, assume_filled=False,
                       fold_io=False, mask=None):
    """One frame through one DenBlock stage (streaming DenBlock.forward,
    bsvd_arch.py:374-396). ``assume_filled=True`` (static) treats every
    buffer as primed — the steady-state client path compiles mask-free.

    ``fold_io``: x arrives width-folded and the folded output is returned —
    the full-res segment (incl. the skip1/skip2 rings, see
    _stage_stream_init) then lives entirely in the folded domain with no
    unfold/refold reshapes inside or between stages.

    ``mask``: optional (v, level) -> v row-validity hook for the spatially
    sharded streaming step (parallel/spatial.py): applied after every conv
    site so global-edge shards reproduce per-conv zero padding exactly
    (same protocol as wnet_arch._stage_apply_folded). With a mask the
    in-VMEM conv CHAINS are unbundled into single-conv kernels (a chain
    cannot mask its intermediate); all other kernels stay engaged."""
    norm = cfg.norm
    fd = cfg.fold_div
    causal = 'toFutureOnly' in cfg.shift_mode
    m1 = None if mask is None else (lambda v: mask(v, 1))
    m2 = None if mask is None else (lambda v: mask(v, 2))
    m4 = None if mask is None else (lambda v: mask(v, 4))
    mid = lambda v: v
    # Per-frame convs route through the NT=1 ROW-BLOCK-pipelined Pallas
    # kernel (ops/conv3x3._kernel_nt1). The original frame-minor kernel
    # regressed at NT=1 (32.8 -> 37.6 ms/frame: no cross-step ring reuse,
    # serialized DMA prologue per row block); the row-block variant
    # double-buffers DMA across row blocks and beats XLA at every >=128-lane
    # site (PERF.md round-3 streaming table). C<128 sites (inc c1, stride-2
    # downs) stay on XLA.
    from bsvd_tpu.ops.conv3x3 import KERNEL_ACTS
    use_k = (cfg.use_fused and cfg.norm == 'none' and _on_tpu()
             and cfg.act in KERNEL_ACTS)
    an = cfg.act if use_k else None
    new_st = dict(st)
    rc = cfg.residual_ch

    # fold_io is the caller's fold_gate on this width: x arrives already
    # width-folded, every intermediate (incl. the skip rings, sized at
    # state-init by the same gate) stays folded, and the folded output is
    # returned — the step never folds or unfolds internally.
    if fold_io:
        n_, h_, wf_, c2_ = x.shape
        sk1_full = st['skip1']['buf'].shape[-1] == c2_
        if sk1_full:
            # tail-stage ring carries the FULL folded input (see
            # _stage_stream_init) for the res_embed chain kernel
            new_st['skip1'] = _ring_push(st['skip1'], x, valid)
        else:
            xr = x.reshape(n_, h_, wf_, 2, c2_ // 2)[..., :rc]
            new_st['skip1'] = _ring_push(st['skip1'],
                                         xr.reshape(n_, h_, wf_, 2 * rc),
                                         valid)
    else:
        new_st['skip1'] = _ring_push(st['skip1'], x[..., :rc], valid)

    if cfg.shift_input:
        s1, x0, v0 = _bibuffer_step(p['inc']['c1'], norm, p['inc']['n1'], act,
                                    st['inc'][0], x, valid, fd, causal,
                                    assume_filled, mask1=m1)
        s2, x0, v0 = _bibuffer_step(p['inc']['c2'], norm, p['inc']['n2'], act,
                                    st['inc'][1], x0, v0, fd, causal,
                                    assume_filled, mask1=m1)
        new_st['inc'] = [s1, s2]
    elif fold_io:
        xf = x
        s_out0 = p['outc']['c2']['w'].shape[-1]
        if xf.shape[-1] >= 128:
            if mask is None:
                x0f = _pair_folded_stream(p['inc']['c1'], p['inc']['c2'], xf,
                                          act, an or 'relu6', an)
            else:
                x0f = m1(_xla_site_folded(p['inc']['c1'], xf, act,
                                          kernel_act=an))
                x0f = m1(_xla_site_folded(p['inc']['c2'], x0f, act,
                                          kernel_act=an))
        elif an is not None and 2 * s_out0 >= 128:
            # embed the sub-128-lane input with a 0/1 GEMM so inc runs the
            # Pallas chain instead of an XLA K=8 conv + layout fix (see
            # wnet_arch._stage_apply_folded)
            in_c = xf.shape[-1] // 2
            xe = embed_half_lanes(xf, in_c, s_out0)
            if mask is None:
                x0f = _pair_folded_stream(
                    pad_in_channels(p['inc']['c1'], s_out0),
                    p['inc']['c2'], xe, act, an or 'relu6', an)
            else:
                x0f = m1(_xla_site_folded(
                    pad_in_channels(p['inc']['c1'], s_out0), xe, act,
                    kernel_act=an))
                x0f = m1(_xla_site_folded(p['inc']['c2'], x0f, act,
                                          kernel_act=an))
        else:
            mm = m1 or mid
            x0f = mm(_xla_site_folded(p['inc']['c1'], xf, act, kernel_act=an))
            x0f = mm(_xla_site_folded(p['inc']['c2'], x0f, act,
                                      kernel_act=an))
        x0 = x0f
        v0 = valid
    else:
        mm = m1 or mid
        x0 = mm(act(norm_apply(norm, p['inc']['n1'],
                               conv2d(p['inc']['c1'], x))))
        x0 = mm(act(norm_apply(norm, p['inc']['n2'],
                               conv2d(p['inc']['c2'], x0))))
        v0 = valid

    new_st['skip2'] = _ring_push(st['skip2'], x0, v0)

    d = p['down0']
    if fold_io:
        y = _xla_down_folded(d['conv'], x0, act, kernel_act=an)
    else:
        y = act(norm_apply(norm, d['n'], conv2d(d['conv'], x0, stride=2)))
    if m2 is not None:
        y = m2(y)
    new_st['down0'], x1, v1 = _memcv_step(d['cv'], norm, act, st['down0'],
                                          y, v0, fd, causal, assume_filled,
                                          an, mask1=m2)
    new_st['skip3'] = _ring_push(st['skip3'], x1, v1)

    d = p['down1']
    if fold_io and x1.shape[-2] % 2 == 0:
        # down1 through the same fold: (270, 480, 128) -> (270, 240, 256)
        y = _xla_down_folded(d['conv'], _fold2s(x1), act, kernel_act=an)
    else:
        y = act(norm_apply(norm, d['n'], conv2d(d['conv'], x1, stride=2)))
    if m4 is not None:
        y = m4(y)
    new_st['down1'], x2, v2 = _memcv_step(d['cv'], norm, act, st['down1'],
                                          y, v1, fd, causal, assume_filled,
                                          an, mask1=m4)

    u = p['up2']
    new_st['up2'], x2, v2 = _memcv_step(u['cv'], norm, act, st['up2'],
                                        x2, v2, fd, causal, assume_filled,
                                        an, mask1=m4)
    x2 = _up_conv_ps_stream(u['conv'], x2, act, use_k=an is not None)
    if m2 is not None:
        x2 = m2(x2)

    new_st['skip3'], sk3 = _ring_pop(new_st['skip3'], v2)

    u = p['up1']
    new_st['up1'], x1u, v1u = _memcv_step(u['cv'], norm, act, st['up1'],
                                          x2 + sk3.astype(x2.dtype), v2, fd,
                                          causal, assume_filled, an,
                                          mask1=m2)

    o = p['outc']
    s_out = o['c2']['w'].shape[-1]
    if fold_io:
        # up1 conv emits the shuffled+folded layout directly, and the outc
        # chain + skip-add + residual combine run as ONE kernel when the
        # folded output is lane-aligned (mirrors wnet_arch's folded tail)
        x1uf = _up_conv_psfold_stream(u['conv'], x1u, act)
        if m1 is not None:
            x1uf = m1(x1uf)
        new_st['skip2'], sk2 = _ring_pop(new_st['skip2'], v1u)
        sk2f = sk2.astype(x1uf.dtype)
        new_st['skip1'], sk1 = _ring_pop(new_st['skip1'], v1u)
        sk1f = sk1.astype(x1uf.dtype)
        sk1_full = sk1f.shape[-1] != 2 * rc
        if an is not None and mask is None:
            from bsvd_tpu.ops.conv3x3 import fold_width_weights
            from bsvd_tpu.ops.conv_chain import (conv_chain_add2_res,
                                                 conv_chain_supported)
            w1, b1 = fold_width_weights(o['c1']['w'], o['c1']['b'])
            w2, b2 = fold_width_weights(o['c2']['w'], o['c2']['b'])
            if sk1_full and conv_chain_supported(
                    sk2f.shape, w1.shape, w2.shape, sk2f.dtype, n_in=2,
                    has_res=True, folded=True,
                    res_lanes=sk1f.shape[-1]):
                # tail stage: the kernel projects the full folded input to
                # output lanes in VMEM (res_embed)
                yf = conv_chain_add2_res(sk2f, x1uf, sk1f, w1, b1, w2, b2,
                                         cfg.act, 'none', rc, True,
                                         res_embed=(sk1f.shape[-1] // 2,
                                                    s_out))
                return new_st, yf, v1u
            if not sk1_full and conv_chain_supported(
                    sk2f.shape, w1.shape, w2.shape, sk2f.dtype, n_in=2,
                    has_res=True, folded=True):
                xpad = embed_half_lanes(sk1f, rc, s_out)
                yf = conv_chain_add2_res(sk2f, x1uf, xpad, w1, b1, w2, b2,
                                         cfg.act, 'none', rc, True)
                return new_st, yf, v1u
        # 0/1-embedding GEMM instead of reshape+pad (layout-safe; see
        # wnet_arch.embed_half_lanes)
        xpad = embed_half_lanes(sk1f, sk1f.shape[-1] // 2 if sk1_full
                                else rc, s_out)
        if mask is None:
            yf = _pair_folded_stream(o['c1'], o['c2'], x1uf, act, 'none', an,
                                     x2_f=sk2f)
        else:
            yf = m1(_xla_site_folded(o['c1'], x1uf, act, kernel_act=an,
                                     x2_f=sk2f))
            yf = _xla_site_folded(o['c2'], yf, act, act_name='none',
                                  kernel_act='none' if an else None)
        lane_is_res = jnp.asarray(np.arange(2 * s_out) % s_out < rc)
        out_f = jnp.where(lane_is_res, xpad - yf, yf)
        return new_st, out_f, v1u

    x1u = _up_conv_ps_stream(u['conv'], x1u, act, use_k=an is not None)
    if m1 is not None:
        x1u = m1(x1u)
    new_st['skip2'], sk2 = _ring_pop(new_st['skip2'], v1u)
    y = (m1 or mid)(act(norm_apply(norm, o['n1'],
                        conv2d(o['c1'], x1u + sk2.astype(x1u.dtype)))))
    y = conv2d(o['c2'], y)

    new_st['skip1'], sk1 = _ring_pop(new_st['skip1'], v1u)
    # residual combine as one fused elementwise pass (lane select instead
    # of sub-128-lane slice+concat; see wnet_arch._stage_apply_folded)
    skpad = jnp.pad(sk1.astype(y.dtype),
                    [(0, 0)] * 3 + [(0, s_out - sk1.shape[-1])])
    lane_is_res = jnp.asarray(np.arange(s_out) < rc)
    out = jnp.where(lane_is_res, skpad - y, y)
    return new_st, out, v1u


# ---------------------------------------------------------------------------
# multi-frame (block) streaming step — steady state only
# ---------------------------------------------------------------------------

def _ring_thread(state, frames):
    """F interleaved push-then-pop pairs through a skip ring (exactly the
    per-frame step's ring order: frame j pushes, then frame j pops), in the
    STEADY state — where the ring is a pure delay line: the gap w - r is
    ``depth - 1`` by construction (ring depths are sized as the pipeline
    in-flight count + 1, and the block path only runs with every buffer
    primed), so pop_j == push_{j - (depth-1)}. The first min(depth-1, F)
    pops come from the stored entries (single-slot dynamic reads — a fancy
    multi-index gather lowers to while loops on TPU, measured 2x slower),
    the rest straight from this block's pushes; the write-back rebases the
    slots to 0..D-1 (r=0, w=D) with ONE static update. Returns
    (new_state, pops (F, N, H, W, C))."""
    depth = state['buf'].shape[0]
    dly = depth - 1
    f = frames.shape[0]
    if dly == 0:                        # causal rings: pure passthrough
        return state, frames
    r = state['r'] % depth
    k = min(dly, f)
    stored = [lax.dynamic_index_in_dim(state['buf'], (r + j) % depth, 0,
                                       keepdims=True) for j in range(k)]
    if f >= dly:
        pops = jnp.concatenate(stored + [frames[:f - dly]], axis=0) \
            if f > dly else jnp.concatenate(stored, axis=0)
        new_entries = frames[f - dly:]
    else:
        rest = [lax.dynamic_index_in_dim(state['buf'], (r + f + j) % depth,
                                         0, keepdims=True)
                for j in range(dly - f)]
        pops = (jnp.concatenate(stored, axis=0) if len(stored) > 1
                else stored[0])
        new_entries = jnp.concatenate(rest + [frames], axis=0)
    buf = lax.dynamic_update_slice_in_dim(
        state['buf'], new_entries.astype(state['buf'].dtype), 0, axis=0)
    zero = jnp.zeros((), jnp.int32)
    return {'buf': buf, 'w': zero + dly, 'r': zero}, pops


def _bibuffer_multi_site(conv_p, norm, norm_p, act, state, xs, fold_div,
                         causal, act_name, mask1=None):
    """F-frame advance of one buffered shift-conv (steady state, all frames
    valid): ONE weight-shared kernel when the site qualifies (N == 1,
    ops/bibuffer_conv.bibuffer_multi_pallas — MIMO-kernel throughput), a
    scanned per-frame step otherwise. ``xs``: (F, N, H, W, C). ``mask1``:
    level-bound row-validity hook applied to the conv outputs (the carried
    state is lane slices of the already-masked inputs)."""
    from bsvd_tpu.ops.conv3x3 import KERNEL_ACTS
    m = (lambda v: v) if mask1 is None else mask1
    f, n_ = xs.shape[:2]
    if (n_ == 1 and norm == 'none' and act_name in KERNEL_ACTS
            and 'b' in conv_p):
        from bsvd_tpu.ops.bibuffer_conv import (bibuffer_multi_pallas,
                                                bibuffer_multi_supported)
        xsq = xs[:, 0]
        if bibuffer_multi_supported(xsq.shape, conv_p['w'].shape, xs.dtype):
            y, bn = bibuffer_multi_pallas(xsq, state['packed'], conv_p['w'],
                                          conv_p['b'], fold_div=fold_div,
                                          act=act_name, causal=causal)
            return ({'packed': bn, 'has_center': state['has_center']},
                    m(y[:, None]))

    def body(s, xi):
        s2, y, _ = _bibuffer_step(conv_p, norm, norm_p, act, s, xi, True,
                                  fold_div, causal, True, act_name,
                                  mask1=mask1)
        return s2, y

    s_n, ys = lax.scan(body, state, xs)
    return s_n, ys


def _memcv_multi(p, norm, act, st_pair, xs, fold_div, causal, act_name,
                 mask1=None):
    """F-frame MemCvBlock advance: both buffered convs as weight-shared
    multi-frame kernels (steady state)."""
    s1, y1 = _bibuffer_multi_site(p['c1'], norm, p['n1'], act, st_pair[0],
                                  xs, fold_div, causal, act_name, mask1)
    s2, y2 = _bibuffer_multi_site(p['c2'], norm, p['n2'], act, st_pair[1],
                                  y1, fold_div, causal, act_name, mask1)
    return [s1, s2], y2


def _stage_stream_step_block(p, st, xs, cfg, act, fold_io=False, mask=None):
    """F frames through one DenBlock stage in steady state — exactly F
    repetitions of ``_stage_stream_step(assume_filled=True, valid=True)``
    (property-tested), but each temporal site advances via ONE weight-shared
    F-frame kernel and each non-temporal site via the NT=F MIMO kernels, so
    a block runs at whole-clip kernel throughput instead of paying the NT=1
    per-frame DMA prologue 16 times per frame.

    ``xs``: (F, N, H, W, C) (width-folded when ``fold_io``). ``mask``: the
    spatial-sharding row-validity hook (see _stage_stream_step); unbundles
    the conv chains."""
    norm = cfg.norm
    fd = cfg.fold_div
    causal = 'toFutureOnly' in cfg.shift_mode
    from bsvd_tpu.ops.conv3x3 import KERNEL_ACTS
    use_k = (cfg.use_fused and cfg.norm == 'none' and _on_tpu()
             and cfg.act in KERNEL_ACTS)
    an = cfg.act if use_k else None
    m1 = None if mask is None else (lambda v: mask(v, 1))
    m2 = None if mask is None else (lambda v: mask(v, 2))
    m4 = None if mask is None else (lambda v: mask(v, 4))
    mid = lambda v: v
    new_st = dict(st)
    rc = cfg.residual_ch
    f, n_ = xs.shape[:2]

    def merge(v):                       # (F, N, ...) -> (F*N, ...) — free
        return v.reshape((f * n_,) + v.shape[2:])

    def split(v):
        return v.reshape((f, n_) + v.shape[1:])

    if fold_io:
        _, _, h_, wf_, c2_ = xs.shape
        if st['skip1']['buf'].shape[-1] == c2_:
            sk1_pushes = xs          # tail stage: full folded input
        else:
            xr = xs.reshape(f, n_, h_, wf_, 2, c2_ // 2)[..., :rc]
            sk1_pushes = xr.reshape(f, n_, h_, wf_, 2 * rc)
    else:
        sk1_pushes = xs[..., :rc]

    if cfg.shift_input:
        s1, x0 = _bibuffer_multi_site(p['inc']['c1'], norm, p['inc']['n1'],
                                      act, st['inc'][0], xs, fd, causal, an,
                                      mask1=m1)
        s2, x0 = _bibuffer_multi_site(p['inc']['c2'], norm, p['inc']['n2'],
                                      act, st['inc'][1], x0, fd, causal, an,
                                      mask1=m1)
        new_st['inc'] = [s1, s2]
    elif fold_io:
        xf = merge(xs)
        s_out0 = p['outc']['c2']['w'].shape[-1]
        if xf.shape[-1] >= 128 and mask is None:
            x0f = _pair_folded_stream(p['inc']['c1'], p['inc']['c2'], xf,
                                      act, an or 'relu6', an)
        elif xf.shape[-1] >= 128:
            x0f = m1(_xla_site_folded(p['inc']['c1'], xf, act, kernel_act=an))
            x0f = m1(_xla_site_folded(p['inc']['c2'], x0f, act,
                                      kernel_act=an))
        elif an is not None and 2 * s_out0 >= 128:
            in_c = xf.shape[-1] // 2
            xe = embed_half_lanes(xf, in_c, s_out0)
            if mask is None:
                x0f = _pair_folded_stream(
                    pad_in_channels(p['inc']['c1'], s_out0),
                    p['inc']['c2'], xe, act, an or 'relu6', an)
            else:
                x0f = m1(_xla_site_folded(
                    pad_in_channels(p['inc']['c1'], s_out0), xe, act,
                    kernel_act=an))
                x0f = m1(_xla_site_folded(p['inc']['c2'], x0f, act,
                                          kernel_act=an))
        else:
            mm = m1 or mid
            x0f = mm(_xla_site_folded(p['inc']['c1'], xf, act, kernel_act=an))
            x0f = mm(_xla_site_folded(p['inc']['c2'], x0f, act,
                                      kernel_act=an))
        x0 = split(x0f)
    else:
        mm = m1 or mid
        xm = merge(xs)
        x0 = mm(act(norm_apply(norm, p['inc']['n1'],
                               conv2d(p['inc']['c1'], xm))))
        x0 = mm(act(norm_apply(norm, p['inc']['n2'],
                               conv2d(p['inc']['c2'], x0))))
        x0 = split(x0)

    d = p['down0']
    if fold_io:
        y = split(_xla_down_folded(d['conv'], merge(x0), act, kernel_act=an))
    else:
        y = split(act(norm_apply(norm, d['n'],
                                 conv2d(d['conv'], merge(x0), stride=2))))
    if m2 is not None:
        y = m2(y)
    new_st['down0'], x1 = _memcv_multi(d['cv'], norm, act, st['down0'], y,
                                       fd, causal, an, mask1=m2)

    d = p['down1']
    if fold_io and x1.shape[-2] % 2 == 0:
        y = split(_xla_down_folded(d['conv'], _fold2s(merge(x1)), act,
                                   kernel_act=an))
    else:
        y = split(act(norm_apply(norm, d['n'],
                                 conv2d(d['conv'], merge(x1), stride=2))))
    if m4 is not None:
        y = m4(y)
    new_st['down1'], x2 = _memcv_multi(d['cv'], norm, act, st['down1'], y,
                                       fd, causal, an, mask1=m4)

    u = p['up2']
    new_st['up2'], x2 = _memcv_multi(u['cv'], norm, act, st['up2'], x2,
                                     fd, causal, an, mask1=m4)
    x2 = split(_up_conv_ps_stream(u['conv'], merge(x2), act,
                                  use_k=an is not None))
    if m2 is not None:
        x2 = m2(x2)

    new_st['skip3'], sk3 = _ring_thread(st['skip3'], x1)

    u = p['up1']
    new_st['up1'], x1u = _memcv_multi(u['cv'], norm, act, st['up1'],
                                      x2 + sk3.astype(x2.dtype), fd, causal,
                                      an, mask1=m2)

    o = p['outc']
    s_out = o['c2']['w'].shape[-1]
    if fold_io:
        x1uf = _up_conv_psfold_stream(u['conv'], merge(x1u), act)
        if m1 is not None:
            x1uf = m1(x1uf)
        new_st['skip2'], sk2 = _ring_thread(st['skip2'], x0)
        sk2f = merge(sk2).astype(x1uf.dtype)
        new_st['skip1'], sk1 = _ring_thread(st['skip1'], sk1_pushes)
        sk1f = merge(sk1).astype(x1uf.dtype)
        sk1_full = sk1f.shape[-1] != 2 * rc
        if an is not None and mask is None:
            from bsvd_tpu.ops.conv3x3 import fold_width_weights
            from bsvd_tpu.ops.conv_chain import (conv_chain_add2_res,
                                                 conv_chain_supported)
            w1, b1 = fold_width_weights(o['c1']['w'], o['c1']['b'])
            w2, b2 = fold_width_weights(o['c2']['w'], o['c2']['b'])
            if sk1_full and conv_chain_supported(
                    sk2f.shape, w1.shape, w2.shape, sk2f.dtype, n_in=2,
                    has_res=True, folded=True, res_lanes=sk1f.shape[-1]):
                yf = conv_chain_add2_res(sk2f, x1uf, sk1f, w1, b1, w2, b2,
                                         cfg.act, 'none', rc, True,
                                         res_embed=(sk1f.shape[-1] // 2,
                                                    s_out))
                return new_st, split(yf)
            if not sk1_full and conv_chain_supported(
                    sk2f.shape, w1.shape, w2.shape, sk2f.dtype, n_in=2,
                    has_res=True, folded=True):
                xpad = embed_half_lanes(sk1f, rc, s_out)
                yf = conv_chain_add2_res(sk2f, x1uf, xpad, w1, b1, w2, b2,
                                         cfg.act, 'none', rc, True)
                return new_st, split(yf)
        xpad = embed_half_lanes(sk1f, sk1f.shape[-1] // 2 if sk1_full
                                else rc, s_out)
        if mask is None:
            yf = _pair_folded_stream(o['c1'], o['c2'], x1uf, act, 'none', an,
                                     x2_f=sk2f)
        else:
            yf = m1(_xla_site_folded(o['c1'], x1uf, act, kernel_act=an,
                                     x2_f=sk2f))
            yf = _xla_site_folded(o['c2'], yf, act, act_name='none',
                                  kernel_act='none' if an else None)
        lane_is_res = jnp.asarray(np.arange(2 * s_out) % s_out < rc)
        return new_st, split(jnp.where(lane_is_res, xpad - yf, yf))

    x1um = _up_conv_ps_stream(u['conv'], merge(x1u), act,
                              use_k=an is not None)
    if m1 is not None:
        x1um = m1(x1um)
    new_st['skip2'], sk2 = _ring_thread(st['skip2'], x0)
    y = (m1 or mid)(act(norm_apply(norm, o['n1'],
                        conv2d(o['c1'],
                               x1um + merge(sk2).astype(x1um.dtype)))))
    y = conv2d(o['c2'], y)

    new_st['skip1'], sk1 = _ring_thread(st['skip1'], sk1_pushes)
    skpad = jnp.pad(merge(sk1).astype(y.dtype),
                    [(0, 0)] * 3 + [(0, s_out - sk1.shape[-1])])
    lane_is_res = jnp.asarray(np.arange(s_out) < rc)
    return new_st, split(jnp.where(lane_is_res, skpad - y, y))


def stream_step_block(params, state, xs, cfg):
    """Advance the whole pipeline by F frames in ONE program (steady state
    only: every buffer primed, every frame valid). Semantically exactly F
    ``stream_step(..., True, cfg, assume_filled=True)`` advances, but each
    of the 16 temporal convs runs as ONE weight-shared F-frame kernel and
    the stems/ups run the NT=F MIMO kernels (StreamDenoiser.push_block's
    throughput mode; reference counterpart: frame-by-frame
    feedin_one_element, bsvd_arch.py:501-552).

    Args:
        xs: (F, N, H, W, C_in) stacked frames.
    Returns:
        (new_state, outs (F, N, H, W, out_ch)).
    """
    act = get_act(cfg.act)
    fold_io = _fold_active(cfg, xs.shape[-2])
    if fold_io:
        fb, nb, hb_, wb, cb = xs.shape
        xs = xs.reshape(fb, nb, hb_, wb // 2, 2 * cb)
    new_state = []
    for i in range(cfg.stage_num):
        st, xs = _stage_stream_step_block(params[f'stage{i}'], state[i], xs,
                                          cfg, act, fold_io=fold_io)
        new_state.append(st)
    if fold_io:
        fb, nb, hb_, wb, cb = xs.shape
        xs = xs.reshape(fb, nb, hb_, wb * 2, cb // 2)
    return new_state, xs


# ---------------------------------------------------------------------------
# full-net streaming
# ---------------------------------------------------------------------------

def stream_init(cfg, n, h, w, dtype=jnp.float32):
    """Zero streaming state for the whole net at input resolution (h, w)."""
    return [_stage_stream_init(cfg, i, n, h, w, dtype)
            for i in range(cfg.stage_num)]


def stream_step(params, state, x, valid, cfg, assume_filled=False,
                mask=None):
    """Advance the whole pipeline by one frame.

    Args:
        x: (N, H, W, C_in) frame (contents ignored when ``valid`` is False).
        valid: () bool — False during drain. May be a static Python bool
            (client path) or traced (scan path).
        assume_filled: static; treat all buffers as primed (steady state).
        mask: optional (v, level) -> v row-validity hook (spatially sharded
            streaming; see _stage_stream_step).
    Returns:
        (new_state, out (N, H, W, out_ch_of_last_stage), out_valid)
    """
    act = get_act(cfg.act)
    if not isinstance(valid, bool):
        valid = jnp.asarray(valid, jnp.bool_)
    fold_io = _fold_active(cfg, x.shape[-2])
    if fold_io:
        x = _fold2s(x)
    new_state = []
    for i in range(cfg.stage_num):
        st, x, valid = _stage_stream_step(params[f'stage{i}'], state[i], x,
                                          valid, cfg, act, assume_filled,
                                          fold_io=fold_io, mask=mask)
        new_state.append(st)
    if fold_io:
        x = _unfold2s(x)
    return new_state, x, valid


def stream_state_specs(cfg, batch_axis='data', row_axis=None):
    """PartitionSpec pytree matching stream_init's structure: the stream
    batch N rides ``batch_axis`` (N-stream serving) and the row dimension
    H rides ``row_axis`` (single-stream spatial sharding, where each shard
    holds its halo-extended row block — parallel/spatial.py). Scalars and
    counters are replicated. Ring buffers are (depth, N, H, W, C)."""
    from jax.sharding import PartitionSpec as P

    def bib():
        return {'packed': P(batch_axis, row_axis), 'has_center': P()}

    def ring():
        return {'buf': P(None, batch_axis, row_axis), 'w': P(), 'r': P()}

    specs = []
    for _ in range(cfg.stage_num):
        st = {'down0': [bib(), bib()], 'down1': [bib(), bib()],
              'up2': [bib(), bib()], 'up1': [bib(), bib()],
              'skip1': ring(), 'skip2': ring(), 'skip3': ring()}
        if cfg.shift_input:
            st['inc'] = [bib(), bib()]
        specs.append(st)
    return specs


def pipeline_latency(cfg):
    """Output delay in frames (== reference BSVD.shift_num for bidirectional;
    0 for the causal variant, which needs no future context)."""
    if 'toFutureOnly' in cfg.shift_mode:
        return 0
    return cfg.shift_num


def streaming_apply(params, x, cfg, state_dtype=None):
    """Whole-clip streaming forward via lax.scan — reference
    BSVD.streaming_forward (bsvd_arch.py:501-552): feed T frames, then drain
    with ``shift_num`` invalid steps, return outputs[shift_num:].

    Args:
        x: (N, T, H, W, C_in)
    Returns:
        (N, T, H, W, out_ch)
    """
    n, t, h, w, _ = x.shape
    lat = pipeline_latency(cfg)
    state = stream_init(cfg, n, h, w, state_dtype or x.dtype)

    pad = jnp.zeros((n, lat) + x.shape[2:], x.dtype)
    frames = jnp.concatenate([x, pad], axis=1)          # (N, T+lat, H, W, C)
    frames_t = jnp.moveaxis(frames, 1, 0)               # (T+lat, N, H, W, C)
    valids = jnp.arange(t + lat) < t

    def body(carry, inp):
        frame, valid = inp
        new_carry, out, _ = stream_step(params, carry, frame, valid, cfg)
        return new_carry, out

    _, outs = lax.scan(body, state, (frames_t, valids))
    return jnp.moveaxis(outs[lat:], 0, 1)


class StreamDenoiser:
    """Low-latency frame-by-frame streaming client.

    Push frames one at a time; each push returns a denoised frame delayed by
    ``latency`` frames (None while the pipeline fills). ``flush()`` drains the
    remaining frames. This is the TPU counterpart of driving the reference
    BSVD net with feedin_one_element (bsvd_arch.py:485-552) — the step is one
    jitted XLA program with donated state, so per-frame host overhead is a
    single dispatch.

    Example::

        sd = StreamDenoiser(params, cfg, batch=1, height=540, width=960)
        for frame in video:           # frame: (1, H, W, C) with noise map
            out = sd.push(frame)
            if out is not None: emit(out)
        for out in sd.flush(): emit(out)
    """

    def __init__(self, params, cfg, batch, height, width, dtype=jnp.float32,
                 mesh=None):
        self.cfg = cfg
        self.params = params
        self._shape = (batch, height, width)
        self.dtype = dtype
        self.latency = pipeline_latency(cfg)
        # N-stream serving: with a mesh whose 'data' axis divides the stream
        # batch, every step runs inside shard_map with the batch sharded
        # over 'data' — N chips each advance their streams' pipelines, and
        # the Pallas kernels stay engaged per-shard (GSPMD cannot partition
        # custom calls). SINGLE-STREAM scaling: a 'spatial' mesh axis shards
        # the frame ROWS — each shard holds the halo-extended row block of
        # every carried buffer and the step gathers each stage's cheap
        # narrow-channel input over ICI (parallel/spatial.py
        # stream_local_step; the reference has no single-stream multi-GPU
        # streaming at all — its DP scatters whole frames,
        # BasicSR/basicsr/models/base_model.py:62-76).
        self.mesh = None
        self._spatial = None
        self._batch_axis = None
        if mesh is not None:
            shape = dict(mesh.shape)
            n_sp = shape.get('spatial', 1)
            n_dat = shape.get('data', 1)
            batch_rides = n_dat > 1 and batch % n_dat == 0
            if n_sp > 1:
                from bsvd_tpu.parallel.spatial import (stage_halo,
                                                       stream_spatial_ok)
                if stream_spatial_ok(cfg, height, mesh):
                    self.mesh = mesh
                    self._spatial = {'n_sp': n_sp, 'halo': stage_halo(cfg),
                                     'h_local': height // n_sp}
                    # batch shards over 'data' when it divides; otherwise
                    # it replicates there (N=1 single-stream serving)
                    self._batch_axis = 'data' if batch_rides else None
            elif batch_rides:
                self.mesh = mesh
                self._batch_axis = 'data'

        def _wrap(fn, frame_spec=None):
            """shard_map the (params, state, frame) -> (state, out) step
            over the configured mesh axes."""
            if self.mesh is None:
                return fn
            import functools
            from jax.sharding import PartitionSpec as P
            from bsvd_tpu.parallel.mesh import get_shard_map
            shard_map, relax = get_shard_map()
            row_axis = 'spatial' if self._spatial else None
            sspec = stream_state_specs(cfg, self._batch_axis, row_axis)
            fspec = frame_spec or P(self._batch_axis, row_axis)
            return functools.partial(
                shard_map, mesh=self.mesh,
                in_specs=(P(), sspec, fspec),
                out_specs=(sspec, fspec), **relax)(fn)

        if self._spatial is None:
            def mk_step(valid, filled):
                return lambda p, s, f: stream_step(p, s, f, valid, cfg,
                                                   assume_filled=filled)[:2]
        else:
            from bsvd_tpu.parallel.spatial import stream_local_step

            def mk_step(valid, filled):
                def local(p, s, f):
                    ns, out, _ = stream_local_step(p, s, f, cfg, height,
                                                   'spatial', valid, filled)
                    return ns, out
                return local

        # three compiled variants: fill (traced masking), steady state
        # (mask-free: every buffer primed, input always valid), drain
        self._step_fill = jax.jit(_wrap(mk_step(True, False)),
                                  donate_argnums=(1,))
        self._step_steady = jax.jit(_wrap(mk_step(True, True)),
                                    donate_argnums=(1,))
        self._step_drain = jax.jit(_wrap(mk_step(False, False)),
                                   donate_argnums=(1,))
        self._wrap = _wrap
        self._mk_step = mk_step
        self._block_steps = {}      # (F, steady) -> jitted block step
        self.reset()

    def reset(self):
        n, h, w = self._shape
        if self._spatial is not None:
            # per-shard HALO-EXTENDED state, laid out as one global array
            # whose 'spatial' shards are the extended blocks (content is
            # all zeros at init, so the tiling is trivially consistent)
            sp = self._spatial
            h_state = sp['n_sp'] * (sp['h_local'] + 2 * sp['halo'])
            self.state = stream_init(self.cfg, n, h_state, w, self.dtype)
        else:
            self.state = stream_init(self.cfg, n, h, w, self.dtype)
        if self.mesh is not None:
            # place state (and params) on the mesh up front so the first
            # step does not pay a resharding copy
            from jax.sharding import NamedSharding, PartitionSpec as P
            row_axis = 'spatial' if self._spatial else None
            flat, treedef = jax.tree.flatten(self.state)
            specs = treedef.flatten_up_to(
                stream_state_specs(self.cfg, self._batch_axis, row_axis))
            self.state = jax.tree.unflatten(treedef, [
                jax.device_put(a, NamedSharding(self.mesh, sp))
                for a, sp in zip(flat, specs)])
            self.params = jax.device_put(
                self.params, NamedSharding(self.mesh, P()))
        self._pushed = 0
        self._emitted = 0

    def push(self, frame):
        frame = jnp.asarray(frame, self.dtype)
        step = (self._step_steady if self._pushed >= self.latency
                else self._step_fill)
        self.state, out = step(self.params, self.state, frame)
        self._pushed += 1
        # Output validity is deterministic (pipeline latency), so no device
        # sync is needed per frame — the step stays fully async.
        if self._pushed > self.latency:
            self._emitted += 1
            return out
        return None

    def push_block(self, frames):
        """Throughput mode: advance the pipeline by F frames in ONE device
        program (a jitted scan), returning the F delayed outputs.

        One dispatch instead of F — on remote-attached TPUs the per-call
        host->device latency (~3.7 ms through the axon tunnel, PERF.md)
        amortizes across the block. Adds F-1 frames of latency for the
        first frame of the block relative to per-frame ``push``.

        Args:
            frames: (F, N, H, W, C_in) stacked frames (or a list of
                (N, H, W, C_in) arrays).
        Returns:
            list of F outputs ((N, H, W, out_ch) each; None while the
            pipeline is still filling).
        """
        if isinstance(frames, (list, tuple)):
            frames = jnp.stack([jnp.asarray(f, self.dtype) for f in frames])
        else:
            frames = jnp.asarray(frames, self.dtype)
        f = frames.shape[0]
        steady = self._pushed >= self.latency
        key = (f, steady)
        blk = self._block_steps.get(key)
        if blk is None:
            cfg = self.cfg
            height = self._shape[1]

            if steady and self._spatial is not None:
                from bsvd_tpu.parallel.spatial import stream_local_step_block

                def run(p, s, fr):
                    return stream_local_step_block(p, s, fr, cfg, height,
                                                   'spatial')
            elif steady:
                # steady state: the F-frame block step — every temporal conv
                # one weight-shared multi-frame kernel, stems/ups the NT=F
                # MIMO kernels (whole-clip kernel throughput)
                def run(p, s, fr):
                    return stream_step_block(p, s, fr, cfg)
            else:
                # fill: scanned per-frame steps with validity masking
                step1 = self._mk_step(True, False)

                def run(p, s, fr):
                    def body(carry, frame):
                        return step1(p, carry, frame)
                    return lax.scan(body, s, fr)

            from jax.sharding import PartitionSpec as P
            row_axis = 'spatial' if self._spatial else None
            fspec = P(None, self._batch_axis, row_axis)
            blk = jax.jit(self._wrap(run, frame_spec=fspec),
                          donate_argnums=(1,))
            self._block_steps[key] = blk
        self.state, outs = blk(self.params, self.state, frames)
        res = []
        for i in range(f):
            self._pushed += 1
            if self._pushed > self.latency:
                self._emitted += 1
                res.append(outs[i])
            else:
                res.append(None)
        return res

    def flush(self):
        """Drain the pipeline and return the outstanding outputs.

        The output for pushed frame i only becomes valid ``latency`` steps
        after its push (reference drains with None until T valid outputs
        are collected, bsvd_arch.py:530-552), so a full drain always runs
        ``latency`` invalid steps — even when fewer frames than the
        pipeline depth were pushed — and only the last
        ``pushed - emitted`` outputs are real."""
        if self._emitted >= self._pushed:
            return []
        n, h, w = self._shape
        cin = self.cfg.effective_in_ch
        zero = jnp.zeros((n, h, w, cin), self.dtype)
        outs = []
        first_valid = self.latency + self._emitted - self._pushed
        for d in range(self.latency):
            self.state, out = self._step_drain(self.params, self.state,
                                               zero)
            if d >= first_valid:
                outs.append(out)
                self._emitted += 1
        return outs

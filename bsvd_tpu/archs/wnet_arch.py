"""WNet — the W-shaped multi-stage temporal-shift U-Net denoiser, TPU-native.

One functional core serves every mode of the reference's three network
classes (WNet/TSN for training, BSVD for streaming inference):

- ``shift_mode='none'``  -> plain 2-D WNet (reference
  Experimental_root/archs/archs_2d/wnet_models.py:126-278)
- ``shift_mode='TSM'``   -> temporal-shift WNet == TSN training net
  (Experimental_root/archs/tsm_arch.py:11-72); applied whole-clip it is
  exactly the BSVD streaming pipeline (bsvd_arch.py:441-560) because both
  use zero temporal boundaries.
- ``shift_mode='TSM_toFutureOnly'`` -> causal/unidirectional variant
  (temporal_shift.py:42-46).

Layout is (N, T, H, W, C) NHWC — channels ride the TPU lane dimension and
the T axis merges into the conv batch, so every 3x3 conv is one large MXU
matmul over N*T frames.

Structure per stage (DenBlock, chns=(c0,c1,c2)):
  inc   : InputCvBlock conv(in->interm) act conv(interm->c0) act
          (or CvBlock with temporal shift when shift_input=True)
  down0 : conv_s2(c0->c1) act | shift-conv(c1) act | shift-conv(c1) act
  down1 : conv_s2(c1->c2) act | shift-conv(c2) act | shift-conv(c2) act
  up2   : shift-conv(c2) act shift-conv(c2) act | conv(c2->4*c1) pixshuf
  up1   : (x1+x2) shift-conv(c1) act x2 | conv(c1->4*c0) pixshuf
  outc  : (x0+x1) conv(c0) act conv(c0->out)
  residual: out[..., :3] = in[..., :3] - out[..., :3]

Only the CvBlock convs inside down/up blocks are temporal (16 shift convs
for stage_num=2 — matching BSVD.count_shift()==16, bsvd_arch.py:554-560).
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsvd_tpu.nn.layers import conv2d, conv_init, get_act, get_norm, norm_apply, norm_init
from bsvd_tpu.nn.shift import temporal_shift, temporal_shift_chunk
from bsvd_tpu.utils.registry import ARCH_REGISTRY


@dataclasses.dataclass(frozen=True)
class WNetConfig:
    """Static architecture configuration (hashable: safe as a jit static arg)."""
    chns: Tuple[int, ...] = (32, 64, 128)
    mid_ch: int = 3
    in_ch: int = 4
    out_ch: int = 3
    stage_num: int = 2
    interm_ch: int = 30
    norm: str = 'bn'
    act: str = 'relu'
    bias: bool = True
    blind: bool = False
    shift_input: bool = False
    shift_mode: str = 'TSM'    # 'none' | 'TSM' | 'TSM_toFutureOnly'
    fold_div: int = 8
    # Channels carried through the per-stage residual (in - out). The
    # reference hardcodes 3 (RGB; wnet_models.py:181); the raw-domain
    # bsvd_raw variant uses 4 raw channels.
    residual_ch: int = 3
    # Route temporal-shift convs through the fused Pallas kernel when the
    # backend/shape supports it (bsvd_tpu/ops/shift_conv.py). Semantics are
    # identical; forward is ~1.2-1.5x faster on TPU. Falls back silently.
    use_fused: bool = True
    # Rematerialize each stage on the backward pass (jax.checkpoint): the
    # grad stores only stage boundaries instead of every intermediate,
    # trading ~1 extra forward of FLOPs for activation memory — enables
    # larger batches / longer clips per chip. TPU-native extension (no
    # reference counterpart); forward-only inference is unaffected.
    remat: bool = False

    def __post_init__(self):
        get_norm(self.norm)
        get_act(self.act)

    def stage_io(self, i):
        """(in_ch, out_ch, blind) of stage i — blind only drops the noise-map
        channel of stage 0 (reference wnet_models.py:240-256)."""
        s_in = self.in_ch if i == 0 else self.mid_ch
        s_out = self.out_ch if i == (self.stage_num - 1) else self.mid_ch
        return s_in, s_out, (self.blind and i == 0)

    @property
    def effective_in_ch(self):
        return 3 if self.blind else self.in_ch

    @property
    def shift_num(self):
        """Temporal (shift) convs per net = pipeline delay of streaming mode."""
        per_stage = 8 + (2 if self.shift_input else 0)
        return per_stage * self.stage_num


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _cvblock_init(key, in_ch, out_ch, cfg):
    k1, k2 = jax.random.split(key)
    return {
        'c1': conv_init(k1, in_ch, out_ch, 3, cfg.bias),
        'n1': norm_init(cfg.norm, out_ch),
        'c2': conv_init(k2, out_ch, out_ch, 3, cfg.bias),
        'n2': norm_init(cfg.norm, out_ch),
    }


def _stage_init(key, cfg, stage_idx):
    s_in, s_out, blind = cfg.stage_io(stage_idx)
    if blind:
        s_in = 3
    c0, c1, c2 = cfg.chns
    keys = jax.random.split(key, 8)
    if cfg.shift_input:
        inc = _cvblock_init(keys[0], s_in, c0, cfg)
    else:
        ka, kb = jax.random.split(keys[0])
        inc = {
            'c1': conv_init(ka, s_in, cfg.interm_ch, 3, cfg.bias),
            'n1': norm_init(cfg.norm, cfg.interm_ch),
            'c2': conv_init(kb, cfg.interm_ch, c0, 3, cfg.bias),
            'n2': norm_init(cfg.norm, c0),
        }
    down0 = {'conv': conv_init(keys[1], c0, c1, 3, cfg.bias),
             'n': norm_init(cfg.norm, c1),
             'cv': _cvblock_init(keys[2], c1, c1, cfg)}
    down1 = {'conv': conv_init(keys[3], c1, c2, 3, cfg.bias),
             'n': norm_init(cfg.norm, c2),
             'cv': _cvblock_init(keys[4], c2, c2, cfg)}
    ka, kb = jax.random.split(keys[5])
    up2 = {'cv': _cvblock_init(ka, c2, c2, cfg),
           'conv': conv_init(kb, c2, c1 * 4, 3, cfg.bias)}
    ka, kb = jax.random.split(keys[6])
    up1 = {'cv': _cvblock_init(ka, c1, c1, cfg),
           'conv': conv_init(kb, c1, c0 * 4, 3, cfg.bias)}
    ka, kb = jax.random.split(keys[7])
    outc = {'c1': conv_init(ka, c0, c0, 3, cfg.bias),
            'n1': norm_init(cfg.norm, c0),
            'c2': conv_init(kb, c0, s_out, 3, cfg.bias)}
    return {'inc': inc, 'down0': down0, 'down1': down1,
            'up2': up2, 'up1': up1, 'outc': outc}


def wnet_init(key, cfg):
    """Initialize the full WNet parameter pytree."""
    keys = jax.random.split(key, cfg.stage_num)
    return {f'stage{i}': _stage_init(keys[i], cfg, i) for i in range(cfg.stage_num)}


# ---------------------------------------------------------------------------
# apply (MIMO mode over (N, T, H, W, C))
# ---------------------------------------------------------------------------

def _shift(x, cfg, shift_fn):
    if cfg.shift_mode == 'none':
        return x
    if shift_fn is not None:
        return shift_fn(x)
    return temporal_shift(x, cfg.fold_div, cfg.shift_mode)


def _fused_ok(x, p, cfg, n_in=1):
    if not (cfg.use_fused and cfg.norm == 'none'
            and cfg.shift_mode != 'none' and 'b' in p):
        return False
    from bsvd_tpu.ops.shift_conv import shift_conv_supported
    n, t, h, w, c = x.shape
    return shift_conv_supported((n * t, h, w, c), p['w'].shape, x.dtype,
                                cfg.norm, n_in=n_in)


def _plain_conv_act(conv_p, norm_p, x, cfg, act, act_name=None):
    """Stride-1 3x3 conv (+ norm) + act site: fused Pallas path when
    supported (identity norm, TPU, 3x3), XLA otherwise. ``act_name=None``
    means use cfg.act; 'none' applies no activation (up-path convs)."""
    name = cfg.act if act_name is None else act_name
    # C >= 128 only: the C=64 width-folded kernel wins standalone but costs
    # more E2E than it saves by breaking XLA's elementwise fusion around the
    # full-res stems (measured: stems fused +52 ms, up-path fused -16 ms on
    # the 540p flagship). The up-path convs (C=128/256) keep the win.
    if cfg.use_fused and cfg.norm == 'none' and 'b' in conv_p \
            and conv_p['w'].shape[0] == 3 and conv_p['w'].shape[2] >= 128 \
            and name in ('relu', 'relu6', 'none'):
        from bsvd_tpu.ops.conv3x3 import conv3x3, conv3x3_supported
        n, t, h, w, c = x.shape
        if conv3x3_supported((n * t, h, w, c), conv_p['w'].shape, x.dtype):
            y = conv3x3(x.reshape(n * t, h, w, c), conv_p['w'],
                        conv_p['b'], name)
            return y.reshape(n, t, h, w, y.shape[-1])
    y = conv2d(conv_p, x)
    if norm_p is not None:
        y = norm_apply(cfg.norm, norm_p, y)
    if name == 'none':
        return y
    return act(y)


def _up_conv_ps(conv_p, x, cfg, act):
    """Up-path conv + r=2 pixel shuffle. One fused Pallas kernel emitting
    the shuffled NATURAL layout when each shuffle plane is 128-lane
    (ops/conv3x3.conv_ps_natural — up2's Cout=4x128 site); otherwise
    Pallas conv + XLA transpose. (up1's 4x64 output instead uses the
    width-FOLDED shuffled write, _up_conv_psfold.)"""
    n, t, h, w, c = x.shape
    if cfg.use_fused and cfg.norm == 'none':
        from bsvd_tpu.ops.conv3x3 import (conv_ps_natural,
                                          conv_ps_natural_supported)
        if conv_ps_natural_supported((n * t, h, w, c), conv_p['w'].shape,
                                     x.dtype):
            y = conv_ps_natural(x.reshape(n * t, h, w, c), conv_p['w'],
                                conv_p['b'])
            return y.reshape(n, t, 2 * h, 2 * w, y.shape[-1])
    from bsvd_tpu.nn.layers import pixel_shuffle
    return pixel_shuffle(_plain_conv_act(conv_p, None, x, cfg, act,
                                         act_name='none'), 2)


def _up_conv_psfold(conv_p, x, cfg, act):
    """Up-path conv + r=2 pixel shuffle, emitted directly in the
    width-folded layout the full-res segment consumes: the fused Pallas
    kernel (ops/conv3x3.conv_ps_fold) writes shuffled+folded rows as
    tile-aligned lane slices, replacing three XLA relayout copies.
    Returns fold2(pixel_shuffle(conv(x), 2))."""
    n, t, h, w, c = x.shape
    if cfg.use_fused and cfg.norm == 'none':
        from bsvd_tpu.ops.conv3x3 import (conv_ps_fold,
                                          conv_ps_fold_supported)
        if conv_ps_fold_supported((n * t, h, w, c), conv_p['w'].shape,
                                  x.dtype):
            y = conv_ps_fold(x.reshape(n * t, h, w, c), conv_p['w'],
                             conv_p['b'])
            return y.reshape(n, t, 2 * h, w, y.shape[-1])
    return _fold2(_up_conv_ps(conv_p, x, cfg, act))


def _cvblock_apply(p, x, cfg, act, temporal, shift_pair=None, x_add=None,
                   mask=None, level=1):
    """(shift? conv norm act) x2 — reference CvBlock with TemporalShift-wrapped
    convs (tsm_arch.py:49-57). ``shift_pair``: optional (fn1, fn2) closures
    or ``_ChunkShiftSite`` pairs overriding the default whole-segment shift
    (used for chunked carry).
    ``x_add``: optional second addend consumed by the FIRST conv with the
    skip-add fused into the kernel (up1's x1 + x2 entry).
    ``mask``: optional (x, level) -> x row-validity hook applied after EACH
    conv site (spatially-sharded forward: zeroes rows outside the global
    image so per-conv zero-padding semantics hold at the global edges)."""
    m = (lambda v: v) if mask is None else (lambda v: mask(v, level))
    if temporal and shift_pair is None:
        x = m(_shift_conv_act_site(p['c1'], p['n1'], x, cfg, act, x_add))
        x = m(_shift_conv_act_site(p['c2'], p['n2'], x, cfg, act))
        return x
    if temporal and isinstance(shift_pair[0], _ChunkShiftSite):
        x = m(_chunk_shift_conv_site(p['c1'], p['n1'], x, cfg, act,
                                     shift_pair[0], x_add))
        return m(_chunk_shift_conv_site(p['c2'], p['n2'], x, cfg, act,
                                        shift_pair[1]))
    if x_add is not None:
        x = x + x_add
    if temporal:
        x = _shift(x, cfg, shift_pair[0] if shift_pair else None)
    x = m(act(norm_apply(cfg.norm, p['n1'], conv2d(p['c1'], x))))
    if temporal:
        x = _shift(x, cfg, shift_pair[1] if shift_pair else None)
    x = m(act(norm_apply(cfg.norm, p['n2'], conv2d(p['c2'], x))))
    return x


def _shift_conv_act_site(conv_p, norm_p, x, cfg, act, x_add=None):
    if _fused_ok(x, conv_p, cfg, n_in=1 if x_add is None else 2):
        from bsvd_tpu.ops.shift_conv import shift_conv, shift_conv_add2
        n, t, h, w, c = x.shape
        causal = 'toFutureOnly' in cfg.shift_mode
        if x_add is None:
            y = shift_conv(x.reshape(n * t, h, w, c), conv_p['w'],
                           conv_p['b'], t, cfg.fold_div, cfg.act, causal)
        else:
            y = shift_conv_add2(x.reshape(n * t, h, w, c),
                                x_add.reshape(n * t, h, w, c), conv_p['w'],
                                conv_p['b'], t, cfg.fold_div, cfg.act, causal)
        return y.reshape(n, t, h, w, y.shape[-1])
    if x_add is not None:
        x = x + x_add
    xs = _shift(x, cfg, None)
    return act(norm_apply(cfg.norm, norm_p, conv2d(conv_p, xs)))


class _ChunkShiftSite:
    """One carry-threaded temporal-shift site of the chunked MIMO path
    (the reference's global-queue slot, slot-keyed into wnet_apply_chunk's
    ``new_carries``; validation_seq_infer.py:54-89 + temporal_shift.py:53-80).

    Two consumption modes, one carry protocol:

    - called as a function (the XLA path and shift_input stems): applies
      ``temporal_shift_chunk`` to the whole chunk and slot-writes the
      outgoing carry — the original closure contract.
    - fused path (``_chunk_shift_conv_site``): the zero-boundary segment
      kernel already computes frames 1..T-1 of the chunk shift exactly (the
      two shifts differ ONLY in frame 0's carried past slice), so the site
      exposes ``assemble_frame0`` for an NT=1 recompute of frame 0 and
      ``record`` for the carry extraction (a pure pre-shift input slice,
      reference temporal_shift.py:68).
    """

    def __init__(self, cfg, carry, future, write):
        self._cfg = cfg
        self.carry = carry
        self.future = future
        self._write = write

    def __call__(self, h):
        shifted, new_c = temporal_shift_chunk(
            h, self.carry, self._cfg.fold_div, self._cfg.shift_mode,
            future_buffer_len=self.future)
        self._write(new_c)
        return shifted

    def record(self, xin):
        """Slot-write the outgoing carry: the pre-shift input slice at frame
        ``T-1-future`` (temporal_shift_chunk's ``src``)."""
        t = xin.shape[1]
        fold = xin.shape[-1] // self._cfg.fold_div
        lo, hi = ((0, 2 * fold) if 'toFutureOnly' in self._cfg.shift_mode
                  else (fold, 2 * fold))
        self._write(xin[:, t - 1 - self.future:t - self.future, ..., lo:hi])

    def assemble_frame0(self, xin):
        """Frame 0's shifted input under the chunk boundary: the carried
        past slice where the segment shift would use zeros."""
        fold = xin.shape[-1] // self._cfg.fold_div
        x0 = xin[:, :1]
        if 'toFutureOnly' in self._cfg.shift_mode:
            head = (jnp.zeros_like(x0[..., :2 * fold]) if self.carry is None
                    else self.carry.astype(xin.dtype))
            return jnp.concatenate([head, x0[..., 2 * fold:]], axis=-1)
        fut = (xin[:, 1:2, ..., :fold] if xin.shape[1] > 1
               else jnp.zeros_like(x0[..., :fold]))
        pst = (jnp.zeros_like(x0[..., fold:2 * fold]) if self.carry is None
               else self.carry.astype(xin.dtype))
        return jnp.concatenate([fut, pst, x0[..., 2 * fold:]], axis=-1)


def _chunk_shift_conv_site(conv_p, norm_p, x, cfg, act, site, x_add=None):
    """Carry-threaded shift+conv site: the fused segment kernel computes the
    whole chunk with zero temporal boundaries, then frame 0 — the only frame
    whose shifted input differs under the chunk protocol — is recomputed
    from the carried slice and spliced in. Cost: one NT=1 XLA conv per site
    (~1/T of the site) instead of the whole chunk falling back to XLA."""
    xin = x if x_add is None else x + x_add
    if xin.shape[1] > 1 and _fused_ok(x, conv_p, cfg,
                                      n_in=1 if x_add is None else 2):
        from bsvd_tpu.ops.shift_conv import shift_conv, shift_conv_add2
        n, t, h, w, c = x.shape
        causal = 'toFutureOnly' in cfg.shift_mode
        if x_add is None:
            y = shift_conv(x.reshape(n * t, h, w, c), conv_p['w'],
                           conv_p['b'], t, cfg.fold_div, cfg.act, causal)
        else:
            y = shift_conv_add2(x.reshape(n * t, h, w, c),
                                x_add.reshape(n * t, h, w, c), conv_p['w'],
                                conv_p['b'], t, cfg.fold_div, cfg.act,
                                causal)
        y = y.reshape(n, t, h, w, y.shape[-1])
        y0 = act(conv2d(conv_p, site.assemble_frame0(xin)))
        site.record(xin)
        # dynamic-update-slice, NOT concat([y0, y[:, 1:]]): XLA updates the
        # kernel's output buffer in place; the concat materializes a second
        # full (T,H,W,C) tensor per site (16 sites/chunk)
        return y.at[:, :1].set(y0.astype(y.dtype))
    xs = site(xin)
    return act(norm_apply(cfg.norm, norm_p, conv2d(conv_p, xs)))


# ---------------------------------------------------------------------------
# width-folded full-resolution segment
# ---------------------------------------------------------------------------
# Site-level A/Bs (PERF.md) showed any C=64 540p tensor crossing an
# XLA<->Pallas boundary degrades the surrounding XLA program badly, while
# C>=128 boundaries are cheap. The folded path therefore runs the whole
# full-resolution segment on the (H, W/2, 2C) VIEW of every tensor (a free
# row-major reshape): the stems become dense C>=128 convs with exactly
# transformed weights (ops/conv3x3.fold_width_weights) — Pallas where
# supported, XLA folded otherwise — and down0's stride-2 conv keeps only
# its H stride (fold_width_stride2_weights). Numerics are exact up to fp
# summation order (CPU-equivalence-tested in tests/test_wnet_folded.py).

def _fold2(x):
    n, t, h, w, c = x.shape
    return x.reshape(n, t, h, w // 2, 2 * c)


def _unfold2(x):
    n, t, h, w2, c2 = x.shape
    return x.reshape(n, t, h, w2 * 2, c2 // 2)


# Activations the Pallas kernel epilogues implement; gates for every fused
# site check against this single tuple so MIMO and streaming always pick
# the same path for the same config (the kernels also raise on anything
# else rather than silently skipping the activation).
from bsvd_tpu.ops.conv3x3 import KERNEL_ACTS  # noqa: E402  single source


def fold_gate(cfg, w):
    """Gate for the width-folded segment, shared by the MIMO path and the
    streaming step (which must also size its skip rings consistently):
    fused mode, identity norm, plain (non-shifted) biased stems, even W,
    TPU backend (the folded helpers consume conv biases unconditionally). The folded path is exact everywhere, but only pays off where
    the boundary effects it sidesteps exist; tests call the folded
    implementations directly on CPU."""
    if not (cfg.use_fused and cfg.norm == 'none' and not cfg.shift_input
            and cfg.bias):
        return False
    if w % 2 != 0:
        return False
    try:
        return jax.devices()[0].platform in ('tpu', 'TPU', 'axon')
    except Exception:
        return False


def _folded_stems_ok(x, cfg):
    return fold_gate(cfg, x.shape[-2])


def embed_half_lanes(x_f, in_c, s_out):
    """0/1-embedding GEMM mapping folded lanes (dj*in_c + c) to
    (dj*s_out + c), zero elsewhere — the lane layout the folded residual
    combine and the padded inc weights consume.

    A dot is used instead of reshape+pad because XLA lowers the pad via an
    H-minor layout for the sub-128-lane intermediate and then pays a
    full-tensor relayout copy before the Pallas consumer (~3.6 ms on the
    540p flagship trace); the dot lands directly in the MXU-default
    layout."""
    emb = np.zeros((2 * in_c, 2 * s_out), np.float32)
    for dj in range(2):
        # channels beyond s_out are dropped — consumers only read lanes
        # l % s_out < residual_ch, and residual_ch <= s_out always
        for c in range(min(in_c, s_out)):
            emb[dj * in_c + c, dj * s_out + c] = 1.0
    k = x_f.ndim - 1
    return jax.lax.dot_general(x_f, jnp.asarray(emb, x_f.dtype),
                               dimension_numbers=(((k,), (0,)), ((), ())),
                               preferred_element_type=x_f.dtype)


def pad_in_channels(conv_p, s_in):
    """Zero-pad a conv's input-channel dim to ``s_in`` (consumes the
    embed_half_lanes lane layout after width-folding)."""
    w = conv_p['w']
    wp = jnp.zeros(w.shape[:2] + (s_in,) + w.shape[3:], w.dtype)
    return {'w': wp.at[:, :, :w.shape[2]].set(w), 'b': conv_p['b']}


def _site_folded(conv_p, x_f, cfg, act, act_name, x2_f=None):
    """One folded conv site: conv with width-folded weights on the folded
    activation — the Pallas kernel when the folded shape qualifies, a
    plain XLA conv otherwise. ``x2_f``: optional second addend; the skip-add
    fuses into the kernel's tile assembly (no extra HBM round trip)."""
    from bsvd_tpu.ops.conv3x3 import fold_width_weights
    w2, b2 = fold_width_weights(conv_p['w'], conv_p['b'])
    n, t, h, wf, c2 = x_f.shape
    if cfg.use_fused and c2 >= 128:
        from bsvd_tpu.ops.conv3x3 import (conv3x3, conv3x3_add2,
                                          conv3x3_supported)
        if conv3x3_supported((n * t, h, wf, c2), w2.shape, x_f.dtype,
                             n_in=1 if x2_f is None else 2, folded=True):
            if x2_f is None:
                y = conv3x3(x_f.reshape(n * t, h, wf, c2), w2, b2, act_name,
                            True)
            else:
                y = conv3x3_add2(x_f.reshape(n * t, h, wf, c2),
                                 x2_f.reshape(n * t, h, wf, c2), w2, b2,
                                 act_name, True)
            return y.reshape(n, t, h, wf, y.shape[-1])
    xin = x_f if x2_f is None else x_f + x2_f
    y = conv2d({'w': w2, 'b': b2}, xin)
    return y if act_name == 'none' else act(y)


def _pair_folded(p1, p2, x_f, cfg, act, act2, x2_f=None):
    """Chained pair of folded conv sites (inc c1+c2 / outc c1+c2) through
    the rolling-intermediate kernel (ops/conv_chain) — the intermediate
    never touches HBM. Falls back to two single-conv sites."""
    from bsvd_tpu.ops.conv3x3 import fold_width_weights
    n, t, h, wf, c2 = x_f.shape
    if cfg.use_fused and cfg.norm == 'none' and c2 >= 128 \
            and cfg.act in KERNEL_ACTS:
        from bsvd_tpu.ops.conv_chain import (conv_chain, conv_chain_add2,
                                             conv_chain_supported)
        w1, b1 = fold_width_weights(p1['w'], p1['b'])
        w2, b2 = fold_width_weights(p2['w'], p2['b'])
        n_in = 1 if x2_f is None else 2
        if conv_chain_supported((n * t, h, wf, c2), w1.shape, w2.shape,
                                x_f.dtype, n_in, folded=True):
            xm = x_f.reshape(n * t, h, wf, c2)
            if x2_f is None:
                y = conv_chain(xm, w1, b1, w2, b2, cfg.act, act2, True)
            else:
                y = conv_chain_add2(xm, x2_f.reshape(n * t, h, wf, c2),
                                    w1, b1, w2, b2, cfg.act, act2, True)
            return y.reshape(n, t, h, wf, y.shape[-1])
    y = _site_folded(p1, x_f, cfg, act, cfg.act, x2_f=x2_f)
    return _site_folded(p2, y, cfg, act, act2)


def _down_folded(conv_p, norm_p, x_f, cfg, act):
    """Stride-2 down conv from the folded domain -> NATURAL half-res
    output (which the shift-conv blocks consume). Pallas s2 kernel
    (ops/conv_s2) when the shape qualifies, folded XLA otherwise."""
    from bsvd_tpu.ops.conv3x3 import fold_width_stride2_weights
    w2, b2 = fold_width_stride2_weights(conv_p['w'], conv_p['b'])
    n, t, h, wf, c2 = x_f.shape
    xm = x_f.reshape(n * t, h, wf, c2)
    if cfg.use_fused and cfg.norm == 'none' and cfg.act in KERNEL_ACTS:
        from bsvd_tpu.ops.conv_s2 import conv_s2, conv_s2_supported
        if conv_s2_supported(xm.shape, w2.shape, xm.dtype):
            y = conv_s2(xm, w2, b2, cfg.act)
            return y.reshape(n, t, y.shape[1], y.shape[2], y.shape[3])
    y = jax.lax.conv_general_dilated(
        xm, w2, (2, 1), ((1, 1), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y + b2.astype(y.dtype)
    y = y.reshape(n, t, y.shape[1], y.shape[2], y.shape[3])
    return act(norm_apply(cfg.norm, norm_p, y))


def _stage_apply_folded(p, x, cfg, act, fold_io=False, mask=None,
                        shift_fns=None):
    """DenBlock stage with the full-res segment in the folded domain.
    Mirrors _stage_apply exactly (same site order/semantics).

    ``shift_fns``: optional per-shift-site sequence (len == 8; the folded
    gate excludes shift_input) indexed POSITIONALLY like _stage_apply —
    the chunked-carry path threads its ``_ChunkShiftSite`` objects here so
    chunked MIMO keeps the folded stems and fused kernels. Width folding
    only touches the stems; the temporal sites run on the natural half/
    quarter-res tensors, so carry shapes are identical to _stage_apply's.

    ``fold_io``: x is ALREADY width-folded and the folded output is
    returned un-unfolded — chaining stages entirely in the folded domain
    avoids the unfold/refold reshape pair at stage boundaries, which XLA
    materializes as two full-tensor layout copies (~4.5 ms on the 540p
    flagship trace) instead of cancelling.

    ``mask``: optional (x, level) -> x row-validity hook for the
    spatially-sharded forward (parallel/spatial.py): applied after EVERY
    conv site so global-edge shards reproduce per-conv zero padding
    exactly. With a mask the in-kernel conv CHAINS are unbundled into
    single-conv kernels (the chain cannot mask its VMEM intermediate);
    all other Pallas kernels stay engaged. Width folding is on W, the
    mask on H — orthogonal."""
    if fold_io:
        xf = x
        in_ch = x.shape[-1] // 2
    else:
        xf = _fold2(x)
        in_ch = x.shape[-1]

    m1 = (lambda v: v) if mask is None else (lambda v: mask(v, 1))

    def pair(k):
        """Shift fns for sites (k, k+1) of this stage, or None —
        positional slots identical to _stage_apply's (off == 0: the folded
        gate excludes shift_input)."""
        if shift_fns is None:
            return None
        return (shift_fns[k], shift_fns[k + 1])

    rc = cfg.residual_ch
    s_out = p['outc']['c2']['w'].shape[-1]
    xe = None   # >=128-lane input in residual-source lane layout
    if xf.shape[-1] >= 128:
        if mask is None:
            x0 = _pair_folded(p['inc']['c1'], p['inc']['c2'], xf, cfg, act,
                              cfg.act)
        else:
            x0 = m1(_site_folded(p['inc']['c1'], xf, cfg, act, cfg.act))
            x0 = m1(_site_folded(p['inc']['c2'], x0, cfg, act, cfg.act))
        if in_ch == s_out:
            xe = xf
    elif (cfg.use_fused and cfg.norm == 'none' and 2 * s_out >= 128
          and cfg.act in KERNEL_ACTS):
        # sub-128-lane input (stage 0): embed per folded half to s_out
        # channels with ONE 0/1 GEMM. The embedded tensor (a) feeds inc as
        # a dense 128-lane Pallas chain — replacing an XLA K=8 conv whose
        # output-layout fix alone costs ~2.5 ms — and (b) doubles as the
        # residual source for the outc chain-res kernel (the mask only
        # reads lanes l%s_out < residual_ch, so extra live channels like
        # the noise map are ignored).
        xe = embed_half_lanes(xf, in_ch, s_out)
        if mask is None:
            x0 = _pair_folded(pad_in_channels(p['inc']['c1'], s_out),
                              p['inc']['c2'], xe, cfg, act, cfg.act)
        else:
            x0 = m1(_site_folded(pad_in_channels(p['inc']['c1'], s_out),
                                 xe, cfg, act, cfg.act))
            x0 = m1(_site_folded(p['inc']['c2'], x0, cfg, act, cfg.act))
    else:
        x0 = m1(_site_folded(p['inc']['c1'], xf, cfg, act, cfg.act))
        x0 = m1(_site_folded(p['inc']['c2'], x0, cfg, act, cfg.act))

    x1 = _down_folded(p['down0']['conv'], p['down0']['n'], x0, cfg, act)
    if mask is not None:
        x1 = mask(x1, 2)
    x1 = _cvblock_apply(p['down0']['cv'], x1, cfg, act, True,
                        shift_pair=pair(0), mask=mask, level=2)

    d = p['down1']
    if x1.shape[-2] % 2 == 0:
        # down1 through the same fold: (270p, 128) -> folded (240, 256)
        x2 = _down_folded(d['conv'], d['n'], _fold2(x1), cfg, act)
    else:
        x2 = act(norm_apply(cfg.norm, d['n'], conv2d(d['conv'], x1, stride=2)))
    if mask is not None:
        x2 = mask(x2, 4)
    x2 = _cvblock_apply(d['cv'], x2, cfg, act, True, shift_pair=pair(2),
                        mask=mask, level=4)

    u = p['up2']
    x2 = _cvblock_apply(u['cv'], x2, cfg, act, True, shift_pair=pair(4),
                        mask=mask, level=4)
    x2 = _up_conv_ps(u['conv'], x2, cfg, act)
    if mask is not None:
        x2 = mask(x2, 2)

    u = p['up1']
    x1 = _cvblock_apply(u['cv'], x1, cfg, act, True, shift_pair=pair(6),
                        x_add=x2, mask=mask, level=2)
    x1uf = _up_conv_psfold(u['conv'], x1, cfg, act)
    if mask is not None:
        x1uf = mask(x1uf, 1)

    o = p['outc']
    n, t, h, wf, _ = x0.shape

    # outc c1+c2 + skip-add + residual combine as ONE kernel when the
    # folded output is lane-aligned (ops/conv_chain.conv_chain_add2_res)
    if mask is None and cfg.use_fused and cfg.norm == 'none' \
            and cfg.act in KERNEL_ACTS:
        from bsvd_tpu.ops.conv3x3 import fold_width_weights
        from bsvd_tpu.ops.conv_chain import (conv_chain_add2_res,
                                             conv_chain_supported)
        w1, b1 = fold_width_weights(o['c1']['w'], o['c1']['b'])
        w2, b2 = fold_width_weights(o['c2']['w'], o['c2']['b'])
        xm0 = x0.reshape(n * t, h, wf, x0.shape[-1])
        x1m = x1uf.reshape(n * t, h, wf, x1uf.shape[-1])
        if conv_chain_supported((n * t, h, wf, x0.shape[-1]), w1.shape,
                                w2.shape, x0.dtype, n_in=2, has_res=True,
                                folded=True):
            xpad = xe if xe is not None else embed_half_lanes(xf, in_ch,
                                                              s_out)
            y = conv_chain_add2_res(
                xm0, x1m, xpad.reshape(n * t, h, wf, 2 * s_out),
                w1, b1, w2, b2, cfg.act, 'none', rc, True)
            y = y.reshape(n, t, h, wf, 2 * s_out)
            return y if fold_io else _unfold2(y)
        if (2 * in_ch) % 128 == 0 and conv_chain_supported(
                (n * t, h, wf, x0.shape[-1]), w1.shape, w2.shape, x0.dtype,
                n_in=2, has_res=True, folded=True, res_lanes=2 * in_ch):
            # tail stage (2*s_out < 128): the kernel takes the RAW folded
            # stage input and projects it to output lanes in VMEM — the
            # sub-128-lane embed+subtract XLA fusion (2.9 ms on the 540p
            # flagship trace: 6-lane 540p tensors are physically
            # 128-lane-padded, so every access moves ~21x the bytes)
            # never materializes.
            y = conv_chain_add2_res(
                xm0, x1m, xf.reshape(n * t, h, wf, 2 * in_ch),
                w1, b1, w2, b2, cfg.act, 'none', rc, True,
                res_embed=(in_ch, s_out))
            y = y.reshape(n, t, h, wf, 2 * s_out)
            return y if fold_io else _unfold2(y)

    # residual source in the output's folded lane layout. The stage input
    # itself serves when its lane layout already matches (xe): the residual
    # mask only reads lanes l%s_out < rc. Otherwise embed with a 0/1 GEMM —
    # NOT reshape+pad, whose XLA lowering picks an H-minor layout for the
    # sub-128-lane intermediate and pays a full-tensor relayout copy before
    # the Pallas consumer (~3.6 ms on the 540p trace).
    xpad = xe if xe is not None else embed_half_lanes(xf, in_ch, s_out)

    if mask is None:
        y = _pair_folded(o['c1'], o['c2'], x0, cfg, act, 'none', x2_f=x1uf)
    else:
        y = m1(_site_folded(o['c1'], x0, cfg, act, cfg.act, x2_f=x1uf))
        y = _site_folded(o['c2'], y, cfg, act, 'none')

    # residual combine as ONE fused elementwise pass: select per lane on a
    # static mask (sub-128-lane slicing+concat at full resolution measured
    # 9.7 ms/fwd on TPU)
    lane_is_res = jnp.asarray(np.arange(2 * s_out) % s_out < rc)
    out_f = jnp.where(lane_is_res, xpad - y, y)
    return out_f if fold_io else _unfold2(out_f)


def _stage_apply(p, x, cfg, act, shift_fns=None, mask=None):
    """One DenBlock stage. ``shift_fns``: optional SEQUENCE of per-shift-site
    functions for this stage (len == 8, or 10 with shift_input), indexed
    POSITIONALLY at fixed sites — site k is always shift_fns[k] regardless
    of trace/call order (the round-3 mutable-iterator protocol consumed
    them in call order, which silently mismatched carries under
    reorderings). ``mask``: optional (x, level) -> x row-validity hook
    applied after every conv site (spatially-sharded forward, see
    _stage_apply_folded)."""
    if shift_fns is None and _folded_stems_ok(x, cfg):
        return _stage_apply_folded(p, x, cfg, act, mask=mask)

    m1 = (lambda v: v) if mask is None else (lambda v: mask(v, 1))

    def pair(k):
        """Shift fns for sites (k, k+1) of this stage, or None."""
        if shift_fns is None:
            return None
        return (shift_fns[k], shift_fns[k + 1])

    off = 2 if cfg.shift_input else 0
    if cfg.shift_input:
        xs = _shift(x, cfg, shift_fns[0] if shift_fns else None)
        x0 = m1(act(norm_apply(cfg.norm, p['inc']['n1'], conv2d(p['inc']['c1'], xs))))
        x0 = _shift(x0, cfg, shift_fns[1] if shift_fns else None)
        x0 = m1(act(norm_apply(cfg.norm, p['inc']['n2'], conv2d(p['inc']['c2'], x0))))
    else:
        x0 = m1(_plain_conv_act(p['inc']['c1'], p['inc']['n1'], x, cfg, act))
        x0 = m1(_plain_conv_act(p['inc']['c2'], p['inc']['n2'], x0, cfg, act))

    d = p['down0']
    x1 = act(norm_apply(cfg.norm, d['n'], conv2d(d['conv'], x0, stride=2)))
    if mask is not None:
        x1 = mask(x1, 2)
    x1 = _cvblock_apply(d['cv'], x1, cfg, act, True, pair(off),
                        mask=mask, level=2)

    d = p['down1']
    x2 = act(norm_apply(cfg.norm, d['n'], conv2d(d['conv'], x1, stride=2)))
    if mask is not None:
        x2 = mask(x2, 4)
    x2 = _cvblock_apply(d['cv'], x2, cfg, act, True, pair(off + 2),
                        mask=mask, level=4)

    u = p['up2']
    x2 = _cvblock_apply(u['cv'], x2, cfg, act, True, pair(off + 4),
                        mask=mask, level=4)
    x2 = _up_conv_ps(u['conv'], x2, cfg, act)
    if mask is not None:
        x2 = mask(x2, 2)

    u = p['up1']
    x1 = _cvblock_apply(u['cv'], x1, cfg, act, True, pair(off + 6),
                        x_add=x2, mask=mask, level=2)
    x1 = _up_conv_ps(u['conv'], x1, cfg, act)
    if mask is not None:
        x1 = mask(x1, 1)

    o = p['outc']
    y = m1(_plain_conv_act(o['c1'], o['n1'], x0 + x1, cfg, act))
    y = conv2d(o['c2'], y)

    # Residual on the first residual_ch (RGB/raw) channels only
    # (wnet_models.py:181).
    rc = cfg.residual_ch
    res = x[..., :rc] - y[..., :rc]
    return jnp.concatenate([res, y[..., rc:]], axis=-1)


def wnet_apply(params, x, cfg):
    """MIMO forward: x (N, T, H, W, C_in) -> (N, T, H, W, out_ch).

    With shift_mode='TSM' this is simultaneously:
    - the TSN training forward when T == num_segments (per-sample segments),
    - whole-clip BSVD inference when T == clip length (== the reference's
      streaming pipeline output, bit-for-bit in exact arithmetic).
    """
    act = get_act(cfg.act)
    if _folded_stems_ok(x, cfg):
        # chain every stage in the width-folded domain: fold once, unfold
        # once — stage-boundary unfold/refold pairs otherwise materialize
        # as two full-tensor copies each (XLA does not cancel them)
        stage_f = _stage_apply_folded
        if cfg.remat:
            stage_f = jax.checkpoint(stage_f, static_argnums=(2, 3, 4))
        xf = _fold2(x)
        for i in range(cfg.stage_num):
            xf = stage_f(params[f'stage{i}'], xf, cfg, act, True)
        return _unfold2(xf)
    stage = _stage_apply
    if cfg.remat:
        stage = jax.checkpoint(stage, static_argnums=(2, 3))
    for i in range(cfg.stage_num):
        x = stage(params[f'stage{i}'], x, cfg, act)
    return x


# ---------------------------------------------------------------------------
# chunked MIMO inference with explicit carry (replaces the reference's
# global queue buffer: global_queue_buffer.py + temporal_shift.py:53-80)
# ---------------------------------------------------------------------------

def wnet_apply_chunk(params, x, cfg, carries, future_buffer_len=0):
    """Forward one chunk, threading per-shift-site carries.

    Carry indexing is POSITIONAL: global site index = stage * per_stage +
    local site, where local sites are fixed structural positions in
    _stage_apply (inc?, down0 x2, down1 x2, up2 x2, up1 x2) — identical
    ordering to the reference's global FIFO queue, but slot-addressed, so a
    trace reordering can never mismatch a carry with its site.

    On TPU with the folded gate open this runs the SAME fused/folded kernel
    program as whole-clip MIMO (folded stems, Pallas shift convs, chain-res
    outc): the segment kernels compute frames 1..T-1 of each chunk shift
    exactly, and only frame 0 — the one frame whose shifted input carries
    across the chunk boundary — is recomputed per site (_chunk_shift_conv_
    site). Elsewhere (CPU tests, unsupported shapes) every site falls back
    to the XLA chunk shift, bit-identical to the pre-fusion path.

    Args:
        carries: list of per-site carry arrays (or None on the first chunk).
    Returns:
        (out, new_carries)
    """
    act = get_act(cfg.act)
    per_stage = cfg.shift_num // cfg.stage_num
    new_carries = [None] * cfg.shift_num

    def make_site(idx):
        def write(c):
            new_carries[idx] = c       # slot-keyed, order-independent
        return _ChunkShiftSite(cfg, None if carries is None else carries[idx],
                               future_buffer_len, write)

    if _folded_stems_ok(x, cfg):
        # chain the stages in the folded domain like wnet_apply (the folded
        # gate excludes shift_input, so all sites live in _stage_apply_folded)
        xf = _fold2(x)
        for i in range(cfg.stage_num):
            fns = [make_site(i * per_stage + j) for j in range(per_stage)]
            xf = _stage_apply_folded(params[f'stage{i}'], xf, cfg, act,
                                     fold_io=True, shift_fns=fns)
        return _unfold2(xf), new_carries

    for i in range(cfg.stage_num):
        fns = [make_site(i * per_stage + j) for j in range(per_stage)]
        x = _stage_apply(params[f'stage{i}'], x, cfg, act, shift_fns=fns)
    return x, new_carries


# ---------------------------------------------------------------------------
# Registered arch wrappers with reference-compatible construction/IO
# ---------------------------------------------------------------------------

def _nfchw_to_nthwc(x):
    return jnp.transpose(x, (0, 1, 3, 4, 2))


def _nthwc_to_nfchw(x):
    return jnp.transpose(x, (0, 1, 4, 2, 3))


def _warn_unknown_opts(where, extra):
    """Unknown network options (typos, unsupported knobs) are logged instead
    of silently dropped — a misspelled ``use_fused``/``residual_ch`` should
    not vanish without trace."""
    if extra:
        from bsvd_tpu.utils import get_root_logger
        get_root_logger().warning(
            f'{where}: ignoring unknown network option(s) {sorted(extra)}')


class _WNetBase:
    """Holds (cfg, params); callable with reference layout (N, F, C, H, W)."""

    def __init__(self, cfg, params=None, seed=0, param_dtype=jnp.float32):
        self.cfg = cfg
        if params is None:
            params = wnet_init(jax.random.PRNGKey(seed), cfg)
        self.params = jax.tree.map(lambda a: a.astype(param_dtype), params)

    @property
    def shift_num(self):
        return self.cfg.shift_num

    def __call__(self, input, noise_map=None):
        """input: (N, F, C, H, W); noise_map: (N, F, 1, H, W) or None.
        Returns (N, F, out_ch, H, W) — reference BSVD.forward/TSN.forward IO
        (bsvd_arch.py:490-499, tsm_arch.py:59-72)."""
        if noise_map is not None:
            input = jnp.concatenate([input, noise_map], axis=2)
        x = _nfchw_to_nthwc(input)
        y = wnet_apply(self.params, x.astype(self.params_dtype), self.cfg)
        return _nthwc_to_nfchw(y)

    @property
    def params_dtype(self):
        return jax.tree.leaves(self.params)[0].dtype

    def load(self, path):
        from bsvd_tpu.convert.torch_ckpt import load_params
        self.params = load_params(path, self.cfg, dtype=self.params_dtype)
        return self


@ARCH_REGISTRY.register()
class TSN(_WNetBase):
    """Training-time temporal-shift network (reference tsm_arch.py:10-72).

    Accepts the reference YAML options (network_g block of
    options/train/bsvd_c64_unblind.yml:37-50).
    """

    def __init__(self, num_segments=11, base_model='WNet_multistage',
                 shift_type='TSM', shift_div=8, inplace=False, net2d_opt=None,
                 enable_past_buffer=True, seed=0, param_dtype=jnp.float32, **kwargs):
        del inplace
        _warn_unknown_opts('TSN', kwargs)
        if base_model != 'WNet_multistage':
            raise NotImplementedError(f'base_model {base_model!r}')
        net2d_opt = dict(net2d_opt or {})
        shift_mode = 'none' if shift_type == 'no_temporal_shift' else shift_type
        cfg = WNetConfig(
            chns=tuple(net2d_opt.pop('chns', (32, 64, 128))),
            mid_ch=net2d_opt.pop('mid_ch', 3),
            in_ch=net2d_opt.pop('in_ch', 4),
            out_ch=net2d_opt.pop('out_ch', 3),
            stage_num=net2d_opt.pop('stage_num', 2),
            interm_ch=net2d_opt.pop('interm_ch', 30),
            norm=net2d_opt.pop('norm', 'bn'),
            act=net2d_opt.pop('act', 'relu'),
            bias=net2d_opt.pop('bias', True),
            blind=net2d_opt.pop('blind', False),
            shift_input=net2d_opt.pop('shift_input', False),
            shift_mode=shift_mode,
            fold_div=shift_div,
            residual_ch=net2d_opt.pop('residual_ch', 3),
            use_fused=net2d_opt.pop('use_fused', True),
            remat=net2d_opt.pop('remat', False),
        )
        _warn_unknown_opts('TSN net2d_opt', net2d_opt)
        self.num_segments = num_segments
        self.enable_past_buffer = enable_past_buffer
        super().__init__(cfg, seed=seed, param_dtype=param_dtype)


@ARCH_REGISTRY.register()
class BSVD(_WNetBase):
    """Streaming/inference network (reference bsvd_arch.py:441-560).

    The reference's per-layer bidirectional buffers + whole-clip pipeline are
    mathematically identical to whole-clip MIMO with zero temporal boundaries,
    which is how __call__ evaluates (one big batched forward — optimal for the
    MXU). True low-latency frame-by-frame streaming lives in
    bsvd_tpu/archs/streaming.py.
    """

    def __init__(self, chns=(32, 64, 128), mid_ch=3, shift_input=False,
                 in_ch=4, out_ch=3, norm='bn', act='relu', interm_ch=30,
                 blind=False, pretrain_ckpt=None, shift_mode='TSM',
                 residual_ch=3, use_fused=True, bias=True, seed=0,
                 param_dtype=jnp.float32, **kwargs):
        _warn_unknown_opts('BSVD', kwargs)
        cfg = WNetConfig(
            chns=tuple(chns), mid_ch=mid_ch, in_ch=in_ch, out_ch=out_ch,
            interm_ch=interm_ch, norm=norm, act=act, bias=bias, blind=blind,
            shift_input=shift_input, shift_mode=shift_mode,
            residual_ch=residual_ch, use_fused=use_fused)
        super().__init__(cfg, seed=seed, param_dtype=param_dtype)
        if pretrain_ckpt is not None:
            self.load(pretrain_ckpt)


# Stale alias used by options/test/0706_*.yml:87 (maps to today's BSVD class).
BufferConv = BSVD
ARCH_REGISTRY._do_register('BufferConv', BSVD)

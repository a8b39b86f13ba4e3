"""Width-folded full-res segment == the plain stage path, exactly (up to
fp32 summation order). The folded path (wnet_arch._stage_apply_folded)
auto-engages only on TPU; these tests call it directly on CPU."""

import numpy as np

import jax
import jax.numpy as jnp

from bsvd_tpu.archs.wnet_arch import (WNetConfig, _stage_apply,
                                      _stage_apply_folded, get_act,
                                      wnet_init)


def _cfg(**kw):
    base = dict(chns=(16, 32, 64), mid_ch=16, in_ch=4, out_ch=3,
                interm_ch=16, norm='none', act='relu6', shift_mode='TSM')
    base.update(kw)
    return WNetConfig(**base)


def _run_pair(cfg, in_ch, seed=0):
    params = wnet_init(jax.random.PRNGKey(seed), cfg)
    act = get_act(cfg.act)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 16, 24, in_ch)), jnp.float32)
    ref = _stage_apply(params['stage0'], x, cfg, act)
    got = _stage_apply_folded(params['stage0'], x, cfg, act)
    return np.asarray(ref), np.asarray(got)


def test_folded_stage_matches_plain():
    ref, got = _run_pair(_cfg(), 4)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_folded_stage_matches_plain_c64():
    """The flagship channel widths (folded stems are C=128)."""
    cfg = _cfg(chns=(64, 128, 256), mid_ch=64, interm_ch=64)
    ref, got = _run_pair(cfg, 4, seed=1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_folded_stage_matches_plain_stage1():
    """The SECOND stage's shape (in_ch = mid_ch > out_ch): exercises the
    residual lane-select with rc < in_ch and s_out == out_ch — the case
    that broke the first pad-based residual (negative pad)."""
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(3), cfg)
    act = get_act(cfg.act)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 16, 24, cfg.mid_ch)),
                    jnp.float32)
    ref = _stage_apply(params['stage1'], x, cfg, act)
    got = _stage_apply_folded(params['stage1'], x, cfg, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_folded_stage_matches_plain_causal_and_blind():
    cfg = _cfg(shift_mode='TSM_toFutureOnly', blind=True)
    params = wnet_init(jax.random.PRNGKey(2), cfg)
    act = get_act(cfg.act)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, 8, 16, 3)), jnp.float32)
    ref = _stage_apply(params['stage0'], x, cfg, act)
    got = _stage_apply_folded(params['stage0'], x, cfg, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_width_stride2_weights_match_strided_conv():
    """The folded stride-2 kernel == the plain stride-2 conv."""
    from jax import lax
    from bsvd_tpu.ops.conv3x3 import fold_width_stride2_weights
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 12, 20, 16)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 16, 8)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((8,)), jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    w2, b2 = fold_width_stride2_weights(w, b)
    xf = x.reshape(2, 12, 10, 32)
    got = lax.conv_general_dilated(
        xf, w2, (2, 1), ((1, 1), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_folded_streaming_step_matches_plain(monkeypatch):
    """The folded streaming step (XLA width-folded convs, folded state
    rings and I/O) == the plain streaming step. The gate is TPU-only;
    force it on for CPU testing — stream_init and stream_step share it,
    so state shapes stay consistent."""
    import bsvd_tpu.archs.streaming as st
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    frames = [jnp.asarray(rng.uniform(0, 1, (1, 8, 16, 4)), jnp.float32)
              for _ in range(5)]

    def run():
        state = st.stream_init(cfg, 1, 8, 16, jnp.float32)
        outs = []
        for f in frames:
            state, y, valid = st.stream_step(params, state, f, True, cfg)
            outs.append(np.asarray(y))
        return np.stack(outs)

    plain = run()
    monkeypatch.setattr(st, '_fold_active', lambda cfg, w: True)
    folded = run()
    np.testing.assert_allclose(folded, plain, rtol=1e-5, atol=1e-5)


def test_fold_io_stage_chain_matches_plain():
    """Chaining stages entirely in the folded domain (fold_io=True, the
    wnet_apply fast path) == per-stage natural-I/O folded application."""
    from bsvd_tpu.archs.wnet_arch import _fold2, _unfold2
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(5), cfg)
    act = get_act(cfg.act)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 16, 24, 4)), jnp.float32)
    ref = x
    for i in range(cfg.stage_num):
        ref = _stage_apply(params[f'stage{i}'], ref, cfg, act)
    xf = _fold2(x)
    for i in range(cfg.stage_num):
        xf = _stage_apply_folded(params[f'stage{i}'], xf, cfg, act,
                                 fold_io=True)
    got = _unfold2(xf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

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


# ---------------------------------------------------------------------------
# chunked-carry path on the folded/fused program
# ---------------------------------------------------------------------------

def test_chunk_site_frame0_correction_matches_chunk_shift():
    """The fused chunk site's decomposition — zero-boundary segment shift
    for frames 1..T-1 + a carried-slice reassembly of frame 0 — equals
    temporal_shift_chunk exactly, and its recorded carry matches."""
    from bsvd_tpu.archs.wnet_arch import _ChunkShiftSite
    from bsvd_tpu.nn.shift import temporal_shift, temporal_shift_chunk
    rng = np.random.default_rng(7)
    for mode in ('TSM', 'TSM_toFutureOnly'):
        for future in (0, 2):
            for has_carry in (False, True):
                cfg = _cfg(shift_mode=mode)
                x = jnp.asarray(rng.standard_normal((2, 5, 4, 6, 16)),
                                jnp.float32)
                fold = 16 // cfg.fold_div
                width = 2 * fold if 'toFutureOnly' in mode else fold
                carry = (jnp.asarray(
                    rng.standard_normal((2, 1, 4, 6, width)), jnp.float32)
                    if has_carry else None)
                written = []
                site = _ChunkShiftSite(cfg, carry, future, written.append)
                ref_sh, ref_carry = temporal_shift_chunk(
                    x, carry, cfg.fold_div, mode, future_buffer_len=future)
                seg = temporal_shift(x, cfg.fold_div, mode)
                got_sh = jnp.concatenate(
                    [site.assemble_frame0(x), seg[:, 1:]], axis=1)
                site.record(x)
                tag = f'{mode} future={future} carry={has_carry}'
                np.testing.assert_allclose(np.asarray(got_sh),
                                           np.asarray(ref_sh),
                                           rtol=0, atol=0, err_msg=tag)
                np.testing.assert_allclose(np.asarray(written[-1]),
                                           np.asarray(ref_carry),
                                           rtol=0, atol=0, err_msg=tag)


def _run_chunks(params, chunks, cfg, future):
    from bsvd_tpu.archs.wnet_arch import wnet_apply_chunk
    outs, carries = [], None
    for ch in chunks:
        o, carries = wnet_apply_chunk(params, ch, cfg, carries,
                                      future_buffer_len=future)
        outs.append(np.asarray(o))
    return outs, carries


def test_chunked_folded_matches_plain(monkeypatch):
    """wnet_apply_chunk through the folded-stage routing (the TPU path) ==
    the plain per-stage chunk forward, carries included."""
    import bsvd_tpu.archs.wnet_arch as wa
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    chunks = [jnp.asarray(rng.uniform(0, 1, (1, 6, 16, 24, 4)), jnp.float32)
              for _ in range(3)]
    ref, ref_c = _run_chunks(params, chunks, cfg, 2)
    monkeypatch.setattr(wa, '_folded_stems_ok', lambda x, c: True)
    got, got_c = _run_chunks(params, chunks, cfg, 2)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5,
                                   err_msg=f'chunk {i}')
    for i, (r, g) in enumerate(zip(ref_c, got_c)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f'carry {i}')


def test_chunk_fused_sites_match_plain(monkeypatch):
    """The fused chunk site branch (segment kernel + frame-0 splice) == the
    all-XLA chunk shift, with the Pallas kernel swapped for its XLA oracle
    so the branch runs on CPU. Covers both shift modes and the up1 skip-add
    (shift_conv_add2) site."""
    import bsvd_tpu.archs.wnet_arch as wa
    import bsvd_tpu.ops.shift_conv as sc
    for mode in ('TSM', 'TSM_toFutureOnly'):
        cfg = _cfg(shift_mode=mode)
        params = wnet_init(jax.random.PRNGKey(6), cfg)
        rng = np.random.default_rng(6)
        chunks = [jnp.asarray(rng.uniform(0, 1, (1, 6, 16, 24, 4)),
                              jnp.float32) for _ in range(3)]
        ref, ref_c = _run_chunks(params, chunks, cfg, 2)

        monkeypatch.setattr(wa, '_fused_ok', lambda *a, **k: True)
        monkeypatch.setattr(
            sc, 'shift_conv',
            lambda x, w, b, t, fd=8, act='relu6', causal=False:
                sc.shift_conv_reference(x, w, b, t_len=t, fold_div=fd,
                                        act=act, causal=causal))
        monkeypatch.setattr(
            sc, 'shift_conv_add2',
            lambda x, x2, w, b, t, fd=8, act='relu6', causal=False:
                sc.shift_conv_reference(x + x2, w, b, t_len=t, fold_div=fd,
                                        act=act, causal=causal))
        got, got_c = _run_chunks(params, chunks, cfg, 2)
        monkeypatch.undo()

        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5,
                                       err_msg=f'{mode} chunk {i}')
        for i, (r, g) in enumerate(zip(ref_c, got_c)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f'{mode} carry {i}')

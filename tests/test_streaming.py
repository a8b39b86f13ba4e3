"""Streaming pipeline == whole-clip MIMO equivalence.

The reference asserts this only via a code comment ("0.002 dB"); here it is a
hard property: scan-carried streaming with zero fill/drain boundaries is
exactly whole-clip temporal shift with zero boundaries
(reference: bsvd_arch.py:501-552 vs temporal_shift.py:40-47).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply, wnet_init
from bsvd_tpu.archs.streaming import (StreamDenoiser, pipeline_latency,
                                      streaming_apply)


def _cfg(**kw):
    base = dict(chns=(8, 16, 32), mid_ch=8, in_ch=4, out_ch=3, stage_num=2,
                interm_ch=8, norm='none', act='relu6', shift_mode='TSM')
    base.update(kw)
    return WNetConfig(**base)


def _run(cfg, t=20, n=1, h=16, w=16, seed=0):
    params = wnet_init(jax.random.PRNGKey(seed), cfg)
    cin = cfg.effective_in_ch
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, t, h, w, cin),
                          jnp.float32)
    mimo = wnet_apply(params, x, cfg)
    stream = streaming_apply(params, x, cfg)
    return params, x, np.asarray(mimo), np.asarray(stream)


@pytest.mark.parametrize('variant', ['base', 'blind', 'stage1', 'short_clip',
                                     'batch2'])
def test_streaming_equals_mimo(variant):
    kw, t, n = {}, 20, 1
    if variant == 'blind':
        kw = dict(blind=True)
    elif variant == 'stage1':
        kw = dict(stage_num=1)
    elif variant == 'short_clip':
        t = 5   # shorter than the 16-frame pipeline latency
    elif variant == 'batch2':
        n = 2
    cfg = _cfg(**kw)
    _, _, mimo, stream = _run(cfg, t=t, n=n)
    assert mimo.shape == stream.shape
    np.testing.assert_allclose(stream, mimo, rtol=2e-5, atol=2e-5)


def test_streaming_causal_equals_mimo():
    cfg = _cfg(shift_mode='TSM_toFutureOnly')
    assert pipeline_latency(cfg) == 0
    _, _, mimo, stream = _run(cfg, t=10)
    np.testing.assert_allclose(stream, mimo, rtol=2e-5, atol=2e-5)


def test_latency_matches_reference_shift_count():
    assert pipeline_latency(_cfg()) == 16          # BSVD.count_shift() == 16
    assert pipeline_latency(_cfg(stage_num=1)) == 8
    assert pipeline_latency(_cfg(shift_input=True)) == 20


def test_stream_denoiser_push_flush():
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    t, n, h, w = 20, 1, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (n, t, h, w, 4), jnp.float32)
    mimo = np.asarray(wnet_apply(params, x, cfg))

    sd = StreamDenoiser(params, cfg, batch=n, height=h, width=w)
    outs = []
    for i in range(t):
        out = sd.push(x[:, i])
        if out is not None:
            outs.append(np.asarray(out))
    assert len(outs) == t - sd.latency
    outs.extend(np.asarray(o) for o in sd.flush())
    assert len(outs) == t
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, mimo, rtol=2e-5, atol=2e-5)

    # reset + reuse reproduces the same outputs
    sd.reset()
    out0 = None
    for i in range(sd.latency + 1):
        out0 = sd.push(x[:, i])
    np.testing.assert_allclose(np.asarray(out0), mimo[:, 0], rtol=2e-5, atol=2e-5)


def test_stream_denoiser_flush_short_clip():
    """Fewer pushes than the pipeline depth: flush must still drain the
    FULL latency (the first valid output only exists ``latency`` steps
    after its push) and return exactly the pushed frames."""
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    t, n, h, w = 5, 1, 16, 16
    assert t < pipeline_latency(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, t, h, w, 4), jnp.float32)
    mimo = np.asarray(wnet_apply(params, x, cfg))

    sd = StreamDenoiser(params, cfg, batch=n, height=h, width=w)
    assert all(sd.push(x[:, i]) is None for i in range(t))
    outs = [np.asarray(o) for o in sd.flush()]
    assert len(outs) == t
    np.testing.assert_allclose(np.stack(outs, axis=1), mimo,
                               rtol=2e-5, atol=2e-5)
    assert sd.flush() == []            # nothing outstanding afterwards


def test_fold_gate_requires_bias():
    """The folded helpers consume conv biases unconditionally, so the gate
    must reject bias=False configs (platform-independent: the check sits
    before the backend test)."""
    from bsvd_tpu.archs.wnet_arch import fold_gate
    assert not fold_gate(_cfg(bias=False), 960)
    # bias=False nets still run end-to-end on the unfused path
    cfg = _cfg(bias=False)
    _, _, mimo, stream = _run(cfg, t=4, h=8, w=8)
    np.testing.assert_allclose(stream, mimo, rtol=2e-5, atol=2e-5)


def test_stream_denoiser_causal_zero_latency():
    cfg = _cfg(shift_mode='TSM_toFutureOnly')
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    t, h, w = 6, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (1, t, h, w, 4), jnp.float32)
    mimo = np.asarray(wnet_apply(params, x, cfg))
    sd = StreamDenoiser(params, cfg, batch=1, height=h, width=w)
    for i in range(t):
        out = sd.push(x[:, i])
        assert out is not None, 'causal mode must have zero latency'
        np.testing.assert_allclose(np.asarray(out), mimo[:, i],
                                   rtol=2e-5, atol=2e-5)
    assert sd.flush() == []


# ---------------------------------------------------------------------------
# device-scan chunked MIMO == host-loop chunked MIMO (reference protocol)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('t,psz,future', [
    (10, 4, 0),    # ragged tail, no look-ahead
    (12, 4, 0),    # exact multiple
    (10, 4, 2),    # look-ahead with sticky disable near the end
    (11, 3, 2),    # look-ahead + ragged tail
    (9, 4, 6),     # look-ahead longer than any full chunk (k == 0)
])
def test_chunked_device_scan_matches_host_loop(t, psz, future):
    from bsvd_tpu.models.seq_inference import denoise_seq
    cfg = _cfg(norm='none')
    params = wnet_init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(7)
    seq = rng.uniform(0, 1, (t, 3, 16, 16)).astype(np.float32)
    host = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=psz,
                       future_buffer_len=future, host_chunks=True)
    # default: async per-chunk loop (device-resident outputs)
    dev = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=psz,
                      future_buffer_len=future)
    np.testing.assert_allclose(dev, host, atol=2e-6)
    # one-program scan variant (fixed-length protocols)
    prog = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=psz,
                       future_buffer_len=future, device_program=True)
    np.testing.assert_allclose(prog, host, atol=2e-6)


def test_stream_denoiser_push_block_matches_push():
    """push_block (one jitted scan per F-frame block) == per-frame push."""
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    t, n, h, w = 20, 1, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(2), (n, t, h, w, 4), jnp.float32)
    mimo = np.asarray(wnet_apply(params, x, cfg))

    sd = StreamDenoiser(params, cfg, batch=n, height=h, width=w)
    outs = []
    for i in range(0, t, 4):
        block = jnp.moveaxis(x[:, i:i + 4], 1, 0)      # (F, N, H, W, C)
        outs.extend(o for o in sd.push_block(block) if o is not None)
    assert len(outs) == t - sd.latency
    outs.extend(sd.flush())
    got = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(got, mimo, rtol=2e-5, atol=2e-5)


def test_streaming_fold_io_path_matches_mimo_cpu(monkeypatch):
    """Force the width-folded streaming path (normally TPU-only) on CPU:
    folded skip rings + fold_io stage chaining must still equal whole-clip
    MIMO. Covers the riskiest folded-layout code (per-half channel slicing
    into the folded skip1 ring, folded ring pops feeding the outc tail)
    without TPU hardware."""
    import bsvd_tpu.archs.streaming as streaming_mod
    monkeypatch.setattr(streaming_mod, '_fold_active',
                        lambda cfg, w: cfg.norm == 'none' and w % 2 == 0
                        and not cfg.shift_input)
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(7), cfg)
    t, n, h, w = 20, 1, 16, 24
    x = jax.random.normal(jax.random.PRNGKey(8), (n, t, h, w, 4), jnp.float32)
    mimo = np.asarray(wnet_apply(params, x, cfg))
    got = np.asarray(streaming_apply(params, x, cfg))
    np.testing.assert_allclose(got, mimo, rtol=2e-5, atol=2e-5)

    # the frame-by-frame client through the same forced-folded path
    sd = StreamDenoiser(params, cfg, batch=n, height=h, width=w)
    outs = []
    for i in range(t):
        o = sd.push(x[:, i])
        if o is not None:
            outs.append(np.asarray(o))
    outs.extend(np.asarray(o) for o in sd.flush())
    np.testing.assert_allclose(np.stack(outs, axis=1), mimo,
                               rtol=2e-5, atol=2e-5)


def test_use_fused_false_dispatches_no_pallas(monkeypatch):
    """cfg.use_fused=False is the documented escape hatch: under a (faked)
    TPU backend, tracing the per-frame step must produce ZERO pallas_call
    equations — every conv site (including the up-path convs, which carry
    no activation and previously bypassed the gate) falls back to XLA."""
    import types
    import bsvd_tpu.archs.streaming as streaming_mod

    fake_dev = types.SimpleNamespace(platform='tpu')
    monkeypatch.setattr(jax, 'devices', lambda *a, **k: [fake_dev])
    monkeypatch.setattr(streaming_mod, '_on_tpu', lambda: True)

    def n_pallas_eqns(cfg, h, w):
        from bsvd_tpu.archs.streaming import stream_init, stream_step
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                              wnet_init(jax.random.PRNGKey(0), cfg))
        state = stream_init(cfg, 1, h, w, jnp.bfloat16)
        x = jnp.zeros((1, h, w, cfg.effective_in_ch), jnp.bfloat16)
        jaxpr = jax.make_jaxpr(
            lambda p, s, x: stream_step(p, s, x, True, cfg,
                                        assume_filled=True))(params, state, x)
        return jaxpr.pretty_print().count('pallas_call')

    kw = dict(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
              norm='none', act='relu6', shift_mode='TSM')
    # positive control: the fused config at a kernel-qualifying resolution
    # does trace pallas calls (otherwise this test can't catch regressions)
    assert n_pallas_eqns(WNetConfig(use_fused=True, **kw), 144, 256) > 0
    assert n_pallas_eqns(WNetConfig(use_fused=False, **kw), 144, 256) == 0


def test_stream_denoiser_mesh_multi_stream():
    """N-stream serving: StreamDenoiser with a mesh shards the stream batch
    over the 'data' axis (shard_map per-shard steps); per-stream outputs ==
    the single-device batched run, through fill, steady state, push_block
    and drain."""
    from bsvd_tpu.parallel.mesh import make_mesh

    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    t, n, h, w = 22, 8, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (n, t, h, w, 4),
                          jnp.float32)

    sd_ref = StreamDenoiser(params, cfg, batch=n, height=h, width=w)
    mesh = make_mesh(8, spatial=1)
    sd_mesh = StreamDenoiser(params, cfg, batch=n, height=h, width=w,
                             mesh=mesh)
    assert sd_mesh.mesh is not None

    outs_ref, outs_mesh = [], []
    for i in range(t - 4):
        a, b = sd_ref.push(x[:, i]), sd_mesh.push(x[:, i])
        if a is not None:
            outs_ref.append(np.asarray(a))
        if b is not None:
            outs_mesh.append(np.asarray(b))
    # push_block on the mesh path too (scan over 4 frames, batch on axis 1)
    blk_frames = jnp.moveaxis(x[:, t - 4:], 1, 0)
    for o in sd_ref.push_block(blk_frames):
        if o is not None:
            outs_ref.append(np.asarray(o))
    for o in sd_mesh.push_block(blk_frames):
        if o is not None:
            outs_mesh.append(np.asarray(o))
    outs_ref.extend(np.asarray(o) for o in sd_ref.flush())
    outs_mesh.extend(np.asarray(o) for o in sd_mesh.flush())

    assert len(outs_ref) == len(outs_mesh) == t
    np.testing.assert_allclose(np.stack(outs_mesh, 1), np.stack(outs_ref, 1),
                               rtol=2e-5, atol=2e-5)


def test_stream_denoiser_mesh_gate():
    """Meshes the streaming step cannot ride (non-dividing batch, row
    misalignment) fall back to single-device stepping."""
    from bsvd_tpu.parallel.mesh import make_mesh

    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    sd = StreamDenoiser(params, cfg, batch=3, height=16, width=16,
                        mesh=make_mesh(8, spatial=1))
    assert sd.mesh is None              # 3 streams don't divide 8
    sd = StreamDenoiser(params, cfg, batch=1, height=20, width=16,
                        mesh=make_mesh(8, spatial=8))
    assert sd.mesh is None              # 20 rows don't align to 4*8 shards


def test_stream_denoiser_mesh_spatial_single_stream():
    """SINGLE-STREAM multi-chip streaming: a 'spatial' mesh axis shards the
    frame rows; each shard advances the halo-extended block of every
    carried buffer (parallel/spatial.py stream_local_step). Outputs match
    the single-device client through fill, steady state, push_block and
    drain — the one parallelism surface the reference cannot shard at all
    (its DP scatters whole frames, base_model.py:62-76)."""
    from bsvd_tpu.parallel.mesh import make_mesh

    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    t, n, h, w = 22, 1, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(5), (n, t, h, w, 4),
                          jnp.float32)

    sd_ref = StreamDenoiser(params, cfg, batch=n, height=h, width=w)
    mesh = make_mesh(8, spatial=2)      # 4 data x 2 spatial; batch 1 -> rows
    sd_sp = StreamDenoiser(params, cfg, batch=n, height=h, width=w,
                           mesh=mesh)
    assert sd_sp.mesh is not None and sd_sp._spatial is not None

    outs_ref, outs_sp = [], []
    for i in range(t - 4):
        a, b = sd_ref.push(x[:, i]), sd_sp.push(x[:, i])
        if a is not None:
            outs_ref.append(np.asarray(a))
        if b is not None:
            outs_sp.append(np.asarray(b))
    blk_frames = jnp.moveaxis(x[:, t - 4:], 1, 0)
    for o in sd_ref.push_block(blk_frames):
        if o is not None:
            outs_ref.append(np.asarray(o))
    for o in sd_sp.push_block(blk_frames):
        if o is not None:
            outs_sp.append(np.asarray(o))
    outs_ref.extend(np.asarray(o) for o in sd_ref.flush())
    outs_sp.extend(np.asarray(o) for o in sd_sp.flush())

    assert len(outs_ref) == len(outs_sp) == t
    np.testing.assert_allclose(np.stack(outs_sp, 1), np.stack(outs_ref, 1),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('t,psz,future', [
    (12, 4, 0),    # exact multiple, no look-ahead
    (10, 4, 2),    # look-ahead with sticky disable near the end
    (11, 3, 2),    # look-ahead + ragged tail
])
def test_block_stream_denoiser_matches_chunked_protocol(t, psz, future):
    """BlockStreamDenoiser fed incrementally (odd-sized pushes) == the
    denoise_seq temp_psz protocol on the whole clip, frame for frame —
    the chunk boundaries, sticky look-ahead disable, and reflect-padded
    ragged tail all line up with the reference semantics."""
    from bsvd_tpu.models.seq_inference import BlockStreamDenoiser, denoise_seq
    cfg = _cfg(norm='none')
    params = wnet_init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(8)
    seq = rng.uniform(0, 1, (t, 3, 16, 16)).astype(np.float32)
    ref = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=psz,
                      future_buffer_len=future, host_chunks=True)

    # the client consumes ready-made (N, H, W, C_in) frames w/ noise map
    frames = np.transpose(seq, (0, 2, 3, 1))[:, None]          # (T,1,H,W,3)
    nm = np.full(frames.shape[:-1] + (1,), 0.1, np.float32)
    frames = np.concatenate([frames, nm], axis=-1)

    bsd = BlockStreamDenoiser(params, cfg, psz=psz, future_buffer_len=future)
    outs = []
    i = 0
    for size in (1, 3, 2, 5, 4, 1, 7, 6, 2, 3):                # odd pushes
        outs.extend(bsd.push_block(list(frames[i:i + size])))
        i += size
        if i >= t:
            break
    outs.extend(bsd.flush())
    assert len(outs) == t
    got = np.stack([np.asarray(o[0], np.float32) for o in outs])
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref,
                               atol=2e-6)

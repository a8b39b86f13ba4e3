"""Spatially-sharded forward (parallel/spatial.py): shard_map + halo
exchange + per-site edge masking == the single-device forward, for the
natural and width-folded stage paths, for inference and the train step.

This is the path that keeps the Pallas kernels engaged on multi-chip
meshes (they run per-shard); on the CPU test mesh the kernels themselves
are gated off, so these tests validate the halo/mask/crop machinery the
kernels run inside.
"""

import numpy as np

import jax
import jax.numpy as jnp

from bsvd_tpu.archs.wnet_arch import (WNetConfig, _stage_apply,
                                      _stage_apply_folded, get_act,
                                      wnet_apply, wnet_init)
from bsvd_tpu.parallel.mesh import make_mesh
from bsvd_tpu.parallel.spatial import (spatial_ok, stage_halo,
                                       wnet_apply_spatial)


def _cfg(**kw):
    base = dict(chns=(8, 16, 32), mid_ch=8, in_ch=4, out_ch=3,
                interm_ch=8, norm='none', act='relu6', shift_mode='TSM')
    base.update(kw)
    return WNetConfig(**base)


def test_stage_halo_flagship():
    # hand-derived garbage growth for the 2-down/2-up DenBlock topology
    assert stage_halo(_cfg()) == 40


def test_spatial_ok_gates():
    cfg = _cfg()
    mesh = make_mesh(8, spatial=4)
    assert spatial_ok(cfg, 32, mesh)          # 32 % (4*4) == 0... (16)
    assert not spatial_ok(cfg, 36, mesh)      # misaligned H
    assert not spatial_ok(cfg, 32, None)
    assert not spatial_ok(cfg, 32, make_mesh(8, spatial=1))


def test_spatial_forward_matches_single_device_halo_gt_shard():
    """halo (40) > shard height (8): the gather-based extension must pull
    rows across multiple shard boundaries and zero-fill past the edges."""
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 3, 32, 16, 4)), jnp.float32)
    ref = np.asarray(wnet_apply(params, x, cfg))
    mesh = make_mesh(8, spatial=4)
    got = np.asarray(jax.jit(
        lambda p, v: wnet_apply_spatial(p, v, cfg, mesh))(params, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_spatial_forward_matches_single_device_halo_lt_shard():
    """halo (40) < shard height (48): the interior-crop regime."""
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, 2, 96, 8, 4)), jnp.float32)
    ref = np.asarray(wnet_apply(params, x, cfg))
    mesh = make_mesh(2, spatial=2)
    got = np.asarray(jax.jit(
        lambda p, v: wnet_apply_spatial(p, v, cfg, mesh))(params, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_spatial_forward_data_and_spatial_axes():
    """N > 1 rides the 'data' axis simultaneously."""
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (4, 2, 16, 8, 4)), jnp.float32)
    ref = np.asarray(wnet_apply(params, x, cfg))
    mesh = make_mesh(8, spatial=2)    # 4 data x 2 spatial
    got = np.asarray(jax.jit(
        lambda p, v: wnet_apply_spatial(p, v, cfg, mesh))(params, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _edge_mask_case(stage_fn):
    """Single-shard emulation of the global-edge semantics: extend the
    whole image with `halo` fictitious zero rows on both sides, run the
    stage with the row-validity mask, crop — must equal the plain stage
    on the unextended image (i.e. per-conv zero padding reproduced)."""
    cfg = _cfg(chns=(16, 32, 64), mid_ch=16, interm_ch=16)
    params = wnet_init(jax.random.PRNGKey(3), cfg)
    act = get_act(cfg.act)
    h, hg = stage_halo(cfg), 24
    x = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (1, 3, hg, 8, 4)), jnp.float32)
    ref = _stage_apply(params['stage0'], x, cfg, act)

    x_ext = jnp.pad(x, ((0, 0), (0, 0), (h, h), (0, 0), (0, 0)))
    s_ext = -h

    def mask(v, level):
        rows = jax.lax.broadcasted_iota(jnp.int32, (v.shape[2], 1, 1), 0)
        gidx = rows + s_ext // level
        valid = (gidx >= 0) & (gidx < hg // level)
        return jnp.where(valid, v, jnp.zeros((), v.dtype))

    got = stage_fn(params['stage0'], x_ext, cfg, act, mask)[:, :, h:h + hg]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_edge_mask_natural_stage():
    _edge_mask_case(lambda p, x, cfg, act, mask:
                    _stage_apply(p, x, cfg, act, mask=mask))


def test_edge_mask_folded_stage():
    """The width-folded stage with mask (the TPU path inside shard_map;
    auto-engages only on TPU, called directly here)."""
    _edge_mask_case(lambda p, x, cfg, act, mask:
                    _stage_apply_folded(p, x, cfg, act, mask=mask))


def test_denoise_seq_spatial_mesh_routes_shard_map():
    """denoise_seq(mesh with spatial axis) goes through the shard_map
    path and matches the single-device protocol output."""
    from bsvd_tpu.models.seq_inference import denoise_seq
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(4), cfg)
    seq = np.random.default_rng(4).uniform(
        0, 1, (5, 3, 32, 16)).astype(np.float32)
    ref = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=-1)
    mesh = make_mesh(8, spatial=2)
    got = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=-1,
                      mesh=mesh)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_spatial_train_step_matches_single_device():
    """The data x spatial shard_map train step (halo-exchange forward,
    per-shard pixel loss, pmean over both axes) == the unsharded step."""
    import optax
    from bsvd_tpu.losses import build_loss
    from bsvd_tpu.models.denoising_model import make_train_step

    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(5), cfg)
    tx = optax.adam(1e-3)
    cri = build_loss(dict(type='MSELoss', loss_weight=1.0))

    step_ref = make_train_step(cfg, tx, cri)
    mesh = make_mesh(8, spatial=2)    # 4 data x 2 spatial
    step_sp = make_train_step(cfg, tx, cri, mesh=mesh)

    rng = np.random.default_rng(6)
    p1 = jax.tree.map(jnp.array, params)
    p2 = jax.tree.map(jnp.array, params)
    s1, s2 = tx.init(p1), tx.init(p2)
    for it in range(3):
        batch = {
            'lq': jnp.asarray(rng.uniform(0, 1, (8, 3, 16, 8, 4)),
                              jnp.float32),
            'gt': jnp.asarray(rng.uniform(0, 1, (8, 3, 16, 8, 3)),
                              jnp.float32),
        }
        p1, s1, _, l1 = jax.jit(step_ref)(p1, s1, None, batch, it, 0.0)
        p2, s2, _, l2 = jax.jit(step_sp)(p2, s2, None, batch, it, 0.0)
        np.testing.assert_allclose(float(l1['l_pix']), float(l2['l_pix']),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        # per-shard reduce + pmean vs one global mean: same math, different
        # fp32 summation order, amplified by 3 Adam steps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

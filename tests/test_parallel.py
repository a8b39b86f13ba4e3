"""Multi-device sharding: data-parallel training equivalence and
spatially-sharded inference correctness on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply, wnet_init
from bsvd_tpu.models.seq_inference import denoise_seq
from bsvd_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch


def _cfg():
    return WNetConfig(chns=(8, 16, 32), mid_ch=8, interm_ch=8, norm='none',
                      act='relu6')


def test_spatial_sharded_inference_matches_single_device():
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    seq = np.random.default_rng(0).uniform(
        0, 1, (6, 3, 32, 32)).astype(np.float32)

    ref = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=-1)
    mesh = make_mesh(8, spatial=4)
    got = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=-1,
                      mesh=mesh)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_data_sharded_forward_matches_single_device():
    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 4, 16, 16, 4))
    ref = np.asarray(wnet_apply(params, x, cfg))

    mesh = make_mesh(8, spatial=2)   # 4 data x 2 spatial
    xs = jax.device_put(x, batch_sharding(mesh, 5, 0, spatial_axis=2))
    got = np.asarray(jax.jit(lambda p, x: wnet_apply(p, x, cfg))(params, xs))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_shard_batch_tree():
    mesh = make_mesh(4)
    tree = {'a': np.zeros((8, 3)), 'b': np.ones((8, 2, 2))}
    sharded = shard_batch(mesh, tree)
    assert sharded['a'].sharding.spec[0] == 'data'


def test_shard_map_dp_train_step_matches_single_device():
    """Data-parallel train step via shard_map (the path that keeps Pallas
    kernels usable on multi-chip meshes) == the unsharded step: identical
    params, opt state, and losses after several updates."""
    import optax
    from bsvd_tpu.models.denoising_model import make_train_step
    from bsvd_tpu.losses import build_loss

    cfg = _cfg()
    params = wnet_init(jax.random.PRNGKey(3), cfg)
    tx = optax.adam(1e-3)
    cri = build_loss(dict(type='MSELoss', loss_weight=1.0))

    step_ref = make_train_step(cfg, tx, cri)
    mesh = make_mesh(8, spatial=1)
    step_dp = make_train_step(cfg, tx, cri, mesh=mesh)

    rng = np.random.default_rng(4)
    p1 = jax.tree.map(jnp.array, params)
    p2 = jax.tree.map(jnp.array, params)
    s1 = tx.init(p1)
    s2 = tx.init(p2)
    for it in range(3):
        batch = {
            'lq': jnp.asarray(rng.uniform(0, 1, (8, 3, 16, 16, 4)),
                              jnp.float32),
            'gt': jnp.asarray(rng.uniform(0, 1, (8, 3, 16, 16, 3)),
                              jnp.float32),
        }
        p1, s1, _, l1 = jax.jit(step_ref)(p1, s1, None, batch, it, 0.0)
        p2, s2, _, l2 = jax.jit(step_dp)(p2, s2, None, batch, it, 0.0)
        # per-shard reduce + pmean vs one global mean: same math, different
        # fp32 summation order (measured drift ~3e-6 after 3 Adam steps)
        np.testing.assert_allclose(float(l1['l_pix']), float(l2['l_pix']),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

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

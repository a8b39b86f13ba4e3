"""HiFaceGAN parity vs the reference torch implementation (CPU; spectral
norm folded into effective weights for eval)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_util import load_reference

torch = pytest.importorskip('torch')


def _fold_spectral_norm(state):
    """Fold torch spectral_norm triplets (weight_orig/u/v) into effective
    weights: w = w_orig / (u^T W v)."""
    out = {}
    for k in list(state):
        if k.endswith('weight_orig'):
            base = k[:-len('_orig')]
            w = state[k]
            u = state[base + '_u']
            v = state[base + '_v']
            w_mat = w.reshape(w.shape[0], -1)
            sigma = float(u @ w_mat @ v)
            out[base] = w / sigma
        elif k.endswith('weight_u') or k.endswith('weight_v'):
            continue
        else:
            out[k] = state[k]
    return out


def _to_tree(state):
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree
    return jax.tree.map(jnp.asarray, state_dict_to_tree(state))


def test_hifacegan_generator_parity():
    load_reference()
    from basicsr.archs.hifacegan_arch import HiFaceGAN as RefNet
    from bsvd_tpu.archs.hifacegan_arch import hifacegan_apply
    net = RefNet(num_in_ch=3, num_feat=4, crop_size=64, is_train=False).eval()
    state = _fold_spectral_norm(
        {k: v.detach().numpy() for k, v in net.state_dict().items()})
    params = _to_tree(state)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    fn = jax.jit(functools.partial(hifacegan_apply, scale_ratio=5, phase=4))
    got = fn(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, rtol=2e-3, atol=2e-3)


def test_hifacegan_discriminator_parity():
    load_reference()
    from basicsr.archs.hifacegan_arch import HiFaceGANDiscriminator as RefNet
    from bsvd_tpu.archs.hifacegan_arch import hifacegan_discriminator_apply
    net = RefNet(num_in_ch=3, num_out_ch=3, num_d=2, n_layers_d=3,
                 num_feat=8).eval()
    state = _fold_spectral_norm(
        {k: v.detach().numpy() for k, v in net.state_dict().items()})
    params = _to_tree(state)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 6, 64, 64)).astype(np.float32)  # conditional: 3+3
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
    fn = jax.jit(functools.partial(hifacegan_discriminator_apply, num_d=2,
                                   n_layers_d=3))
    got = fn(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(got) == len(ref) == 2
    for d_got, d_ref in zip(got, ref):
        assert len(d_got) == len(d_ref)
        for t_got, t_ref in zip(d_got, d_ref):
            np.testing.assert_allclose(
                np.transpose(np.asarray(t_got), (0, 3, 1, 2)), t_ref.numpy(),
                rtol=2e-3, atol=2e-3)

def test_hifacegan_train_step(tmp_path):
    """Engine smoke: G+D step with pixel, multiscale-GAN and feature-matching
    losses; both param sets move and all losses are finite."""
    import os
    from bsvd_tpu.models import build_model
    opt = {
        'name': 'hifacegan_smoke', 'model_type': 'HiFaceGANModel',
        'is_train': True, 'num_gpu': 1, 'manual_seed': 0, 'scale': 1,
        'network_g': {'type': 'HiFaceGAN', 'num_in_ch': 3, 'num_feat': 4,
                      'crop_size': 64, 'is_train': True},
        'network_d': {'type': 'HiFaceGANDiscriminator', 'num_in_ch': 3,
                      'num_out_ch': 3, 'num_d': 2, 'n_layers_d': 3,
                      'num_feat': 8},
        'path': {'models': str(tmp_path / 'm'),
                 'training_states': str(tmp_path / 's')},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'optim_d': {'type': 'Adam', 'lr': 4e-4, 'betas': [0.9, 0.99]},
            'total_iter': 3, 'net_d_iters': 1, 'net_d_init_iters': 0,
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0},
            'gan_opt': {'type': 'MultiScaleGANLoss', 'gan_type': 'hinge',
                        'loss_weight': 0.1},
            'feature_matching_opt': {'type': 'GANFeatLoss', 'criterion': 'l1',
                                     'loss_weight': 10.0},
        },
        'logger': {},
    }
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)
    rng = np.random.default_rng(3)
    lq = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    gt = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    g_before = np.asarray(jax.tree.leaves(model.params)[0])
    d_before = np.asarray(jax.tree.leaves(model.d_params)[0])
    for it in range(1, 4):
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(it)
        ld = model.log_dict
        for k in ('l_g_pix', 'l_g_gan', 'l_g_feat', 'l_d_real', 'l_d_fake'):
            assert np.isfinite(ld[k]), (k, ld)
    assert not np.array_equal(g_before,
                              np.asarray(jax.tree.leaves(model.params)[0]))
    assert not np.array_equal(d_before,
                              np.asarray(jax.tree.leaves(model.d_params)[0]))
    model.save(0, 3)
    assert (tmp_path / 'm' / 'net_d_3.npz').exists()


def test_nlayer_discriminator_spectral_norm_training_path():
    """Training-from-scratch D convs are spectral-normalized with a
    persistent power-iteration u (reference hifacegan_util SpectralNorm):
    scaling a weight leaves the (normalized) output invariant, and the
    updated u folds back into the tree."""
    from bsvd_tpu.archs.hifacegan_arch import (nlayer_discriminator_apply,
                                               nlayer_discriminator_init,
                                               sn_aux_fold)
    p = nlayer_discriminator_init(jax.random.PRNGKey(0), 6, n_layers_d=3,
                                  num_feat=8)
    assert 'u' in p['model0']['0']
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 32, 32, 6)).astype(np.float32))

    # converge u first so one-step estimates are stable
    cur = p
    for _ in range(30):
        aux = {}
        nlayer_discriminator_apply(cur, x, n_layers_d=3, aux=aux)
        cur = sn_aux_fold(cur, aux)

    aux1 = {}
    out1 = nlayer_discriminator_apply(cur, x, n_layers_d=3, aux=aux1)[-1]
    scaled = jax.tree.map(lambda a: a, cur)
    scaled['model1']['0']['0'] = dict(scaled['model1']['0']['0'])
    scaled['model1']['0']['0']['w'] = scaled['model1']['0']['0']['w'] * 10
    aux2 = {}
    out2 = nlayer_discriminator_apply(scaled, x, n_layers_d=3, aux=aux2)[-1]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-3, atol=1e-4)
    assert set(aux1) == {'model0.0', 'model1.0.0', 'model2.0.0', 'model3.0'}
    folded = sn_aux_fold(cur, aux1)
    np.testing.assert_array_equal(np.asarray(folded['model1']['0']['0']['u']),
                                  np.asarray(aux1['model1.0.0']))

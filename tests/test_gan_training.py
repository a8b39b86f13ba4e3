"""GAN engines: discriminator parity (VGG-style vs reference torch, eval
mode), SN power iteration sanity, ESRGAN/SRGAN train steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_util import load_reference

torch = pytest.importorskip('torch')


def test_vgg_discriminator_parity_eval():
    load_reference()
    from basicsr.archs.discriminator_arch import VGGStyleDiscriminator128 as Ref
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree
    from bsvd_tpu.archs.discriminator_arch import vgg_discriminator_apply
    net = Ref(num_in_ch=3, num_feat=8).eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()
             if 'num_batches_tracked' not in k}
    # torch BN keys: weight->scale? generic mapper puts weight->w; remap
    tree = state_dict_to_tree(state)
    for k, v in tree.items():
        if k.startswith('bn'):
            tree[k] = {'scale': v['w'], 'bias': v['b'],
                       'mean': v['running_mean'], 'var': v['running_var']}
    params = jax.tree.map(jnp.asarray, tree)
    x = np.random.default_rng(0).uniform(0, 1, (2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()
    got, stats = vgg_discriminator_apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 3, 128, train=False)
    assert stats == {}
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-3, atol=1e-4)


def test_sn_conv_normalizes_spectral_norm():
    from bsvd_tpu.archs.discriminator_arch import _sn_conv_apply, _sn_conv_init
    p = _sn_conv_init(jax.random.PRNGKey(0), 4, 8, 3)
    p = dict(p, w=p['w'] * 10)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    u = p['u']
    for _ in range(20):       # converge power iteration
        _, u = _sn_conv_apply(dict(p, u=u), x)
    w_mat = np.asarray(p['w']).reshape(-1, 8).T
    sigma_true = np.linalg.svd(w_mat, compute_uv=False)[0]
    # effective weight spectral norm ~ 1 after normalization
    v = w_mat.T @ np.asarray(u)
    v /= np.linalg.norm(v)
    sigma_est = np.asarray(u) @ w_mat @ v
    np.testing.assert_allclose(sigma_est, sigma_true, rtol=1e-3)


@pytest.mark.parametrize('model_type,disc', [
    ('ESRGANModel', {'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                     'num_feat': 8}),
    ('SRGANModel', {'type': 'VGGStyleDiscriminator128', 'num_in_ch': 3,
                    'num_feat': 8}),
])
def test_gan_train_step(model_type, disc, tmp_path):
    import os
    from bsvd_tpu.models import build_model
    opt = {
        'name': 'gan_smoke', 'model_type': model_type, 'is_train': True,
        'num_gpu': 1, 'manual_seed': 0, 'scale': 4,
        'network_g': {'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                      'num_feat': 8, 'num_block': 1, 'upscale': 4},
        'network_d': disc,
        'path': {'models': str(tmp_path / 'm'),
                 'training_states': str(tmp_path / 's')},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'optim_d': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'total_iter': 4, 'ema_decay': 0.99,
            'net_d_iters': 1, 'net_d_init_iters': 0,
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 0.01},
            'gan_opt': {'type': 'GANLoss', 'gan_type': 'vanilla',
                        'real_label_val': 1.0, 'fake_label_val': 0.0,
                        'loss_weight': 0.005},
        },
        'logger': {},
    }
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)
    rng = np.random.default_rng(0)
    lq = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    gt = rng.uniform(0, 1, (2, 3, 128, 128)).astype(np.float32)
    d_before = np.asarray(jax.tree.leaves(model.d_params)[0])
    for it in range(1, 4):
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(it)
        ld = model.log_dict
        for k in ('l_g_gan', 'l_d_real', 'l_d_fake'):
            assert np.isfinite(ld[k]), (k, ld)
    assert not np.array_equal(d_before,
                              np.asarray(jax.tree.leaves(model.d_params)[0]))
    model.save(0, 3)
    assert (tmp_path / 'm' / 'net_d_3.npz').exists()


def test_gan_gated_g_step_freezes_params_and_opt_state(tmp_path):
    """On gated-off iterations (net_d_iters/net_d_init_iters) the reference
    skips the whole G block (srgan_model.py:83-120): G params AND Adam
    moments/counter must stay bitwise unchanged, while D still trains."""
    import os
    from bsvd_tpu.models import build_model
    opt = {
        'name': 'gan_gate', 'model_type': 'SRGANModel', 'is_train': True,
        'num_gpu': 1, 'manual_seed': 0, 'scale': 4,
        'network_g': {'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                      'num_feat': 8, 'num_block': 1, 'upscale': 4},
        'network_d': {'type': 'VGGStyleDiscriminator128', 'num_in_ch': 3,
                      'num_feat': 8},
        'path': {'models': str(tmp_path / 'm'),
                 'training_states': str(tmp_path / 's')},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'optim_d': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'total_iter': 4, 'ema_decay': 0,
            'net_d_iters': 2, 'net_d_init_iters': 1,
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 0.01},
            'gan_opt': {'type': 'GANLoss', 'gan_type': 'vanilla',
                        'real_label_val': 1.0, 'fake_label_val': 0.0,
                        'loss_weight': 0.005},
        },
        'logger': {},
    }
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)
    rng = np.random.default_rng(0)
    batch = {'lq': rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32),
             'gt': rng.uniform(0, 1, (2, 3, 128, 128)).astype(np.float32)}

    def snap(tree):
        return [np.asarray(x).copy() for x in jax.tree.leaves(tree)]

    def same(a, b):
        return all(np.array_equal(x, y) for x, y in zip(a, b))

    g0, o0 = snap(model.params), snap(model.opt_state)
    d0 = snap(model.d_params)
    # it=1: 1 % 2 != 0 -> gated off
    model.feed_data(batch)
    model.optimize_parameters(1)
    assert same(snap(model.params), g0)
    assert same(snap(model.opt_state), o0)
    assert not same(snap(model.d_params), d0)
    # it=2: 2 % 2 == 0 and 2 > 1 -> G trains
    model.feed_data(batch)
    model.optimize_parameters(2)
    g2, o2 = snap(model.params), snap(model.opt_state)
    assert not same(g2, g0)
    # it=3: gated off again -> frozen at the it=2 state
    model.feed_data(batch)
    model.optimize_parameters(3)
    assert same(snap(model.params), g2)
    assert same(snap(model.opt_state), o2)


@pytest.mark.parametrize('model_type,g_net,lq_shape,gt_shape', [
    ('VideoGANModel',
     {'type': 'EDVR', 'num_in_ch': 3, 'num_out_ch': 3, 'num_feat': 8,
      'num_frame': 3, 'deformable_groups': 2, 'num_extract_block': 1,
      'num_reconstruct_block': 1},
     (1, 3, 3, 8, 8), (1, 3, 32, 32)),
    ('VideoRecurrentGANModel',
     {'type': 'BasicVSR', 'num_feat': 8, 'num_block': 1},
     (1, 2, 3, 18, 18), (1, 2, 3, 72, 72)),  # non-/32 H,W: SpyNet pad path
])
def test_video_gan_models(model_type, g_net, lq_shape, gt_shape, tmp_path):
    import os
    from bsvd_tpu.models import build_model
    opt = {
        'name': 'vgan_smoke', 'model_type': model_type, 'is_train': True,
        'num_gpu': 1, 'manual_seed': 0, 'scale': 4,
        'network_g': g_net,
        'network_d': {'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                      'num_feat': 8},
        'path': {'models': str(tmp_path / 'm'),
                 'training_states': str(tmp_path / 's')},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'optim_d': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
            'total_iter': 2, 'net_d_iters': 1, 'net_d_init_iters': 0,
            'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0},
            'gan_opt': {'type': 'GANLoss', 'gan_type': 'vanilla',
                        'loss_weight': 0.005},
        },
        'logger': {},
    }
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)
    rng = np.random.default_rng(0)
    lq = rng.uniform(0, 1, lq_shape).astype(np.float32)
    gt = rng.uniform(0, 1, gt_shape).astype(np.float32)
    for it in range(1, 3):
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(it)
        assert np.isfinite(model.log_dict['l_g_gan'])
        assert np.isfinite(model.log_dict['l_d_real'])


def test_gan_resume_restores_both_optimizers(tmp_path):
    """save() must persist the D optimizer state (extra slot) and
    resume_training() must restore it: after resume, G AND D Adam moments
    equal the pre-restart ones (regression: only opt_state (G) survived,
    reference saves every optimizer, base_model.py:280-313)."""
    import os
    from bsvd_tpu.models import build_model
    from bsvd_tpu.models.checkpoint import load_training_state

    def make_opt():
        return {
            'name': 'gan_resume', 'model_type': 'ESRGANModel',
            'is_train': True, 'num_gpu': 1, 'manual_seed': 0, 'scale': 4,
            'network_g': {'type': 'MSRResNet', 'num_in_ch': 3,
                          'num_out_ch': 3, 'num_feat': 8, 'num_block': 1,
                          'upscale': 4},
            'network_d': {'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                          'num_feat': 8},
            'path': {'models': str(tmp_path / 'm'),
                     'training_states': str(tmp_path / 's')},
            'train': {
                'optim_g': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
                'optim_d': {'type': 'Adam', 'lr': 1e-4, 'betas': [0.9, 0.99]},
                'total_iter': 4, 'ema_decay': 0.99,
                'net_d_iters': 1, 'net_d_init_iters': 0,
                'pixel_opt': {'type': 'L1Loss', 'loss_weight': 0.01},
                'gan_opt': {'type': 'GANLoss', 'gan_type': 'vanilla',
                            'real_label_val': 1.0, 'fake_label_val': 0.0,
                            'loss_weight': 0.005},
            },
            'logger': {},
        }

    os.makedirs(tmp_path / 'm'); os.makedirs(tmp_path / 's')
    model = build_model(make_opt())
    rng = np.random.default_rng(0)
    lq = rng.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32)
    gt = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    for it in range(1, 3):
        model.feed_data({'lq': lq, 'gt': gt})
        model.optimize_parameters(it)
    model.save(0, 2)
    want_g = [np.asarray(v) for v in jax.tree.leaves(model.opt_state)]
    want_d = [np.asarray(v) for v in jax.tree.leaves(model.opt_state_d)]
    assert any(np.any(v != 0) for v in want_d), 'D moments never updated'

    state = load_training_state(str(tmp_path / 's' / '2.state'))
    opt2 = make_opt()
    opt2['path']['resume_state'] = str(tmp_path / 's' / '2.state')
    from bsvd_tpu.utils.misc import check_resume
    check_resume(opt2, 2)
    assert opt2['path']['pretrain_network_d'].endswith('net_d_2.npz')
    model2 = build_model(opt2)
    model2.resume_training(state)
    for got, want, name in [(model2.opt_state, want_g, 'G'),
                            (model2.opt_state_d, want_d, 'D')]:
        for g_leaf, w_leaf in zip(jax.tree.leaves(got), want):
            np.testing.assert_array_equal(np.asarray(g_leaf), w_leaf,
                                          err_msg=f'{name} optimizer state')

"""StyleGAN2 parity vs the reference torch implementation (CPU, with the
CUDA-only fused_act patched to its mathematical definition; upfirdn2d uses
the reference's own native CPU fallback)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_util import load_reference

torch = pytest.importorskip('torch')


def _patch_fused_act():
    """The reference fused_act is CUDA-only; install the equivalent math."""
    import basicsr.ops.fused_act.fused_act as fa
    import basicsr.archs.stylegan2_arch as sg

    def fused_leaky_relu_native(input, bias=None, negative_slope=0.2,
                                scale=2**0.5):
        if bias is not None:
            shape = [1, -1] + [1] * (input.ndim - 2)
            input = input + bias.view(*shape)
        return torch.nn.functional.leaky_relu(input, negative_slope) * scale

    class FusedLeakyReLUNative(torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu_native(x, self.bias, self.negative_slope,
                                           self.scale)

    fa.fused_leaky_relu = fused_leaky_relu_native
    fa.FusedLeakyReLU = FusedLeakyReLUNative
    sg.fused_leaky_relu = fused_leaky_relu_native
    sg.FusedLeakyReLU = FusedLeakyReLUNative


def test_upfirdn2d_parity():
    load_reference()
    from basicsr.ops.upfirdn2d.upfirdn2d import upfirdn2d_native
    from bsvd_tpu.ops.stylegan_ops import make_resample_kernel, upfirdn2d
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 9, 11)).astype(np.float32)
    k = np.asarray(make_resample_kernel([1, 3, 3, 1]), np.float32)
    for up, down, pad in [(2, 1, (2, 1)), (1, 2, (2, 1)), (1, 1, (1, 1)),
                          (1, 1, (2, -1))]:
        ref = upfirdn2d_native(torch.from_numpy(x), torch.from_numpy(k),
                               up, up, down, down, pad[0], pad[1], pad[0],
                               pad[1]).numpy()
        got = upfirdn2d(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                        jnp.asarray(k), up=up, down=down, pad=pad)
        np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                                   ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f'up={up} down={down} pad={pad}')


def test_stylegan2_generator_parity():
    load_reference()
    _patch_fused_act()
    from basicsr.archs.stylegan2_arch import StyleGAN2Generator as RefG
    from bsvd_tpu.archs.stylegan2_arch import (convert_stylegan2_state,
                                               stylegan2_generator_apply)
    net = RefG(out_size=32, num_style_feat=32, num_mlp=2,
               channel_multiplier=1, narrow=0.25).eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_stylegan2_state(state))

    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 32)).astype(np.float32)
    with torch.no_grad():
        ref_img, _ = net([torch.from_numpy(z)], randomize_noise=False)
    got, _ = stylegan2_generator_apply(params, [jnp.asarray(z)], out_size=32,
                                       randomize_noise=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_img.numpy(), rtol=5e-3, atol=5e-3)


def test_stylegan2_discriminator_parity():
    load_reference()
    _patch_fused_act()
    from basicsr.archs.stylegan2_arch import StyleGAN2Discriminator as RefD
    from bsvd_tpu.archs.stylegan2_arch import (convert_stylegan2_state,
                                               stylegan2_discriminator_apply)
    net = RefD(out_size=32, channel_multiplier=1, narrow=0.25,
               stddev_group=2).eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_stylegan2_state(state)

    # map torch ConvLayer Sequential indices to the functional layout
    def map_convlayer(node):
        # {'0': conv(+b?), '1': act bias} or {'1': conv, '2': act} (downsample)
        out = {}
        if '0' in node and 'w' in node['0'] and node['0']['w'].ndim == 4:
            conv = dict(node['0'])
        elif '1' in node and 'w' in node.get('1', {}):
            conv = dict(node['1'])
        else:
            return None
        act_key = None
        for k in ('1', '2'):
            if k in node and 'b' in node[k] and 'w' not in node[k]:
                act_key = k
        out['conv'] = {'w': jnp.asarray(conv['w'])}
        if 'b' in conv:
            out['conv']['b'] = jnp.asarray(conv['b'])
        if act_key:
            out['act_bias'] = jnp.asarray(node[act_key]['b'])
        return out

    params = {'conv_body': {}, 'final_conv': None, 'final_linear': {}}
    body = tree['conv_body']
    params['conv_body']['0'] = map_convlayer(body['0'])
    for bi in range(1, len(body)):
        blk = body[str(bi)]
        params['conv_body'][str(bi)] = {
            'conv1': map_convlayer(blk['conv1']),
            'conv2': map_convlayer(blk['conv2']),
            'skip': map_convlayer(blk['skip']),
        }
    params['final_conv'] = map_convlayer(tree['final_conv'])
    params['final_linear'] = {k: jax.tree.map(jnp.asarray, v)
                              for k, v in tree['final_linear'].items()}

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()
    got = stylegan2_discriminator_apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), stddev_group=2)
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=5e-3, atol=5e-3)


def test_stylegan2_model_train_steps(tmp_path):
    """StyleGAN2Model: base + r1 + path-reg steps all run and stay finite."""
    import os
    from bsvd_tpu.models import build_model
    opt = {
        'name': 'sg2_smoke', 'model_type': 'StyleGAN2Model', 'is_train': True,
        'num_gpu': 1, 'manual_seed': 0,
        'network_g': {'type': 'StyleGAN2Generator', 'out_size': 16,
                      'num_style_feat': 16, 'num_mlp': 2,
                      'channel_multiplier': 1, 'narrow': 0.0625},
        'network_d': {'type': 'StyleGAN2Discriminator', 'out_size': 16,
                      'channel_multiplier': 1, 'narrow': 0.0625,
                      'stddev_group': 2},
        'path': {'models': str(tmp_path / 'm'),
                 'training_states': str(tmp_path / 's')},
        'train': {
            'optim_g': {'type': 'Adam', 'lr': 2e-3},
            'optim_d': {'type': 'Adam', 'lr': 2e-3},
            'gan_opt': {'type': 'GANLoss', 'gan_type': 'wgan_softplus',
                        'loss_weight': 1.0},
            'r1_reg_weight': 10, 'path_reg_weight': 2,
            'net_g_reg_every': 2, 'net_d_reg_every': 3, 'mixing_prob': 0.9,
            'total_iter': 6,
        },
        'logger': {},
    }
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)
    gt = np.random.default_rng(0).uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)
    for it in range(1, 7):    # covers r1 (3, 6) and path (2, 4, 6) iters
        model.feed_data({'gt': gt})
        model.optimize_parameters(it)
        for k in ('l_d', 'l_g'):
            assert np.isfinite(model.log_dict[k]), (it, k, model.log_dict)
    assert np.isfinite(model.log_dict['l_g_path'])
    samples = model.test(num_samples=2)
    assert samples.shape == (2, 3, 16, 16)
    model.save(0, 6)
    assert (tmp_path / 'm' / 'net_g_6.npz').exists()


def test_stylegan2_model_eval_mode_test(tmp_path):
    """Eval mode (is_train=False) never runs init_training_settings —
    test() must still sample, from the loaded weights (regression: missing
    ema_params AttributeError)."""
    from bsvd_tpu.models import build_model
    opt = {
        'name': 'sg2_eval', 'model_type': 'StyleGAN2Model', 'is_train': False,
        'num_gpu': 1, 'manual_seed': 0,
        'network_g': {'type': 'StyleGAN2Generator', 'out_size': 16,
                      'num_style_feat': 16, 'num_mlp': 2,
                      'channel_multiplier': 1, 'narrow': 0.0625},
        'path': {}, 'logger': {},
    }
    model = build_model(opt)
    samples = model.test(num_samples=2)
    assert samples.shape == (2, 3, 16, 16)
    assert np.isfinite(np.asarray(samples)).all()

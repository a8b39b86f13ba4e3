"""VGG feature extractor + PerceptualLoss parity vs a torch oracle
(torchvision itself is unavailable, so the oracle is a hand-built
nn.Sequential with the exact torchvision `features` module order that
the converter's index mapping assumes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
from torch import nn  # noqa: E402

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _torch_vgg19_prefix(max_layers=12, seed=0):
    """torchvision vgg19 `features` truncated: indices 0..11 cover
    conv1_1..relu2_2 + pool1 (matching bsvd_tpu.archs.vgg_arch.NAMES)."""
    torch.manual_seed(seed)
    mods = [nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(),
            nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
            nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(2, 2)]
    return nn.Sequential(*mods[:max_layers]).eval()


def test_vgg_feature_extractor_parity():
    from bsvd_tpu.archs.vgg_arch import (convert_torchvision_vgg,
                                         vgg_feature_apply)
    net = _torch_vgg19_prefix(9)   # through relu2_2
    state = {f'features.{i}.{k}': v.detach().numpy()
             for i, m in enumerate(net)
             for k, v in getattr(m, 'state_dict', dict)().items()}
    layers = ['relu1_1', 'relu2_2', 'conv2_1']
    params = convert_torchvision_vgg(state, 'vgg19')
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)

    xt = torch.from_numpy(x)
    xt = (xt - torch.tensor(MEAN).view(1, 3, 1, 1)) \
        / torch.tensor(STD).view(1, 3, 1, 1)
    ref = {}
    with torch.no_grad():
        h = xt
        names = ['conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1',
                 'conv2_1', 'relu2_1', 'conv2_2', 'relu2_2']
        for name, m in zip(names, net):
            h = m(h)
            if name in layers:
                ref[name] = h.numpy()

    got = vgg_feature_apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), layers, 'vgg19')
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            np.transpose(np.asarray(got[k]), (0, 3, 1, 2)), ref[k],
            rtol=1e-4, atol=1e-5)


def test_perceptual_loss_parity(tmp_path):
    from bsvd_tpu.losses import build_loss
    net = _torch_vgg19_prefix(9, seed=3)
    state = {f'features.{i}.{k}': v.detach().numpy()
             for i, m in enumerate(net)
             for k, v in getattr(m, 'state_dict', dict)().items()}
    np.savez(tmp_path / 'vgg.npz', **state)

    layer_weights = {'relu1_1': 1.0, 'relu2_2': 0.25}
    loss = build_loss({'type': 'PerceptualLoss',
                       'layer_weights': layer_weights,
                       'perceptual_weight': 2.0, 'style_weight': 3.0,
                       'criterion': 'l1',
                       'pretrain_path': str(tmp_path / 'vgg.npz')})
    assert loss.vgg.pretrained

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    g = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)

    def feats(a):
        at = torch.from_numpy(a)
        at = (at - torch.tensor(MEAN).view(1, 3, 1, 1)) \
            / torch.tensor(STD).view(1, 3, 1, 1)
        out, h = {}, at
        names = ['conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1',
                 'conv2_1', 'relu2_1', 'conv2_2', 'relu2_2']
        with torch.no_grad():
            for name, m in zip(names, net):
                h = m(h)
                if name in layer_weights:
                    out[name] = h
        return out

    def gram(t):
        n, c, hh, ww = t.shape
        f = t.view(n, c, hh * ww)
        return f.bmm(f.transpose(1, 2)) / (c * hh * ww)

    xf, gf = feats(x), feats(g)
    ref_p = sum(torch.nn.functional.l1_loss(xf[k], gf[k]).item() * w
                for k, w in layer_weights.items()) * 2.0
    ref_s = sum(torch.nn.functional.l1_loss(gram(xf[k]), gram(gf[k])).item() * w
                for k, w in layer_weights.items()) * 3.0

    p, s = loss(jnp.asarray(x), jnp.asarray(g))
    np.testing.assert_allclose(float(p), ref_p, rtol=1e-4)
    np.testing.assert_allclose(float(s), ref_s, rtol=1e-3, atol=1e-7)


def test_sr_model_with_perceptual(tmp_path):
    """Engine smoke: SRModel trains against pixel + perceptual + style."""
    import os
    from bsvd_tpu.models import build_model
    net = _torch_vgg19_prefix(9, seed=4)
    state = {f'features.{i}.{k}': v.detach().numpy()
             for i, m in enumerate(net)
             for k, v in getattr(m, 'state_dict', dict)().items()}
    np.savez(tmp_path / 'vgg.npz', **state)
    opt = {
        'name': 'percep_smoke', 'model_type': 'SRModel', 'is_train': True,
        'num_gpu': 1, 'manual_seed': 0, 'scale': 4,
        'network_g': {'type': 'MSRResNet', 'num_in_ch': 3, 'num_out_ch': 3,
                      'num_feat': 8, 'num_block': 1, 'upscale': 4},
        'path': {'models': str(tmp_path / 'm'),
                 'training_states': str(tmp_path / 's')},
        'train': {'optim_g': {'type': 'Adam', 'lr': 1e-4,
                              'betas': [0.9, 0.99]},
                  'total_iter': 2,
                  'pixel_opt': {'type': 'L1Loss', 'loss_weight': 0.01},
                  'perceptual_opt': {'type': 'PerceptualLoss',
                                     'layer_weights': {'relu2_2': 1.0},
                                     'perceptual_weight': 1.0,
                                     'style_weight': 0.5,
                                     'pretrain_path': str(tmp_path / 'vgg.npz')}},
        'logger': {},
    }
    os.makedirs(opt['path']['models'])
    os.makedirs(opt['path']['training_states'])
    model = build_model(opt)
    rng = np.random.default_rng(0)
    model.feed_data({'lq': rng.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32),
                     'gt': rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)})
    model.optimize_parameters(1)
    for k in ('l_pix', 'l_percep', 'l_style'):
        assert np.isfinite(model.log_dict[k]), (k, model.log_dict)


def test_psnr_loss_per_image_log_and_to_y():
    """PSNRLoss: scale * mean(log(per-image MSE)) — NOT log of the global
    mean (Jensen gap) — with optional BT.601 Y conversion."""
    import math
    import numpy as np
    import jax.numpy as jnp
    from bsvd_tpu.losses.losses import PSNRLoss

    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0, 1, (3, 4, 5, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (3, 4, 5, 3)), jnp.float32)

    scale = 10 / math.log(10)
    mse = np.square(np.asarray(pred) - np.asarray(tgt)).mean(axis=(1, 2, 3))
    expect = scale * np.mean(np.log(mse + 1e-8))
    got = float(PSNRLoss()(pred, tgt))
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # per-image-log differs from global-log for unequal MSEs
    assert abs(got - scale * math.log(mse.mean() + 1e-8)) > 1e-6

    coef = np.array([65.481, 128.553, 24.966])
    def y(x):
        return ((np.asarray(x) * coef).sum(-1, keepdims=True) + 16.) / 255.
    ymse = np.square(y(pred) - y(tgt)).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(float(PSNRLoss(to_y=True)(pred, tgt)),
                               scale * np.mean(np.log(ymse + 1e-8)), rtol=1e-5)

    # NCHW layout supported too
    p4 = jnp.transpose(pred, (0, 3, 1, 2))
    t4 = jnp.transpose(tgt, (0, 3, 1, 2))
    np.testing.assert_allclose(float(PSNRLoss(to_y=True)(p4, t4)),
                               scale * np.mean(np.log(ymse + 1e-8)), rtol=1e-5)

    # NTCHW video: channels live at axis 2 — with T == 3 the time axis must
    # NOT be mistaken for RGB (the mix would run across frames)
    p5 = jnp.stack([p4, p4 * 0.5, p4 * 0.25], axis=1)   # (N, T=3, C=3, H, W)
    t5 = jnp.stack([t4, t4 * 0.5, t4 * 0.25], axis=1)
    # Y of scaled RGB: coef linear part scales, +16 offset does not
    def y5(x, s):
        return ((np.asarray(x) * coef).sum(-1, keepdims=True) * s + 16.) / 255.
    ymse5 = np.stack(
        [np.square(y5(pred, s) - y5(tgt, s)).mean(axis=(1, 2, 3))
         for s in (1., .5, .25)], axis=1).mean(axis=1)
    np.testing.assert_allclose(float(PSNRLoss(to_y=True)(p5, t5)),
                               scale * np.mean(np.log(ymse5 + 1e-8)),
                               rtol=1e-5)

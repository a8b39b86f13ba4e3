"""LPIPS perceptual distance (VGG16 backbone), TPU-native
(replaces the external ``lpips`` package the reference's
BasicSR/scripts/metrics/calculate_lpips.py:9-13 depends on).

Pipeline (Zhang et al. 2018, the `lpips` package's `LPIPS(net='vgg')`):
ScalingLayer -> vgg16 features at relu{1_2,2_2,3_3,4_3,5_3} ->
channel-unit-normalize -> squared diff -> learned non-negative 1x1 conv
head per layer -> spatial mean -> sum over layers.

Weights are external (no egress): point ``BSVD_LPIPS_PRETRAIN_PATH`` at the
lpips package's ``vgg.pth`` (the per-layer linear heads) and
``BSVD_VGG16_PRETRAIN_PATH`` at torchvision's ``vgg16-397923af.pth``.
Random-weight mode keeps the full math path testable.
"""

import os

import jax
import jax.numpy as jnp

from bsvd_tpu.archs.vgg_arch import (convert_torchvision_vgg,
                                     vgg_feature_apply, vgg_feature_init)

LPIPS_PRETRAIN_PATH = os.environ.get(
    'BSVD_LPIPS_PRETRAIN_PATH', 'experiments/pretrained_models/lpips_vgg.pth')
VGG16_PRETRAIN_PATH = os.environ.get(
    'BSVD_VGG16_PRETRAIN_PATH',
    'experiments/pretrained_models/vgg16-397923af.pth')

_LAYERS = ('relu1_2', 'relu2_2', 'relu3_3', 'relu4_3', 'relu5_3')
_CHNS = (64, 128, 256, 512, 512)
# the lpips package's ScalingLayer constants ([-1, 1] input domain)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def lpips_init(key, dtype=jnp.float32):
    """Random-weight LPIPS params: {'vgg': ..., 'lins': [(1,1,C,1) convs]}."""
    kv, kl = jax.random.split(key)
    vgg = vgg_feature_init(kv, list(_LAYERS), 'vgg16')
    lins = []
    for c in _CHNS:
        kl, sub = jax.random.split(kl)
        lins.append(jax.random.uniform(sub, (1, 1, c, 1), dtype, 0.0, 0.1))
    return {'vgg': vgg, 'lins': lins}


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_apply(params, x0, x1):
    """LPIPS distance per sample. x0, x1: (N, H, W, 3) RGB in [-1, 1]."""
    dists = None
    feats = []
    for x in (x0, x1):
        x = (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)
        feats.append(vgg_feature_apply(params['vgg'], x, list(_LAYERS),
                                       'vgg16', use_input_norm=False))
    for layer, lin in zip(_LAYERS, params['lins']):
        d = (_unit_normalize(feats[0][layer])
             - _unit_normalize(feats[1][layer])) ** 2
        # non-negative 1x1 head (the lpips package clamps at load; we clamp
        # at apply so random-weight tests keep d >= 0)
        val = jnp.einsum('nhwc,co->nhwo', d,
                         jnp.maximum(lin, 0.0)[0, 0]).mean(axis=(1, 2, 3))
        dists = val if dists is None else dists + val
    return dists


def load_lpips(pretrain_path=None, vgg_path=None):
    """(params, jitted distance fn) from external weights (see module
    docstring); raises FileNotFoundError with instructions if absent."""
    import numpy as np
    lin_path = pretrain_path or LPIPS_PRETRAIN_PATH
    backbone = vgg_path or VGG16_PRETRAIN_PATH
    for p, what in ((lin_path, 'lpips vgg.pth'), (backbone,
                                                  'vgg16-397923af.pth')):
        if not os.path.exists(p):
            raise FileNotFoundError(
                f'{what} not found at {p}; set BSVD_LPIPS_PRETRAIN_PATH / '
                'BSVD_VGG16_PRETRAIN_PATH (no bundled weights, no egress)')
    import torch
    vgg_state = {k: v.numpy() for k, v in
                 torch.load(backbone, map_location='cpu').items()}
    vgg = convert_torchvision_vgg(vgg_state, 'vgg16')
    lin_state = torch.load(lin_path, map_location='cpu')
    lins = []
    for i, c in enumerate(_CHNS):
        w = np.asarray(lin_state[f'lin{i}.model.1.weight'])  # (1, C, 1, 1)
        lins.append(jnp.asarray(w.transpose(2, 3, 1, 0)))    # -> (1, 1, C, 1)
    params = {'vgg': vgg, 'lins': lins}
    return params, jax.jit(lpips_apply)

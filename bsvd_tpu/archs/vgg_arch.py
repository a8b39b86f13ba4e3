"""VGG feature extractor for perceptual/style losses
(reference: BasicSR/basicsr/archs/vgg_arch.py:9-153).

Pretrained torchvision weights are NOT bundled (no egress); point
``BSVD_VGG_PRETRAIN_PATH`` (or the ``pretrain_path`` opt) at a torchvision
``vgg19-dcbb9e9d.pth``-style state dict to get reference-parity features.
Conversion is layout-only: torchvision ``features.<idx>.weight`` OIHW ->
name-keyed HWIO trees (the sequential index of every conv/bn is derived
from the layer-name table, which mirrors torchvision's module order).
"""

import os

import jax
import jax.numpy as jnp

from bsvd_tpu.nn.layers import conv2d, conv_init
from bsvd_tpu.utils.registry import ARCH_REGISTRY

VGG_PRETRAIN_PATH = os.environ.get(
    'BSVD_VGG_PRETRAIN_PATH',
    'experiments/pretrained_models/vgg19-dcbb9e9d.pth')

# layer-name tables mirroring torchvision's Sequential order
# (reference vgg_arch.py:10-34)
NAMES = {
    'vgg11': [
        'conv1_1', 'relu1_1', 'pool1', 'conv2_1', 'relu2_1', 'pool2',
        'conv3_1', 'relu3_1', 'conv3_2', 'relu3_2', 'pool3', 'conv4_1',
        'relu4_1', 'conv4_2', 'relu4_2', 'pool4', 'conv5_1', 'relu5_1',
        'conv5_2', 'relu5_2', 'pool5'
    ],
    'vgg13': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'pool3', 'conv4_1', 'relu4_1', 'conv4_2',
        'relu4_2', 'pool4', 'conv5_1', 'relu5_1', 'conv5_2', 'relu5_2',
        'pool5'
    ],
    'vgg16': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'conv3_3', 'relu3_3', 'pool3', 'conv4_1',
        'relu4_1', 'conv4_2', 'relu4_2', 'conv4_3', 'relu4_3', 'pool4',
        'conv5_1', 'relu5_1', 'conv5_2', 'relu5_2', 'conv5_3', 'relu5_3',
        'pool5'
    ],
    'vgg19': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'conv3_3', 'relu3_3', 'conv3_4', 'relu3_4',
        'pool3', 'conv4_1', 'relu4_1', 'conv4_2', 'relu4_2', 'conv4_3',
        'relu4_3', 'conv4_4', 'relu4_4', 'pool4', 'conv5_1', 'relu5_1',
        'conv5_2', 'relu5_2', 'conv5_3', 'relu5_3', 'conv5_4', 'relu5_4',
        'pool5'
    ]
}

# ImageNet normalization for [0, 1] inputs (reference vgg_arch.py:135-139)
_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def insert_bn(names):
    """Insert a bn layer after each conv (reference vgg_arch.py:37-52)."""
    out = []
    for name in names:
        out.append(name)
        if 'conv' in name:
            out.append('bn' + name.replace('conv', ''))
    return out


def _conv_channels(name, prev):
    block = int(name[4])
    return min(64 * 2 ** (block - 1), 512), prev


def vgg_names(vgg_type='vgg19'):
    names = NAMES[vgg_type.replace('_bn', '')]
    return insert_bn(names) if 'bn' in vgg_type else list(names)


def vgg_feature_init(key, layer_name_list, vgg_type='vgg19'):
    """Random-init params for the truncated VGG (layers up to the deepest
    requested one). Load real torchvision weights via
    ``convert_torchvision_vgg`` for reference-parity features."""
    names = vgg_names(vgg_type)
    max_idx = max(names.index(v) for v in layer_name_list)
    params = {}
    cin = 3
    for name in names[:max_idx + 1]:
        if name.startswith('conv'):
            cout, _ = _conv_channels(name, cin)
            key, sub = jax.random.split(key)
            params[name] = conv_init(sub, cin, cout, 3, True)
            cin = cout
        elif name.startswith('bn'):
            params[name] = {'scale': jnp.ones((cin,)),
                            'bias': jnp.zeros((cin,)),
                            'mean': jnp.zeros((cin,)),
                            'var': jnp.ones((cin,))}
    return params


def _max_pool(x, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, stride, stride, 1),
        'VALID')


def vgg_feature_apply(params, x, layer_name_list, vgg_type='vgg19',
                      use_input_norm=True, range_norm=False,
                      remove_pooling=False, pooling_stride=2):
    """x: (N, H, W, C) in [0, 1] (or [-1, 1] with range_norm) -> dict of
    NHWC features keyed by layer name (reference vgg_arch.py:141-163)."""
    if range_norm:
        x = (x + 1) / 2
    if use_input_norm:
        x = (x - jnp.asarray(_MEAN, x.dtype)) / jnp.asarray(_STD, x.dtype)
    names = vgg_names(vgg_type)
    max_idx = max(names.index(v) for v in layer_name_list)
    out = {}
    for name in names[:max_idx + 1]:
        if name.startswith('conv'):
            x = conv2d(params[name], x, padding=1)
        elif name.startswith('bn'):
            p = params[name]
            x = (x - p['mean']) / jnp.sqrt(p['var'] + 1e-5)
            x = x * p['scale'] + p['bias']
        elif name.startswith('relu'):
            x = jax.nn.relu(x)
        elif name.startswith('pool'):
            if remove_pooling:
                continue
            x = _max_pool(x, pooling_stride)
        if name in layer_name_list:
            out[name] = x
    return out


def convert_torchvision_vgg(state_dict, vgg_type='vgg19'):
    """Map a torchvision VGG ``features.<idx>.*`` state dict (numpy arrays)
    onto the name-keyed tree this module consumes."""
    names = vgg_names(vgg_type)
    params = {}
    for idx, name in enumerate(names):
        if f'features.{idx}.weight' not in state_dict:
            continue          # truncated checkpoint: deeper layers absent
        if name.startswith('conv'):
            w = state_dict[f'features.{idx}.weight']
            params[name] = {'w': jnp.asarray(w).transpose(2, 3, 1, 0),
                            'b': jnp.asarray(state_dict[f'features.{idx}.bias'])}
        elif name.startswith('bn'):
            params[name] = {
                'scale': jnp.asarray(state_dict[f'features.{idx}.weight']),
                'bias': jnp.asarray(state_dict[f'features.{idx}.bias']),
                'mean': jnp.asarray(state_dict[f'features.{idx}.running_mean']),
                'var': jnp.asarray(state_dict[f'features.{idx}.running_var']),
            }
    return params


@ARCH_REGISTRY.register()
class VGGFeatureExtractor:
    """NCHW wrapper (reference vgg_arch.py:56-163). Loads torchvision
    weights from ``pretrain_path`` (default: BSVD_VGG_PRETRAIN_PATH env /
    the reference's experiments path); random init otherwise."""

    def __init__(self, layer_name_list, vgg_type='vgg19',
                 use_input_norm=True, range_norm=False, requires_grad=False,
                 remove_pooling=False, pooling_stride=2, seed=0,
                 pretrain_path=None):
        del requires_grad  # params are explicit; the caller decides grads
        self.layer_name_list = list(layer_name_list)
        self.vgg_type = vgg_type
        self.use_input_norm = use_input_norm
        self.range_norm = range_norm
        self.remove_pooling = remove_pooling
        self.pooling_stride = pooling_stride
        self.pretrained = False
        path = pretrain_path or VGG_PRETRAIN_PATH
        if os.path.exists(path):
            self.params = self.load(path)
            self.pretrained = True
        else:
            self.params = vgg_feature_init(
                jax.random.PRNGKey(seed), self.layer_name_list, vgg_type)

    def load(self, path):
        import numpy as np
        if str(path).endswith('.npz'):
            with np.load(path) as z:
                state = {k: z[k] for k in z.files}
        else:
            import torch
            ckpt = torch.load(path, map_location='cpu', weights_only=True)
            state = {k: v.numpy() for k, v in ckpt.items()}
        return convert_torchvision_vgg(state, self.vgg_type)

    def apply(self, params, x_nchw):
        feats = vgg_feature_apply(
            params, jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1)),
            self.layer_name_list, self.vgg_type, self.use_input_norm,
            self.range_norm, self.remove_pooling, self.pooling_stride)
        return {k: jnp.transpose(v, (0, 3, 1, 2)) for k, v in feats.items()}

    def __call__(self, x):
        return self.apply(self.params, x)

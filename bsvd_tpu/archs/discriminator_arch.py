"""Discriminators for GAN training, functional
(reference: BasicSR/basicsr/archs/discriminator_arch.py VGGStyleDiscriminator
128/256 with BatchNorm, and UNetDiscriminatorSN with spectral norm).

Stateful bits are explicit:
- BatchNorm: train mode normalizes by batch stats and returns the batch
  (mean, var) pairs so the engine can update the running stats outside the
  gradient; eval mode uses the stored running stats.
- Spectral norm: each conv carries a persistent power-iteration vector 'u';
  apply returns the updated u alongside the output.
"""

import jax
import jax.numpy as jnp

from bsvd_tpu.nn.layers import conv2d, conv_init
from bsvd_tpu.utils.registry import ARCH_REGISTRY


def lrelu2(x):
    return jnp.where(x >= 0, x, 0.2 * x)


# ---------------------------------------------------------------------------
# BatchNorm (affine, running stats)
# ---------------------------------------------------------------------------

def bn_init(ch):
    return {'scale': jnp.ones((ch,)), 'bias': jnp.zeros((ch,)),
            'mean': jnp.zeros((ch,)), 'var': jnp.ones((ch,))}


def bn_apply(p, x, train, eps=1e-5):
    """Returns (y, (batch_mean, batch_var) or None)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        stats = (mean, var)
    else:
        mean, var = p['mean'], p['var']
        stats = None
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p['scale'] + p['bias']
    return y, stats


def bn_update_running(p, stats, momentum=0.1, n=None):
    """torch-style running-stat update (unbiased var when n is given)."""
    mean, var = stats
    if n is not None and n > 1:
        var = var * n / (n - 1)
    return dict(p, mean=(1 - momentum) * p['mean'] + momentum * mean,
                var=(1 - momentum) * p['var'] + momentum * var)


# ---------------------------------------------------------------------------
# VGG-style discriminator (BN)
# ---------------------------------------------------------------------------

_VGG_D_LAYERS = [
    # (name, cin_mult|'in', cout_mult, kernel, stride, bias, bn)
    ('conv0_0', 'in', 1, 3, 1, True, False),
    ('conv0_1', 1, 1, 4, 2, False, True),
    ('conv1_0', 1, 2, 3, 1, False, True),
    ('conv1_1', 2, 2, 4, 2, False, True),
    ('conv2_0', 2, 4, 3, 1, False, True),
    ('conv2_1', 4, 4, 4, 2, False, True),
    ('conv3_0', 4, 8, 3, 1, False, True),
    ('conv3_1', 8, 8, 4, 2, False, True),
    ('conv4_0', 8, 8, 3, 1, False, True),
    ('conv4_1', 8, 8, 4, 2, False, True),
]

_EXTRA_256 = [
    ('conv5_0', 8, 8, 3, 1, False, True),
    ('conv5_1', 8, 8, 4, 2, False, True),
]


def _linear_init(key, din, dout):
    kw, kb = jax.random.split(key)
    bound = 1 / jnp.sqrt(din)
    return {'w': jax.random.uniform(kw, (din, dout), jnp.float32, -bound, bound),
            'b': jax.random.uniform(kb, (dout,), jnp.float32, -bound, bound)}


def vgg_discriminator_init(key, num_in_ch=3, num_feat=64, input_size=128):
    layers = _VGG_D_LAYERS + (_EXTRA_256 if input_size == 256 else [])
    keys = jax.random.split(key, len(layers) + 2)
    p = {}
    for i, (name, cin_m, cout_m, k, s, bias, bn) in enumerate(layers):
        cin = num_in_ch if cin_m == 'in' else num_feat * cin_m
        p[name] = conv_init(keys[i], cin, num_feat * cout_m, k, bias)
        if bn:
            p['bn' + name[4:]] = bn_init(num_feat * cout_m)
    p['linear1'] = _linear_init(keys[-2], num_feat * 8 * 4 * 4, 100)
    p['linear2'] = _linear_init(keys[-1], 100, 1)
    return p


def vgg_discriminator_apply(p, x, num_in_ch=3, input_size=128, train=False):
    """x: (N, H, W, C) with H=W=input_size -> ((N, 1) logits, bn_stats dict)."""
    assert x.shape[1] == input_size and x.shape[2] == input_size, (
        f'Input spatial size must be {input_size}x{input_size}, got {x.shape}')
    layers = _VGG_D_LAYERS + (_EXTRA_256 if input_size == 256 else [])
    stats = {}
    feat = x
    for name, cin_m, cout_m, k, s, bias, bn in layers:
        pad = 1
        feat = conv2d(p[name], feat, stride=s, padding=pad)
        if bn:
            bn_name = 'bn' + name[4:]
            feat, st = bn_apply(p[bn_name], feat, train)
            if st is not None:
                stats[bn_name] = st
        feat = lrelu2(feat)
    n = feat.shape[0]
    # torch flatten order: (C, H, W) channel-major
    feat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(n, -1)
    feat = lrelu2(feat @ p['linear1']['w'] + p['linear1']['b'])
    out = feat @ p['linear2']['w'] + p['linear2']['b']
    return out, stats


# ---------------------------------------------------------------------------
# U-Net discriminator with spectral norm
# ---------------------------------------------------------------------------

def _sn_conv_init(key, cin, cout, k, bias=True):
    ku, kc = jax.random.split(key)
    p = conv_init(kc, cin, cout, k, bias)
    p['u'] = jax.random.normal(ku, (cout,))
    return p


def _sn_conv_apply(p, x, stride=1, padding=1, n_power_iterations=1):
    """Spectral-normalized conv: w / sigma_max(w), sigma estimated by power
    iteration on the (cout, cin*k*k) matrix with persistent u."""
    w = p['w']
    kh, kw, cin, cout = w.shape
    w_mat = w.reshape(-1, cout).T                      # (cout, cin*k*k)
    u = p['u']
    v = None
    for _ in range(n_power_iterations):
        v = w_mat.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w_mat @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ w_mat @ v
    pn = {'w': w / sigma}
    if 'b' in p:
        pn['b'] = p['b']
    y = conv2d(pn, x, stride=stride, padding=padding)
    return y, u


def unet_discriminator_sn_init(key, num_in_ch=3, num_feat=64, skip_connection=True):
    del skip_connection
    keys = jax.random.split(key, 10)
    return {
        'conv0': conv_init(keys[0], num_in_ch, num_feat, 3, True),
        'conv1': _sn_conv_init(keys[1], num_feat, num_feat * 2, 4, False),
        'conv2': _sn_conv_init(keys[2], num_feat * 2, num_feat * 4, 4, False),
        'conv3': _sn_conv_init(keys[3], num_feat * 4, num_feat * 8, 4, False),
        'conv4': _sn_conv_init(keys[4], num_feat * 8, num_feat * 4, 3, False),
        'conv5': _sn_conv_init(keys[5], num_feat * 4, num_feat * 2, 3, False),
        'conv6': _sn_conv_init(keys[6], num_feat * 2, num_feat, 3, False),
        'conv7': _sn_conv_init(keys[7], num_feat, num_feat, 3, False),
        'conv8': _sn_conv_init(keys[8], num_feat, num_feat, 3, False),
        'conv9': conv_init(keys[9], num_feat, 1, 3, True),
    }


def unet_discriminator_sn_apply(p, x, skip_connection=True):
    """(N, H, W, C) -> ((N, H, W, 1) patch logits, new_u dict)."""
    from bsvd_tpu.nn.warp import interpolate_bilinear
    us = {}

    def sn(name, h, stride=1):
        y, u = _sn_conv_apply(p[name], h, stride=stride)
        us[name] = u
        return y

    x0 = lrelu2(conv2d(p['conv0'], x))
    x1 = lrelu2(sn('conv1', x0, 2))
    x2 = lrelu2(sn('conv2', x1, 2))
    x3 = lrelu2(sn('conv3', x2, 2))

    x3u = interpolate_bilinear(x3, x3.shape[1] * 2, x3.shape[2] * 2)
    x4 = lrelu2(sn('conv4', x3u))
    if skip_connection:
        x4 = x4 + x2
    x4u = interpolate_bilinear(x4, x4.shape[1] * 2, x4.shape[2] * 2)
    x5 = lrelu2(sn('conv5', x4u))
    if skip_connection:
        x5 = x5 + x1
    x5u = interpolate_bilinear(x5, x5.shape[1] * 2, x5.shape[2] * 2)
    x6 = lrelu2(sn('conv6', x5u))
    if skip_connection:
        x6 = x6 + x0

    out = lrelu2(sn('conv7', x6))
    out = lrelu2(sn('conv8', out))
    out = conv2d(p['conv9'], out)
    return out, us


# ---------------------------------------------------------------------------
# registered wrappers (NCHW IO)
# ---------------------------------------------------------------------------

class _DiscBase:
    def __init__(self, num_in_ch=3, num_feat=64, seed=0, **opt):
        self.num_in_ch = num_in_ch
        self.num_feat = num_feat
        self.opt = opt
        self.params = self._init(jax.random.PRNGKey(seed))

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator128(_DiscBase):
    input_size = 128

    def _init(self, key):
        return vgg_discriminator_init(key, self.num_in_ch, self.num_feat,
                                      self.input_size)

    def apply(self, params, x_nchw, train=False):
        x = jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))
        return vgg_discriminator_apply(params, x, self.num_in_ch,
                                       self.input_size, train)

    def __call__(self, x):
        return self.apply(self.params, x)[0]


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator256(VGGStyleDiscriminator128):
    input_size = 256


@ARCH_REGISTRY.register()
class UNetDiscriminatorSN(_DiscBase):
    def _init(self, key):
        return unet_discriminator_sn_init(key, self.num_in_ch, self.num_feat,
                                          self.opt.get('skip_connection', True))

    def apply(self, params, x_nchw, train=False):
        del train
        x = jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))
        out, us = unet_discriminator_sn_apply(
            params, x, self.opt.get('skip_connection', True))
        return jnp.transpose(out, (0, 3, 1, 2)), us

    def __call__(self, x):
        return self.apply(self.params, x)[0]

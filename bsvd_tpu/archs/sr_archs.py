"""Single-image SR model zoo, TPU-native functional style
(reference: BasicSR/basicsr/archs/{srresnet,edsr,rrdbnet}_arch.py +
arch_util.py ResidualBlockNoBN/Upsample/pixel_unshuffle).

Param trees mirror the torch module names (``body.0.conv1`` ->
params['body']['0']['conv1']) so reference checkpoints convert via the
generic key mapper (bsvd_tpu/convert/torch_generic.py). IO is NHWC
internally; the registered wrappers accept the reference's NCHW."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from bsvd_tpu.nn.layers import conv2d, conv_init, pixel_shuffle
from bsvd_tpu.utils.registry import ARCH_REGISTRY


def lrelu(x, slope=0.1):
    return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))


def bilinear_resize(x, scale):
    """torch F.interpolate(mode='bilinear', align_corners=False) on NHWC."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * scale, w * scale, c), method='bilinear')


def nearest_up(x, scale=2):
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def pixel_unshuffle(x, scale):
    """Inverse pixel shuffle with torch channel ordering, NHWC."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // scale, scale, w // scale, scale, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(n, h // scale, w // scale, c * scale * scale)


def _scaled_conv_init(key, cin, cout, scale=0.1):
    p = conv_init(key, cin, cout, 3, True)
    return {'w': p['w'] * scale, 'b': jnp.zeros_like(p['b'])}


# ---------------------------------------------------------------------------
# ResidualBlockNoBN
# ---------------------------------------------------------------------------

def res_block_init(key, num_feat, pytorch_init=False):
    k1, k2 = jax.random.split(key)
    if pytorch_init:
        # torch default conv init: kaiming_uniform(a=sqrt(5)) ~= uniform bound
        def t_init(k, cin, cout):
            kw, kb = jax.random.split(k)
            fan_in = cin * 9
            bound = math.sqrt(6.0 / ((1 + 5) * fan_in))
            w = jax.random.uniform(kw, (3, 3, cin, cout), jnp.float32,
                                   -bound, bound)
            bb = 1 / math.sqrt(fan_in)
            b = jax.random.uniform(kb, (cout,), jnp.float32, -bb, bb)
            return {'w': w, 'b': b}
        return {'conv1': t_init(k1, num_feat, num_feat),
                'conv2': t_init(k2, num_feat, num_feat)}
    return {'conv1': _scaled_conv_init(k1, num_feat, num_feat),
            'conv2': _scaled_conv_init(k2, num_feat, num_feat)}


def res_block_apply(p, x, res_scale=1.0):
    out = conv2d(p['conv2'], jnp.maximum(conv2d(p['conv1'], x), 0))
    return x + out * res_scale


# ---------------------------------------------------------------------------
# MSRResNet (srresnet_arch.py:9-67)
# ---------------------------------------------------------------------------

def msrresnet_init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_block=16,
                   upscale=4):
    keys = jax.random.split(key, num_block + 5)
    p = {'conv_first': _scaled_conv_init(keys[0], num_in_ch, num_feat),
         'body': {str(i): res_block_init(keys[1 + i], num_feat)
                  for i in range(num_block)}}
    k = keys[num_block + 1:]
    if upscale in (2, 3):
        p['upconv1'] = _scaled_conv_init(k[0], num_feat, num_feat * upscale**2)
    else:
        p['upconv1'] = _scaled_conv_init(k[0], num_feat, num_feat * 4)
        p['upconv2'] = _scaled_conv_init(k[1], num_feat, num_feat * 4)
    p['conv_hr'] = _scaled_conv_init(k[2], num_feat, num_feat)
    p['conv_last'] = _scaled_conv_init(k[3], num_feat, num_out_ch)
    return p


def msrresnet_apply(p, x, upscale=4):
    feat = lrelu(conv2d(p['conv_first'], x))
    out = feat
    for i in range(len(p['body'])):
        out = res_block_apply(p['body'][str(i)], out)
    if upscale == 4:
        out = lrelu(pixel_shuffle(conv2d(p['upconv1'], out), 2))
        out = lrelu(pixel_shuffle(conv2d(p['upconv2'], out), 2))
    else:
        out = lrelu(pixel_shuffle(conv2d(p['upconv1'], out), upscale))
    out = conv2d(p['conv_last'], lrelu(conv2d(p['conv_hr'], out)))
    return out + bilinear_resize(x, upscale)


# ---------------------------------------------------------------------------
# EDSR (edsr_arch.py:9-61)
# ---------------------------------------------------------------------------

def _upsample_init(key, scale, num_feat):
    p = {}
    keys = jax.random.split(key, 8)
    idx = 0
    if (scale & (scale - 1)) == 0:
        for i in range(int(math.log2(scale))):
            p[str(2 * i)] = conv_init(keys[idx], num_feat, 4 * num_feat, 3, True)
            idx += 1
    elif scale == 3:
        p['0'] = conv_init(keys[0], num_feat, 9 * num_feat, 3, True)
    else:
        raise ValueError(f'scale {scale} not supported (2^n and 3)')
    return p


def _upsample_apply(p, x, scale):
    if (scale & (scale - 1)) == 0:
        for i in range(int(math.log2(scale))):
            x = pixel_shuffle(conv2d(p[str(2 * i)], x), 2)
    else:
        x = pixel_shuffle(conv2d(p['0'], x), 3)
    return x


def edsr_init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_block=16,
              upscale=4):
    keys = jax.random.split(key, num_block + 4)
    return {
        'conv_first': conv_init(keys[0], num_in_ch, num_feat, 3, True),
        'body': {str(i): res_block_init(keys[1 + i], num_feat, pytorch_init=True)
                 for i in range(num_block)},
        'conv_after_body': conv_init(keys[num_block + 1], num_feat, num_feat, 3, True),
        'upsample': _upsample_init(keys[num_block + 2], upscale, num_feat),
        'conv_last': conv_init(keys[num_block + 3], num_feat, num_out_ch, 3, True),
    }


def edsr_apply(p, x, upscale=4, res_scale=1.0, img_range=255.,
               rgb_mean=(0.4488, 0.4371, 0.4040)):
    mean = jnp.asarray(rgb_mean, x.dtype).reshape(1, 1, 1, 3)
    x = (x - mean) * img_range
    feat = conv2d(p['conv_first'], x)
    res = feat
    for i in range(len(p['body'])):
        res = res_block_apply(p['body'][str(i)], res, res_scale)
    res = conv2d(p['conv_after_body'], res) + feat
    out = conv2d(p['conv_last'], _upsample_apply(p['upsample'], res, upscale))
    return out / img_range + mean


# ---------------------------------------------------------------------------
# RRDBNet / ESRGAN (rrdbnet_arch.py:9-121)
# ---------------------------------------------------------------------------

def _rdb_init(key, num_feat, num_grow_ch):
    keys = jax.random.split(key, 5)
    chans = [num_feat + i * num_grow_ch for i in range(5)]
    p = {}
    for i in range(4):
        p[f'conv{i + 1}'] = _scaled_conv_init(keys[i], chans[i], num_grow_ch)
    p['conv5'] = _scaled_conv_init(keys[4], chans[4], num_feat)
    return p


def _rdb_apply(p, x):
    feats = [x]
    for i in range(4):
        cat = jnp.concatenate(feats, axis=-1)
        feats.append(lrelu(conv2d(p[f'conv{i + 1}'], cat), 0.2))
    x5 = conv2d(p['conv5'], jnp.concatenate(feats, axis=-1))
    return x5 * 0.2 + x


def _rrdb_init(key, num_feat, num_grow_ch):
    k1, k2, k3 = jax.random.split(key, 3)
    return {'rdb1': _rdb_init(k1, num_feat, num_grow_ch),
            'rdb2': _rdb_init(k2, num_feat, num_grow_ch),
            'rdb3': _rdb_init(k3, num_feat, num_grow_ch)}


def _rrdb_apply(p, x):
    out = _rdb_apply(p['rdb1'], x)
    out = _rdb_apply(p['rdb2'], out)
    out = _rdb_apply(p['rdb3'], out)
    return out * 0.2 + x


def rrdbnet_init(key, num_in_ch=3, num_out_ch=3, scale=4, num_feat=64,
                 num_block=23, num_grow_ch=32):
    if scale == 2:
        num_in_ch *= 4
    elif scale == 1:
        num_in_ch *= 16
    keys = jax.random.split(key, num_block + 7)
    p = {'conv_first': conv_init(keys[0], num_in_ch, num_feat, 3, True),
         'body': {str(i): _rrdb_init(keys[1 + i], num_feat, num_grow_ch)
                  for i in range(num_block)}}
    k = keys[num_block + 1:]
    for i, name in enumerate(('conv_body', 'conv_up1', 'conv_up2', 'conv_hr')):
        p[name] = conv_init(k[i], num_feat, num_feat, 3, True)
    p['conv_last'] = conv_init(k[4], num_feat, num_out_ch, 3, True)
    return p


def rrdbnet_apply(p, x, scale=4):
    if scale == 2:
        feat = pixel_unshuffle(x, 2)
    elif scale == 1:
        feat = pixel_unshuffle(x, 4)
    else:
        feat = x
    feat = conv2d(p['conv_first'], feat)
    body = feat
    for i in range(len(p['body'])):
        body = _rrdb_apply(p['body'][str(i)], body)
    feat = feat + conv2d(p['conv_body'], body)
    feat = lrelu(conv2d(p['conv_up1'], nearest_up(feat, 2)), 0.2)
    feat = lrelu(conv2d(p['conv_up2'], nearest_up(feat, 2)), 0.2)
    return conv2d(p['conv_last'], lrelu(conv2d(p['conv_hr'], feat), 0.2))


# ---------------------------------------------------------------------------
# registered wrappers (NCHW IO, reference option names)
# ---------------------------------------------------------------------------

class _SRArchBase:
    init_fn = None
    apply_fn = None

    def __init__(self, seed=0, param_dtype=jnp.float32, **opt):
        self.opt = opt
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            type(self).init_fn(jax.random.PRNGKey(seed), **self._init_kwargs()))

    def _init_kwargs(self):
        return self.opt

    def _apply_kwargs(self):
        return {}

    def apply(self, params, x):
        """Pure forward: x (N, C, H, W) -> (N, C_out, sH, sW) with explicit
        params (for jitted train steps)."""
        xh = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
        y = type(self).apply_fn(params, xh, **self._apply_kwargs())
        return jnp.transpose(y, (0, 3, 1, 2))

    def __call__(self, x):
        """x: (N, C, H, W) -> (N, C_out, H*scale, W*scale)."""
        return self.apply(self.params, x)

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self


@ARCH_REGISTRY.register()
class MSRResNet(_SRArchBase):
    init_fn = staticmethod(msrresnet_init)
    apply_fn = staticmethod(msrresnet_apply)

    def _apply_kwargs(self):
        return {'upscale': self.opt.get('upscale', 4)}


@ARCH_REGISTRY.register()
class EDSR(_SRArchBase):
    init_fn = staticmethod(edsr_init)
    apply_fn = staticmethod(edsr_apply)

    def _init_kwargs(self):
        o = dict(self.opt)
        o.pop('res_scale', None)
        o.pop('img_range', None)
        o.pop('rgb_mean', None)
        return o

    def _apply_kwargs(self):
        return {'upscale': self.opt.get('upscale', 4),
                'res_scale': self.opt.get('res_scale', 1),
                'img_range': self.opt.get('img_range', 255.),
                'rgb_mean': tuple(self.opt.get('rgb_mean',
                                               (0.4488, 0.4371, 0.4040)))}


@ARCH_REGISTRY.register()
class RRDBNet(_SRArchBase):
    init_fn = staticmethod(rrdbnet_init)
    apply_fn = staticmethod(rrdbnet_apply)

    def _apply_kwargs(self):
        return {'scale': self.opt.get('scale', 4)}


# ---------------------------------------------------------------------------
# RCAN (rcan_arch.py:8-133): residual groups of channel-attention blocks
# ---------------------------------------------------------------------------

def _ca_init(key, num_feat, squeeze):
    k1, k2 = jax.random.split(key)
    return {'attention': {
        '1': conv_init(k1, num_feat, num_feat // squeeze, 1, True),
        '3': conv_init(k2, num_feat // squeeze, num_feat, 1, True)}}


def _ca_apply(p, x):
    y = jnp.mean(x, axis=(-3, -2), keepdims=True)       # global avg pool
    y = jnp.maximum(conv2d(p['attention']['1'], y, padding=0), 0)
    y = jax.nn.sigmoid(conv2d(p['attention']['3'], y, padding=0))
    return x * y


def _rcab_init(key, num_feat, squeeze):
    k1, k2, k3 = jax.random.split(key, 3)
    return {'rcab': {'0': conv_init(k1, num_feat, num_feat, 3, True),
                     '2': conv_init(k2, num_feat, num_feat, 3, True),
                     '3': _ca_init(k3, num_feat, squeeze)}}


def _rcab_apply(p, x, res_scale=1.0):
    res = conv2d(p['rcab']['2'], jnp.maximum(conv2d(p['rcab']['0'], x), 0))
    res = _ca_apply(p['rcab']['3'], res) * res_scale
    return res + x


def rcan_init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_group=10,
              num_block=16, squeeze_factor=16, upscale=4):
    keys = jax.random.split(key, num_group + 4)
    body = {}
    for g in range(num_group):
        kg = jax.random.split(keys[g], num_block + 1)
        body[str(g)] = {
            'residual_group': {str(b): _rcab_init(kg[b], num_feat, squeeze_factor)
                               for b in range(num_block)},
            'conv': conv_init(kg[num_block], num_feat, num_feat, 3, True)}
    return {
        'conv_first': conv_init(keys[num_group], num_in_ch, num_feat, 3, True),
        'body': body,
        'conv_after_body': conv_init(keys[num_group + 1], num_feat, num_feat, 3, True),
        'upsample': _upsample_init(keys[num_group + 2], upscale, num_feat),
        'conv_last': conv_init(keys[num_group + 3], num_feat, num_out_ch, 3, True),
    }


def rcan_apply(p, x, upscale=4, res_scale=1.0, img_range=255.,
               rgb_mean=(0.4488, 0.4371, 0.4040)):
    mean = jnp.asarray(rgb_mean, x.dtype).reshape(1, 1, 1, 3)
    x = (x - mean) * img_range
    feat = conv2d(p['conv_first'], x)
    res = feat
    for g in range(len(p['body'])):
        grp = p['body'][str(g)]
        h = res
        for b in range(len(grp['residual_group'])):
            h = _rcab_apply(grp['residual_group'][str(b)], h, res_scale)
        res = conv2d(grp['conv'], h) + res
    res = conv2d(p['conv_after_body'], res) + feat
    out = conv2d(p['conv_last'], _upsample_apply(p['upsample'], res, upscale))
    return out / img_range + mean


@ARCH_REGISTRY.register()
class RCAN(_SRArchBase):
    init_fn = staticmethod(rcan_init)
    apply_fn = staticmethod(rcan_apply)

    def _init_kwargs(self):
        o = dict(self.opt)
        for k in ('res_scale', 'img_range', 'rgb_mean'):
            o.pop(k, None)
        return o

    def _apply_kwargs(self):
        return {'upscale': self.opt.get('upscale', 4),
                'res_scale': self.opt.get('res_scale', 1),
                'img_range': self.opt.get('img_range', 255.),
                'rgb_mean': tuple(self.opt.get('rgb_mean',
                                               (0.4488, 0.4371, 0.4040)))}


# ---------------------------------------------------------------------------
# RIDNet (ridnet_arch.py:8-198): enhancement attention modules (EAM)
# ---------------------------------------------------------------------------

def _mean_shift_params(img_range, rgb_mean, rgb_std, sign=-1):
    std = np.asarray(rgb_std, np.float32)
    w = np.eye(3, dtype=np.float32).reshape(1, 1, 3, 3) / std.reshape(1, 1, 3, 1)
    b = sign * img_range * np.asarray(rgb_mean, np.float32) / std
    return {'w': jnp.asarray(w), 'b': jnp.asarray(b)}


def _eam_init(key, cin, mid, cout):
    keys = jax.random.split(key, 10)
    return {
        'merge': {
            'dilation1': {'0': conv_init(keys[0], cin, mid, 3, True),
                          '2': conv_init(keys[1], mid, mid, 3, True)},
            'dilation2': {'0': conv_init(keys[2], cin, mid, 3, True),
                          '2': conv_init(keys[3], mid, mid, 3, True)},
            'aggregation': {'0': conv_init(keys[4], mid * 2, mid, 3, True)},
        },
        'block1': res_block_init(keys[5], mid, pytorch_init=True),
        'block2': {'body': {'0': conv_init(keys[6], mid, cout, 3, True),
                            '2': conv_init(keys[7], cout, cout, 3, True),
                            '4': conv_init(keys[8], cout, cout, 1, True)}},
        'ca': _ca_init(keys[9], cout, 16),
    }


def _eam_apply(p, x):
    relu = lambda v: jnp.maximum(v, 0)  # noqa: E731
    m = p['merge']
    d1 = relu(conv2d(m['dilation1']['2'],
                     relu(conv2d(m['dilation1']['0'], x)),
                     padding=2, dilation=2))
    d2 = relu(conv2d(m['dilation2']['2'],
                     relu(conv2d(m['dilation2']['0'], x, padding=3, dilation=3)),
                     padding=4, dilation=4))
    out = relu(conv2d(m['aggregation']['0'],
                      jnp.concatenate([d1, d2], axis=-1))) + x
    out = relu(res_block_apply(p['block1'], out))
    b = p['block2']['body']
    eres = conv2d(b['4'], relu(conv2d(b['2'], relu(conv2d(b['0'], out)))),
                  padding=0)
    out = relu(eres + out)
    return _ca_apply(p['ca'], out)


def ridnet_init(key, in_channels=3, mid_channels=64, out_channels=3,
                num_block=4, img_range=255., rgb_mean=(0.4488, 0.4371, 0.4040),
                rgb_std=(1.0, 1.0, 1.0)):
    keys = jax.random.split(key, num_block + 2)
    return {
        'sub_mean': _mean_shift_params(img_range, rgb_mean, rgb_std, -1),
        'add_mean': _mean_shift_params(img_range, rgb_mean, rgb_std, 1),
        'head': conv_init(keys[0], in_channels, mid_channels, 3, True),
        'body': {str(i): _eam_init(keys[1 + i], mid_channels, mid_channels,
                                   mid_channels) for i in range(num_block)},
        'tail': conv_init(keys[num_block + 1], mid_channels, out_channels, 3, True),
    }


def ridnet_apply(p, x):
    res = conv2d(p['sub_mean'], x, padding=0)
    res = jnp.maximum(conv2d(p['head'], res), 0)
    for i in range(len(p['body'])):
        res = _eam_apply(p['body'][str(i)], res)
    res = conv2d(p['tail'], res)
    res = conv2d(p['add_mean'], res, padding=0)
    return x + res


@ARCH_REGISTRY.register()
class RIDNet(_SRArchBase):
    init_fn = staticmethod(ridnet_init)
    apply_fn = staticmethod(ridnet_apply)

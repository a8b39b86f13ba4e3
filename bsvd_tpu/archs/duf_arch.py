"""DUF — video SR with dynamic upsampling filters, functional
(reference: BasicSR/basicsr/archs/duf_arch.py:9-280). 3D convs run in NDHWC;
the dynamic filtering is an im2col (done as a depthwise identity conv, like
the reference) followed by a per-pixel matmul with the softmaxed predicted
filters — a pure MXU contraction."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bsvd_tpu.nn.layers import pixel_shuffle
from bsvd_tpu.utils.registry import ARCH_REGISTRY

_DN3 = ('NDHWC', 'DHWIO', 'NDHWC')


def conv3d(p, x, padding=(0, 1, 1)):
    """x (N, D, H, W, C); p['w'] (kd, kh, kw, cin, cout)."""
    pd, ph, pw = padding
    y = lax.conv_general_dilated(
        x, p['w'], (1, 1, 1), [(pd, pd), (ph, ph), (pw, pw)],
        dimension_numbers=_DN3)
    return y + p['b'] if 'b' in p else y


def _conv3d_init(key, cin, cout, ksize):
    kw_, kb = jax.random.split(key)
    kd, kh, kw = ksize
    fan_in = cin * kd * kh * kw
    bound = 1 / np.sqrt(fan_in)
    return {'w': jax.random.uniform(kw_, (kd, kh, kw, cin, cout), jnp.float32,
                                    -bound, bound),
            'b': jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def _bn_init(ch):
    return {'w': jnp.ones((ch,)), 'b': jnp.zeros((ch,)),
            'running_mean': jnp.zeros((ch,)), 'running_var': jnp.ones((ch,))}


def _bn(p, x, eps=1e-5):
    return ((x - p['running_mean']) * lax.rsqrt(p['running_var'] + eps) *
            p['w'] + p['b'])


def _dense_unit_init(key, cin, cout, k3_pad_t):
    """BN ReLU Conv1x1x1 BN ReLU Conv3x3x3 (Sequential indices 0,2,3,5)."""
    del k3_pad_t
    k1, k2 = jax.random.split(key)
    return {'0': _bn_init(cin), '2': _conv3d_init(k1, cin, cin, (1, 1, 1)),
            '3': _bn_init(cin), '5': _conv3d_init(k2, cin, cout, (3, 3, 3))}


def _dense_unit(p, x, pad_t, eps):
    y = jnp.maximum(_bn(p['0'], x, eps), 0)
    y = conv3d(p['2'], y, (0, 0, 0))
    y = jnp.maximum(_bn(p['3'], y, eps), 0)
    return conv3d(p['5'], y, (pad_t, 1, 1))


def duf_init(key, scale=4, num_layer=52):
    if num_layer == 16:
        num_block, num_grow_ch = 3, 32
    elif num_layer == 28:
        num_block, num_grow_ch = 9, 16
    elif num_layer == 52:
        num_block, num_grow_ch = 21, 16
    else:
        raise ValueError(f'Only (16, 28, 52) layers supported, got {num_layer}.')
    keys = iter(jax.random.split(key, num_block + 12))
    nf = 64 + num_grow_ch * num_block
    p = {
        'conv3d1': _conv3d_init(next(keys), 3, 64, (1, 3, 3)),
        'dense_block1': {'dense_blocks': {
            str(i): _dense_unit_init(next(keys), 64 + i * num_grow_ch,
                                     num_grow_ch, 1) for i in range(num_block)}},
        'dense_block2': {
            'temporal_reduce1': _dense_unit_init(next(keys), nf, num_grow_ch, 0),
            'temporal_reduce2': _dense_unit_init(next(keys), nf + num_grow_ch,
                                                 num_grow_ch, 0),
            'temporal_reduce3': _dense_unit_init(next(keys), nf + 2 * num_grow_ch,
                                                 num_grow_ch, 0),
        },
        'bn3d2': _bn_init(nf + 3 * num_grow_ch),
        'conv3d2': _conv3d_init(next(keys), nf + 3 * num_grow_ch, 256, (1, 3, 3)),
        'conv3d_r1': _conv3d_init(next(keys), 256, 256, (1, 1, 1)),
        'conv3d_r2': _conv3d_init(next(keys), 256, 3 * scale**2, (1, 1, 1)),
        'conv3d_f1': _conv3d_init(next(keys), 256, 512, (1, 1, 1)),
        'conv3d_f2': _conv3d_init(next(keys), 512, 25 * scale**2, (1, 1, 1)),
    }
    return p


def dynamic_upsampling_filter(x, filters, filter_size=(5, 5)):
    """x (N, H, W, 3); filters (N, H, W, filter_prod, up^2) softmaxed.
    Returns (N, H, W, 3*up^2) with torch's channel ordering."""
    kh, kw = filter_size
    fp = kh * kw
    # im2col via depthwise identity conv (reference expansion_filter):
    # tap (i, j) of input channel c -> output channel c*fp + i*kw + j
    eye = np.zeros((kh, kw, 1, fp), np.float32)
    for i in range(kh):
        for j in range(kw):
            eye[i, j, 0, i * kw + j] = 1.0
    k = jnp.concatenate([jnp.asarray(eye)] * 3, axis=-1)     # (kh,kw,1,3*fp)
    expanded = lax.conv_general_dilated(
        x, k, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=3)
    n, h, w, _ = expanded.shape
    expanded = expanded.reshape(n, h, w, 3, fp)
    out = jnp.einsum('nhwcf,nhwfu->nhwcu', expanded, filters)
    # torch layout: (n, 3*up^2, h, w) with c-major: channel = c*up^2 + u
    return out.reshape(n, h, w, -1)


def duf_apply(p, x, scale=4, eps=1e-5):
    """x (N, T=7, H, W, 3) -> (N, H*scale, W*scale, 3)."""
    n, t, h, w, c = x.shape
    x_center = x[:, t // 2]
    y = conv3d(p['conv3d1'], x, (0, 1, 1))    # (N, D=T, H, W, C)

    blocks = p['dense_block1']['dense_blocks']
    for i in range(len(blocks)):
        z = _dense_unit(blocks[str(i)], y, 1, eps)
        y = jnp.concatenate([y, z], axis=-1)

    d2 = p['dense_block2']
    z = _dense_unit(d2['temporal_reduce1'], y, 0, eps)
    y = jnp.concatenate([y[:, 1:-1], z], axis=-1)
    z = _dense_unit(d2['temporal_reduce2'], y, 0, eps)
    y = jnp.concatenate([y[:, 1:-1], z], axis=-1)
    z = _dense_unit(d2['temporal_reduce3'], y, 0, eps)
    y = jnp.concatenate([y[:, 1:-1], z], axis=-1)            # (N, 1, H, W, C)

    y = jnp.maximum(_bn(p['bn3d2'], y, eps), 0)
    y = jnp.maximum(conv3d(p['conv3d2'], y, (0, 1, 1)), 0)

    res = conv3d(p['conv3d_r2'], jnp.maximum(conv3d(p['conv3d_r1'], y,
                                                    (0, 0, 0)), 0), (0, 0, 0))
    filt = conv3d(p['conv3d_f2'], jnp.maximum(conv3d(p['conv3d_f1'], y,
                                                     (0, 0, 0)), 0), (0, 0, 0))
    # (N, 1, H, W, 25*up^2) -> softmax over the 25 taps
    filt = filt[:, 0].reshape(n, h, w, 25, scale**2)
    filt = jax.nn.softmax(filt, axis=3)

    out = dynamic_upsampling_filter(x_center, filt)          # (N,H,W,3*up^2)
    out = out + res[:, 0]
    # torch pixel_shuffle expects channel = c*up^2 + u ordering — ours matches
    return pixel_shuffle(out, scale)


def convert_duf_state(state):
    """torch DUF state dict -> param tree (5D conv OIDHW -> DHWIO; BN kept)."""
    tree = {}
    for key, val in state.items():
        if 'num_batches_tracked' in key:
            continue
        v = np.asarray(val)
        parts = key.split('.')
        leaf = parts[-1]
        if leaf == 'weight' and v.ndim == 5:
            leaf, v = 'w', np.transpose(v, (2, 3, 4, 1, 0))
        elif leaf == 'weight':
            leaf = 'w'
        elif leaf == 'bias':
            leaf = 'b'
        node = tree
        for pth in parts[:-1]:
            node = node.setdefault(pth, {})
        node[leaf] = v
    return tree


@ARCH_REGISTRY.register()
class DUF:
    def __init__(self, scale=4, num_layer=52, adapt_official_weights=False,
                 seed=0, param_dtype=jnp.float32):
        self.scale = scale
        self.eps = 1e-3 if adapt_official_weights else 1e-5
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            duf_init(jax.random.PRNGKey(seed), scale, num_layer))

    def apply(self, params, x_ntchw):
        x = jnp.transpose(jnp.asarray(x_ntchw), (0, 1, 3, 4, 2))
        y = duf_apply(params, x, self.scale, self.eps)
        return jnp.transpose(y, (0, 3, 1, 2))

    def __call__(self, x):
        """(N, 7, 3, H, W) -> (N, 3, H*scale, W*scale)."""
        return self.apply(self.params, x)

    def load(self, path, param_key='params'):
        import torch
        ckpt = torch.load(path, map_location='cpu', weights_only=True)
        if param_key and param_key in ckpt:
            ckpt = ckpt[param_key]
        state = {k: v.numpy() for k, v in ckpt.items()}
        self.params = jax.tree.map(jnp.asarray, convert_duf_state(state))
        return self

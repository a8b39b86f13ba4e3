"""TOFlow — task-oriented flow video enhancement, functional
(reference: BasicSR/basicsr/archs/tof_arch.py:10-174 — a 4-level SPyNet
variant with BatchNorm plus a flow-warp-and-fuse reconstruction head)."""

import jax
import jax.numpy as jnp
from jax import lax

from bsvd_tpu.archs.spynet_arch import _avg_pool2
from bsvd_tpu.nn.layers import conv2d, conv_init
from bsvd_tpu.nn.warp import flow_warp, interpolate_bilinear
from bsvd_tpu.utils.registry import ARCH_REGISTRY

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)
_CHANS = ((8, 32), (32, 64), (64, 32), (32, 16), (16, 2))


def _bn(p, x, eps=1e-5):
    return ((x - p['running_mean']) * lax.rsqrt(p['running_var'] + eps) *
            p['w'] + p['b'])


def _basic_module_init(key):
    keys = jax.random.split(key, 5)
    p = {'basic_module': {}}
    # Sequential: conv(bias=False) BN ReLU x4, final conv with bias
    idx = 0
    for i, (cin, cout) in enumerate(_CHANS):
        last = i == len(_CHANS) - 1
        conv = conv_init(keys[i], cin, cout, 7, bias=last)
        p['basic_module'][str(idx)] = conv
        idx += 1
        if not last:
            p['basic_module'][str(idx)] = {
                'w': jnp.ones((cout,)), 'b': jnp.zeros((cout,)),
                'running_mean': jnp.zeros((cout,)),
                'running_var': jnp.ones((cout,))}
            idx += 2   # BN at idx, ReLU occupies the next Sequential slot
    return p


def _basic_module_apply(p, x):
    m = p['basic_module']
    idx = 0
    for i in range(len(_CHANS)):
        last = i == len(_CHANS) - 1
        x = conv2d(m[str(idx)], x, padding=3)
        idx += 1
        if not last:
            x = jnp.maximum(_bn(m[str(idx)], x), 0)
            idx += 2
    return x


def spynet_tof_init(key):
    keys = jax.random.split(key, 4)
    return {'basic_module': {str(i): _basic_module_init(keys[i])
                             for i in range(4)}}


def spynet_tof_apply(params, ref, supp):
    """4-level coarse-to-fine flow; ref/supp (N, H, W, 3), H/W /16-divisible."""
    n, h, w, _ = ref.shape
    refs, supps = [ref], [supp]
    for _ in range(3):
        refs.insert(0, _avg_pool2(refs[0]))
        supps.insert(0, _avg_pool2(supps[0]))
    flow = jnp.zeros((n, h // 16, w // 16, 2), ref.dtype)
    for i in range(4):
        fh, fw = refs[i].shape[1:3]
        flow_up = interpolate_bilinear(flow, fh, fw, align_corners=True) * 2.0
        inp = jnp.concatenate([refs[i], flow_warp(supps[i], flow_up), flow_up],
                              axis=-1)
        flow = flow_up + _basic_module_apply(
            params['basic_module'][str(i)], inp)
    return flow


def toflow_init(key, adapt_official_weights=False):
    del adapt_official_weights
    keys = jax.random.split(key, 5)
    return {'spynet': spynet_tof_init(keys[0]),
            'conv_1': conv_init(keys[1], 21, 64, 9, True),
            'conv_2': conv_init(keys[2], 64, 64, 9, True),
            'conv_3': conv_init(keys[3], 64, 64, 1, True),
            'conv_4': conv_init(keys[4], 64, 3, 1, True)}


def toflow_apply(p, lrs, ref_idx=3):
    """lrs (N, 7, H, W, 3) -> (N, H, W, 3)."""
    mean = jnp.asarray(_MEAN, lrs.dtype)
    std = jnp.asarray(_STD, lrs.dtype)
    lrs = (lrs - mean) / std
    lr_ref = lrs[:, ref_idx]
    aligned = []
    for i in range(7):
        if i == ref_idx:
            aligned.append(lr_ref)
        else:
            flow = spynet_tof_apply(p['spynet'], lr_ref, lrs[:, i])
            aligned.append(flow_warp(lrs[:, i], flow))
    hr = jnp.concatenate(aligned, axis=-1)        # frame-major channels
    hr = jnp.maximum(conv2d(p['conv_1'], hr, padding=4), 0)
    hr = jnp.maximum(conv2d(p['conv_2'], hr, padding=4), 0)
    hr = jnp.maximum(conv2d(p['conv_3'], hr, padding=0), 0)
    hr = conv2d(p['conv_4'], hr, padding=0) + lr_ref
    return hr * std + mean


@ARCH_REGISTRY.register()
class TOFlow:
    def __init__(self, adapt_official_weights=False, seed=0,
                 param_dtype=jnp.float32):
        self.ref_idx = 0 if adapt_official_weights else 3
        self.adapt_official_weights = adapt_official_weights
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            toflow_init(jax.random.PRNGKey(seed)))

    def apply(self, params, x_ntchw):
        x = jnp.transpose(jnp.asarray(x_ntchw), (0, 1, 3, 4, 2))
        if self.adapt_official_weights:
            x = x[:, jnp.asarray([3, 0, 1, 2, 4, 5, 6])]
        y = toflow_apply(params, x, self.ref_idx)
        return jnp.transpose(y, (0, 3, 1, 2))

    def __call__(self, x):
        """(N, 7, 3, H, W) -> (N, 3, H, W)."""
        return self.apply(self.params, x)

    def load(self, path, param_key='params'):
        from bsvd_tpu.archs.duf_arch import convert_duf_state
        import torch
        ckpt = torch.load(path, map_location='cpu', weights_only=True)
        if param_key and param_key in ckpt:
            ckpt = ckpt[param_key]
        state = {k: v.numpy() for k, v in ckpt.items()
                 if k not in ('mean', 'std')}
        tree = convert_duf_state(state)   # same key->tree + OIHW handling
        # 4D conv weights: convert_duf_state keeps them OIHW under 'w'
        import numpy as np

        def fix(node):
            if isinstance(node, dict):
                if 'w' in node and getattr(node['w'], 'ndim', 0) == 4:
                    node = dict(node, w=np.transpose(node['w'], (2, 3, 1, 0)))
                return {k: fix(v) if isinstance(v, dict) else v
                        for k, v in node.items()}
            return node
        self.params = jax.tree.map(jnp.asarray, fix(tree))
        return self

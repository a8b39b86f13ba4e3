"""SpyNet optical flow, functional (reference:
BasicSR/basicsr/archs/spynet_arch.py — 6-level coarse-to-fine pyramid of
5-conv modules). Param tree mirrors torch names for generic conversion."""

import math

import jax
import jax.numpy as jnp
from jax import lax

from bsvd_tpu.nn.layers import conv2d, conv_init
from bsvd_tpu.nn.warp import flow_warp, interpolate_bilinear
from bsvd_tpu.utils.registry import ARCH_REGISTRY

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)
_CHANS = ((8, 32), (32, 64), (64, 32), (32, 16), (16, 2))


def _basic_module_init(key):
    keys = jax.random.split(key, 5)
    return {'basic_module': {str(2 * i): conv_init(keys[i], cin, cout, 7, True)
                             for i, (cin, cout) in enumerate(_CHANS)}}


def _basic_module_apply(p, x):
    m = p['basic_module']
    for i in range(5):
        x = conv2d(m[str(2 * i)], x, padding=3)
        if i < 4:
            x = jnp.maximum(x, 0)
    return x


def spynet_init(key):
    keys = jax.random.split(key, 6)
    return {'basic_module': {str(i): _basic_module_init(keys[i])
                             for i in range(6)}}


def _avg_pool2(x):
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             'VALID') / 4.0


def spynet_process(params, ref, supp):
    """Coarse-to-fine flow on /32-aligned inputs. ref/supp: (N, H, W, 3)."""
    mean = jnp.asarray(_MEAN, ref.dtype)
    std = jnp.asarray(_STD, ref.dtype)
    refs = [(ref - mean) / std]
    supps = [(supp - mean) / std]
    for _ in range(5):
        refs.insert(0, _avg_pool2(refs[0]))
        supps.insert(0, _avg_pool2(supps[0]))

    n, h0, w0, _ = refs[0].shape
    # clamp the coarsest init to >=1 px: the reference crashes below 64-px
    # inputs (its h0//2 hits zero); clamping keeps small inputs working
    # with identical numerics everywhere the reference runs
    flow = jnp.zeros((n, max(h0 // 2, 1), max(w0 // 2, 1), 2), ref.dtype)
    for level in range(6):
        h, w = refs[level].shape[1:3]
        up = interpolate_bilinear(flow, h, w, align_corners=True) * 2.0
        warped = flow_warp(supps[level], up, padding_mode='border')
        inp = jnp.concatenate([refs[level], warped, up], axis=-1)
        flow = _basic_module_apply(params['basic_module'][str(level)], inp) + up
    return flow


def spynet_apply(params, ref, supp):
    """Full flow: arbitrary (N, H, W, 3) pair -> (N, H, W, 2) flow (x, y)."""
    h, w = ref.shape[1:3]
    h32 = int(math.ceil(h / 32.0) * 32)
    w32 = int(math.ceil(w / 32.0) * 32)
    ref_r = interpolate_bilinear(ref, h32, w32, align_corners=False)
    supp_r = interpolate_bilinear(supp, h32, w32, align_corners=False)
    flow = spynet_process(params, ref_r, supp_r)
    flow = interpolate_bilinear(flow, h, w, align_corners=False)
    scale = jnp.asarray([w / w32, h / h32], flow.dtype)
    return flow * scale


@ARCH_REGISTRY.register()
class SpyNet:
    def __init__(self, load_path=None, seed=0, param_dtype=jnp.float32):
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            spynet_init(jax.random.PRNGKey(seed)))
        if load_path:
            self.load(load_path)

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self

    def __call__(self, ref, supp):
        """(N, 3, H, W) pair -> (N, 2, H, W) flow (reference NCHW IO)."""
        ref = jnp.transpose(jnp.asarray(ref), (0, 2, 3, 1))
        supp = jnp.transpose(jnp.asarray(supp), (0, 2, 3, 1))
        flow = spynet_apply(self.params, ref, supp)
        return jnp.transpose(flow, (0, 3, 1, 2))

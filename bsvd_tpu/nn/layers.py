"""Functional NN primitives in TPU-native NHWC layout.

Parameters are plain pytrees (nested dicts of jnp arrays); every layer is a
pure function ``apply(params, x)``. Conv weights are stored HWIO so they feed
``lax.conv_general_dilated`` directly; the checkpoint converter transposes
from torch's OIHW (see bsvd_tpu/convert/torch_ckpt.py).

Numerical conventions intentionally match the reference network definitions
(reference: Experimental_root/archs/archs_2d/wnet_models.py:5-46 for
conv/norm/act choices) so converted checkpoints reproduce outputs:

- 3x3 convs use explicit (1,1)/(1,1) spatial padding (torch ``padding=1``),
  which for stride 2 differs from XLA 'SAME' padding placement.
- Kaiming-normal fan-in init for weights; torch's default uniform bias init.
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

_DIMSPEC = ('NHWC', 'HWIO', 'NHWC')


def conv2d(params, x, stride=1, padding=1, groups=1, dilation=1):
    """3x3 (or kxk) conv over NHWC with torch-style symmetric padding.

    Args:
        params: {'w': (kh, kw, in/groups, out), 'b': (out,) or absent}
        x: (..., H, W, C) — leading dims are merged into the batch.
        stride: int spatial stride.
        padding: int or (ph, pw) symmetric spatial pad (torch Conv2d
            ``padding=``; the tuple form covers 1x7/7x1 kernels).
        groups: feature group count.
        dilation: kernel (rhs) dilation.
    """
    w = params['w']
    lead = x.shape[:-3]
    xm = x.reshape((-1,) + x.shape[-3:])
    ph, pw = padding if isinstance(padding, (tuple, list)) else (padding,
                                                                 padding)
    y = lax.conv_general_dilated(
        xm, w,
        window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
    )
    if 'b' in params:
        y = y + params['b'].astype(y.dtype)
    return y.reshape(lead + y.shape[-3:])


def conv_init(key, in_ch, out_ch, kernel_size=3, bias=True, groups=1,
              dtype=jnp.float32):
    """Kaiming-normal (fan_in, relu gain) weight init + torch default bias init.

    Matches the reference's ``nn.init.kaiming_normal_(w, nonlinearity='relu')``
    re-init applied on top of torch's default bias (reference:
    Experimental_root/archs/archs_2d/wnet_models.py:155-162).
    """
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel_size * kernel_size
    std = math.sqrt(2.0 / fan_in)
    w = std * jax.random.normal(kw, (kernel_size, kernel_size, in_ch // groups, out_ch), dtype)
    p = {'w': w}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p['b'] = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return p


def pixel_shuffle(x, r=2):
    """torch.nn.PixelShuffle semantics on NHWC input.

    Input (..., H, W, C*r*r) -> (..., H*r, W*r, C) with torch's channel
    ordering: input channel ``c*r*r + i*r + j`` maps to output pixel offset
    (i, j) of channel c (reference uses nn.PixelShuffle(2) in UpBlock,
    Experimental_root/archs/archs_2d/wnet_models.py:92-105).
    """
    *lead, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(*lead, h, w, c, r, r)
    # (..., h, w, c, i, j) -> (..., h, i, w, j, c)
    nl = len(lead)
    perm = tuple(range(nl)) + (nl, nl + 3, nl + 1, nl + 4, nl + 2)
    x = jnp.transpose(x, perm)
    return x.reshape(*lead, h * r, w * r, c)


def get_act(act):
    """Activation by name; mirrors reference get_act_function
    (Experimental_root/archs/archs_2d/wnet_models.py:39-46)."""
    if act == 'relu':
        return lambda x: jnp.maximum(x, 0)
    if act == 'relu6':
        return lambda x: jnp.clip(x, 0, jnp.asarray(6, x.dtype))
    if act == 'none':
        return lambda x: x
    raise ValueError(f'unknown act {act!r}')


def get_norm(norm):
    """Validate a norm name; mirrors reference get_norm_function
    (Experimental_root/archs/archs_2d/wnet_models.py:30-37)."""
    if norm not in ('none', 'in', 'bn'):
        raise ValueError(f'unknown norm {norm!r}')
    return norm


def norm_init(norm, ch, dtype=jnp.float32):
    """Init norm params. 'none' and 'in' (torch InstanceNorm2d default:
    affine=False, no running stats) carry no params; 'bn' carries
    scale/bias + running stats."""
    if norm in ('none', 'in'):
        return {}
    if norm == 'bn':
        return {
            'scale': jnp.ones((ch,), dtype),
            'bias': jnp.zeros((ch,), dtype),
            'mean': jnp.zeros((ch,), jnp.float32),
            'var': jnp.ones((ch,), jnp.float32),
        }
    raise ValueError(f'unknown norm {norm!r}')


import contextlib

# When set (a list), BN sites normalize by batch statistics and record
# (param_leaf, batch_mean, batch_var, count) so the train step can fold the
# running-stat momentum update back into the param tree (torch train-mode BN
# semantics). Trace-time only; tracing is single-threaded.
_BN_COLLECT = None


@contextlib.contextmanager
def bn_training(collector):
    """Enable train-mode BatchNorm inside this trace; batch stats are
    appended to ``collector``."""
    global _BN_COLLECT
    prev = _BN_COLLECT
    _BN_COLLECT = collector
    try:
        yield collector
    finally:
        _BN_COLLECT = prev


def bn_stats_with_paths(params, collector):
    """Resolve collected (leaf, mean, var, n) entries to tree paths against
    ``params`` (the tree whose leaves flowed through norm_apply). Paths are
    static; call inside the same trace as the forward."""
    id2path = {}

    def walk(node, path):
        if isinstance(node, dict):
            id2path[id(node)] = path
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (i,))
    walk(params, ())
    return [(id2path[id(leaf)], m, v, n) for leaf, m, v, n in collector]


def bn_fold_running_stats(params, path_stats, momentum=0.1):
    """Return params with running mean/var at ``path_stats`` paths updated
    (unbiased var, torch convention)."""
    import copy
    out = copy.copy(params) if isinstance(params, dict) else params
    for path, m, v, n in path_stats:
        if n > 1:
            v = v * n / (n - 1)
        node = out
        for p in path[:-1]:
            child = node[p]
            child = copy.copy(child) if isinstance(child, dict) else list(child)
            node[p] = child
            node = child
        leaf = dict(node[path[-1]])
        leaf['mean'] = (1 - momentum) * leaf['mean'] + momentum * m
        leaf['var'] = (1 - momentum) * leaf['var'] + momentum * v
        node[path[-1]] = leaf
    return out


def norm_apply(norm, params, x, eps=1e-5):
    """Apply a norm over NHWC input.

    'in': per-sample per-channel spatial normalization (InstanceNorm2d
    affine=False). 'bn': running-stats batchnorm in eval; batch-stats when
    inside a ``bn_training`` context (stats recorded for the caller).
    """
    if norm == 'none':
        return x
    if norm == 'in':
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        return (x - mean) * lax.rsqrt(var + eps)
    if norm == 'bn':
        if _BN_COLLECT is not None:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            count = 1
            for d in axes:
                count *= x.shape[d]
            _BN_COLLECT.append((params, mean.astype(jnp.float32),
                                var.astype(jnp.float32), count))
            mean = mean.astype(x.dtype)
            var = var.astype(x.dtype)
        else:
            mean = params['mean'].astype(x.dtype)
            var = params['var'].astype(x.dtype)
        y = (x - mean) * lax.rsqrt(var + jnp.asarray(eps, x.dtype))
        return y * params['scale'].astype(x.dtype) + params['bias'].astype(x.dtype)
    raise ValueError(f'unknown norm {norm!r}')

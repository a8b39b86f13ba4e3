"""BasicVSR — bidirectional recurrent video SR, functional
(reference: BasicSR/basicsr/archs/basicvsr_arch.py:11-109).

The backward/forward propagation loops are ``lax.scan`` over T with the
propagated feature as carry; flow estimation is batched over all frame pairs
(one SpyNet call per direction). Param tree mirrors torch names."""

import jax
import jax.numpy as jnp
from jax import lax

from bsvd_tpu.archs.spynet_arch import spynet_apply, spynet_init
from bsvd_tpu.archs.sr_archs import bilinear_resize, lrelu, res_block_init
from bsvd_tpu.nn.layers import conv2d, conv_init, pixel_shuffle
from bsvd_tpu.nn.warp import flow_warp
from bsvd_tpu.utils.registry import ARCH_REGISTRY


def _conv_res_blocks_init(key, num_in_ch, num_out_ch, num_block):
    keys = jax.random.split(key, num_block + 1)
    main = {'0': conv_init(keys[0], num_in_ch, num_out_ch, 3, True),
            '2': {str(i): res_block_init(keys[1 + i], num_out_ch)
                  for i in range(num_block)}}
    return {'main': main}


def _conv_res_blocks_apply(p, x):
    x = lrelu(conv2d(p['main']['0'], x))
    blocks = p['main']['2']
    for i in range(len(blocks)):
        b = blocks[str(i)]
        x = x + conv2d(b['conv2'], jnp.maximum(conv2d(b['conv1'], x), 0))
    return x


def basicvsr_init(key, num_feat=64, num_block=15):
    keys = jax.random.split(key, 8)
    return {
        'spynet': spynet_init(keys[0]),
        'backward_trunk': _conv_res_blocks_init(keys[1], num_feat + 3, num_feat, num_block),
        'forward_trunk': _conv_res_blocks_init(keys[2], num_feat + 3, num_feat, num_block),
        'fusion': conv_init(keys[3], num_feat * 2, num_feat, 1, True),
        'upconv1': conv_init(keys[4], num_feat, num_feat * 4, 3, True),
        'upconv2': conv_init(keys[5], num_feat, 64 * 4, 3, True),
        'conv_hr': conv_init(keys[6], 64, 64, 3, True),
        'conv_last': conv_init(keys[7], 64, 3, 3, True),
    }


def basicvsr_apply(params, x, num_feat=64):
    """x: (N, T, H, W, 3) in [0, 1] -> (N, T, 4H, 4W, 3)."""
    n, t, h, w, c = x.shape

    # flows between adjacent frames, batched
    x1 = x[:, :-1].reshape(n * (t - 1), h, w, c)
    x2 = x[:, 1:].reshape(n * (t - 1), h, w, c)
    flows_backward = spynet_apply(params['spynet'], x1, x2).reshape(n, t - 1, h, w, 2)
    flows_forward = spynet_apply(params['spynet'], x2, x1).reshape(n, t - 1, h, w, 2)

    zeros_flow = jnp.zeros((n, 1, h, w, 2), x.dtype)
    # backward pass scans t-1 .. 0; frame t-1 has no flow (no warp -> flow 0
    # on a zero feature is also zero, so a zero flow is equivalent)
    flows_b = jnp.concatenate([flows_backward, zeros_flow], axis=1)  # align per-i
    flows_f = jnp.concatenate([zeros_flow, flows_forward], axis=1)

    def backward_step(feat, inp):
        x_i, flow = inp
        feat = flow_warp(feat, flow)
        feat = _conv_res_blocks_apply(params['backward_trunk'],
                                      jnp.concatenate([x_i, feat], axis=-1))
        return feat, feat

    xs_rev = jnp.flip(jnp.moveaxis(x, 1, 0), axis=0)              # t-1..0
    flows_rev = jnp.flip(jnp.moveaxis(flows_b, 1, 0), axis=0)
    init = jnp.zeros((n, h, w, num_feat), x.dtype)
    _, back_feats_rev = lax.scan(backward_step, init, (xs_rev, flows_rev))
    back_feats = jnp.flip(back_feats_rev, axis=0)                  # 0..t-1

    def forward_step(feat, inp):
        x_i, flow, back_feat = inp
        feat = flow_warp(feat, flow)
        feat = _conv_res_blocks_apply(params['forward_trunk'],
                                      jnp.concatenate([x_i, feat], axis=-1))
        out = jnp.concatenate([back_feat, feat], axis=-1)
        out = lrelu(conv2d(params['fusion'], out, padding=0))
        out = lrelu(pixel_shuffle(conv2d(params['upconv1'], out), 2))
        out = lrelu(pixel_shuffle(conv2d(params['upconv2'], out), 2))
        out = lrelu(conv2d(params['conv_hr'], out))
        out = conv2d(params['conv_last'], out)
        out = out + bilinear_resize(x_i, 4)
        return feat, out

    xs = jnp.moveaxis(x, 1, 0)
    flows_fwd = jnp.moveaxis(flows_f, 1, 0)
    _, outs = lax.scan(forward_step, init, (xs, flows_fwd, back_feats))
    return jnp.moveaxis(outs, 0, 1)


@ARCH_REGISTRY.register()
class BasicVSR:
    def __init__(self, num_feat=64, num_block=15, spynet_path=None, seed=0,
                 param_dtype=jnp.float32):
        self.num_feat = num_feat
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            basicvsr_init(jax.random.PRNGKey(seed), num_feat, num_block))
        if spynet_path:
            from bsvd_tpu.convert.torch_generic import load_torch_generic
            self.params['spynet'] = load_torch_generic(
                spynet_path, self.params['spynet'], 'params')

    def apply(self, params, x_nfchw):
        x = jnp.transpose(jnp.asarray(x_nfchw), (0, 1, 3, 4, 2))
        y = basicvsr_apply(params, x, self.num_feat)
        return jnp.transpose(y, (0, 1, 4, 2, 3))

    def __call__(self, x):
        """(N, T, 3, H, W) -> (N, T, 3, 4H, 4W) (reference NCHW IO)."""
        return self.apply(self.params, x)

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self

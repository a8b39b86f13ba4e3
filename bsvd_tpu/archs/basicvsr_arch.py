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


# ---------------------------------------------------------------------------
# IconVSR (reference basicvsr_arch.py:111-310): BasicVSR + keyframe EDVR
# features fused into both propagation branches
# ---------------------------------------------------------------------------

def edvr_feature_extractor_init(key, num_input_frame, num_feat=64,
                                deformable_groups=8):
    from bsvd_tpu.archs.edvr_arch import pcd_alignment_init, tsa_fusion_init
    keys = jax.random.split(key, 12)
    return {
        'conv_first': conv_init(keys[0], 3, num_feat, 3, True),
        'feature_extraction': {str(i): res_block_init(keys[1 + i], num_feat)
                               for i in range(5)},
        'conv_l2_1': conv_init(keys[6], num_feat, num_feat, 3, True),
        'conv_l2_2': conv_init(keys[7], num_feat, num_feat, 3, True),
        'conv_l3_1': conv_init(keys[8], num_feat, num_feat, 3, True),
        'conv_l3_2': conv_init(keys[9], num_feat, num_feat, 3, True),
        'pcd_align': pcd_alignment_init(keys[10], num_feat, deformable_groups),
        'fusion': tsa_fusion_init(keys[11], num_feat, num_input_frame),
    }


def edvr_feature_extractor_apply(p, x, deformable_groups=8):
    """x (N, T, H, W, 3) -> fused center-frame features (N, H, W, C)."""
    from bsvd_tpu.archs.edvr_arch import pcd_alignment_apply, tsa_fusion_apply
    from bsvd_tpu.archs.sr_archs import res_block_apply
    n, t, h, w, c = x.shape
    center = t // 2
    f1 = lrelu(conv2d(p['conv_first'], x.reshape(n * t, h, w, c)))
    for i in range(len(p['feature_extraction'])):
        f1 = res_block_apply(p['feature_extraction'][str(i)], f1)
    f2 = lrelu(conv2d(p['conv_l2_2'], lrelu(conv2d(p['conv_l2_1'], f1, stride=2))))
    f3 = lrelu(conv2d(p['conv_l3_2'], lrelu(conv2d(p['conv_l3_1'], f2, stride=2))))
    f1 = f1.reshape(n, t, h, w, -1)
    f2 = f2.reshape(n, t, h // 2, w // 2, -1)
    f3 = f3.reshape(n, t, h // 4, w // 4, -1)
    ref = [f1[:, center], f2[:, center], f3[:, center]]
    aligned = [pcd_alignment_apply(p['pcd_align'], [f1[:, i], f2[:, i], f3[:, i]],
                                   ref, deformable_groups) for i in range(t)]
    return tsa_fusion_apply(p['fusion'], jnp.stack(aligned, axis=1), center)


def iconvsr_init(key, num_feat=64, num_block=15, keyframe_stride=5,
                 temporal_padding=2):
    keys = jax.random.split(key, 12)
    return {
        'spynet': spynet_init(keys[0]),
        'edvr': edvr_feature_extractor_init(keys[1], temporal_padding * 2 + 1,
                                            num_feat),
        'backward_fusion': conv_init(keys[2], 2 * num_feat, num_feat, 3, True),
        'backward_trunk': _conv_res_blocks_init(keys[3], num_feat + 3, num_feat,
                                                num_block),
        'forward_fusion': conv_init(keys[4], 2 * num_feat, num_feat, 3, True),
        'forward_trunk': _conv_res_blocks_init(keys[5], 2 * num_feat + 3,
                                               num_feat, num_block),
        'upconv1': conv_init(keys[6], num_feat, num_feat * 4, 3, True),
        'upconv2': conv_init(keys[7], num_feat, 64 * 4, 3, True),
        'conv_hr': conv_init(keys[8], 64, 64, 3, True),
        'conv_last': conv_init(keys[9], 64, 3, 3, True),
    }


def iconvsr_apply(params, x, num_feat=64, keyframe_stride=5,
                  temporal_padding=2):
    """x (N, T, H, W, 3) -> (N, T, 4H, 4W, 3)."""
    n, t, h_in, w_in, c = x.shape
    pad_h = (4 - h_in % 4) % 4
    pad_w = (4 - w_in % 4) % 4
    if pad_h or pad_w:
        x = x.reshape(n * t, h_in, w_in, c)
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode='reflect')
        x = x.reshape(n, t, h_in + pad_h, w_in + pad_w, c)
    h, w = x.shape[2:4]

    keyframe_idx = list(range(0, t, keyframe_stride))
    if keyframe_idx[-1] != t - 1:
        keyframe_idx.append(t - 1)

    x1 = x[:, :-1].reshape(n * (t - 1), h, w, c)
    x2 = x[:, 1:].reshape(n * (t - 1), h, w, c)
    flows_backward = spynet_apply(params['spynet'], x1, x2).reshape(n, t - 1, h, w, 2)
    flows_forward = spynet_apply(params['spynet'], x2, x1).reshape(n, t - 1, h, w, 2)

    # keyframe features: mirror-pad the sequence then 5-frame windows
    tp = temporal_padding
    if tp == 2:
        padded = jnp.concatenate([x[:, jnp.asarray([4, 3])], x,
                                  x[:, jnp.asarray([-4, -5])]], axis=1)
    elif tp == 3:
        padded = jnp.concatenate([x[:, jnp.asarray([6, 5, 4])], x,
                                  x[:, jnp.asarray([-5, -6, -7])]], axis=1)
    else:
        raise ValueError(f'temporal_padding {tp} not supported (2 or 3)')
    nf = 2 * tp + 1
    feats_keyframe = {i: edvr_feature_extractor_apply(params['edvr'],
                                                      padded[:, i:i + nf])
                      for i in keyframe_idx}

    # backward branch
    out_l = [None] * t
    feat_prop = jnp.zeros((n, h, w, num_feat), x.dtype)
    for i in range(t - 1, -1, -1):
        if i < t - 1:
            feat_prop = flow_warp(feat_prop, flows_backward[:, i])
        if i in keyframe_idx:
            feat_prop = conv2d(params['backward_fusion'],
                               jnp.concatenate([feat_prop, feats_keyframe[i]],
                                               axis=-1))
        feat_prop = _conv_res_blocks_apply(
            params['backward_trunk'],
            jnp.concatenate([x[:, i], feat_prop], axis=-1))
        out_l[i] = feat_prop

    # forward branch
    feat_prop = jnp.zeros_like(feat_prop)
    outs = []
    for i in range(t):
        if i > 0:
            feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
        if i in keyframe_idx:
            feat_prop = conv2d(params['forward_fusion'],
                               jnp.concatenate([feat_prop, feats_keyframe[i]],
                                               axis=-1))
        feat_prop = _conv_res_blocks_apply(
            params['forward_trunk'],
            jnp.concatenate([x[:, i], out_l[i], feat_prop], axis=-1))
        out = lrelu(pixel_shuffle(conv2d(params['upconv1'], feat_prop), 2))
        out = lrelu(pixel_shuffle(conv2d(params['upconv2'], out), 2))
        out = lrelu(conv2d(params['conv_hr'], out))
        out = conv2d(params['conv_last'], out)
        out = out + bilinear_resize(x[:, i], 4)
        outs.append(out)
    return jnp.stack(outs, axis=1)[:, :, :4 * h_in, :4 * w_in]


@ARCH_REGISTRY.register()
class IconVSR:
    def __init__(self, num_feat=64, num_block=15, keyframe_stride=5,
                 temporal_padding=2, spynet_path=None, edvr_path=None,
                 seed=0, param_dtype=jnp.float32):
        self.num_feat = num_feat
        self.keyframe_stride = keyframe_stride
        self.temporal_padding = temporal_padding
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            iconvsr_init(jax.random.PRNGKey(seed), num_feat, num_block,
                         keyframe_stride, temporal_padding))
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        if spynet_path:
            self.params['spynet'] = load_torch_generic(
                spynet_path, self.params['spynet'], 'params')
        if edvr_path:
            self.params['edvr'] = load_torch_generic(
                edvr_path, self.params['edvr'], 'params')

    def apply(self, params, x_nfchw):
        x = jnp.transpose(jnp.asarray(x_nfchw), (0, 1, 3, 4, 2))
        y = iconvsr_apply(params, x, self.num_feat, self.keyframe_stride,
                          self.temporal_padding)
        return jnp.transpose(y, (0, 1, 4, 2, 3))

    def __call__(self, x):
        """(N, T, 3, H, W) -> (N, T, 3, 4H, 4W)."""
        return self.apply(self.params, x)

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self

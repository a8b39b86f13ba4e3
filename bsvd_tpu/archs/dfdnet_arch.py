"""DFDNet — deep face dictionary network (eval-only, like the reference)
(reference: BasicSR/basicsr/archs/dfdnet_arch.py:1-158 and
dfdnet_util.py:1-162).

Design notes (TPU-first):
- All spectral-normed convs run as plain convs; sigma is folded into the
  weight at conversion time (the reference only ever runs this net in eval
  mode, where torch's SN is exactly W/sigma(u, v) with frozen u, v).
- The dictionary swap involves data-dependent crop shapes (per-part
  landmark boxes), so the forward runs eagerly in jnp rather than under
  jit: this is a batch-1, offline face-restoration path (the reference
  supports only batch 1, dfdnet_arch.py:128-130), not a hot loop.
- Resizes are matmuls against precomputed interpolation matrices
  (bilinear, torch align_corners=False) or gathers (nearest), matching
  F.interpolate semantics bit-for-bit in fp32.

External artifacts (no egress): the VGGFace-tuned backbone + heads live in
``DFDNet_official-d1fa5650.pth`` and the facial-component dictionary in
``DFDNet_dict_512-f79685f0.pth``; pass them as ``pretrain_path`` /
``dict_path``. Random-weight mode keeps the whole math path testable.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from bsvd_tpu.archs.inception_arch import resize_bilinear
from bsvd_tpu.archs.vgg_arch import vgg_feature_apply, vgg_feature_init
from bsvd_tpu.nn.layers import conv2d, conv_init
from bsvd_tpu.utils.registry import ARCH_REGISTRY

PARTS = ('left_eye', 'right_eye', 'nose', 'mouth')
VGG_LAYERS = ('relu2_2', 'relu3_4', 'relu4_4', 'conv5_4')
FEATURE_SIZES = (256, 128, 64, 32)
CHANNEL_SIZES = (128, 256, 512, 512)

# normalized 3x3 binomial kernel (reference dfdnet_util.py Blur)
_BLUR_K = (np.array([[1., 2., 1.], [2., 4., 2.], [1., 2., 1.]],
                    np.float32) / 16.0)


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def _blur(x):
    """Depthwise 3x3 binomial blur, pad 1 (reference Blur module)."""
    c = x.shape[-1]
    k = jnp.asarray(_BLUR_K)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c)


def resize_nearest(x, out_h, out_w):
    """NHWC nearest resize with torch F.interpolate(mode='nearest')
    indexing: src = floor(dst * in / out)."""
    ih, iw = x.shape[1], x.shape[2]
    ri = (np.arange(out_h) * ih // out_h).astype(np.int32)
    ci = (np.arange(out_w) * iw // out_w).astype(np.int32)
    return x[:, ri][:, :, ci]


def calc_mean_std(feat, eps=1e-5):
    """Per-sample/channel mean + std over spatial dims, UNBIASED variance
    (torch .var default; reference dfdnet_util.py:57-72). feat: NHWC."""
    n, h, w, c = feat.shape
    flat = feat.reshape(n, h * w, c)
    mean = flat.mean(axis=1, keepdims=True)
    var = ((flat - mean) ** 2).sum(axis=1, keepdims=True) / (h * w - 1)
    return (mean.reshape(n, 1, 1, c),
            jnp.sqrt(var + eps).reshape(n, 1, 1, c))


def adaptive_instance_normalization(content_feat, style_feat):
    """Renormalize content to the style's per-channel statistics
    (reference dfdnet_util.py:75-89)."""
    s_mean, s_std = calc_mean_std(style_feat)
    c_mean, c_std = calc_mean_std(content_feat)
    return (content_feat - c_mean) / c_std * s_std + s_mean


def _seq2_init(key, cin, cout):
    """Two 3x3 convs (the AttentionBlock / scale / shift / conv_block
    shape): [conv, conv] with lrelu applied between at apply time."""
    k0, k1 = jax.random.split(key)
    return [conv_init(k0, cin, cout, 3), conv_init(k1, cout, cout, 3)]


def dfdnet_init(key, num_feat=64):
    """Random-weight param tree; module names mirror the reference so the
    checkpoint converter is a key-table walk."""
    keys = iter(jax.random.split(key, 64))
    p = {'vgg': vgg_feature_init(next(keys), list(VGG_LAYERS), 'vgg19')}
    p['attn'] = {
        f'{part}_{fs}': _seq2_init(next(keys), c, c)
        for fs, c in zip(FEATURE_SIZES, CHANNEL_SIZES) for part in PARTS}
    cf = num_feat * 8
    p['ms_dilation'] = {
        'blocks': [_seq2_init(next(keys), cf, cf) for _ in range(4)],
        'fusion': conv_init(next(keys), cf * 4, cf, 3)}
    up_chns = [(cf, cf), (cf, num_feat * 4), (num_feat * 4, num_feat * 2),
               (num_feat * 2, num_feat)]
    for i, (ci, co) in enumerate(up_chns):
        p[f'upsample{i}'] = {
            'conv1': conv_init(next(keys), ci, co, 3),
            'convup': conv_init(next(keys), co, co, 3),
            'scale': _seq2_init(next(keys), ci, co),
            'shift': _seq2_init(next(keys), ci, co)}
    p['upsample4'] = {
        'conv0': conv_init(next(keys), num_feat, num_feat, 3),
        'res1': _seq2_init(next(keys), num_feat, num_feat),
        'res2': _seq2_init(next(keys), num_feat, num_feat),
        'out': conv_init(next(keys), num_feat, 3, 3)}
    return p


def _attn_block(p, x):
    """conv -> lrelu(0.2) -> conv (reference AttentionBlock)."""
    return conv2d(p[1], _lrelu(conv2d(p[0], x)))


def _ms_dilation(p, x):
    """4 dilated double-conv branches + fused residual
    (reference MSDilationBlock, dilation=[4, 3, 2, 1])."""
    outs = []
    for blk, d in zip(p['blocks'], (4, 3, 2, 1)):
        y = _lrelu(conv2d(blk[0], x, padding=d, dilation=d))
        y = conv2d(blk[1], y, padding=d, dilation=d)
        outs.append(y)
    return conv2d(p['fusion'], jnp.concatenate(outs, -1)) + x


def _sft_up(p, x, updated_feat):
    """Blur -> conv -> lrelu(0.04); SFT (out*scale + sigmoid-shift); 2x
    bilinear up -> conv -> lrelu(0.2) (reference SFTUpBlock)."""
    out = _lrelu(conv2d(p['conv1'], _blur(x)), 0.04)
    scale = conv2d(p['scale'][1], _lrelu(conv2d(p['scale'][0], updated_feat)))
    shift = jax.nn.sigmoid(
        conv2d(p['shift'][1], _lrelu(conv2d(p['shift'][0], updated_feat))))
    out = out * scale + shift
    out = resize_bilinear(out, out.shape[1] * 2, out.shape[2] * 2)
    return _lrelu(conv2d(p['convup'], out))


def _swap_feat(params, vgg_feat, updated_feat, dict_feat, location,
               part_name, f_size):
    """Dictionary swap for one facial part (reference
    dfdnet_arch.py:96-115): crop -> AdaIN-matched dict -> correlation
    argmax -> nearest-resize back -> attention-gated residual update."""
    x0, y0, x1, y1 = [int(v) for v in location]
    part_feat = vgg_feat[:, y0:y1, x0:x1, :]
    dh, dw = dict_feat.shape[1], dict_feat.shape[2]
    part_resize = resize_bilinear(part_feat, dh, dw)
    dict_feat = adaptive_instance_normalization(dict_feat, part_resize)
    # correlation of the (1, dh, dw, C) query against K dictionary atoms;
    # softmax then argmax == argmax of the raw scores
    scores = jnp.einsum('hwc,khwc->k', part_resize[0], dict_feat)
    select_idx = jnp.argmax(scores)
    swap = resize_nearest(dict_feat[select_idx][None],
                          part_feat.shape[1], part_feat.shape[2])
    attn = _attn_block(params['attn'][f'{part_name}_{f_size}'],
                       swap - part_feat)
    return updated_feat.at[:, y0:y1, x0:x1, :].set(attn * swap + part_feat)


def dfdnet_apply(params, face_dict, x, part_locations):
    """x: (1, H, W, 3) NHWC in [-1, 1]; part_locations: 4 arrays of (1, 4)
    pixel boxes in 512-scale coords. Returns (1, H, W, 3) in [-1, 1]."""
    vgg_features = vgg_feature_apply(params['vgg'], x, list(VGG_LAYERS),
                                     'vgg19', use_input_norm=True,
                                     range_norm=True)
    updated = []
    for vgg_layer, f_size in zip(VGG_LAYERS, FEATURE_SIZES):
        feat = vgg_features[vgg_layer]
        upd = feat
        for part_idx, part in enumerate(PARTS):
            # 512 is the reference's hard-coded face size
            # (dfdnet_arch.py:144: location // (512 / f_size))
            loc = (np.asarray(part_locations[part_idx][0])
                   // (512 / f_size)).astype(np.int64)
            upd = _swap_feat(params, feat, upd,
                             jnp.asarray(face_dict[str(f_size)][part]),
                             loc, part, f_size)
        updated.append(upd)

    feat = _ms_dilation(params['ms_dilation'], vgg_features['conv5_4'])
    feat = _sft_up(params['upsample0'], feat, updated[3])
    feat = _sft_up(params['upsample1'], feat, updated[2])
    feat = _sft_up(params['upsample2'], feat, updated[1])
    feat = _sft_up(params['upsample3'], feat, updated[0])
    p4 = params['upsample4']
    feat = _lrelu(conv2d(p4['conv0'], feat))
    for res in (p4['res1'], p4['res2']):
        feat = feat + conv2d(res[1], _lrelu(conv2d(res[0], feat)))
    return jnp.tanh(conv2d(p4['out'], feat))


# ------------------------------------------------------------- conversion
def _fold_sn(state, prefix):
    """Fold spectral norm: W / sigma with sigma = u . (W_mat @ v)
    (torch SN eval semantics, frozen power-iteration vectors)."""
    w = np.asarray(state[f'{prefix}.weight_orig'])
    u = np.asarray(state[f'{prefix}.weight_u'])
    v = np.asarray(state[f'{prefix}.weight_v'])
    sigma = float(u @ (w.reshape(w.shape[0], -1) @ v))
    return w / sigma


def _conv_from(state, prefix):
    """One conv (SN-folded if needed), torch OIHW -> HWIO."""
    if f'{prefix}.weight_orig' in state:
        w = _fold_sn(state, prefix)
    else:
        w = np.asarray(state[f'{prefix}.weight'])
    p = {'w': jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if f'{prefix}.bias' in state:
        p['b'] = jnp.asarray(np.asarray(state[f'{prefix}.bias']))
    return p


def convert_torch_dfdnet(state, num_feat=64):
    """Reference DFDNet state dict ('params' payload) -> params tree."""
    from bsvd_tpu.archs.vgg_arch import vgg_names
    p = {'vgg': {}}
    for name in vgg_names('vgg19'):
        if f'vgg_extractor.vgg_net.{name}.weight' in state:
            p['vgg'][name] = _conv_from(state, f'vgg_extractor.vgg_net.{name}')
    p['attn'] = {}
    for fs in FEATURE_SIZES:
        for part in PARTS:
            key = f'{part}_{fs}'
            p['attn'][key] = [
                _conv_from(state, f'attn_blocks.{key}.{i}') for i in (0, 2)]
    p['ms_dilation'] = {
        'blocks': [[_conv_from(state, f'multi_scale_dilation.conv_blocks.{i}.{j}')
                    for j in (0, 2)] for i in range(4)],
        'fusion': _conv_from(state, 'multi_scale_dilation.conv_fusion')}
    for i in range(4):
        p[f'upsample{i}'] = {
            'conv1': _conv_from(state, f'upsample{i}.conv1.1'),
            'convup': _conv_from(state, f'upsample{i}.convup.1'),
            'scale': [_conv_from(state, f'upsample{i}.scale_block.{j}')
                      for j in (0, 2)],
            'shift': [_conv_from(state, f'upsample{i}.shift_block.{j}')
                      for j in (0, 2)]}
    p['upsample4'] = {
        'conv0': _conv_from(state, 'upsample4.0'),
        'res1': [_conv_from(state, f'upsample4.2.body.{j}') for j in (0, 2)],
        'res2': [_conv_from(state, f'upsample4.3.body.{j}') for j in (0, 2)],
        'out': _conv_from(state, 'upsample4.4')}
    del num_feat
    return p


def load_face_dict(dict_path):
    """Facial-component dictionary: torch .pth ({size: {part: (K,C,h,w)}})
    or .npz ('size/part' keys). Stored as NHWC jnp arrays."""
    out = {}
    if str(dict_path).endswith('.npz'):
        with np.load(dict_path) as z:
            for k in z.files:
                size, part = k.split('/')
                out.setdefault(size, {})[part] = jnp.asarray(
                    np.transpose(z[k], (0, 2, 3, 1)))
        return out
    import torch
    d = torch.load(dict_path, map_location='cpu')
    for size, parts in d.items():
        out[str(size)] = {
            part: jnp.asarray(np.transpose(feat.numpy(), (0, 2, 3, 1)))
            for part, feat in parts.items()}
    return out


@ARCH_REGISTRY.register()
class DFDNet:
    """NCHW wrapper (reference dfdnet_arch.py:50-158). Only 512x512 batch-1
    faces, eval only — exactly the reference's supported envelope."""

    def __init__(self, num_feat, dict_path=None, face_dict=None, seed=0,
                 pretrain_path=None):
        self.num_feat = num_feat
        if face_dict is not None:
            self.dict = {str(k): {p: jnp.asarray(v) for p, v in d.items()}
                         for k, d in face_dict.items()}
        elif dict_path is not None:
            self.dict = load_face_dict(dict_path)
        else:
            raise ValueError('DFDNet needs dict_path or face_dict')
        if pretrain_path:
            self.load(pretrain_path)
        else:
            self.params = dfdnet_init(jax.random.PRNGKey(seed), num_feat)

    def load(self, path, param_key='params'):
        import torch
        ckpt = torch.load(path, map_location='cpu')
        state = ckpt.get(param_key, ckpt)
        state = {k: v.numpy() if hasattr(v, 'numpy') else v
                 for k, v in state.items()}
        self.params = convert_torch_dfdnet(state, self.num_feat)
        return self

    def apply(self, params, x_nchw, part_locations):
        x = jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))
        out = dfdnet_apply(params, self.dict, x, part_locations)
        return jnp.transpose(out, (0, 3, 1, 2))

    def __call__(self, x, part_locations):
        return self.apply(self.params, x, part_locations)

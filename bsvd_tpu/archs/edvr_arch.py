"""EDVR — video restoration with PCD (pyramid-cascading-deformable)
alignment and TSA fusion, functional
(reference: BasicSR/basicsr/archs/edvr_arch.py:9-383; the DCN comes from
bsvd_tpu/ops/deform_conv.py instead of the CUDA extension).

Param trees mirror torch module names (ModuleDict levels 'l1'..'l3') so
reference checkpoints convert via the generic key mapper."""

import jax
import jax.numpy as jnp
from jax import lax

from bsvd_tpu.archs.sr_archs import bilinear_resize, lrelu, res_block_apply, res_block_init
from bsvd_tpu.nn.layers import conv2d, conv_init, pixel_shuffle
from bsvd_tpu.nn.warp import interpolate_bilinear
from bsvd_tpu.ops.deform_conv import modulated_deform_conv
from bsvd_tpu.utils.registry import ARCH_REGISTRY


def _up2(x):
    return interpolate_bilinear(x, x.shape[1] * 2, x.shape[2] * 2,
                                align_corners=False)


def _max_pool_3s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             [(0, 0), (1, 1), (1, 1), (0, 0)])


def _avg_pool_3s2(x):
    # torch AvgPool2d(3, 2, 1) default count_include_pad=True: divide by 9
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _dcn_pack_init(key, num_feat, dg):
    k1, k2 = jax.random.split(key)
    p = conv_init(k1, num_feat, num_feat, 3, True)
    off = conv_init(k2, num_feat, dg * 3 * 9, 3, True)
    # reference initializes conv_offset to zero (ModulatedDeformConvPack.init_weights)
    off = {'w': jnp.zeros_like(off['w']), 'b': jnp.zeros_like(off['b'])}
    return {'w': p['w'], 'b': p['b'], 'conv_offset': off}


def _dcn_pack_apply(p, x, feat, dg):
    out = conv2d(p['conv_offset'], feat)
    o1, o2, mask = jnp.split(out, 3, axis=-1)
    offset = jnp.concatenate([o1, o2], axis=-1)
    mask = jax.nn.sigmoid(mask)
    return modulated_deform_conv(x, offset, mask, p['w'], p['b'],
                                 deformable_groups=dg)


# ---------------------------------------------------------------------------
# PCD alignment
# ---------------------------------------------------------------------------

def pcd_alignment_init(key, num_feat=64, deformable_groups=8):
    keys = iter(jax.random.split(key, 16))
    p = {'offset_conv1': {}, 'offset_conv2': {}, 'offset_conv3': {},
         'dcn_pack': {}, 'feat_conv': {}}
    for i in range(3, 0, -1):
        lv = f'l{i}'
        p['offset_conv1'][lv] = conv_init(next(keys), num_feat * 2, num_feat, 3, True)
        if i == 3:
            p['offset_conv2'][lv] = conv_init(next(keys), num_feat, num_feat, 3, True)
        else:
            p['offset_conv2'][lv] = conv_init(next(keys), num_feat * 2, num_feat, 3, True)
            p['offset_conv3'][lv] = conv_init(next(keys), num_feat, num_feat, 3, True)
        p['dcn_pack'][lv] = _dcn_pack_init(next(keys), num_feat, deformable_groups)
        if i < 3:
            p['feat_conv'][lv] = conv_init(next(keys), num_feat * 2, num_feat, 3, True)
    p['cas_offset_conv1'] = conv_init(next(keys), num_feat * 2, num_feat, 3, True)
    p['cas_offset_conv2'] = conv_init(next(keys), num_feat, num_feat, 3, True)
    p['cas_dcnpack'] = _dcn_pack_init(next(keys), num_feat, deformable_groups)
    return p


def pcd_alignment_apply(p, nbr_feat_l, ref_feat_l, dg=8):
    """Align one neighbor's 3-level pyramid to the reference pyramid
    (NHWC lists, index 0 = full res)."""
    upsampled_offset, upsampled_feat = None, None
    feat = None
    for i in range(3, 0, -1):
        lv = f'l{i}'
        offset = jnp.concatenate([nbr_feat_l[i - 1], ref_feat_l[i - 1]], axis=-1)
        offset = lrelu(conv2d(p['offset_conv1'][lv], offset))
        if i == 3:
            offset = lrelu(conv2d(p['offset_conv2'][lv], offset))
        else:
            offset = lrelu(conv2d(p['offset_conv2'][lv],
                                  jnp.concatenate([offset, upsampled_offset], axis=-1)))
            offset = lrelu(conv2d(p['offset_conv3'][lv], offset))

        feat = _dcn_pack_apply(p['dcn_pack'][lv], nbr_feat_l[i - 1], offset, dg)
        if i < 3:
            feat = conv2d(p['feat_conv'][lv],
                          jnp.concatenate([feat, upsampled_feat], axis=-1))
        if i > 1:
            feat = lrelu(feat)
            upsampled_offset = _up2(offset) * 2
            upsampled_feat = _up2(feat)

    offset = jnp.concatenate([feat, ref_feat_l[0]], axis=-1)
    offset = lrelu(conv2d(p['cas_offset_conv2'],
                          lrelu(conv2d(p['cas_offset_conv1'], offset))))
    return lrelu(_dcn_pack_apply(p['cas_dcnpack'], feat, offset, dg))


# ---------------------------------------------------------------------------
# TSA fusion
# ---------------------------------------------------------------------------

def tsa_fusion_init(key, num_feat=64, num_frame=5):
    keys = iter(jax.random.split(key, 16))
    c = conv_init
    return {
        'temporal_attn1': c(next(keys), num_feat, num_feat, 3, True),
        'temporal_attn2': c(next(keys), num_feat, num_feat, 3, True),
        'feat_fusion': c(next(keys), num_frame * num_feat, num_feat, 1, True),
        'spatial_attn1': c(next(keys), num_frame * num_feat, num_feat, 1, True),
        'spatial_attn2': c(next(keys), num_feat * 2, num_feat, 1, True),
        'spatial_attn3': c(next(keys), num_feat, num_feat, 3, True),
        'spatial_attn4': c(next(keys), num_feat, num_feat, 1, True),
        'spatial_attn5': c(next(keys), num_feat, num_feat, 3, True),
        'spatial_attn_l1': c(next(keys), num_feat, num_feat, 1, True),
        'spatial_attn_l2': c(next(keys), num_feat * 2, num_feat, 3, True),
        'spatial_attn_l3': c(next(keys), num_feat, num_feat, 3, True),
        'spatial_attn_add1': c(next(keys), num_feat, num_feat, 1, True),
        'spatial_attn_add2': c(next(keys), num_feat, num_feat, 1, True),
    }


def tsa_fusion_apply(p, aligned_feat, center_frame_idx):
    """aligned_feat: (N, T, H, W, C) -> (N, H, W, C)."""
    n, t, h, w, c = aligned_feat.shape
    emb_ref = conv2d(p['temporal_attn1'], aligned_feat[:, center_frame_idx])
    emb = conv2d(p['temporal_attn2'], aligned_feat)       # (N, T, H, W, C)
    corr = jnp.sum(emb * emb_ref[:, None], axis=-1)       # (N, T, H, W)
    corr_prob = jax.nn.sigmoid(corr)[..., None]           # (N, T, H, W, 1)
    weighted = (aligned_feat * corr_prob)
    # channel concat over frames: (N, H, W, T*C) with frame-major channels
    flat = jnp.moveaxis(weighted, 1, 3).reshape(n, h, w, t * c)

    feat = lrelu(conv2d(p['feat_fusion'], flat, padding=0))

    attn = lrelu(conv2d(p['spatial_attn1'], flat, padding=0))
    attn_max = _max_pool_3s2(attn)
    attn_avg = _avg_pool_3s2(attn)
    attn = lrelu(conv2d(p['spatial_attn2'],
                        jnp.concatenate([attn_max, attn_avg], axis=-1), padding=0))
    attn_level = lrelu(conv2d(p['spatial_attn_l1'], attn, padding=0))
    attn_max = _max_pool_3s2(attn_level)
    attn_avg = _avg_pool_3s2(attn_level)
    attn_level = lrelu(conv2d(p['spatial_attn_l2'],
                              jnp.concatenate([attn_max, attn_avg], axis=-1)))
    attn_level = lrelu(conv2d(p['spatial_attn_l3'], attn_level))
    attn_level = _up2(attn_level)

    attn = lrelu(conv2d(p['spatial_attn3'], attn)) + attn_level
    attn = lrelu(conv2d(p['spatial_attn4'], attn, padding=0))
    attn = _up2(attn)
    attn = conv2d(p['spatial_attn5'], attn)
    attn_add = conv2d(p['spatial_attn_add2'],
                      lrelu(conv2d(p['spatial_attn_add1'], attn, padding=0)),
                      padding=0)
    attn = jax.nn.sigmoid(attn)
    return feat * attn * 2 + attn_add


# ---------------------------------------------------------------------------
# Predeblur
# ---------------------------------------------------------------------------

def predeblur_init(key, num_in_ch=3, num_feat=64, hr_in=False):
    """Pre-deblur feature pyramid (reference edvr_arch.py:193-243)."""
    keys = iter(jax.random.split(key, 16))
    p = {'conv_first': conv_init(next(keys), num_in_ch, num_feat, 3, True)}
    if hr_in:
        p['stride_conv_hr1'] = conv_init(next(keys), num_feat, num_feat, 3, True)
        p['stride_conv_hr2'] = conv_init(next(keys), num_feat, num_feat, 3, True)
    p['stride_conv_l2'] = conv_init(next(keys), num_feat, num_feat, 3, True)
    p['stride_conv_l3'] = conv_init(next(keys), num_feat, num_feat, 3, True)
    p['resblock_l3'] = res_block_init(next(keys), num_feat)
    p['resblock_l2_1'] = res_block_init(next(keys), num_feat)
    p['resblock_l2_2'] = res_block_init(next(keys), num_feat)
    p['resblock_l1'] = {str(i): res_block_init(next(keys), num_feat)
                        for i in range(5)}
    return p


def predeblur_apply(p, x, hr_in=False):
    """x: (N, H, W, C_in) -> (N, H[/4], W[/4], num_feat)
    (reference edvr_arch.py:224-243; hr_in downsamples x4 first)."""
    feat_l1 = lrelu(conv2d(p['conv_first'], x))
    if hr_in:
        feat_l1 = lrelu(conv2d(p['stride_conv_hr1'], feat_l1, stride=2))
        feat_l1 = lrelu(conv2d(p['stride_conv_hr2'], feat_l1, stride=2))
    feat_l2 = lrelu(conv2d(p['stride_conv_l2'], feat_l1, stride=2))
    feat_l3 = lrelu(conv2d(p['stride_conv_l3'], feat_l2, stride=2))
    feat_l3 = _up2(res_block_apply(p['resblock_l3'], feat_l3))
    feat_l2 = res_block_apply(p['resblock_l2_1'], feat_l2) + feat_l3
    feat_l2 = _up2(res_block_apply(p['resblock_l2_2'], feat_l2))
    for i in range(2):
        feat_l1 = res_block_apply(p['resblock_l1'][str(i)], feat_l1)
    feat_l1 = feat_l1 + feat_l2
    for i in range(2, 5):
        feat_l1 = res_block_apply(p['resblock_l1'][str(i)], feat_l1)
    return feat_l1


# ---------------------------------------------------------------------------
# EDVR
# ---------------------------------------------------------------------------

def edvr_init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_frame=5,
              deformable_groups=8, num_extract_block=5,
              num_reconstruct_block=10, with_tsa=True, with_predeblur=False,
              hr_in=False):
    keys = iter(jax.random.split(key, 32))
    if with_predeblur:
        p = {'predeblur': predeblur_init(next(keys), num_in_ch, num_feat,
                                         hr_in),
             'conv_1x1': conv_init(next(keys), num_feat, num_feat, 1, True)}
    else:
        p = {'conv_first': conv_init(next(keys), num_in_ch, num_feat, 3,
                                     True)}
    p.update({
        'feature_extraction': {str(i): res_block_init(next(keys), num_feat)
                               for i in range(num_extract_block)},
        'conv_l2_1': conv_init(next(keys), num_feat, num_feat, 3, True),
        'conv_l2_2': conv_init(next(keys), num_feat, num_feat, 3, True),
        'conv_l3_1': conv_init(next(keys), num_feat, num_feat, 3, True),
        'conv_l3_2': conv_init(next(keys), num_feat, num_feat, 3, True),
        'pcd_align': pcd_alignment_init(next(keys), num_feat, deformable_groups),
        'reconstruction': {str(i): res_block_init(next(keys), num_feat)
                           for i in range(num_reconstruct_block)},
        'upconv1': conv_init(next(keys), num_feat, num_feat * 4, 3, True),
        'upconv2': conv_init(next(keys), num_feat, 64 * 4, 3, True),
        'conv_hr': conv_init(next(keys), 64, 64, 3, True),
        'conv_last': conv_init(next(keys), 64, num_out_ch, 3, True),
    })
    if with_tsa:
        p['fusion'] = tsa_fusion_init(next(keys), num_feat, num_frame)
    else:
        p['fusion'] = conv_init(next(keys), num_frame * num_feat, num_feat, 1, True)
    return p


def edvr_apply(p, x, center_frame_idx=None, deformable_groups=8,
               with_tsa=True, hr_in=False):
    """x: (N, T, H, W, C) -> (N, 4H, 4W, C_out) (or (N, H, W, C_out) when
    hr_in: the input is already high-res and gets downsampled x4 inside the
    predeblur module, reference edvr_arch.py:328-338,378-381)."""
    n, t, h, w, c = x.shape
    if hr_in:
        assert h % 16 == 0 and w % 16 == 0, \
            'The height and width must be multiple of 16.'
    else:
        assert h % 4 == 0 and w % 4 == 0, \
            'The height and width must be multiple of 4.'
    if center_frame_idx is None:
        center_frame_idx = t // 2
    x_center = x[:, center_frame_idx]

    if 'predeblur' in p:
        feat_l1 = predeblur_apply(p['predeblur'], x.reshape(n * t, h, w, c),
                                  hr_in)
        feat_l1 = conv2d(p['conv_1x1'], feat_l1, padding=0)
        if hr_in:
            h, w = h // 4, w // 4
    else:
        feat_l1 = lrelu(conv2d(p['conv_first'], x.reshape(n * t, h, w, c)))
    for i in range(len(p['feature_extraction'])):
        feat_l1 = res_block_apply(p['feature_extraction'][str(i)], feat_l1)
    feat_l2 = lrelu(conv2d(p['conv_l2_1'], feat_l1, stride=2))
    feat_l2 = lrelu(conv2d(p['conv_l2_2'], feat_l2))
    feat_l3 = lrelu(conv2d(p['conv_l3_1'], feat_l2, stride=2))
    feat_l3 = lrelu(conv2d(p['conv_l3_2'], feat_l3))

    f1 = feat_l1.reshape(n, t, h, w, -1)
    f2 = feat_l2.reshape(n, t, h // 2, w // 2, -1)
    f3 = feat_l3.reshape(n, t, h // 4, w // 4, -1)

    ref = [f1[:, center_frame_idx], f2[:, center_frame_idx], f3[:, center_frame_idx]]
    aligned = [pcd_alignment_apply(p['pcd_align'],
                                   [f1[:, i], f2[:, i], f3[:, i]], ref,
                                   deformable_groups)
               for i in range(t)]
    aligned_feat = jnp.stack(aligned, axis=1)              # (N, T, H, W, C)

    if with_tsa:
        feat = tsa_fusion_apply(p['fusion'], aligned_feat, center_frame_idx)
    else:
        flat = jnp.moveaxis(aligned_feat, 1, 3).reshape(n, h, w, -1)
        feat = conv2d(p['fusion'], flat, padding=0)

    out = feat
    for i in range(len(p['reconstruction'])):
        out = res_block_apply(p['reconstruction'][str(i)], out)
    out = lrelu(pixel_shuffle(conv2d(p['upconv1'], out), 2))
    out = lrelu(pixel_shuffle(conv2d(p['upconv2'], out), 2))
    out = lrelu(conv2d(p['conv_hr'], out))
    out = conv2d(p['conv_last'], out)
    base = x_center if hr_in else bilinear_resize(x_center, 4)
    return out + base


@ARCH_REGISTRY.register()
class EDVR:
    def __init__(self, num_in_ch=3, num_out_ch=3, num_feat=64, num_frame=5,
                 deformable_groups=8, num_extract_block=5,
                 num_reconstruct_block=10, center_frame_idx=None, hr_in=False,
                 with_predeblur=False, with_tsa=True, seed=0,
                 param_dtype=jnp.float32):
        self.num_frame = num_frame
        self.center_frame_idx = (num_frame // 2 if center_frame_idx is None
                                 else center_frame_idx)
        self.deformable_groups = deformable_groups
        self.with_tsa = with_tsa
        self.hr_in = hr_in
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            edvr_init(jax.random.PRNGKey(seed), num_in_ch, num_out_ch,
                      num_feat, num_frame, deformable_groups,
                      num_extract_block, num_reconstruct_block, with_tsa,
                      with_predeblur, hr_in))

    def apply(self, params, x_ntchw):
        x = jnp.transpose(jnp.asarray(x_ntchw), (0, 1, 3, 4, 2))
        y = edvr_apply(params, x, self.center_frame_idx,
                       self.deformable_groups, self.with_tsa, self.hr_in)
        return jnp.transpose(y, (0, 3, 1, 2))

    def __call__(self, x):
        """(N, T, C, H, W) -> (N, C_out, 4H, 4W) center-frame restoration."""
        return self.apply(self.params, x)

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self

"""Modulated deformable convolution (DCNv2) in pure jnp — the TPU-native
replacement for the reference's 2,095-LoC CUDA extension
(reference: BasicSR/basicsr/ops/dcn/* + DCNv2Pack, archs/arch_util.py:208-235).

Formulation: deformable conv is bilinear-sampled im2col + one matmul. For
each kernel tap k and deformable group g, sample the group's channels at
``p + p_k + Δp_k(p)`` (bilinear, zero padding), scale by the modulation mask,
stack into columns, and contract with the weights on the MXU. Offset/mask
channel layouts match the CUDA kernel's consumption order, so converted
checkpoints behave identically:

- offset: (N, dg*2*kh*kw, H', W') with, per group, (Δy_k, Δx_k) interleaved
  over taps in row-major (kh, kw) order;
- mask:   (N, dg*kh*kw, H', W').

All arrays here are channel-last (NHWC); the arch wrappers transpose.
"""

import jax.numpy as jnp

from bsvd_tpu.nn.warp import grid_sample


def modulated_deform_conv(x, offset, mask, weight, bias=None, stride=1,
                          padding=1, dilation=1, deformable_groups=1):
    """DCNv2 forward.

    Args:
        x: (N, H, W, C).
        offset: (N, H', W', dg*2*kh*kw) — layout as in module docstring.
        mask: (N, H', W', dg*kh*kw) (already sigmoided) or None (DCNv1).
        weight: (kh, kw, C, Cout) HWIO.
        bias: (Cout,) or None.
    Returns:
        (N, H', W', Cout).
    """
    n, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    dg = deformable_groups
    k = kh * kw
    ho, wo = offset.shape[1:3]
    cg = c // dg

    off = offset.reshape(n, ho, wo, dg, k, 2)     # [..., g, k, (y, x)]
    msk = None if mask is None else mask.reshape(n, ho, wo, dg, k)

    # All taps and groups sampled in ONE grid_sample call: taps fold into the
    # width axis, deformable groups into the batch axis. A Python loop here
    # would emit k*dg gathers (18+ per conv) — brutal for trace/compile time
    # and a sea of tiny gathers on TPU; this form emits exactly 4.
    gy = jnp.arange(ho, dtype=x.dtype)[:, None] * stride - padding
    gx = jnp.arange(wo, dtype=x.dtype)[None, :] * stride - padding
    taps = jnp.arange(k)
    tap_y = (taps // kw).astype(x.dtype) * dilation            # (K,)
    tap_x = (taps % kw).astype(x.dtype) * dilation
    py = gy[:, :, None] + tap_y                                # (Ho, Wo, K)
    px = gx[:, :, None] + tap_x

    dyx = jnp.moveaxis(off, 3, 1)                  # (N, dg, Ho, Wo, K, 2)
    cx = px[None, None] + dyx[..., 1]
    cy = py[None, None] + dyx[..., 0]
    coords = jnp.stack([cx, cy], axis=-1).reshape(n * dg, ho, wo * k, 2)

    img_g = x.reshape(n, h, w, dg, cg)
    img_g = jnp.moveaxis(img_g, 3, 1).reshape(n * dg, h, w, cg)
    sampled = grid_sample(img_g, coords, 'bilinear', 'zeros')
    sampled = sampled.reshape(n, dg, ho, wo, k, cg)
    if msk is not None:
        sampled = sampled * jnp.moveaxis(msk, 3, 1)[..., None]

    # col channel order must be K-major over C with C grouped [g0.., g1..]
    # to match weight.reshape(kh*kw*c, cout)'s (ki,kj) major over C layout.
    col = jnp.moveaxis(sampled, 1, 4)              # (N, Ho, Wo, K, dg, cg)
    w_mat = weight.reshape(kh * kw * c, cout)          # (ki,kj) major over C
    col = col.reshape(n, ho, wo, k * c)
    y = jnp.einsum('nhwc,cd->nhwd', col, w_mat)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def dcn_v2_pack_apply(params, x, feat, deformable_groups=1, stride=1,
                      padding=1, dilation=1):
    """DCNv2Pack: offsets/masks predicted from a *different* feature map
    (reference arch_util.py:219-235).

    params: {'conv_offset': {'w','b'}, 'w': (kh,kw,C,Cout), 'b': (Cout,)}.
    """
    from bsvd_tpu.nn.layers import conv2d
    out = conv2d(params['conv_offset'], x=feat, stride=stride, padding=padding)
    o1, o2, mask = jnp.split(out, 3, axis=-1)
    offset = jnp.concatenate([o1, o2], axis=-1)
    mask = jnp.asarray(1 / (1 + jnp.exp(-mask)), x.dtype)
    return modulated_deform_conv(x, offset, mask, params['w'],
                                 params.get('b'), stride, padding, dilation,
                                 deformable_groups)

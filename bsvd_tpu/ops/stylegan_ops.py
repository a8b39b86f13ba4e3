"""XLA-native replacements for the reference's StyleGAN CUDA extensions
(reference: BasicSR/basicsr/ops/fused_act/* and ops/upfirdn2d/* — 807 LoC of
CUDA). On TPU both are single fused XLA expressions: the pointwise
bias+LeakyReLU fuses into neighbours automatically, and up-pad-FIR-down is
one dilated/strided conv.
"""

import jax.numpy as jnp
from jax import lax


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2**0.5):
    """bias + LeakyReLU + scale (reference fused_act.py semantics).

    x: (..., C) channel-last (NHWC); reference is NCHW — callers in this
    framework are NHWC throughout.
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Upsample (zero-stuff) -> pad -> FIR filter -> downsample.

    Args:
        x: (N, H, W, C) NHWC.
        kernel: (kh, kw) separable-or-not FIR kernel (float).
        up/down: int or (int, int).
        pad: (pad0, pad1) applied to both spatial dims (reference convention).
    Returns:
        (N, H_out, W_out, C).
    """
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    if len(pad) == 2:
        pad_x0 = pad_y0 = pad[0]
        pad_x1 = pad_y1 = pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    n, h, w, c = x.shape

    # 1) zero-stuffed upsample via lhs dilation inside the conv, with the
    #    FIR kernel applied depthwise (feature_group_count = C).
    k = jnp.asarray(kernel, x.dtype)[::-1, ::-1]          # correlation->conv flip
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))        # HWIO depthwise

    # torch's upfirdn zero-stuffs AFTER every sample (trailing up-1 zeros);
    # lhs_dilation only inserts zeros between samples, so extend the high pad
    y = lax.conv_general_dilated(
        x, k,
        window_strides=(down[0], down[1]),
        padding=((pad_y0, pad_y1 + up[0] - 1), (pad_x0, pad_x1 + up[1] - 1)),
        lhs_dilation=(up[0], up[1]),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c,
    )
    return y


def make_resample_kernel(k):
    """1D list -> normalized 2D FIR kernel (reference upfirdn2d.py helper)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / jnp.sum(k)
    return k


def upsample(x, kernel, factor=2):
    k = kernel * (factor ** 2)
    p = kernel.shape[0] - factor
    return upfirdn2d(x, k, up=factor, down=1,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample(x, kernel, factor=2):
    p = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=1, down=factor,
                     pad=((p + 1) // 2, p // 2))

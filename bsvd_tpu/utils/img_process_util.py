"""Image processing utilities: USM sharpening
(reference: BasicSR/basicsr/utils/img_process_util.py — numpy/cv2 variant and
a batched jnp variant replacing the torch one)."""

import cv2
import numpy as np


def usm_sharp(img, weight=0.5, radius=50, threshold=10):
    """Unsharp masking with a soft threshold mask.

    Args:
        img (ndarray): HWC BGR float32 in [0, 1].
    """
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = np.abs(residual) * 255 > threshold
    mask = mask.astype(np.float32)
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)

    sharp = img + weight * residual
    sharp = np.clip(sharp, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def usm_sharp_jax(img, weight=0.5, radius=51, threshold=10):
    """Batched USM on (N, H, W, C) jnp arrays (Gaussian via separable conv)."""
    import jax.numpy as jnp
    from jax import lax
    if radius % 2 == 0:
        radius += 1
    sigma = 0.3 * ((radius - 1) * 0.5 - 1) + 0.8    # cv2 default sigma
    half = radius // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (xs / sigma) ** 2)
    g = g / g.sum()

    def blur(x):
        # reflect padding (edge not repeated) matches the reference
        # filter2D's F.pad(mode='reflect') (img_process_util.py:7-31);
        # zero padding would darken a half-kernel border band
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (half, half), (half, half), (0, 0)),
                    mode='reflect')
        kh = jnp.tile(g.reshape(radius, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(g.reshape(1, radius, 1, 1), (1, 1, 1, c))
        x = lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                     feature_group_count=c)
        return lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (0, 0)],
                                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                        feature_group_count=c)

    residual = img - blur(img)
    mask = (jnp.abs(residual) * 255 > threshold).astype(img.dtype)
    soft_mask = blur(mask)
    sharp = jnp.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img

"""Differentiable JPEG in jnp (reference: BasicSR/basicsr/utils/diffjpeg.py —
itself modified from mlomnitz/DiffJPEG). Batched, jittable, usable inside
training degradation pipelines; matches the reference numerically including
its idiosyncratic chroma upsampling layout.
"""

import itertools

import jax.numpy as jnp
import numpy as np

Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99]],
    dtype=np.float32).T

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66],
                            [24, 26, 56, 99], [47, 66, 99, 99]],
                           dtype=np.float32).T

_DCT = np.zeros((8, 8, 8, 8), dtype=np.float32)
for _x, _y, _u, _v in itertools.product(range(8), repeat=4):
    _DCT[_x, _y, _u, _v] = (np.cos((2 * _x + 1) * _u * np.pi / 16) *
                            np.cos((2 * _y + 1) * _v * np.pi / 16))
_ALPHA = np.outer(np.array([1. / np.sqrt(2)] + [1] * 7),
                  np.array([1. / np.sqrt(2)] + [1] * 7)).astype(np.float32)
_IDCT = np.transpose(_DCT, (2, 3, 0, 1))


def diff_round(x):
    return jnp.round(x) + (x - jnp.round(x))**3


def quality_to_factor(quality):
    quality = jnp.asarray(quality, jnp.float32)
    q = jnp.where(quality < 50, 5000. / quality, 200. - quality * 2)
    return q / 100.


def _rgb2ycbcr(img):
    m = jnp.asarray([[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5],
                     [0.5, -0.418688, -0.081312]], jnp.float32).T
    return img @ m + jnp.asarray([0., 128., 128.])


def _ycbcr2rgb(img):
    m = jnp.asarray([[1., 0., 1.402], [1, -0.344136, -0.714136],
                     [1, 1.772, 0]], jnp.float32).T
    return (img + jnp.asarray([0., -128., -128.])) @ m


def _block_split(img):
    b, h, w = img.shape
    x = img.reshape(b, h // 8, 8, w // 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, -1, 8, 8)


def _block_merge(patches, h, w):
    b = patches.shape[0]
    x = patches.reshape(b, h // 8, w // 8, 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, h, w)


def _dct(blocks):
    x = blocks - 128.
    return jnp.asarray(_ALPHA * 0.25) * jnp.tensordot(x, jnp.asarray(_DCT), axes=2)


def _idct(blocks):
    x = blocks * jnp.asarray(_ALPHA)
    return 0.25 * jnp.tensordot(x, jnp.asarray(_IDCT), axes=2) + 128.


def _chroma_subsample(ycc):
    """(B, H, W, 3) -> y (B,H,W), cb/cr (B,H/2,W/2) (2x2 mean)."""
    def pool(c):
        b, h, w = c.shape
        return c.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    return ycc[..., 0], pool(ycc[..., 1]), pool(ycc[..., 2])


def _chroma_upsample(y, cb, cr):
    def repeat(x, k=2):
        b, h, w = x.shape
        x = jnp.tile(x[..., None], (1, 1, k, k))     # (b, h, w*k, k)
        return x.reshape(b, h * k, w * k)            # reference layout quirk
    return jnp.stack([y, repeat(cb), repeat(cr)], axis=-1)


def diff_jpeg(x, quality, differentiable=True):
    """Differentiable JPEG round trip.

    Args:
        x: (N, H, W, C=3) RGB float in [0, 1] (NHWC — the reference takes
            NCHW; the DiffJPEG wrapper class below adapts).
        quality: scalar or (N,) quality in (0, 100].
    Returns:
        (N, H, W, 3) in [0, 1].
    """
    rounding = diff_round if differentiable else jnp.round
    factor = quality_to_factor(quality)
    factor = jnp.reshape(factor, (-1, 1, 1, 1))
    n, h, w, _ = x.shape
    h_pad = (16 - h % 16) % 16
    w_pad = (16 - w % 16) % 16
    x = jnp.pad(x, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    hp, wp = h + h_pad, w + w_pad

    ycc = _rgb2ycbcr(x * 255.)
    y, cb, cr = _chroma_subsample(ycc)

    comps = {}
    for name, comp, table in (('y', y, Y_TABLE), ('cb', cb, C_TABLE),
                              ('cr', cr, C_TABLE)):
        blocks = _dct(_block_split(comp))
        q = jnp.asarray(table) * factor
        comps[name] = rounding(blocks / q)

    out = {}
    for name, comp, table in (('y', comps['y'], Y_TABLE),
                              ('cb', comps['cb'], C_TABLE),
                              ('cr', comps['cr'], C_TABLE)):
        q = jnp.asarray(table) * factor
        deq = comp * q
        hh, ww = (hp, wp) if name == 'y' else (hp // 2, wp // 2)
        out[name] = _block_merge(_idct(deq), hh, ww)

    img = _ycbcr2rgb(_chroma_upsample(out['y'], out['cb'], out['cr']))
    img = jnp.clip(img, 0., 255.) / 255.
    return img[:, :h, :w]


class DiffJPEG:
    """Reference-compatible wrapper: NCHW in/out."""

    def __init__(self, differentiable=True):
        self.differentiable = differentiable

    def __call__(self, x, quality):
        xh = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
        y = diff_jpeg(xh, quality, self.differentiable)
        return jnp.transpose(y, (0, 3, 1, 2))

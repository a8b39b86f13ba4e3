"""Modulated deformable conv: zero-offset degeneration to plain conv and a
direct numpy-loop oracle (the reference's CUDA kernels cannot run here, so
the oracle is an independent scalar implementation of the same math)."""

import numpy as np

import jax.numpy as jnp

from bsvd_tpu.nn.layers import conv2d
from bsvd_tpu.ops.deform_conv import modulated_deform_conv


def _bilinear(x, yy, xx):
    """zero-padded bilinear sample of x (H, W) at float (yy, xx)."""
    h, w = x.shape
    y0, x0 = int(np.floor(yy)), int(np.floor(xx))
    val = 0.0
    for dy, wy in ((0, 1 - (yy - y0)), (1, yy - y0)):
        for dx, wx in ((0, 1 - (xx - x0)), (1, xx - x0)):
            yi, xi = y0 + dy, x0 + dx
            if 0 <= yi < h and 0 <= xi < w:
                val += wy * wx * x[yi, xi]
    return val


def _oracle(x, offset, mask, weight, bias, stride, padding, dilation, dg):
    n, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho, wo = offset.shape[1:3]
    cg = c // dg
    out = np.zeros((n, ho, wo, cout), np.float64)
    off = offset.reshape(n, ho, wo, dg, k, 2)
    msk = mask.reshape(n, ho, wo, dg, k)
    for b in range(n):
        for i in range(ho):
            for j in range(wo):
                for ki in range(kh):
                    for kj in range(kw):
                        t = ki * kw + kj
                        for ci in range(c):
                            g = ci // cg
                            yy = i * stride - padding + ki * dilation + off[b, i, j, g, t, 0]
                            xx = j * stride - padding + kj * dilation + off[b, i, j, g, t, 1]
                            v = _bilinear(x[b, :, :, ci], yy, xx) * msk[b, i, j, g, t]
                            out[b, i, j] += v * weight[ki, kj, ci]
    return out + bias


def test_zero_offset_equals_conv():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 9, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32) * 0.2
    b = rng.standard_normal(6).astype(np.float32)
    offset = np.zeros((1, 8, 9, 2 * 9), np.float32)
    mask = np.ones((1, 8, 9, 9), np.float32)
    got = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(w),
                                jnp.asarray(b))
    ref = conv2d({'w': jnp.asarray(w), 'b': jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_oracle_parity_groups_and_stride():
    rng = np.random.default_rng(1)
    n, h, w, c, cout, dg = 1, 6, 7, 4, 3, 2
    stride, padding = 2, 1
    ho = (h + 2 * padding - 3) // stride + 1
    wo = (w + 2 * padding - 3) // stride + 1
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    wt = rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.3
    b = rng.standard_normal(cout).astype(np.float32)
    offset = (rng.standard_normal((n, ho, wo, dg * 18)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (n, ho, wo, dg * 9)).astype(np.float32)

    got = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(wt),
                                jnp.asarray(b), stride=stride,
                                padding=padding, deformable_groups=dg)
    ref = _oracle(x.astype(np.float64), offset.astype(np.float64),
                  mask.astype(np.float64), wt.astype(np.float64),
                  b.astype(np.float64), stride, padding, 1, dg)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)

"""Frechet Inception Distance
(reference: BasicSR/basicsr/metrics/fid.py:1-93).

The feature extractor is the jnp FID InceptionV3
(:mod:`bsvd_tpu.archs.inception_arch`); the distance itself is host-side
numpy/scipy — it is an O(2048^3) sqrtm done once per evaluation, not a hot
op, so it does not belong on the TPU.
"""

import numpy as np
from scipy import linalg

import jax
import jax.numpy as jnp

from bsvd_tpu.archs.inception_arch import (inception_v3_apply,
                                           load_torch_inception)

__all__ = ['load_patched_inception_v3', 'extract_inception_features',
           'calculate_fid']


def load_patched_inception_v3(resize_input=True, normalize_input=False,
                              pretrain_path=None):
    """(params, jitted pool3-feature fn) — the rosinality/StyleGAN2 patched
    configuration the reference uses (fid.py:10-15): resize on,
    normalize off (callers feed [-1, 1])."""
    params = load_torch_inception(pretrain_path)

    @jax.jit
    def features(params, x):
        feat = inception_v3_apply(params, x, output_blocks=(3,),
                                  resize_input=resize_input,
                                  normalize_input=normalize_input)[0]
        return feat.reshape(feat.shape[0], -1)

    return params, features


def extract_inception_features(data_generator, inception, len_generator=None):
    """Run every batch through the extractor; returns (N, 2048) np.ndarray.

    ``data_generator`` yields (N, H, W, 3) NHWC float arrays (NCHW is
    transposed automatically). Reference: fid.py:18-47 (tqdm progress is
    replaced by a per-batch log count).
    """
    params, feat_fn = inception
    feats = []
    for data in data_generator:
        x = jnp.asarray(data)
        if x.ndim == 4 and x.shape[1] == 3 and x.shape[-1] != 3:
            x = jnp.transpose(x, (0, 2, 3, 1))
        feats.append(np.asarray(feat_fn(params, x)))
    return np.concatenate(feats, axis=0)


def calculate_fid(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Frechet distance between N(mu1, sigma1) and N(mu2, sigma2):
    ||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)), with the Dougal Sutherland
    stabilization (reference fid.py:50-93)."""
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    assert mu1.shape == mu2.shape, 'Two mean vectors have different lengths'
    assert sigma1.shape == sigma2.shape, \
        'Two covariances have different dimensions'

    cov_sqrt, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(cov_sqrt).all():
        print(f'Product of cov matrices is singular; adding {eps} to the '
              'diagonals')
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f'Imaginary component {m}')
        cov_sqrt = cov_sqrt.real

    mean_diff = mu1 - mu2
    return (mean_diff @ mean_diff + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(cov_sqrt))

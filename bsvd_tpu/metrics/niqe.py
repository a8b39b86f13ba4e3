"""NIQE — no-reference image quality (MATLAB-faithful re-implementation;
reference math: BasicSR/basicsr/metrics/niqe.py:13-200).

The metric needs the pristine-MVG parameter file (mu/cov estimated on the
official pristine dataset; not re-derivable without it). The file is located
via, in order: the ``niqe_pris_params`` kwarg, ``$BSVD_NIQE_PARAMS``, or a
copy next to this module. The 7x7 Gaussian
window is computed directly (MATLAB fspecial('gaussian', 7, 7/6)).
"""

import math
import os

import cv2
import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma

from bsvd_tpu.metrics.psnr_ssim import reorder_image, to_y_channel
from bsvd_tpu.utils.matlab_functions import imresize
from bsvd_tpu.utils.registry import METRIC_REGISTRY

_PARAM_SEARCH = (
    os.path.join(os.path.dirname(os.path.abspath(__file__)), 'niqe_pris_params.npz'),
)


def _gaussian_window():
    """fspecial('gaussian', 7, 7/6), normalized to unit sum."""
    sigma = 7 / 6
    g = cv2.getGaussianKernel(7, sigma)
    w = np.outer(g, g.T)
    return w / w.sum()


def _load_pris_params(path=None):
    candidates = ([path] if path else []) + \
        ([os.environ['BSVD_NIQE_PARAMS']] if 'BSVD_NIQE_PARAMS' in os.environ else []) + \
        list(_PARAM_SEARCH)
    for cand in candidates:
        if cand and os.path.isfile(cand):
            z = np.load(cand)
            return z['mu_pris_param'], z['cov_pris_param']
    raise FileNotFoundError(
        'niqe_pris_params.npz not found; set BSVD_NIQE_PARAMS or pass '
        'niqe_pris_params=<path> (the pristine MVG parameters are data, not '
        'code, and must be provided).')


def estimate_aggd_param(block):
    """Asymmetric generalized Gaussian fit (Eq. 7 of the NIQE paper)."""
    block = block.flatten()
    gam = np.arange(0.2, 10.001, 0.001)
    gam_reciprocal = np.reciprocal(gam)
    r_gam = (np.square(gamma(gam_reciprocal * 2)) /
             (gamma(gam_reciprocal) * gamma(gam_reciprocal * 3)))

    left_std = np.sqrt(np.mean(block[block < 0]**2))
    right_std = np.sqrt(np.mean(block[block > 0]**2))
    gammahat = left_std / right_std
    rhat = (np.mean(np.abs(block)))**2 / np.mean(block**2)
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / ((gammahat**2 + 1)**2)
    pos = np.argmin((r_gam - rhatnorm)**2)
    alpha = gam[pos]
    beta_l = left_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    beta_r = right_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    return alpha, beta_l, beta_r


def compute_feature(block):
    """18 AGGD features of a normalized block (Eq. 8)."""
    feat = []
    alpha, beta_l, beta_r = estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    for shift in ([0, 1], [1, 0], [1, 1], [1, -1]):
        shifted = np.roll(block, shift, axis=(0, 1))
        alpha, beta_l, beta_r = estimate_aggd_param(block * shifted)
        mean = (beta_r - beta_l) * (gamma(2 / alpha) / gamma(1 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return feat


def niqe_core(img, mu_pris_param, cov_pris_param, gaussian_window,
              block_size_h=96, block_size_w=96):
    assert img.ndim == 2
    h, w = img.shape
    num_block_h = math.floor(h / block_size_h)
    num_block_w = math.floor(w / block_size_w)
    if num_block_h == 0 or num_block_w == 0:
        raise ValueError(
            f'NIQE needs images of at least {block_size_h}x{block_size_w} '
            f'(after border crop); got {h}x{w}.')
    img = img[0:num_block_h * block_size_h, 0:num_block_w * block_size_w]

    distparam = []
    for scale in (1, 2):
        mu = convolve(img, gaussian_window, mode='nearest')
        sigma = np.sqrt(np.abs(convolve(np.square(img), gaussian_window,
                                        mode='nearest') - np.square(mu)))
        img_normalized = (img - mu) / (sigma + 1)
        feat = []
        for idx_w in range(num_block_w):
            for idx_h in range(num_block_h):
                block = img_normalized[
                    idx_h * block_size_h // scale:(idx_h + 1) * block_size_h // scale,
                    idx_w * block_size_w // scale:(idx_w + 1) * block_size_w // scale]
                feat.append(compute_feature(block))
        distparam.append(np.array(feat))
        if scale == 1:
            img = imresize(img / 255., scale=0.5, antialiasing=True) * 255.

    distparam = np.concatenate(distparam, axis=1)
    mu_distparam = np.nanmean(distparam, axis=0)
    distparam_no_nan = distparam[~np.isnan(distparam).any(axis=1)]
    cov_distparam = np.cov(distparam_no_nan, rowvar=False)

    invcov_param = np.linalg.pinv((cov_pris_param + cov_distparam) / 2)
    diff = mu_pris_param - mu_distparam
    quality = float(np.squeeze(np.sqrt(diff @ invcov_param @ diff.T)))
    return quality


@METRIC_REGISTRY.register()
def calculate_niqe(img, crop_border, input_order='HWC', convert_to='y',
                   niqe_pris_params=None, **kwargs):
    """NIQE of a BGR uint8/float image in [0, 255]."""
    mu_pris, cov_pris = _load_pris_params(niqe_pris_params)
    window = _gaussian_window()

    img = np.asarray(img).astype(np.float32)
    if input_order != 'HW':
        img = reorder_image(img, input_order=input_order)
        if convert_to == 'y':
            img = to_y_channel(img)
        elif convert_to == 'gray':
            img = cv2.cvtColor(img / 255., cv2.COLOR_BGR2GRAY) * 255.
        img = np.squeeze(img)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    img = img.round()
    return niqe_core(img, mu_pris, cov_pris, window)

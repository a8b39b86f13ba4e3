"""Degradation synthesis: blur kernels, Gaussian/Poisson noise, JPEG
(reference API: BasicSR/basicsr/data/degradations.py — the Real-ESRGAN-style
degradation toolbox). Kernel generation is host-side numpy; the noise adders
come in numpy (``add_*``) and jnp batched (``add_*_jax``, replacing the
reference's ``*_pt`` torch variants) forms.
"""

import math

import cv2
import numpy as np
from scipy import special
from scipy.stats import multivariate_normal


# ---------------------------------------------------------------------------
# blur kernels
# ---------------------------------------------------------------------------

def sigma_matrix2(sig_x, sig_y, theta):
    """Rotated 2D covariance matrix."""
    d = np.array([[sig_x**2, 0], [0, sig_y**2]])
    u = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def mesh_grid(kernel_size):
    """Zero-centered (K, K, 2) grid plus xx/yy components."""
    ax = np.arange(-kernel_size // 2 + 1., kernel_size // 2 + 1.)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.stack([xx, yy], axis=-1)
    return xy, xx, yy


def pdf2(sigma_matrix, grid):
    inv = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.sum((grid @ inv) * grid, 2))


def cdf2(d_matrix, grid):
    rv = multivariate_normal([0, 0], [[1, 0], [0, 1]])
    return rv.cdf(grid @ d_matrix)


def bivariate_Gaussian(kernel_size, sig_x, sig_y, theta, grid=None,
                       isotropic=True):
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma = sigma_matrix2(sig_x, sig_y, theta)
    kernel = pdf2(sigma, grid)
    return kernel / np.sum(kernel)


def bivariate_generalized_Gaussian(kernel_size, sig_x, sig_y, theta, beta,
                                   grid=None, isotropic=True):
    """exp(-(x^T Σ⁻¹ x / 2)^beta), normalized."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma = sigma_matrix2(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    kernel = np.exp(-0.5 * np.power(np.sum((grid @ inv) * grid, 2), beta))
    return kernel / np.sum(kernel)


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, grid=None,
                      isotropic=True):
    """1 / (1 + (x^T Σ⁻¹ x)^beta), normalized."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma = sigma_matrix2(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    kernel = np.reciprocal(np.power(np.sum((grid @ inv) * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def _rand_params(rng, kernel_size, sigma_x_range, sigma_y_range, rotation_range,
                 isotropic):
    assert kernel_size % 2 == 1, 'Kernel size must be an odd number.'
    sigma_x = rng.uniform(sigma_x_range[0], sigma_x_range[1])
    if isotropic:
        sigma_y, rotation = sigma_x, 0.0
    else:
        sigma_y = rng.uniform(sigma_y_range[0], sigma_y_range[1])
        rotation = rng.uniform(rotation_range[0], rotation_range[1])
    return sigma_x, sigma_y, rotation


def random_bivariate_Gaussian(kernel_size, sigma_x_range, sigma_y_range,
                              rotation_range, noise_range=None, isotropic=True,
                              rng=None):
    rng = rng or np.random.default_rng()
    sx, sy, rot = _rand_params(rng, kernel_size, sigma_x_range, sigma_y_range,
                               rotation_range, isotropic)
    kernel = bivariate_Gaussian(kernel_size, sx, sy, rot, isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * rng.uniform(noise_range[0], noise_range[1],
                                      kernel.shape)
    return kernel / np.sum(kernel)


def random_bivariate_generalized_Gaussian(kernel_size, sigma_x_range,
                                          sigma_y_range, rotation_range,
                                          beta_range, noise_range=None,
                                          isotropic=True, rng=None):
    rng = rng or np.random.default_rng()
    sx, sy, rot = _rand_params(rng, kernel_size, sigma_x_range, sigma_y_range,
                               rotation_range, isotropic)
    if rng.uniform() < 0.5:
        beta = rng.uniform(beta_range[0], 1)
    else:
        beta = rng.uniform(1, beta_range[1])
    kernel = bivariate_generalized_Gaussian(kernel_size, sx, sy, rot, beta,
                                            isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * rng.uniform(noise_range[0], noise_range[1],
                                      kernel.shape)
    return kernel / np.sum(kernel)


def random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range,
                             rotation_range, beta_range, noise_range=None,
                             isotropic=True, rng=None):
    rng = rng or np.random.default_rng()
    sx, sy, rot = _rand_params(rng, kernel_size, sigma_x_range, sigma_y_range,
                               rotation_range, isotropic)
    if rng.uniform() < 0.5:
        beta = rng.uniform(beta_range[0], 1)
    else:
        beta = rng.uniform(1, beta_range[1])
    kernel = bivariate_plateau(kernel_size, sx, sy, rot, beta,
                               isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * rng.uniform(noise_range[0], noise_range[1],
                                      kernel.shape)
    return kernel / np.sum(kernel)


def random_mixed_kernels(kernel_list, kernel_prob, kernel_size=21,
                         sigma_x_range=(0.6, 5), sigma_y_range=(0.6, 5),
                         rotation_range=(-math.pi, math.pi),
                         betag_range=(0.5, 8), betap_range=(0.5, 8),
                         noise_range=None, rng=None):
    """Sample one kernel from the weighted family mix (iso/aniso x
    gaussian/generalized/plateau)."""
    rng = rng or np.random.default_rng()
    kernel_type = rng.choice(kernel_list, p=kernel_prob)
    common = dict(noise_range=noise_range, rng=rng)
    if kernel_type == 'iso':
        return random_bivariate_Gaussian(kernel_size, sigma_x_range,
                                         sigma_y_range, rotation_range,
                                         isotropic=True, **common)
    if kernel_type == 'aniso':
        return random_bivariate_Gaussian(kernel_size, sigma_x_range,
                                         sigma_y_range, rotation_range,
                                         isotropic=False, **common)
    if kernel_type == 'generalized_iso':
        return random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, isotropic=True, **common)
    if kernel_type == 'generalized_aniso':
        return random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, isotropic=False, **common)
    if kernel_type == 'plateau_iso':
        return random_bivariate_plateau(kernel_size, sigma_x_range,
                                        sigma_y_range, rotation_range,
                                        betap_range, isotropic=True, **common)
    if kernel_type == 'plateau_aniso':
        return random_bivariate_plateau(kernel_size, sigma_x_range,
                                        sigma_y_range, rotation_range,
                                        betap_range, isotropic=False, **common)
    raise ValueError(f'unknown kernel type {kernel_type}')


def circular_lowpass_kernel(cutoff, kernel_size, pad_to=0):
    """2D sinc filter (ideal circular lowpass), MATLAB-faithful."""
    assert kernel_size % 2 == 1, 'Kernel size must be an odd number.'
    kernel = np.fromfunction(
        lambda x, y: cutoff * special.j1(
            cutoff * np.sqrt((x - (kernel_size - 1) / 2)**2 +
                             (y - (kernel_size - 1) / 2)**2)) /
        (2 * np.pi * np.sqrt((x - (kernel_size - 1) / 2)**2 +
                             (y - (kernel_size - 1) / 2)**2)),
        [kernel_size, kernel_size])
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = cutoff**2 / (4 * np.pi)
    kernel = kernel / np.sum(kernel)
    if pad_to > kernel_size:
        pad = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad, pad), (pad, pad)))
    return kernel


# ---------------------------------------------------------------------------
# noise (numpy, HWC [0,1])
# ---------------------------------------------------------------------------

def generate_gaussian_noise(img, sigma=10, gray_noise=False, rng=None):
    rng = rng or np.random.default_rng()
    if gray_noise:
        noise = rng.normal(0, sigma / 255., img.shape[0:2]).astype(np.float32)
        noise = noise[..., None].repeat(3, axis=2) if img.ndim == 3 else noise
    else:
        noise = rng.normal(0, sigma / 255., img.shape).astype(np.float32)
    return noise


def add_gaussian_noise(img, sigma=10, clip=True, rounds=False, gray_noise=False,
                       rng=None):
    out = img + generate_gaussian_noise(img, sigma, gray_noise, rng)
    if clip and rounds:
        out = np.clip((out * 255.0).round(), 0, 255) / 255.
    elif clip:
        out = np.clip(out, 0, 1)
    elif rounds:
        out = (out * 255.0).round() / 255.
    return out


def random_add_gaussian_noise(img, sigma_range=(0, 1.0), gray_prob=0,
                              clip=True, rounds=False, rng=None):
    rng = rng or np.random.default_rng()
    sigma = rng.uniform(sigma_range[0], sigma_range[1])
    gray = rng.uniform() < gray_prob
    return add_gaussian_noise(img, sigma, clip, rounds, gray, rng)


def _poisson_rate(img, gray_noise=False):
    """Quantized rate image + vals for Poisson noise (reference
    degradations.py generate_poisson_noise). The gray conversion happens on
    the FLOAT image and only then quantizes — uint8 truncation first would
    shift the rate by up to 1/255."""
    if gray_noise:
        base = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_BGR2GRAY)
    else:
        base = img
    base = np.clip((base * 255.0).round(), 0, 255) / 255.
    vals = len(np.unique(base))
    vals = 2**np.ceil(np.log2(vals))
    return base, vals


def generate_poisson_noise(img, scale=1.0, gray_noise=False, rng=None):
    """Poisson (shot) noise; vals follows cv2's unique-value heuristic."""
    rng = rng or np.random.default_rng()
    base, vals = _poisson_rate(img, gray_noise)
    out = np.float32(rng.poisson(base * vals) / float(vals))
    noise = out - base
    if gray_noise and img.ndim == 3:
        noise = noise[..., None].repeat(3, axis=2)
    return noise * scale


def add_poisson_noise(img, scale=1.0, clip=True, rounds=False, gray_noise=False,
                      rng=None):
    out = img + generate_poisson_noise(img, scale, gray_noise, rng)
    if clip and rounds:
        out = np.clip((out * 255.0).round(), 0, 255) / 255.
    elif clip:
        out = np.clip(out, 0, 1)
    elif rounds:
        out = (out * 255.0).round() / 255.
    return out


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0, clip=True,
                             rounds=False, rng=None):
    rng = rng or np.random.default_rng()
    scale = rng.uniform(scale_range[0], scale_range[1])
    gray = rng.uniform() < gray_prob
    return add_poisson_noise(img, scale, clip, rounds, gray, rng)


# ---------------------------------------------------------------------------
# noise (jnp batched, NHWC [0,1]) — replaces the reference *_pt variants
# ---------------------------------------------------------------------------

def add_gaussian_noise_jax(key, img, sigma, gray_noise=None, clip=True,
                           rounds=False):
    """img (N, H, W, C); sigma (N,) in [0, 255] units; gray_noise (N,) in
    {0,1} or None."""
    import jax
    import jax.numpy as jnp
    n = img.shape[0]
    sig = jnp.asarray(sigma, img.dtype).reshape(n, 1, 1, 1) / 255.
    noise = jax.random.normal(key, img.shape, img.dtype) * sig
    if gray_noise is not None:
        kg, _ = jax.random.split(key)
        g = jax.random.normal(kg, img.shape[:3] + (1,), img.dtype) * sig
        mask = jnp.asarray(gray_noise, img.dtype).reshape(n, 1, 1, 1)
        noise = mask * g + (1 - mask) * noise
    out = img + noise
    if clip and rounds:
        out = jnp.clip(jnp.round(out * 255.), 0, 255) / 255.
    elif clip:
        out = jnp.clip(out, 0, 1)
    elif rounds:
        out = jnp.round(out * 255.) / 255.
    return out


# ---------------------------------------------------------------------------
# JPEG (cv2 codec)
# ---------------------------------------------------------------------------

def add_jpg_compression(img, quality=90):
    """Round-trip a float [0,1] BGR image through the JPEG codec."""
    img = np.clip(img, 0, 1)
    encode_param = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    _, encimg = cv2.imencode('.jpg', (img * 255.).astype(np.uint8), encode_param)
    return np.float32(cv2.imdecode(encimg, 1)) / 255.


def random_add_jpg_compression(img, quality_range=(90, 100), rng=None):
    rng = rng or np.random.default_rng()
    quality = rng.uniform(quality_range[0], quality_range[1])
    return add_jpg_compression(img, quality)

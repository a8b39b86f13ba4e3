"""Degradation-toolbox parity vs the reference (deterministic kernel math)."""

import numpy as np
import pytest

from reference_util import load_reference


@pytest.fixture(scope='module')
def ref_deg():
    load_reference()
    from basicsr.data import degradations as d
    return d


def test_bivariate_gaussian_parity(ref_deg):
    from bsvd_tpu.data import degradations as mine
    for iso in (True, False):
        a = mine.bivariate_Gaussian(13, 1.8, 3.1, 0.7, isotropic=iso)
        b = ref_deg.bivariate_Gaussian(13, 1.8, 3.1, 0.7, isotropic=iso)
        np.testing.assert_allclose(a, b, rtol=1e-10)


def test_generalized_and_plateau_parity(ref_deg):
    from bsvd_tpu.data import degradations as mine
    a = mine.bivariate_generalized_Gaussian(11, 2.0, 1.1, -0.4, 1.7,
                                            isotropic=False)
    b = ref_deg.bivariate_generalized_Gaussian(11, 2.0, 1.1, -0.4, 1.7,
                                               isotropic=False)
    np.testing.assert_allclose(a, b, rtol=1e-10)
    a = mine.bivariate_plateau(11, 2.0, 1.1, -0.4, 1.7, isotropic=False)
    b = ref_deg.bivariate_plateau(11, 2.0, 1.1, -0.4, 1.7, isotropic=False)
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_sinc_kernel_parity(ref_deg):
    from bsvd_tpu.data import degradations as mine
    a = mine.circular_lowpass_kernel(np.pi / 3, 13, pad_to=21)
    b = ref_deg.circular_lowpass_kernel(np.pi / 3, 13, pad_to=21)
    np.testing.assert_allclose(a, b, rtol=1e-8)


def test_mixed_kernels_and_noise():
    from bsvd_tpu.data import degradations as mine
    rng = np.random.default_rng(0)
    k = mine.random_mixed_kernels(
        ['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
         'plateau_iso', 'plateau_aniso'],
        [1 / 6] * 6, kernel_size=17, rng=rng)
    assert k.shape == (17, 17)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)

    img = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    noisy = mine.random_add_gaussian_noise(img, (5, 20), gray_prob=0.5, rng=rng)
    assert noisy.shape == img.shape and noisy.min() >= 0 and noisy.max() <= 1
    pois = mine.add_poisson_noise(img, scale=1.0, rng=rng)
    assert np.abs(pois - img).mean() > 0
    jpg = mine.add_jpg_compression(img, quality=50)
    assert jpg.shape == img.shape


def test_poisson_gray_rate_matches_reference_semantics():
    """Gray Poisson rate: cvtColor on the FLOAT image, then quantize
    (reference generate_poisson_noise) — not uint8 truncation first."""
    import cv2
    from bsvd_tpu.data.degradations import _poisson_rate
    rng = np.random.default_rng(3)
    # values straddling x.5/255 so truncation vs rounding differ
    img = (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.float32)
    img = ((img + 0.499) / 255.).astype(np.float32)
    base, vals = _poisson_rate(img, gray_noise=True)
    exp = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    exp = np.clip((exp * 255.0).round(), 0, 255) / 255.
    np.testing.assert_allclose(base, exp, rtol=0, atol=0)
    exp_vals = 2**np.ceil(np.log2(len(np.unique(exp))))
    assert vals == exp_vals
    # the old uint8-truncation path disagrees on this input
    trunc = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_BGR2GRAY)
    trunc = np.clip(((trunc / 255.) * 255.0).round(), 0, 255) / 255.
    assert np.abs(trunc - base).max() > 0


def test_gaussian_noise_jax_batched():
    import jax
    from bsvd_tpu.data.degradations import add_gaussian_noise_jax
    img = jax.numpy.zeros((2, 8, 8, 3)) + 0.5
    out = add_gaussian_noise_jax(jax.random.PRNGKey(0), img,
                                 sigma=np.array([10., 30.]),
                                 gray_noise=np.array([1., 0.]))
    out = np.asarray(out)
    # gray sample: identical noise across channels
    diff = out[0] - 0.5
    np.testing.assert_allclose(diff[..., 0], diff[..., 1], rtol=1e-5)
    # non-gray: channels differ
    assert np.abs((out[1] - 0.5)[..., 0] - (out[1] - 0.5)[..., 1]).max() > 1e-4
    # larger sigma -> larger std
    assert (out[1] - 0.5).std() > (out[0] - 0.5).std()


def test_diffjpeg_parity():
    """jnp DiffJPEG matches the reference torch implementation."""
    load_reference()
    import torch
    from basicsr.utils.diffjpeg import DiffJPEG as RefJpeg
    from bsvd_tpu.utils.diffjpeg import DiffJPEG
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 3, 20, 28)).astype(np.float32)
    q = np.array([20., 75.], np.float32)
    ref = RefJpeg(differentiable=False)
    with __import__('torch').no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(q.copy())).numpy()
    got = np.asarray(DiffJPEG(differentiable=False)(x, q))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # differentiable variant must have finite grads
    import jax, jax.numpy as jnp
    from bsvd_tpu.utils.diffjpeg import diff_jpeg
    g = jax.grad(lambda v: jnp.sum(diff_jpeg(v, 50.)))(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert bool(jnp.isfinite(g).all())

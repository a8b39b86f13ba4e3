"""Metric parity vs the reference implementations (uint8/BGR/crop-border
conventions — BasicSR/basicsr/metrics/psnr_ssim.py)."""

import numpy as np
import pytest

from bsvd_tpu.metrics import calculate_metric
from bsvd_tpu.metrics.psnr_ssim import (calculate_psnr, calculate_psnr_float,
                                        calculate_ssim)
from bsvd_tpu.utils import tensor2img

from reference_util import load_reference


@pytest.fixture(scope='module')
def ref_metrics():
    load_reference()
    from basicsr.metrics import psnr_ssim as ref_ps
    return ref_ps


def _imgs(seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (37, 41, 3), dtype=np.uint8)
    noise = rng.normal(0, 12, a.shape)
    b = np.clip(a.astype(np.float64) + noise, 0, 255).astype(np.uint8)
    return a, b


@pytest.mark.parametrize('crop,y', [(0, False), (2, False), (2, True)])
def test_psnr_parity(ref_metrics, crop, y):
    a, b = _imgs()
    mine = calculate_psnr(a, b, crop_border=crop, test_y_channel=y)
    theirs = ref_metrics.calculate_psnr(a, b, crop_border=crop, test_y_channel=y)
    np.testing.assert_allclose(mine, theirs, rtol=1e-10)


@pytest.mark.parametrize('crop', [0, 2])
def test_ssim_parity(ref_metrics, crop):
    a, b = _imgs(1)
    mine = calculate_ssim(a, b, crop_border=crop)
    theirs = ref_metrics.calculate_ssim(a, b, crop_border=crop)
    np.testing.assert_allclose(mine, theirs, rtol=1e-10)


def test_psnr_float_parity(ref_metrics):
    import torch
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (3, 20, 24)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    mine = calculate_psnr_float(a, b, crop_border=2)
    theirs = ref_metrics.calculate_psnr_float(torch.from_numpy(a),
                                              torch.from_numpy(b), crop_border=2)
    np.testing.assert_allclose(mine, theirs, rtol=1e-6)


def test_tensor2img_parity():
    load_reference()
    import torch
    from basicsr.utils.img_util import tensor2img as ref_t2i
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.1, 1.1, (3, 16, 18)).astype(np.float32)
    mine = tensor2img(x)
    theirs = ref_t2i(torch.from_numpy(x))
    np.testing.assert_array_equal(mine, theirs)


def test_calculate_metric_dispatch():
    a, b = _imgs(4)
    res = calculate_metric({'img': a, 'img2': b},
                           {'type': 'calculate_psnr', 'crop_border': 2,
                            'test_y_channel': False})
    assert 10 < res < 60


def test_niqe_parity(ref_metrics):
    """NIQE matches the reference implementation (uses the pristine params
    from the reference checkout; skips if absent)."""
    import os
    if not os.path.isfile(
            '/root/reference/BasicSR/basicsr/metrics/niqe_pris_params.npz'):
        pytest.skip('pristine params unavailable')
    from basicsr.metrics.niqe import calculate_niqe as ref_niqe
    from bsvd_tpu.metrics.niqe import calculate_niqe
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:128, 0:160]
    img = (np.sin(xx / 9.0) * np.cos(yy / 7.0) * 100 + 120
           + rng.normal(0, 12, (128, 160)))
    img = np.clip(np.stack([img] * 3, axis=-1)
                  + rng.normal(0, 6, (128, 160, 3)), 0, 255).astype(np.uint8)
    mine = calculate_niqe(
        img, crop_border=0,
        niqe_pris_params='/root/reference/BasicSR/basicsr/metrics/'
                         'niqe_pris_params.npz')
    theirs = ref_niqe(img, crop_border=0)
    np.testing.assert_allclose(mine, theirs, rtol=1e-4)

"""PSNR / SSIM / PSNR-float with the reference's exact conventions
(reference: BasicSR/basicsr/metrics/psnr_ssim.py:8-168): uint8 inputs in
[0,255], optional border crop, optional Y-channel, float64 math; SSIM uses
the 11x11 sigma-1.5 Gaussian window and MATLAB-faithful constants.
"""

import cv2
import numpy as np

from bsvd_tpu.utils.registry import METRIC_REGISTRY


def reorder_image(img, input_order='HWC'):
    if input_order not in ('HWC', 'CHW'):
        raise ValueError(f"Wrong input_order {input_order}; use 'HWC' or 'CHW'")
    if len(img.shape) == 2:
        return img[..., None]
    if input_order == 'CHW':
        img = img.transpose(1, 2, 0)
    return img


def to_y_channel(img):
    """BGR [0,255] -> Y channel (BT.601, MATLAB convention), float [16, 235].

    Matches the reference chain to_y_channel->bgr2ycbcr(y_only) including its
    [0,1]-float output range normalization then x255 rescale
    (metric_util.py:32-45, matlab_functions.py:214-244)."""
    img = img.astype(np.float32) / 255.
    if img.ndim == 3 and img.shape[2] == 3:
        img = np.dot(img, np.array([24.966, 128.553, 65.481],
                                   dtype=np.float32)) + 16.0
        img = img[..., None] / 255.
    return img * 255.


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border, input_order='HWC', test_y_channel=False,
                   **kwargs):
    """PSNR of uint8 images in [0, 255]."""
    assert img.shape == img2.shape, f'Image shapes differ: {img.shape} vs {img2.shape}.'
    img = reorder_image(np.asarray(img), input_order)
    img2 = reorder_image(np.asarray(img2), input_order)
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    mse = np.mean((img - img2)**2)
    if mse == 0:
        return float('inf')
    return 20. * np.log10(255. / np.sqrt(mse))


def _ssim_one(img, img2):
    c1 = (0.01 * 255)**2
    c2 = (0.03 * 255)**2
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) /
                ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return ssim_map.mean()


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border, input_order='HWC', test_y_channel=False,
                   **kwargs):
    """SSIM of uint8 images, per-channel averaged."""
    assert img.shape == img2.shape, f'Image shapes differ: {img.shape} vs {img2.shape}.'
    img = reorder_image(np.asarray(img), input_order)
    img2 = reorder_image(np.asarray(img2), input_order)
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    ssims = [_ssim_one(img[..., i], img2[..., i]) for i in range(img.shape[2])]
    return np.array(ssims).mean()


@METRIC_REGISTRY.register()
def calculate_psnr_float(img_float, img2_float, crop_border, input_order='CHW',
                         test_y_channel=False, **kwargs):
    """PSNR of float arrays in [0, 1] (reference psnr_ssim.py:130-168; the
    reference takes torch tensors — here any array-like works).

    NOTE test_y_channel=True reproduces the reference's quirk verbatim:
    to_y_channel expects [0, 255] input, so [0, 1] floats get divided by
    255 again and the resulting Y-PSNR is inflated (reference
    psnr_ssim.py:161-163 has the identical behavior). Kept bit-faithful;
    no shipped config enables it on the float metric."""
    img = reorder_image(np.asarray(img_float, np.float64), input_order)
    img2 = reorder_image(np.asarray(img2_float, np.float64), input_order)
    assert img.shape == img2.shape, f'Image shapes differ: {img.shape} vs {img2.shape}.'
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    mse = np.mean((img - img2)**2)
    if mse == 0:
        return float('inf')
    return -10 * np.log10(mse)

#!/usr/bin/env python
"""Generate degraded LQ faces from a GT folder per the HiFaceGAN paper
settings (reference:
BasicSR/scripts/data_preparation/prepare_hifacegan_dataset.py — same
degradation templates and parameter ranges, but implemented in cv2/numpy
instead of depending on imgaug).

Templates: sr4x, sr4x8x, denoise, deblur, jpeg, 16x, face_renov
(the last chains deblur+denoise+jpeg+sr4x8x in random order).

    python scripts/data_preparation/prepare_hifacegan_dataset.py \
        --gt_folder datasets/FFHQ_512_gt --deg sr4x [--lq_folder <out>] \
        [--seed 0]
"""

import argparse
import os

import cv2
import numpy as np


def _mosaic16(img, rng):
    """Replace each 16x16 neighborhood with its mean (reference Mosaic16x)."""
    del rng
    x = img.astype(np.float64)
    h, w = x.shape[:2]
    for i in range((h + 15) // 16):
        for j in range((w + 15) // 16):
            blk = x[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16]
            blk[...] = blk.mean(axis=(0, 1))
    return x.clip(0, 255).astype(np.uint8)


def _resize_chain(img, rng, lo, hi):
    """Area-downscale by a random factor in [lo, hi], cubic-upscale back."""
    h, w = img.shape[:2]
    s = rng.uniform(lo, hi)
    small = cv2.resize(img, (max(1, round(w * s)), max(1, round(h * s))),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)


def _noise(img, rng):
    """OneOf gaussian/laplace/poisson additive noise, per-channel."""
    x = img.astype(np.float64)
    kind = rng.integers(0, 3)
    if kind == 0:
        x = x + rng.normal(0, rng.uniform(20, 40), x.shape)
    elif kind == 1:
        x = x + rng.laplace(0, rng.uniform(20, 40), x.shape)
    else:
        lam = rng.uniform(15, 30)
        noise = rng.poisson(lam, x.shape) - lam
        x = x + np.where(rng.random(x.shape) < 0.5, noise, -noise)
    return x.clip(0, 255).astype(np.uint8)


def _motion_kernel(k, angle_deg):
    kern = np.zeros((k, k), np.float32)
    kern[k // 2, :] = 1.0
    rot = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle_deg, 1.0)
    kern = cv2.warpAffine(kern, rot, (k, k))
    s = kern.sum()
    return kern / s if s > 0 else kern


def _blur(img, rng):
    """OneOf motion blur k in [10, 20] / gaussian blur sigma in [3, 8]."""
    if rng.integers(0, 2) == 0:
        k = int(rng.integers(10, 21))
        return cv2.filter2D(img, -1, _motion_kernel(k, rng.uniform(0, 360)))
    sigma = rng.uniform(3.0, 8.0)
    ksize = int(2 * round(3 * sigma) + 1)
    return cv2.GaussianBlur(img, (ksize, ksize), sigma)


def _jpeg(img, rng):
    """JPEG at imgaug compression 50-85 == cv2 quality 50-15."""
    quality = int(100 - rng.uniform(50, 85))
    ok, enc = cv2.imencode('.jpg', img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def _face_renov(img, rng):
    ops = [_blur, _noise, _jpeg,
           lambda x, r: _resize_chain(x, r, 0.125, 0.25)]
    for idx in rng.permutation(len(ops)):
        img = ops[idx](img, rng)
    return img


DEG_TEMPLATES = {
    'sr4x': lambda x, r: _resize_chain(x, r, 0.25, 0.25001),
    'sr4x8x': lambda x, r: _resize_chain(x, r, 0.125, 0.25),
    'denoise': _noise,
    'deblur': _blur,
    'jpeg': _jpeg,
    '16x': _mosaic16,
    'face_renov': _face_renov,
}


def create_training_dataset(deg, gt_folder, lq_folder=None, seed=0):
    if deg not in DEG_TEMPLATES:
        raise ValueError(f'Degradation type {deg!r} not recognized: '
                         f'{"|".join(DEG_TEMPLATES)}')
    if not lq_folder:
        lq_folder = '_'.join([gt_folder.replace('gt', 'lq'), deg])
    print(lq_folder)
    os.makedirs(lq_folder, exist_ok=True)
    fn = DEG_TEMPLATES[deg]
    rng = np.random.default_rng(seed)
    names = sorted(os.listdir(gt_folder))
    for name in names:
        gt = cv2.imread(os.path.join(gt_folder, name))
        if gt is None:
            continue
        cv2.imwrite(os.path.join(lq_folder, name), fn(gt, rng))
    print(f'Dataset prepared ({len(names)} images).')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--gt_folder', required=True)
    ap.add_argument('--lq_folder', default=None)
    ap.add_argument('--deg', default='sr4x', choices=sorted(DEG_TEMPLATES))
    ap.add_argument('--seed', type=int, default=0)
    a = ap.parse_args()
    create_training_dataset(a.deg, a.gt_folder, a.lq_folder, a.seed)

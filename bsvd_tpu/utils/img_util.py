"""Image conversion utilities matching the reference's numeric conventions
(reference: BasicSR/basicsr/utils/img_util.py:38-96 tensor2img,
clamp->[0,255]->round->uint8, RGB->BGR) — metric parity depends on these
exact rounding rules.

All functions here are host-side numpy; device arrays should be fetched with
np.asarray first.
"""

import os

import cv2
import numpy as np


def tensor2img(img, rgb2bgr=True, min_max=(0, 1)):
    """Float CHW (or HWC with ``chw=False``) RGB array in [0,1] -> uint8 BGR
    HWC image, with the reference's clamp/scale/round order.

    Accepts a single array (C,H,W) or a list of them (returns a list).
    """
    def _one(t):
        t = np.asarray(t, np.float32)
        t = np.clip(t, min_max[0], min_max[1])
        t = (t - min_max[0]) / (min_max[1] - min_max[0])
        if t.ndim == 3:
            img_np = np.transpose(t, (1, 2, 0))
            if rgb2bgr and img_np.shape[2] == 3:
                img_np = img_np[..., ::-1]
        elif t.ndim == 2:
            img_np = t
        else:
            raise ValueError(f'unsupported ndim {t.ndim}')
        return (img_np * 255.0).round().astype(np.uint8)

    if isinstance(img, (list, tuple)):
        out = [_one(t) for t in img]
        return out if len(out) > 1 else out[0]
    return _one(img)


def img2tensor(img, bgr2rgb=True, float32=True):
    """uint8 BGR HWC -> float32 CHW RGB in [0,1] (numpy)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if bgr2rgb and img.shape[2] == 3:
        img = img[..., ::-1]
    img = np.transpose(img, (2, 0, 1))
    if float32:
        img = img.astype(np.float32) / 255.0
    return np.ascontiguousarray(img)


def imwrite(img, file_path, params=None, auto_mkdir=True):
    """cv2.imwrite with automatic parent-dir creation."""
    if auto_mkdir:
        dir_name = os.path.abspath(os.path.dirname(file_path))
        os.makedirs(dir_name, exist_ok=True)
    ok = cv2.imwrite(file_path, img, params or [])
    if not ok:
        raise IOError(f'Failed in writing images to {file_path}')
    return ok


def imfrombytes(content, flag='color', float32=False):
    """Decode an image from bytes (disk file-client path)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {'color': cv2.IMREAD_COLOR, 'grayscale': cv2.IMREAD_GRAYSCALE,
                    'unchanged': cv2.IMREAD_UNCHANGED}
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def crop_border(imgs, crop_border):
    """Crop borders of image(s) (H, W, C) by ``crop_border`` on each side."""
    if crop_border == 0:
        return imgs
    if isinstance(imgs, list):
        return [v[crop_border:-crop_border, crop_border:-crop_border, ...] for v in imgs]
    return imgs[crop_border:-crop_border, crop_border:-crop_border, ...]

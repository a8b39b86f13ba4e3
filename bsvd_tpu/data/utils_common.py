"""Host-side image sequence loading (reference semantics:
Experimental_root/data/utils_common.py:79-190 — cv2 BGR->RGB, digit-sorted
filenames, [0,1] float32 normalization, optional odd-size edge expansion)."""

import glob
import os

import cv2
import numpy as np

from bsvd_tpu.utils.misc import digit_sort_key

IMAGETYPES = ('*.bmp', '*.png', '*.jpg', '*.jpeg', '*.tif')


def get_imagenames(seq_dir, pattern=None):
    """Ordered (by embedded digits) list of image filenames in a directory."""
    files = []
    for typ in IMAGETYPES:
        files.extend(glob.glob(os.path.join(seq_dir, typ)))
    if pattern is not None:
        files = [f for f in files if pattern in os.path.split(f)[-1]]
    files.sort(key=digit_sort_key)
    return files


def open_image(fpath, gray_mode=False, expand_if_needed=False, normalize_data=True):
    """Load one image as float32 (C, H, W) RGB (or (1, H, W) gray) in [0,1]."""
    if not gray_mode:
        img = cv2.imread(fpath)
        if img is None:
            raise IOError(f'cannot read image {fpath}')
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).transpose(2, 0, 1)
    else:
        img = cv2.imread(fpath, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f'cannot read image {fpath}')
        img = img[None]

    expanded_h = expanded_w = False
    if expand_if_needed:
        if img.shape[-2] % 2 == 1:
            expanded_h = True
            img = np.concatenate([img, img[:, -1:, :]], axis=1)
        if img.shape[-1] % 2 == 1:
            expanded_w = True
            img = np.concatenate([img, img[:, :, -1:]], axis=2)

    if normalize_data:
        img = np.float32(img / 255.)
    return img, expanded_h, expanded_w


def open_sequence(seq_dir, gray_mode=False, expand_if_needed=False, max_num_fr=100):
    """Load a folder of frames -> (T, C, H, W) float32 [0,1].

    Uses the native C++ parallel decoder when available (RGB, no expand);
    falls back to cv2 per-frame."""
    files = get_imagenames(seq_dir)[0:max_num_fr]
    if not files:
        raise IOError(f'no images found in {seq_dir}')

    if not gray_mode and not expand_if_needed and \
            os.environ.get('BSVD_NATIVE_DECODE', '1') != '0':
        from bsvd_tpu.data import native_decode
        if native_decode.available():
            seq = native_decode.load_crop_seq(files)
            if seq is not None:
                seq = np.transpose(seq, (0, 3, 1, 2)).astype(np.float32) / 255.
                return seq, False, False

    seq_list = []
    for fpath in files:
        img, expanded_h, expanded_w = open_image(
            fpath, gray_mode=gray_mode, expand_if_needed=expand_if_needed)
        seq_list.append(img)
    return np.stack(seq_list, axis=0), expanded_h, expanded_w

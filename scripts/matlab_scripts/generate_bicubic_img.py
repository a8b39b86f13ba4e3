#!/usr/bin/env python
"""Generate mod-cropped GT, bicubic-downsampled LR, and (optionally)
bicubic-upsampled images for an image folder — the Python port of the
reference MATLAB script (BasicSR/scripts/matlab_scripts/
generate_bicubic_img.m), using the MATLAB-parity ``imresize`` from
bsvd_tpu.utils.matlab_functions (bit-matched bicubic + antialiasing).

    python scripts/matlab_scripts/generate_bicubic_img.py \
        --input datasets/Set5/original --mod_scale 12 --up_scale 2 \
        --save_mod datasets/Set5/GTmod12 --save_lr datasets/Set5/LRbicx2
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import os
from os import path as osp

import cv2
import numpy as np

from bsvd_tpu.utils.matlab_functions import imresize


def modcrop(img, modulo):
    """Crop H and W down to multiples of ``modulo`` (MATLAB modcrop)."""
    h, w = img.shape[:2]
    return img[:h - h % modulo, :w - w % modulo, ...]


def _imwrite01(img, path):
    cv2.imwrite(path, (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8))


def process_folder(input_folder, mod_scale, up_scale, save_mod=None,
                   save_lr=None, save_bic=None):
    for folder in (save_mod, save_lr, save_bic):
        if folder:
            os.makedirs(folder, exist_ok=True)
    names = sorted(os.listdir(input_folder))
    for idx, name in enumerate(names):
        stem = osp.splitext(name)[0]
        img = cv2.imread(osp.join(input_folder, name), cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        print(f'{idx + 1}\t{stem}.')
        img = modcrop(img.astype(np.float64) / 255.0, mod_scale)
        if save_mod:
            _imwrite01(img, osp.join(save_mod, f'{stem}.png'))
        lr = imresize(img, 1 / up_scale)
        if save_lr:
            _imwrite01(lr, osp.join(save_lr, f'{stem}.png'))
        if save_bic:
            _imwrite01(imresize(lr, up_scale), osp.join(save_bic, f'{stem}.png'))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', required=True, help='input image folder')
    parser.add_argument('--mod_scale', type=int, default=12)
    parser.add_argument('--up_scale', type=int, default=2)
    parser.add_argument('--save_mod', default=None, help='mod-crop GT folder')
    parser.add_argument('--save_lr', default=None, help='bicubic LR folder')
    parser.add_argument('--save_bic', default=None,
                        help='bicubic-upsampled folder')
    args = parser.parse_args(argv)
    process_folder(args.input, args.mod_scale, args.up_scale,
                   args.save_mod, args.save_lr, args.save_bic)


if __name__ == '__main__':
    main()

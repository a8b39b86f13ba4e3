#!/usr/bin/env python
"""Generate matlab-bicubic LRx4 frames for the Vimeo90K septuplet tree —
Python port of the reference MATLAB script (BasicSR/scripts/matlab_scripts/
generate_LR_Vimeo90K.m), using the MATLAB-parity ``imresize``.

Walks sequences/*/*/im?.png under --root and writes the x4-downsampled
frames to the mirrored tree with 'vimeo_septuplet' replaced by
'vimeo_septuplet_matlabLRx4'.

    python scripts/matlab_scripts/generate_LR_Vimeo90K.py \
        --root datasets/vimeo90k/vimeo_septuplet
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import glob
import os
from os import path as osp

import cv2
import numpy as np

from bsvd_tpu.utils.matlab_functions import imresize
from scripts.matlab_scripts.generate_bicubic_img import modcrop


def process_tree(root, up_scale=4, mod_scale=4):
    paths = sorted(glob.glob(osp.join(root, 'sequences', '*', '*', '*.png')))
    for idx, path in enumerate(paths):
        folder, name = osp.split(path)
        save_folder = folder.replace('vimeo_septuplet',
                                     'vimeo_septuplet_matlabLRx4')
        os.makedirs(save_folder, exist_ok=True)
        print(f'{idx + 1}\t{osp.splitext(name)[0]}.')
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float64) / 255.0
        lr = imresize(modcrop(img, mod_scale), 1 / up_scale)
        cv2.imwrite(osp.join(save_folder, name),
                    (np.clip(lr, 0, 1) * 255.0).round().astype(np.uint8))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', required=True,
                        help='vimeo_septuplet root (contains sequences/)')
    parser.add_argument('--up_scale', type=int, default=4)
    parser.add_argument('--mod_scale', type=int, default=4)
    args = parser.parse_args(argv)
    process_tree(args.root, args.up_scale, args.mod_scale)


if __name__ == '__main__':
    main()

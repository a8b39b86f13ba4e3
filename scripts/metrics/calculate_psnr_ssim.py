#!/usr/bin/env python
"""PSNR/SSIM between two image folders
(reference: BasicSR/scripts/metrics/calculate_psnr_ssim.py).

    python scripts/metrics/calculate_psnr_ssim.py --gt <folder> \
        --restored <folder> [--crop_border 4] [--test_y_channel]
"""

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

from bsvd_tpu.metrics import calculate_psnr, calculate_ssim
from bsvd_tpu.utils.misc import scandir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gt', required=True)
    ap.add_argument('--restored', required=True)
    ap.add_argument('--crop_border', type=int, default=0)
    ap.add_argument('--suffix', default='')
    ap.add_argument('--test_y_channel', action='store_true')
    a = ap.parse_args()

    psnrs, ssims = [], []
    gt_list = sorted(scandir(a.gt, recursive=True, full_path=True))
    for i, gt_path in enumerate(gt_list):
        base = os.path.splitext(os.path.basename(gt_path))[0]
        restored_path = os.path.join(a.restored, base + a.suffix +
                                     os.path.splitext(gt_path)[1])
        gt = cv2.imread(gt_path, cv2.IMREAD_UNCHANGED)
        restored = cv2.imread(restored_path, cv2.IMREAD_UNCHANGED)
        p = calculate_psnr(gt, restored, crop_border=a.crop_border,
                           test_y_channel=a.test_y_channel)
        s = calculate_ssim(gt, restored, crop_border=a.crop_border,
                           test_y_channel=a.test_y_channel)
        print(f'{i + 1:3d}: {base:25}. \tPSNR: {p:.6f} dB, \tSSIM: {s:.6f}')
        psnrs.append(p)
        ssims.append(s)
    print(f'Average: PSNR: {np.mean(psnrs):.6f} dB, SSIM: {np.mean(ssims):.6f}')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""NIQE over a folder (reference: BasicSR/scripts/metrics/calculate_niqe.py).

Requires the pristine NIQE model parameters (see bsvd_tpu/metrics/niqe.py for
the BSVD_NIQE_PARAMS search order).

    python scripts/metrics/calculate_niqe.py --input <folder> [--crop_border 0]
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import os
import warnings

import cv2

from bsvd_tpu.metrics import calculate_niqe
from bsvd_tpu.utils import scandir


def main(args):
    niqe_all = []
    img_list = sorted(scandir(args.input, recursive=True, full_path=True))
    for i, img_path in enumerate(img_list):
        basename, _ = os.path.splitext(os.path.basename(img_path))
        img = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore', category=RuntimeWarning)
            score = calculate_niqe(img, args.crop_border, input_order='HWC',
                                   convert_to='y')
        print(f'{i + 1:3d}: {basename:25}. \tNIQE: {score:.6f}')
        niqe_all.append(score)
    print(args.input)
    print(f'Average: NIQE: {sum(niqe_all) / len(niqe_all):.6f}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--crop_border', type=int, default=0)
    main(parser.parse_args())

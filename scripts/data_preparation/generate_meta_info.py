#!/usr/bin/env python
"""Generate a meta-info txt (``<name> (<h>,<w>,<c>)`` per line) for a folder
(reference: BasicSR/scripts/data_preparation/generate_meta_info.py).

    python scripts/data_preparation/generate_meta_info.py \
        --input datasets/DIV2K/DIV2K_train_HR_sub \
        --meta_info bsvd_tpu/data/meta_info/meta_info_DIV2K800sub_GT.txt
"""

import argparse
import os
from os import path as osp

import cv2


def generate_meta_info(input_folder, meta_info_path):
    names = sorted(f for f in os.listdir(input_folder)
                   if f.lower().endswith(('.png', '.jpg', '.jpeg', '.bmp')))
    os.makedirs(osp.dirname(osp.abspath(meta_info_path)), exist_ok=True)
    with open(meta_info_path, 'w') as f:
        for idx, name in enumerate(names):
            img = cv2.imread(osp.join(input_folder, name),
                             cv2.IMREAD_UNCHANGED)
            if img.ndim == 2:
                h, w, c = *img.shape, 1
            else:
                h, w, c = img.shape
            info = f'{name} ({h},{w},{c})'
            print(idx + 1, info)
            f.write(info + '\n')
    print(f'wrote {len(names)} entries -> {meta_info_path}')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True)
    ap.add_argument('--meta_info', required=True)
    a = ap.parse_args()
    generate_meta_info(a.input, a.meta_info)

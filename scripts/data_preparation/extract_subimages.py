#!/usr/bin/env python
"""Crop large images into overlapping sub-images for faster train IO
(reference: BasicSR/scripts/data_preparation/extract_subimages.py — same
sliding-window/threshold semantics and `_s{idx:03d}` naming, but argparse
driven instead of edit-the-dict, and a thread pool sized to the host).

    python scripts/data_preparation/extract_subimages.py \
        --input datasets/DIV2K/DIV2K_train_HR \
        --output datasets/DIV2K/DIV2K_train_HR_sub \
        --crop_size 480 --step 240 [--thresh_size 0] [--n_thread 8]
"""

import argparse
import os
from concurrent.futures import ThreadPoolExecutor
from os import path as osp

import cv2
import numpy as np


def _worker(path, out_dir, crop_size, step, thresh_size, compression):
    name, _ = osp.splitext(osp.basename(path))
    # drop the x2/x3/x4/x8 suffix so LR sub-images pair with HR ones
    for suf in ('x2', 'x3', 'x4', 'x8'):
        name = name.replace(suf, '')
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        return f'{name}: unreadable, skipped'
    h, w = img.shape[:2]
    hs = np.arange(0, h - crop_size + 1, step)
    if h - (hs[-1] + crop_size) > thresh_size:
        hs = np.append(hs, h - crop_size)
    ws = np.arange(0, w - crop_size + 1, step)
    if w - (ws[-1] + crop_size) > thresh_size:
        ws = np.append(ws, w - crop_size)
    idx = 0
    for y in hs:
        for x in ws:
            idx += 1
            patch = np.ascontiguousarray(
                img[y:y + crop_size, x:x + crop_size, ...])
            cv2.imwrite(osp.join(out_dir, f'{name}_s{idx:03d}.png'), patch,
                        [cv2.IMWRITE_PNG_COMPRESSION, compression])
    return f'{name}: {idx} patches'


def extract_subimages(input_folder, save_folder, crop_size, step,
                      thresh_size=0, n_thread=None, compression_level=3):
    os.makedirs(save_folder, exist_ok=True)
    paths = sorted(osp.join(input_folder, f)
                   for f in os.listdir(input_folder)
                   if f.lower().endswith(('.png', '.jpg', '.jpeg', '.bmp')))
    n_thread = n_thread or min(8, os.cpu_count() or 1)
    with ThreadPoolExecutor(n_thread) as pool:
        for info in pool.map(
                lambda p: _worker(p, save_folder, crop_size, step,
                                  thresh_size, compression_level), paths):
            print(info)
    print(f'{len(paths)} images -> {save_folder}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True)
    ap.add_argument('--output', required=True)
    ap.add_argument('--crop_size', type=int, default=480)
    ap.add_argument('--step', type=int, default=240)
    ap.add_argument('--thresh_size', type=int, default=0)
    ap.add_argument('--n_thread', type=int, default=None)
    ap.add_argument('--compression_level', type=int, default=3)
    a = ap.parse_args()
    extract_subimages(a.input, a.output, a.crop_size, a.step, a.thresh_size,
                      a.n_thread, a.compression_level)


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Merge REDS val clips into the train folder, renumbering val clip i to
240+i so the dataset code can hold out the official val split by index
(reference: BasicSR/scripts/data_preparation/regroup_reds_dataset.py).

    python scripts/data_preparation/regroup_reds_dataset.py \
        --train datasets/REDS/train_sharp --val datasets/REDS/val_sharp
"""

import argparse
import glob
import os
import shutil


def regroup_reds_dataset(train_path, val_path):
    val_folders = sorted(glob.glob(os.path.join(val_path, '*')))
    for folder in val_folders:
        new_idx = int(os.path.basename(folder)) + 240
        dst = os.path.join(train_path, str(new_idx))
        print(f'{folder} -> {dst}')
        shutil.copytree(folder, dst, dirs_exist_ok=True)
    print(f'moved {len(val_folders)} val clips into {train_path}')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--train', required=True)
    ap.add_argument('--val', required=True)
    a = ap.parse_args()
    regroup_reds_dataset(a.train, a.val)

#!/usr/bin/env python
"""Precompute FID statistics (mean/cov of pool3 features) for a dataset
(reference: BasicSR/scripts/metrics/calculate_fid_stats_from_datasets.py).

    python scripts/metrics/calculate_fid_stats_from_datasets.py \
        --dataroot datasets/ffhq/ffhq_512 [--size 512] [--backend disk]

Writes ``inception_<name>_<size>.npz`` with mean/cov (numpy; loadable by
calculate_fid_folder.py and calculate_stylegan2_fid.py).
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import math

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--num_sample', type=int, default=50000)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--size', type=int, default=512)
    parser.add_argument('--dataroot', type=str, default='datasets/ffhq')
    parser.add_argument('--backend', type=str, default='disk',
                        help='disk or lmdb')
    args = parser.parse_args()

    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.metrics.fid import (extract_inception_features,
                                      load_patched_inception_v3)

    inception = load_patched_inception_v3()

    opt = {'name': 'FFHQ', 'type': 'FFHQDataset',
           'dataroot_gt': args.dataroot, 'io_backend': {'type': args.backend},
           'use_hflip': False, 'mean': [0.5, 0.5, 0.5],
           'std': [0.5, 0.5, 0.5]}
    dataset = build_dataset(opt)
    num_sample = min(args.num_sample, len(dataset))
    total_batch = math.ceil(num_sample / args.batch_size)

    def data_generator():
        for b in range(total_batch):
            idx = range(b * args.batch_size,
                        min((b + 1) * args.batch_size, len(dataset)))
            yield np.stack([dataset[i]['gt'] for i in idx])  # (N, C, H, W)

    features = extract_inception_features(data_generator(), inception,
                                          total_batch)
    total_len = features.shape[0]
    features = features[:num_sample]
    print(f'Extracted {total_len} features, use the first '
          f'{features.shape[0]} features to calculate stats.')
    mean = np.mean(features, 0)
    cov = np.cov(features, rowvar=False)

    save_path = f'inception_{opt["name"]}_{args.size}.npz'
    np.savez(save_path, name=opt['name'], size=args.size, mean=mean, cov=cov)
    print(f'saved statistics to {save_path}')


if __name__ == '__main__':
    main()

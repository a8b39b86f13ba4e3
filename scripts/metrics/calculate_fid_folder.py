#!/usr/bin/env python
"""FID between a folder of images and precomputed dataset statistics
(reference: BasicSR/scripts/metrics/calculate_fid_folder.py).

Requires the TF-FID InceptionV3 weights (see
bsvd_tpu/archs/inception_arch.py for the BSVD_INCEPTION_PRETRAIN_PATH hook)
and a stats file from calculate_fid_stats_from_datasets.py (``.npz`` with
mean/cov, or a torch ``.pth`` dict).

    python scripts/metrics/calculate_fid_folder.py <folder> \
        --fid_stats <stats.npz> [--batch_size 64]
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import math

import numpy as np


def load_stats(path):
    if path.endswith('.npz'):
        with np.load(path) as z:
            return np.asarray(z['mean']), np.asarray(z['cov'])
    import torch
    stats = torch.load(path, map_location='cpu')
    return np.asarray(stats['mean']), np.asarray(stats['cov'])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('folder', type=str, help='Path to the folder.')
    parser.add_argument('--fid_stats', type=str, required=True,
                        help='Path to the dataset fid statistics.')
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--num_sample', type=int, default=50000)
    parser.add_argument('--backend', type=str, default='disk',
                        help='io backend for dataset. Option: disk, lmdb')
    args = parser.parse_args()

    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.metrics.fid import (calculate_fid,
                                      extract_inception_features,
                                      load_patched_inception_v3)

    inception = load_patched_inception_v3()

    # same normalization as the reference: mean/std 0.5 -> [-1, 1] inputs
    opt = {'name': 'SingleImageDataset', 'type': 'SingleImageDataset',
           'dataroot_lq': args.folder, 'io_backend': {'type': args.backend},
           'mean': [0.5, 0.5, 0.5], 'std': [0.5, 0.5, 0.5]}
    dataset = build_dataset(opt)
    num_sample = min(args.num_sample, len(dataset))
    total_batch = math.ceil(num_sample / args.batch_size)

    def data_generator():
        for b in range(total_batch):
            idx = range(b * args.batch_size,
                        min((b + 1) * args.batch_size, len(dataset)))
            yield np.stack([dataset[i]['lq'] for i in idx])  # (N, C, H, W)

    features = extract_inception_features(data_generator(), inception,
                                          total_batch)
    total_len = features.shape[0]
    features = features[:num_sample]
    print(f'Extracted {total_len} features, use the first '
          f'{features.shape[0]} features to calculate stats.')

    sample_mean = np.mean(features, 0)
    sample_cov = np.cov(features, rowvar=False)
    real_mean, real_cov = load_stats(args.fid_stats)
    fid = calculate_fid(sample_mean, sample_cov, real_mean, real_cov)
    print('fid:', fid)


if __name__ == '__main__':
    main()

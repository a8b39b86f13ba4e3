#!/usr/bin/env python
"""FID of a StyleGAN2 generator checkpoint against dataset statistics
(reference: BasicSR/scripts/metrics/calculate_stylegan2_fid.py).

    python scripts/metrics/calculate_stylegan2_fid.py <ckpt> <fid_stats> \
        [--size 256] [--num_sample 50000] [--truncation 1]
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import math

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('ckpt', type=str,
                        help='Path to the stylegan2 checkpoint.')
    parser.add_argument('fid_stats', type=str,
                        help='Path to the dataset fid statistics.')
    parser.add_argument('--size', type=int, default=256)
    parser.add_argument('--channel_multiplier', type=int, default=2)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--num_sample', type=int, default=50000)
    parser.add_argument('--truncation', type=float, default=1)
    parser.add_argument('--truncation_mean', type=int, default=4096)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from bsvd_tpu.archs.stylegan2_arch import StyleGAN2Generator
    from bsvd_tpu.metrics.fid import (calculate_fid,
                                      extract_inception_features,
                                      load_patched_inception_v3)
    from calculate_fid_folder import load_stats

    generator = StyleGAN2Generator(
        out_size=args.size, num_style_feat=512, num_mlp=8,
        channel_multiplier=args.channel_multiplier,
        resample_kernel=(1, 3, 3, 1))
    generator.load(args.ckpt, 'params_ema')

    key = jax.random.PRNGKey(args.seed)
    truncation_latent = None
    if args.truncation < 1:
        key, sub = jax.random.split(key)
        truncation_latent = generator.mean_latent(args.truncation_mean,
                                                  key=sub)

    inception = load_patched_inception_v3()
    total_batch = math.ceil(args.num_sample / args.batch_size)

    apply = jax.jit(lambda p, z: generator.apply(
        p, [z], truncation=args.truncation,
        truncation_latent=truncation_latent, randomize_noise=False)[0])

    def sample_generator():
        nonlocal key
        for _ in range(total_batch):
            key, zkey = jax.random.split(key)
            z = jax.random.normal(zkey, (args.batch_size, 512), jnp.float32)
            yield apply(generator.params, z)   # (N, 3, H, W) in [-1, 1]

    features = extract_inception_features(sample_generator(), inception,
                                          total_batch)
    total_len = features.shape[0]
    features = features[:args.num_sample]
    print(f'Extracted {total_len} features, use the first '
          f'{features.shape[0]} features to calculate stats.')
    sample_mean = np.mean(features, 0)
    sample_cov = np.cov(features, rowvar=False)
    real_mean, real_cov = load_stats(args.fid_stats)
    fid = calculate_fid(sample_mean, sample_cov, real_mean, real_cov)
    print('fid:', fid)


if __name__ == '__main__':
    main()

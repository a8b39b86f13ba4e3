#!/usr/bin/env python
"""Sample images from a StyleGAN2 generator checkpoint
(reference: BasicSR/inference/inference_stylegan2.py).

    python inference/inference_stylegan2.py --ckpt <ckpt> --size 1024 \
        --sample 1 --pics 1 [--truncation 0.7]

Accepts torch ``.pth`` (``params_ema``) or native ``.npz`` checkpoints.
Samples are tiled sqrt(sample)-per-row and written to ``samples/``.
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 2)[0])  # repo root when run as a script

import argparse
import math
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=1024)
    ap.add_argument('--sample', type=int, default=1)
    ap.add_argument('--pics', type=int, default=1)
    ap.add_argument('--truncation', type=float, default=1)
    ap.add_argument('--truncation_mean', type=int, default=4096)
    ap.add_argument('--ckpt', type=str, required=True)
    ap.add_argument('--channel_multiplier', type=int, default=2)
    ap.add_argument('--randomize_noise', type=lambda s: s != 'False',
                    default=True)
    ap.add_argument('--output', default='samples')
    ap.add_argument('--seed', type=int, default=2020)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bsvd_tpu.archs.stylegan2_arch import StyleGAN2Generator
    from bsvd_tpu.utils import imwrite

    os.makedirs(a.output, exist_ok=True)
    g = StyleGAN2Generator(a.size, num_style_feat=512, num_mlp=8,
                           channel_multiplier=a.channel_multiplier)
    g.load(a.ckpt, 'params_ema')

    key = jax.random.PRNGKey(a.seed)
    mean_latent = None
    if a.truncation < 1:
        key, sub = jax.random.split(key)
        mean_latent = g.mean_latent(a.truncation_mean, key=sub)

    nrow = int(math.sqrt(a.sample))
    for i in range(a.pics):
        key, zkey, nkey = jax.random.split(key, 3)
        z = jax.random.normal(zkey, (a.sample, 512), jnp.float32)
        img, _ = g([z], truncation=a.truncation,
                   truncation_latent=mean_latent,
                   randomize_noise=a.randomize_noise,
                   noise_key=nkey if a.randomize_noise else None)
        # normalize (-1, 1) -> uint8 grid, sqrt(sample) per row
        arr = np.asarray(jnp.clip((img + 1) / 2, 0, 1))      # (B, 3, H, W)
        b, c, h, w = arr.shape
        rows = int(np.ceil(b / nrow))
        grid = np.zeros((c, rows * h, nrow * w), arr.dtype)
        for j in range(b):
            r, q = divmod(j, nrow)
            grid[:, r * h:(r + 1) * h, q * w:(q + 1) * w] = arr[j]
        bgr = (np.transpose(grid, (1, 2, 0))[:, :, ::-1] * 255).round()
        imwrite(bgr.astype(np.uint8),
                os.path.join(a.output, f'{i:06d}.png'))
        print(f'saved {a.output}/{i:06d}.png')


if __name__ == '__main__':
    main()

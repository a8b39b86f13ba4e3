#!/usr/bin/env python
"""RIDNet denoising inference (reference: BasicSR/inference/inference_ridnet.py).

    python inference/inference_ridnet.py --model_path <ckpt> \
        --test_path <folder> --noise_g 25
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 2)[0])  # repo root when run as a script

import argparse
import glob
import os

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model_path', required=True)
    ap.add_argument('--test_path', default='datasets/denoise')
    ap.add_argument('--output', default='results/RIDNet')
    ap.add_argument('--noise_g', type=int, default=25,
                    help='add Gaussian noise of this sigma before denoising '
                         '(0 = input is already noisy)')
    a = ap.parse_args()

    import jax.numpy as jnp
    from bsvd_tpu.archs import build_network
    from bsvd_tpu.utils import img2tensor, imwrite, tensor2img

    net = build_network({'type': 'RIDNet', 'in_channels': 3,
                         'mid_channels': 64, 'out_channels': 3})
    net.load(a.model_path, 'params')

    os.makedirs(a.output, exist_ok=True)
    rng = np.random.default_rng(0)
    for idx, path in enumerate(sorted(glob.glob(os.path.join(a.test_path, '*')))):
        name = os.path.splitext(os.path.basename(path))[0]
        print(f'{idx} {name}')
        img = img2tensor(cv2.imread(path, cv2.IMREAD_COLOR))
        if a.noise_g:
            img = img + rng.normal(0, a.noise_g / 255., img.shape).astype(np.float32)
        out = np.asarray(net(jnp.asarray(img[None], jnp.float32)))[0]
        imwrite(tensor2img(np.clip(out, 0, 1)),
                os.path.join(a.output, f'{name}_RIDNet.png'))


if __name__ == '__main__':
    main()

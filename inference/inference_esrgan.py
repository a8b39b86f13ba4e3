#!/usr/bin/env python
"""ESRGAN (RRDBNet) single-image inference
(reference: BasicSR/inference/inference_esrgan.py).

    python inference/inference_esrgan.py --model_path <ckpt> \
        --input <folder> --output results/ESRGAN
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
    ap.add_argument('--model_path', type=str, required=True)
    ap.add_argument('--input', type=str, default='datasets/LR')
    ap.add_argument('--output', type=str, default='results/ESRGAN')
    ap.add_argument('--scale', type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp
    from bsvd_tpu.archs import build_network
    from bsvd_tpu.utils import img2tensor, imwrite, tensor2img

    net = build_network({'type': 'RRDBNet', 'num_in_ch': 3, 'num_out_ch': 3,
                         'num_feat': 64, 'num_block': 23, 'scale': args.scale})
    net.load(args.model_path, 'params')

    os.makedirs(args.output, exist_ok=True)
    for idx, path in enumerate(sorted(glob.glob(os.path.join(args.input, '*')))):
        name = os.path.splitext(os.path.basename(path))[0]
        print(f'{idx} {name}')
        img = img2tensor(cv2.imread(path, cv2.IMREAD_COLOR))
        out = np.asarray(net(jnp.asarray(img[None])))[0]
        imwrite(tensor2img(out), os.path.join(args.output, f'{name}_ESRGAN.png'))


if __name__ == '__main__':
    main()

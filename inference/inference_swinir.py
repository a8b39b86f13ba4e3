#!/usr/bin/env python
"""SwinIR inference over a folder (reference: BasicSR/inference/inference_swinir.py).

    python inference/inference_swinir.py --model_path <ckpt> --input <folder> \
        --output results/SwinIR [--task classical_sr --scale 4]
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
    ap.add_argument('--input', default='datasets/LR')
    ap.add_argument('--output', default='results/SwinIR')
    ap.add_argument('--task', default='classical_sr',
                    choices=['classical_sr', 'lightweight_sr', 'color_dn'])
    ap.add_argument('--scale', type=int, default=4)
    a = ap.parse_args()

    import jax.numpy as jnp
    from bsvd_tpu.archs import build_network
    from bsvd_tpu.utils import img2tensor, imwrite, tensor2img

    if a.task == 'classical_sr':
        net_opt = dict(type='SwinIR', upscale=a.scale, in_chans=3, img_size=48,
                       window_size=8, depths=(6, 6, 6, 6, 6, 6), embed_dim=180,
                       num_heads=(6, 6, 6, 6, 6, 6), mlp_ratio=2,
                       upsampler='pixelshuffle')
    elif a.task == 'lightweight_sr':
        net_opt = dict(type='SwinIR', upscale=a.scale, in_chans=3, img_size=64,
                       window_size=8, depths=(6, 6, 6, 6), embed_dim=60,
                       num_heads=(6, 6, 6, 6), mlp_ratio=2,
                       upsampler='pixelshuffledirect')
    else:
        net_opt = dict(type='SwinIR', upscale=1, in_chans=3, img_size=128,
                       window_size=8, depths=(6, 6, 6, 6, 6, 6), embed_dim=180,
                       num_heads=(6, 6, 6, 6, 6, 6), mlp_ratio=2, upsampler='')
    net = build_network(net_opt)
    net.load(a.model_path, 'params')

    os.makedirs(a.output, exist_ok=True)
    for idx, path in enumerate(sorted(glob.glob(os.path.join(a.input, '*')))):
        name = os.path.splitext(os.path.basename(path))[0]
        print(f'{idx} {name}')
        img = img2tensor(cv2.imread(path, cv2.IMREAD_COLOR))
        out = np.asarray(net(jnp.asarray(img[None])))[0]
        imwrite(tensor2img(out), os.path.join(a.output, f'{name}_SwinIR.png'))


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""LPIPS between a GT folder and a restored folder
(reference: BasicSR/scripts/metrics/calculate_lpips.py — which depends on
the external ``lpips`` package; here the jnp LPIPS-VGG in
bsvd_tpu/metrics/lpips.py is used, with the reference's defaults exposed as
flags).

    python scripts/metrics/calculate_lpips.py \
        --gt datasets/celeba/celeba_512_validation \
        --restored datasets/celeba/celeba_512_validation_lq [--suffix '']
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import glob
import os.path as osp

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--gt', type=str,
                        default='datasets/celeba/celeba_512_validation')
    parser.add_argument('--restored', type=str,
                        default='datasets/celeba/celeba_512_validation_lq')
    parser.add_argument('--suffix', type=str, default='')
    args = parser.parse_args()

    import jax.numpy as jnp
    from bsvd_tpu.metrics.lpips import load_lpips

    params, lpips_fn = load_lpips()
    lpips_all = []
    img_list = sorted(glob.glob(osp.join(args.gt, '*')))

    for i, img_path in enumerate(img_list):
        basename, ext = osp.splitext(osp.basename(img_path))
        img_gt = cv2.imread(img_path, cv2.IMREAD_UNCHANGED).astype(
            np.float32) / 255.
        img_restored = cv2.imread(
            osp.join(args.restored, basename + args.suffix + ext),
            cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.
        # BGR -> RGB, [0,1] -> [-1,1] (mean/std 0.5, reference :29-38),
        # NHWC batch of 1
        pair = [jnp.asarray((im[..., ::-1] - 0.5) / 0.5)[None]
                for im in (img_restored, img_gt)]
        lpips_val = float(lpips_fn(params, *pair)[0])
        print(f'{i+1:3d}: {basename:25}. \tLPIPS: {lpips_val:.6f}.')
        lpips_all.append(lpips_val)

    print(f'Average: LPIPS: {sum(lpips_all) / len(lpips_all):.6f}')


if __name__ == '__main__':
    main()

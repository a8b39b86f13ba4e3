#!/usr/bin/env python
"""BasicVSR video inference over a folder of LR frames
(reference: BasicSR/inference/inference_basicvsr.py).

    python inference/inference_basicvsr.py --model_path <ckpt> \
        --input_path <frame_folder> --save_path results/BasicVSR
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 2)[0])  # repo root when run as a script

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model_path', type=str, required=True)
    ap.add_argument('--input_path', type=str, required=True)
    ap.add_argument('--save_path', type=str, default='results/BasicVSR')
    ap.add_argument('--interval', type=int, default=15,
                    help='frames per forward (memory bound)')
    args = ap.parse_args()

    import jax.numpy as jnp
    from bsvd_tpu.archs import build_network
    from bsvd_tpu.data.utils_common import open_sequence
    from bsvd_tpu.utils import imwrite, tensor2img

    net = build_network({'type': 'BasicVSR', 'num_feat': 64, 'num_block': 30})
    net.load(args.model_path, 'params')

    seq, _, _ = open_sequence(args.input_path, max_num_fr=10**6)
    os.makedirs(args.save_path, exist_ok=True)
    t = seq.shape[0]
    for start in range(0, t, args.interval):
        chunk = seq[start:start + args.interval]
        out = np.asarray(net(jnp.asarray(chunk[None])))[0]
        for i in range(out.shape[0]):
            imwrite(tensor2img(out[i]),
                    os.path.join(args.save_path, f'{start + i:08d}_BasicVSR.png'))


if __name__ == '__main__':
    main()

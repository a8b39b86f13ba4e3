#!/usr/bin/env python
"""Convert a torch ``.pth`` checkpoint into this framework's native ``.npz``
format — the TPU-side replacement for the reference's model_conversion
scripts (reference: BasicSR/scripts/model_conversion/convert_models.py,
which rewrites key names between torch nets; here torch key names are kept
verbatim in the param tree, so conversion is layout-only: OIHW conv kernels
-> HWIO, (O, I) linears -> (I, O)).

Generic nets (everything loadable via ``bsvd_tpu.convert.torch_generic``):

    python scripts/model_conversion/convert_to_npz.py \
        --arch "{'type': 'RRDBNet', 'num_feat': 64, 'num_block': 23}" \
        --input ESRGAN_x4.pth --output esrgan_x4.npz [--param_key params]

BSVD / TSN denoisers (layout + naming handled by the dedicated converter):

    python scripts/model_conversion/convert_to_npz.py --tsn \
        --input bsvd-64.pth --output bsvd-64.npz
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import ast


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True, help='torch .pth checkpoint')
    ap.add_argument('--output', required=True, help='output .npz path')
    ap.add_argument('--param_key', default='params',
                    help='key inside the .pth (params | params_ema | ...)')
    ap.add_argument('--arch', default=None,
                    help="python-dict network_g opt, e.g. \"{'type': 'EDSR'}\"")
    ap.add_argument('--tsn', action='store_true',
                    help='use the BSVD/TSN-specific converter')
    a = ap.parse_args()

    from bsvd_tpu.models.checkpoint import save_npz_params

    if a.tsn:
        from bsvd_tpu.convert.torch_ckpt import load_params
        params = load_params(a.input)
    else:
        if not a.arch:
            ap.error('--arch is required unless --tsn is set')
        from bsvd_tpu.archs import build_network
        net = build_network(ast.literal_eval(a.arch))
        net.load(a.input, a.param_key)
        params = net.params
    save_npz_params(a.output, {'params': params})
    print(f'wrote {a.output} (param key: params)')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Download the published pretrained checkpoints
(reference: BasicSR/scripts/download_pretrained_models.py + the BSVD
README's checkpoint table).

Requires network egress (absent in some deployments — the download layer
raises a clear error then). BSVD's own checkpoints live on Google Drive
(reference README.md:65-75: bsvd-64, the blind/causal/c32 variants).

    python scripts/download_pretrained_models.py BSVD
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 2)[0])  # repo root when run as a script

import argparse
import os
from os import path as osp

# method -> {file_name: source}. A source is either a direct URL (BSVD's
# checkpoints are OneDrive share folders — reference README.md:66-72; the
# '?download=1' form fetches the shared item) or ('gdrive', file_id) for
# the BasicSR-zoo entries, whose id tables live in the reference script
# (BasicSR/scripts/download_pretrained_models.py:40-200) and can be added
# per-need.
SOURCES = {
    'BSVD': {
        'bsvd-64.pth': ('https://hkustconnect-my.sharepoint.com/:f:/g/'
                        'personal/cqiaa_connect_ust_hk/'
                        'Em-latu2Zm1MpPoxstOmpCQBzNTkyGVqdUEODK3oxcz6eA'
                        '?download=1'),
        'bsvd-64-blind.pth': ('https://hkustconnect-my.sharepoint.com/:f:/g/'
                              'personal/cqiaa_connect_ust_hk/'
                              'EkmrwTvtKYlLha2G1-8XIskBXOwWt33YUy7rl2yXnj-maw'
                              '?download=1'),
        'bsvd-64-unidirection.pth': (
            'https://hkustconnect-my.sharepoint.com/:f:/g/personal/'
            'cqiaa_connect_ust_hk/EtJVxVxBDSBDv5qOvRfM9xcBjkpPLbl4sfhBzpIPAWVMiw'
            '?download=1'),
    },
}
FILE_IDS = SOURCES  # back-compat alias


def download_pretrained_models(method, sources, assume_yes=False):
    from bsvd_tpu.utils.download_util import (
        download_file_from_google_drive, load_file_from_url)
    save_path_root = f'./experiments/pretrained_models/{method}'
    os.makedirs(save_path_root, exist_ok=True)
    for file_name, src in sources.items():
        save_path = osp.abspath(osp.join(save_path_root, file_name))
        if osp.exists(save_path) and not assume_yes:
            resp = input(f'{file_name} already exists. Overwrite? Y/N\n')
            if resp.lower() != 'y':
                print(f'Skipping {file_name}')
                continue
        print(f'Downloading {file_name} to {save_path}')
        if isinstance(src, tuple) and src[0] == 'gdrive':
            download_file_from_google_drive(src[1], save_path)
        else:
            load_file_from_url(src, model_dir=save_path_root,
                               file_name=file_name)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('method', type=str,
                        help=f"one of {sorted(SOURCES)} or 'all'")
    parser.add_argument('--yes', action='store_true')
    args = parser.parse_args()
    methods = sorted(SOURCES) if args.method == 'all' else [args.method]
    for m in methods:
        download_pretrained_models(m, SOURCES[m], assume_yes=args.yes)


if __name__ == '__main__':
    main()

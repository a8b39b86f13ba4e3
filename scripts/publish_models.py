#!/usr/bin/env python
"""Prepare trained checkpoints for release
(reference: BasicSR/scripts/publish_models.py:1-63): append the first 8
sha256 hex chars to the file name (refreshing a stale hash), and for torch
``.pth`` files re-save in the backward-compatible (non-zipfile) format.
Native ``.npz`` checkpoints get the sha treatment only.

    python scripts/publish_models.py [--glob 'experiments/pretrained_models/*.pth']
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 2)[0])  # repo root when run as a script

import argparse
import glob
import hashlib
import re
import os
from os import path as osp


def file_sha8(path):
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()[:8]


def check_keys(path, assume_yes=False):
    """Warn when a checkpoint lacks params/params_ema (reference :12-23)."""
    keys = None
    if path.endswith('.npz'):
        import numpy as np
        with np.load(path) as z:
            keys = set(k.split('/', 1)[0].split('.', 1)[0] for k in z.files)
            has = any(f == k or f.startswith((k + '.', k + '/'))
                      for f in z.files for k in ('params', 'params_ema'))
    else:
        import torch
        net = torch.load(path, map_location='cpu')
        has = isinstance(net, dict) and (
            'params' in net or 'params_ema' in net)
    if not has:
        msg = (f'WARN: Model {osp.basename(path)} does not have '
               f'"params"/"params_ema" key (top-level: {keys}).')
        if assume_yes:
            print(msg + ' Continuing (--yes).')
        else:
            resp = input(msg + ' Do you still want to continue? Y/N\n')
            if resp.lower() != 'y':
                raise ValueError('Aborted; please fix the checkpoint keys.')


def convert_to_backward_compatible_models(paths):
    """torch>=1.6 zipfile checkpoints -> legacy serialization (reference
    :41-58) so old torch versions can read the published files."""
    print('# Convert to backward compatible pth files ...')
    import torch
    from torch.serialization import _is_zipfile, _open_file_like
    for idx, path in enumerate(paths):
        if not path.endswith('.pth'):
            continue
        print(f'{idx+1:03d}: Processing {path}')
        with _open_file_like(path, 'rb') as opened_file:
            needs = _is_zipfile(opened_file)
        if needs:
            net = torch.load(path, map_location='cpu')
            print('\tConverting to compatible pth file...')
            torch.save(net, path, _use_new_zipfile_serialization=False)


def update_sha(paths, assume_yes=False):
    """Rename <name>.<ext> -> <name>-<sha8>.<ext>, refreshing stale hashes
    (reference :8-37)."""
    print('# Update sha ...')
    renamed = []
    for idx, path in enumerate(paths):
        print(f'{idx+1:03d}: Processing {path}')
        check_keys(path, assume_yes)
        basename = osp.basename(path)
        ext = osp.splitext(path)[1]
        sha = file_sha8(path)
        # only a trailing 8-hex-char segment counts as an existing hash —
        # descriptive names like bsvd-64.pth must not be truncated
        stem = basename[: -len(ext)]
        tail = stem.rsplit('-', 1)[-1] if '-' in stem else ''
        if re.fullmatch(r'[0-9a-f]{8}', tail):
            if tail != sha:
                final = path.rsplit('-', 1)[0] + f'-{sha}{ext}'
            else:
                renamed.append(path)
                continue
        else:
            final = path[: -len(ext)] + f'-{sha}{ext}'
        print(f'\tSave from {path} to {final}')
        os.replace(path, final)
        renamed.append(final)
    return renamed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--glob', default='experiments/pretrained_models/*.pth',
                        help='checkpoint glob (pth and/or npz)')
    parser.add_argument('--yes', action='store_true',
                        help='non-interactive: continue past key warnings')
    args = parser.parse_args()
    paths = sorted(glob.glob(args.glob))
    if not paths:
        print(f'no checkpoints match {args.glob!r}')
        return
    if any(p.endswith('.pth') for p in paths):
        convert_to_backward_compatible_models(paths)
    update_sha(paths, assume_yes=args.yes)


if __name__ == '__main__':
    main()

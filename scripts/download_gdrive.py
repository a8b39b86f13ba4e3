#!/usr/bin/env python
"""Download a single file from Google Drive by file id
(reference: BasicSR/scripts/download_gdrive.py:1-12).

    python scripts/download_gdrive.py --id <file_id> --output <save_path>
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 2)[0])  # repo root when run as a script

import argparse

from bsvd_tpu.utils.download_util import download_file_from_google_drive


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--id', type=str, required=True, help='File id')
    parser.add_argument('--output', type=str, required=True, help='Save path')
    args = parser.parse_args(argv)
    download_file_from_google_drive(args.id, args.output)


if __name__ == '__main__':
    main()

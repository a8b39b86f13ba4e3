#!/usr/bin/env python
"""Create lmdb datasets from image folders
(reference: BasicSR/scripts/data_preparation/create_lmdb.py).

    python scripts/data_preparation/create_lmdb.py --input <img_folder> \
        --output <name>.lmdb [--suffix png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

from bsvd_tpu.utils.lmdb_util import make_lmdb_from_imgs
from bsvd_tpu.utils.misc import scandir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True, help='input image folder')
    ap.add_argument('--output', required=True, help='output .lmdb path')
    ap.add_argument('--suffix', default='png')
    a = ap.parse_args()
    img_list = sorted(scandir(a.input, suffix=a.suffix, recursive=True))
    keys = [os.path.splitext(p)[0] for p in img_list]
    make_lmdb_from_imgs(a.input, a.output, img_list, keys)


if __name__ == '__main__':
    main()

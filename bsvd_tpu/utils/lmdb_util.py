"""LMDB dataset creation (reference: BasicSR/basicsr/utils/lmdb_util.py —
make_lmdb_from_imgs with meta_info.txt). Uses the real ``lmdb`` package
when available; otherwise the API-compatible pure-Python log store in
bsvd_tpu/utils/_lmdb_compat.py (same directory layout + meta_info.txt, but
not an LMDB B-tree on disk)."""

import os
import sys

import cv2


def _lmdb():
    try:
        import lmdb
    except ImportError:
        from bsvd_tpu.utils import _lmdb_compat as lmdb
    return lmdb


def make_lmdb_from_imgs(data_path, lmdb_path, img_path_list, keys,
                        batch=5000, compress_level=1, map_size=None):
    """Write images into an lmdb with the BasicSR layout:
    data.mdb/lock.mdb/meta_info.txt; each meta line is
    ``<key>.png (h,w,c) <compress_level>``."""
    lmdb = _lmdb()

    assert len(img_path_list) == len(keys)
    print(f'Create lmdb for {data_path}, save to {lmdb_path}...')
    if not lmdb_path.endswith('.lmdb'):
        raise ValueError("lmdb_path must end with '.lmdb'.")
    if os.path.exists(lmdb_path):
        print(f'Folder {lmdb_path} already exists. Exit.')
        sys.exit(1)

    if map_size is None:
        img = cv2.imread(os.path.join(data_path, img_path_list[0]),
                         cv2.IMREAD_UNCHANGED)
        _, img_byte = cv2.imencode('.png', img,
                                   [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        map_size = img_byte.nbytes * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    txn = env.begin(write=True)
    with open(os.path.join(lmdb_path, 'meta_info.txt'), 'w') as meta:
        for idx, (path, key) in enumerate(zip(img_path_list, keys)):
            img = cv2.imread(os.path.join(data_path, path), cv2.IMREAD_UNCHANGED)
            h, w = img.shape[:2]
            c = 1 if img.ndim == 2 else img.shape[2]
            _, img_byte = cv2.imencode(
                '.png', img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
            txn.put(key.encode('ascii'), img_byte.tobytes())
            meta.write(f'{key}.png ({h},{w},{c}) {compress_level}\n')
            if (idx + 1) % batch == 0:
                txn.commit()
                txn = env.begin(write=True)
    txn.commit()
    env.close()
    print('Finish writing lmdb.')

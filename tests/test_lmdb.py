"""lmdb runtime path, end to end: make_lmdb_from_imgs -> meta_info.txt ->
paths_from_lmdb -> FileClient('lmdb') reads -> PairedImageDataset with an
lmdb io_backend. Runs on the real lmdb package when present, otherwise on
the pure-Python compat store (bsvd_tpu/utils/_lmdb_compat.py)."""

import os

import cv2
import numpy as np
import pytest


def _write_pngs(root, names, size=12):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for name in names:
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(root, name), img)


def _make_lmdb(tmp_path, sub, names, size=12):
    from bsvd_tpu.utils.lmdb_util import make_lmdb_from_imgs
    data_root = str(tmp_path / sub)
    _write_pngs(data_root, names, size)
    lmdb_path = str(tmp_path / f'{sub}.lmdb')
    keys = [os.path.splitext(n)[0] for n in names]
    make_lmdb_from_imgs(data_root, lmdb_path, names, keys)
    return data_root, lmdb_path, keys


def test_make_lmdb_and_fileclient_roundtrip(tmp_path):
    from bsvd_tpu.data.data_util import paths_from_lmdb
    from bsvd_tpu.utils.file_client import FileClient
    from bsvd_tpu.utils.img_util import imfrombytes
    names = [f'img_{i:02d}.png' for i in range(4)]
    data_root, lmdb_path, keys = _make_lmdb(tmp_path, 'gt', names)
    assert os.path.exists(os.path.join(lmdb_path, 'data.mdb'))
    assert sorted(paths_from_lmdb(lmdb_path)) == sorted(keys)

    client = FileClient('lmdb', db_paths=[lmdb_path], client_keys=['gt'])
    for name, key in zip(names, keys):
        buf = client.get(key, 'gt')
        assert buf is not None
        img = imfrombytes(buf, float32=False)
        ref = cv2.imread(os.path.join(data_root, name), cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(img, ref)
    assert client.get('missing_key', 'gt') is None


def test_paired_dataset_lmdb_backend(tmp_path):
    from bsvd_tpu.data import build_dataset
    names = [f'img_{i:02d}.png' for i in range(3)]
    _, gt_lmdb, _ = _make_lmdb(tmp_path, 'gt', names, size=16)
    _, lq_lmdb, _ = _make_lmdb(tmp_path, 'lq', names, size=8)
    opt = {'name': 'lmdb_smoke', 'type': 'PairedImageDataset', 'phase': 'val',
           'scale': 2, 'dataroot_gt': gt_lmdb, 'dataroot_lq': lq_lmdb,
           'io_backend': {'type': 'lmdb'}}
    ds = build_dataset(opt)
    assert len(ds) == 3
    item = ds[1]
    assert item['gt'].shape == (3, 16, 16)
    assert item['lq'].shape == (3, 8, 8)
    assert np.isfinite(item['gt']).all() and item['gt'].max() <= 1.0


def test_compat_store_persistence_and_batched_commits(tmp_path):
    """The fallback store itself: batched write txns, reopen-readonly,
    value fidelity, format guard."""
    from bsvd_tpu.utils import _lmdb_compat as kv
    path = str(tmp_path / 'store.lmdb')
    env = kv.open(path, map_size=1 << 20)
    txn = env.begin(write=True)
    payload = {f'k{i}'.encode(): os.urandom(100 + i) for i in range(10)}
    for i, (k, v) in enumerate(payload.items()):
        txn.put(k, v)
        if (i + 1) % 4 == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()

    ro = kv.open(path, readonly=True)
    with ro.begin(write=False) as txn:
        for k, v in payload.items():
            assert txn.get(k) == v
        assert txn.get(b'nope') is None
    assert ro.stat()['entries'] == 10
    with pytest.raises(PermissionError):
        ro.begin(write=True)

    # a non-store file is rejected with a clear error
    bad = str(tmp_path / 'bad.lmdb')
    os.makedirs(bad)
    with open(os.path.join(bad, 'data.mdb'), 'wb') as f:
        f.write(b'not-a-store')
    with pytest.raises(ValueError):
        kv.open(bad, readonly=True)

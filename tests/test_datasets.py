"""Dataset coverage: Vimeo90K (+recurrent), SingleImage, FFHQ, REDS sliding
window — over synthesized folder trees."""

import os

import cv2
import numpy as np
import pytest

from bsvd_tpu.data import build_dataset


@pytest.fixture(scope='module')
def vimeo_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('vimeo')
    gt, lq = root / 'gt', root / 'lq'
    keys = []
    rng = np.random.default_rng(0)
    for clip in ('00001', '00002'):
        for seq in ('0001',):
            keys.append(f'{clip}/{seq}')
            os.makedirs(gt / clip / seq)
            os.makedirs(lq / clip / seq)
            for i in range(1, 8):
                img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                cv2.imwrite(str(gt / clip / seq / f'im{i}.png'), img)
                cv2.imwrite(str(lq / clip / seq / f'im{i}.png'),
                            cv2.resize(img, (8, 8)))
    meta = root / 'meta.txt'
    meta.write_text('\n'.join(f'{k} 7 (32,32,3)' for k in keys))
    return str(gt), str(lq), str(meta)


def test_vimeo90k_dataset(vimeo_tree):
    gt, lq, meta = vimeo_tree
    ds = build_dataset({'type': 'Vimeo90KDataset', 'dataroot_gt': gt,
                        'dataroot_lq': lq, 'meta_info_file': meta,
                        'num_frame': 7, 'gt_size': 16, 'scale': 4,
                        'random_reverse': True, 'use_hflip': True,
                        'use_rot': True, 'manual_seed': 0})
    item = ds[0]
    assert item['lq'].shape == (7, 3, 4, 4)
    assert item['gt'].shape == (3, 16, 16)
    assert len(ds) == 2


def test_vimeo90k_recurrent_dataset(vimeo_tree):
    gt, lq, meta = vimeo_tree
    ds = build_dataset({'type': 'Vimeo90KRecurrentDataset', 'dataroot_gt': gt,
                        'dataroot_lq': lq, 'meta_info_file': meta,
                        'num_frame': 7, 'gt_size': 16, 'scale': 4,
                        'random_reverse': False, 'flip_sequence': True,
                        'manual_seed': 0})
    item = ds[0]
    assert item['lq'].shape == (14, 3, 4, 4)    # flipped sequence doubles T
    assert item['gt'].shape == (14, 3, 16, 16)


def test_single_image_and_ffhq(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / 'imgs'
    os.makedirs(d)
    for i in range(3):
        cv2.imwrite(str(d / f'{i}.png'),
                    rng.integers(0, 255, (16, 20, 3), dtype=np.uint8))
    ds = build_dataset({'type': 'SingleImageDataset', 'dataroot_lq': str(d)})
    assert len(ds) == 3
    assert ds[0]['lq'].shape == (3, 16, 20)

    ffhq = build_dataset({'type': 'FFHQDataset', 'dataroot_gt': str(d),
                          'use_hflip': True, 'mean': [0.5, 0.5, 0.5],
                          'std': [0.5, 0.5, 0.5], 'manual_seed': 0})
    item = ffhq[1]
    assert item['gt'].shape == (3, 16, 20)
    assert item['gt'].min() >= -1.001 and item['gt'].max() <= 1.001


def test_reds_sliding_window_dataset(tmp_path):
    rng = np.random.default_rng(2)
    for kind, size in (('gt', 32), ('lq', 8)):
        for clip in ('000',):
            os.makedirs(tmp_path / kind / clip)
            for i in range(10):
                cv2.imwrite(str(tmp_path / kind / clip / f'{i:08d}.png'),
                            rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    ds = build_dataset({'type': 'REDSDataset', 'dataroot_gt': str(tmp_path / 'gt'),
                        'dataroot_lq': str(tmp_path / 'lq'), 'num_frame': 5,
                        'gt_size': 16, 'scale': 4, 'interval_list': [1, 2],
                        'random_reverse': True, 'manual_seed': 0})
    assert len(ds) == 10
    for idx in (0, 5, 9):
        item = ds[idx]
        assert item['lq'].shape == (5, 3, 4, 4)
        assert item['gt'].shape == (3, 16, 16)

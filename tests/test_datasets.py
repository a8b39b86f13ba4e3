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


def test_video_test_vimeo90k_dataset(vimeo_tree):
    gt, lq, meta = vimeo_tree
    ds = build_dataset({'type': 'VideoTestVimeo90KDataset', 'name': 'v',
                        'dataroot_gt': gt, 'dataroot_lq': lq,
                        'meta_info_file': meta, 'num_frame': 7})
    assert len(ds) == 2
    item = ds[0]
    assert item['lq'].shape == (7, 3, 8, 8)
    assert item['gt'].shape == (3, 32, 32)
    assert item['folder'] == 'vimeo90k'
    assert item['idx'] == '0/2'


def test_video_test_duf_dataset(tmp_path):
    from bsvd_tpu.data.data_util import duf_downsample
    gt_root, lq_root = tmp_path / 'gt', tmp_path / 'lq'
    rng = np.random.default_rng(3)
    os.makedirs(gt_root / 'clip0')
    os.makedirs(lq_root / 'clip0')
    for i in range(5):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        cv2.imwrite(str(gt_root / 'clip0' / f'{i:08d}.png'), img)
        cv2.imwrite(str(lq_root / 'clip0' / f'{i:08d}.png'),
                    cv2.resize(img, (8, 8)))
    base = {'type': 'VideoTestDUFDataset', 'name': 'duf',
            'dataroot_gt': str(gt_root), 'dataroot_lq': str(lq_root),
            'num_frame': 3, 'padding': 'reflection_circle', 'scale': 4}
    ds = build_dataset(dict(base))
    item = ds[2]
    assert item['lq'].shape == (3, 3, 8, 8)
    assert item['gt'].shape == (3, 32, 32)
    # DUF protocol: regenerate LQ by gaussian-downsampling the GT frames
    ds2 = build_dataset(dict(base, use_duf_downsampling=True))
    item2 = ds2[2]
    assert item2['lq'].shape == (3, 3, 8, 8)
    assert item2['gt'].shape == (3, 32, 32)
    # gaussian-downsampled LQ must differ from the bilinear-resized files
    assert not np.allclose(item2['lq'], item['lq'], atol=1e-3)
    # and must exactly equal duf_downsample applied to the GT window
    gts = np.stack([item['gt']] * 0 + [  # center window idxs: 1, 2, 3
        np.transpose(cv2.cvtColor(cv2.imread(
            str(gt_root / 'clip0' / f'{i:08d}.png')), cv2.COLOR_BGR2RGB),
            (2, 0, 1)).astype(np.float32) / 255. for i in (1, 2, 3)])
    np.testing.assert_allclose(item2['lq'], duf_downsample(gts, 13, 4),
                               rtol=1e-5, atol=1e-6)

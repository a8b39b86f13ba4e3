"""Vimeo90K training datasets (reference:
BasicSR/basicsr/data/vimeo90k_dataset.py — 7-frame septuplets, GT = center
frame im4; the recurrent variant returns all 7 GT frames)."""

import os
import random

import numpy as np

from bsvd_tpu.data.transforms import augment, paired_random_crop
from bsvd_tpu.utils.file_client import FileClient
from bsvd_tpu.utils.img_util import imfrombytes, img2tensor
from bsvd_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class Vimeo90KDataset:
    """opt: dataroot_gt, dataroot_lq, meta_info_file, io_backend, num_frame,
    gt_size, random_reverse, use_hflip, use_rot, scale."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_root, self.lq_root = opt['dataroot_gt'], opt['dataroot_lq']
        with open(opt['meta_info_file'], 'r') as fin:
            self.keys = [line.split(' ')[0] for line in fin]
        self.io_backend_opt = dict(opt.get('io_backend') or {'type': 'disk'})
        self.is_lmdb = self.io_backend_opt.get('type') == 'lmdb'
        if self.is_lmdb:
            self.io_backend_opt['db_paths'] = [self.lq_root, self.gt_root]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']
        self.neighbor_list = [i + (9 - opt['num_frame']) // 2
                              for i in range(opt['num_frame'])]
        self.random_reverse = opt.get('random_reverse', False)
        self._client = None
        self._rng = random.Random(opt.get('manual_seed'))

    @property
    def file_client(self):
        if self._client is None:
            o = dict(self.io_backend_opt)
            self._client = FileClient(o.pop('type', 'disk'), **o)
        return self._client

    def _read(self, path, key='gt'):
        if self.is_lmdb:
            return imfrombytes(self.file_client.get(path, key), float32=True)
        return imfrombytes(self.file_client.get(path), float32=True)

    def __getitem__(self, index):
        neighbor_list = list(self.neighbor_list)
        if self.random_reverse and self._rng.random() < 0.5:
            neighbor_list.reverse()
        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip, seq = key.split('/')

        if self.is_lmdb:
            img_gt = self._read(f'{key}/im4', 'gt')
        else:
            img_gt = self._read(os.path.join(self.gt_root, clip, seq, 'im4.png'))
        img_lqs = []
        for neighbor in neighbor_list:
            if self.is_lmdb:
                img_lqs.append(self._read(f'{clip}/{seq}/im{neighbor}', 'lq'))
            else:
                img_lqs.append(self._read(
                    os.path.join(self.lq_root, clip, seq, f'im{neighbor}.png')))

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size, scale,
                                             key, rng=self._rng)
        img_lqs.append(img_gt)
        img_results = augment(img_lqs, self.opt.get('use_hflip', True),
                              self.opt.get('use_rot', True), rng=self._rng)
        lq = np.stack([img2tensor(v) for v in img_results[:-1]])
        gt = img2tensor(img_results[-1])
        return {'lq': lq, 'gt': gt, 'key': key}

    def __len__(self):
        return len(self.keys)


@DATASET_REGISTRY.register()
class Vimeo90KRecurrentDataset(Vimeo90KDataset):
    """Returns all 7 GT frames alongside the LQ window (for recurrent nets)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.flip_sequence = opt.get('flip_sequence', False)

    def __getitem__(self, index):
        neighbor_list = list(self.neighbor_list)
        if self.random_reverse and self._rng.random() < 0.5:
            neighbor_list.reverse()
        scale = self.opt['scale']
        gt_size = self.opt['gt_size']
        key = self.keys[index]
        clip, seq = key.split('/')

        img_lqs, img_gts = [], []
        for neighbor in neighbor_list:
            if self.is_lmdb:
                img_lqs.append(self._read(f'{clip}/{seq}/im{neighbor}', 'lq'))
                img_gts.append(self._read(f'{clip}/{seq}/im{neighbor}', 'gt'))
            else:
                img_lqs.append(self._read(
                    os.path.join(self.lq_root, clip, seq, f'im{neighbor}.png')))
                img_gts.append(self._read(
                    os.path.join(self.gt_root, clip, seq, f'im{neighbor}.png')))

        img_gts, img_lqs = paired_random_crop(img_gts, img_lqs, gt_size, scale,
                                              key, rng=self._rng)
        img_results = augment(img_lqs + img_gts,
                              self.opt.get('use_hflip', True),
                              self.opt.get('use_rot', True), rng=self._rng)
        t = len(neighbor_list)
        lq = np.stack([img2tensor(v) for v in img_results[:t]])
        gt = np.stack([img2tensor(v) for v in img_results[t:]])
        if self.flip_sequence:
            lq = np.concatenate([lq, lq[::-1]], axis=0)
            gt = np.concatenate([gt, gt[::-1]], axis=0)
        return {'lq': lq, 'gt': gt, 'key': key}

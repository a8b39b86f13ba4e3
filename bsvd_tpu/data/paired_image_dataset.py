"""Paired LQ/GT image dataset for SR training/eval
(reference: BasicSR/basicsr/data/paired_image_dataset.py). Emits float32 CHW
RGB in [0,1]; a batching train wrapper lives in build_dataloader."""

import random

import numpy as np

from bsvd_tpu.data.data_util import (paired_paths_from_folders, paired_paths_from_lmdb,
                                     paired_paths_from_meta_info_file)
from bsvd_tpu.data.transforms import augment, paired_random_crop
from bsvd_tpu.utils.file_client import FileClient
from bsvd_tpu.utils.img_util import imfrombytes, img2tensor
from bsvd_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class PairedImageDataset:
    """opt keys: dataroot_gt, dataroot_lq, io_backend{type}, scale, phase,
    gt_size, use_hflip, use_rot, filename_tmpl, meta_info_file, mean, std."""

    def __init__(self, opt):
        self.opt = opt
        self.io_backend_opt = dict(opt.get('io_backend') or {'type': 'disk'})
        self.mean = opt.get('mean')
        self.std = opt.get('std')
        self.gt_folder, self.lq_folder = opt['dataroot_gt'], opt['dataroot_lq']
        self.filename_tmpl = opt.get('filename_tmpl', '{}')

        backend_type = self.io_backend_opt.get('type', 'disk')
        if backend_type == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.lq_folder, self.gt_folder]
            self.io_backend_opt['client_keys'] = ['lq', 'gt']
            self.paths = paired_paths_from_lmdb(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'])
        elif opt.get('meta_info_file') is not None:
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'],
                opt['meta_info_file'], self.filename_tmpl)
        else:
            self.paths = paired_paths_from_folders(
                [self.lq_folder, self.gt_folder], ['lq', 'gt'],
                self.filename_tmpl)
        self._client = None
        self._rng = random.Random(opt.get('manual_seed'))

    @property
    def file_client(self):
        if self._client is None:
            opt = dict(self.io_backend_opt)
            self._client = FileClient(opt.pop('type', 'disk'), **opt)
        return self._client

    def __getitem__(self, index):
        scale = self.opt.get('scale', 1)
        gt_path = self.paths[index]['gt_path']
        lq_path = self.paths[index]['lq_path']
        if self.io_backend_opt.get('type') == 'lmdb':
            img_gt = imfrombytes(self.file_client.get(gt_path, 'gt'), float32=True)
            img_lq = imfrombytes(self.file_client.get(lq_path, 'lq'), float32=True)
        else:
            img_gt = imfrombytes(self.file_client.get(gt_path), float32=True)
            img_lq = imfrombytes(self.file_client.get(lq_path), float32=True)

        if self.opt.get('phase') == 'train':
            gt_size = self.opt['gt_size']
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size, scale,
                                                gt_path, rng=self._rng)
            img_gt, img_lq = augment([img_gt, img_lq],
                                     self.opt.get('use_hflip', True),
                                     self.opt.get('use_rot', True),
                                     rng=self._rng)
        else:
            # crop gt to match lq * scale
            h, w = img_lq.shape[0:2]
            img_gt = img_gt[0:h * scale, 0:w * scale, :]

        gt = img2tensor(img_gt)      # CHW RGB float32
        lq = img2tensor(img_lq)
        if self.mean is not None:
            mean = np.asarray(self.mean, np.float32).reshape(-1, 1, 1)
            std = np.asarray(self.std, np.float32).reshape(-1, 1, 1)
            gt = (gt - mean) / std
            lq = (lq - mean) / std
        return {'lq': lq, 'gt': gt, 'lq_path': lq_path, 'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)

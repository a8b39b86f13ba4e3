"""Single-image datasets (reference: BasicSR/basicsr/data/single_image_dataset.py
and ffhq_dataset.py)."""

import os
import random

import numpy as np

from bsvd_tpu.data.data_util import paths_from_folder, paths_from_lmdb
from bsvd_tpu.utils.file_client import FileClient
from bsvd_tpu.utils.img_util import imfrombytes, img2tensor
from bsvd_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class SingleImageDataset:
    """LQ-only dataset (inference / no-reference eval).

    opt: dataroot_lq, io_backend, optional meta_info_file, mean, std."""

    def __init__(self, opt):
        self.opt = opt
        self.io_backend_opt = dict(opt.get('io_backend') or {'type': 'disk'})
        self.mean = opt.get('mean')
        self.std = opt.get('std')
        self.lq_folder = opt['dataroot_lq']
        if self.io_backend_opt.get('type') == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.lq_folder]
            self.io_backend_opt['client_keys'] = ['lq']
            self.paths = paths_from_lmdb(self.lq_folder)
        elif opt.get('meta_info_file') is not None:
            with open(opt['meta_info_file'], 'r') as fin:
                self.paths = [os.path.join(self.lq_folder, line.rstrip().split(' ')[0])
                              for line in fin]
        else:
            self.paths = sorted(paths_from_folder(self.lq_folder))
        self._client = None

    @property
    def file_client(self):
        if self._client is None:
            o = dict(self.io_backend_opt)
            self._client = FileClient(o.pop('type', 'disk'), **o)
        return self._client

    def __getitem__(self, index):
        lq_path = self.paths[index]
        if self.io_backend_opt.get('type') == 'lmdb':
            img_lq = imfrombytes(self.file_client.get(lq_path, 'lq'), float32=True)
        else:
            img_lq = imfrombytes(self.file_client.get(lq_path), float32=True)
        lq = img2tensor(img_lq)
        if self.mean is not None:
            mean = np.asarray(self.mean, np.float32).reshape(-1, 1, 1)
            std = np.asarray(self.std, np.float32).reshape(-1, 1, 1)
            lq = (lq - mean) / std
        return {'lq': lq, 'lq_path': lq_path}

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class FFHQDataset:
    """FFHQ face dataset: GT images with horizontal-flip augmentation
    (reference ffhq_dataset.py)."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_folder = opt['dataroot_gt']
        self.mean = opt.get('mean')
        self.std = opt.get('std')
        self.io_backend_opt = dict(opt.get('io_backend') or {'type': 'disk'})
        if self.io_backend_opt.get('type') == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.gt_folder]
            self.io_backend_opt['client_keys'] = ['gt']
            self.paths = paths_from_lmdb(self.gt_folder)
        else:
            self.paths = sorted(paths_from_folder(self.gt_folder))
        self._client = None
        self._rng = random.Random(opt.get('manual_seed'))

    @property
    def file_client(self):
        if self._client is None:
            o = dict(self.io_backend_opt)
            self._client = FileClient(o.pop('type', 'disk'), **o)
        return self._client

    def __getitem__(self, index):
        gt_path = self.paths[index]
        if self.io_backend_opt.get('type') == 'lmdb':
            img_gt = imfrombytes(self.file_client.get(gt_path, 'gt'), float32=True)
        else:
            img_gt = imfrombytes(self.file_client.get(gt_path), float32=True)
        if self.opt.get('use_hflip', True) and self._rng.random() < 0.5:
            img_gt = np.ascontiguousarray(img_gt[:, ::-1, :])
        gt = img2tensor(img_gt)
        if self.mean is not None:
            mean = np.asarray(self.mean, np.float32).reshape(-1, 1, 1)
            std = np.asarray(self.std, np.float32).reshape(-1, 1, 1)
            gt = (gt - mean) / std
        return {'gt': gt, 'gt_path': gt_path}

    def __len__(self):
        return len(self.paths)

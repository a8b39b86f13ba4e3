"""REDS sliding-window training dataset (reference:
BasicSR/basicsr/data/reds_dataset.py REDSDataset — num_frame LQ neighbors ->
center GT frame, with temporal interval sampling and paired crop/augment).
Operates on generic clip-folder trees (dataroot/<clip>/NNNNNNNN.png)."""

import random

import numpy as np

from bsvd_tpu.data.transforms import augment, paired_random_crop
from bsvd_tpu.data.utils_common import get_imagenames, open_image
from bsvd_tpu.data.video_test_dataset import _clip_dirs
from bsvd_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class REDSDataset:
    """opt: dataroot_gt, dataroot_lq, num_frame (odd), gt_size, scale,
    interval_list, random_reverse, use_hflip, use_rot."""

    def __init__(self, opt):
        self.opt = opt
        self.scale = opt.get('scale', 4)
        self.gt_size = opt.get('gt_size', 256)
        self.num_frame = opt.get('num_frame', 5)
        assert self.num_frame % 2 == 1, 'num_frame should be odd'
        self.num_half = self.num_frame // 2
        self.interval_list = opt.get('interval_list', [1])
        self.random_reverse = opt.get('random_reverse', False)
        self.gt_dirs = _clip_dirs(opt['dataroot_gt'])
        self.lq_dirs = _clip_dirs(opt['dataroot_lq'])
        assert len(self.gt_dirs) == len(self.lq_dirs)
        self.gt_frames = [get_imagenames(d) for d in self.gt_dirs]
        self.lq_frames = [get_imagenames(d) for d in self.lq_dirs]
        self.items = [(fi, ci) for fi in range(len(self.gt_dirs))
                      for ci in range(len(self.gt_frames[fi]))]
        self._rng = random.Random(opt.get('manual_seed'))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        rng = self._rng
        fi, center = self.items[index]
        total = len(self.lq_frames[fi])
        interval = rng.choice(self.interval_list)

        # resample the window until it fits (reference clips the start)
        start = center - self.num_half * interval
        end = center + self.num_half * interval
        while start < 0 or end >= total:
            center = rng.randint(self.num_half * interval,
                                 total - 1 - self.num_half * interval)
            start = center - self.num_half * interval
            end = center + self.num_half * interval
        neighbors = list(range(start, end + 1, interval))
        if self.random_reverse and rng.random() < 0.5:
            neighbors.reverse()

        img_lqs = [np.transpose(open_image(self.lq_frames[fi][i])[0], (1, 2, 0))
                   for i in neighbors]
        img_gt = np.transpose(open_image(self.gt_frames[fi][center])[0], (1, 2, 0))

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, self.gt_size,
                                             self.scale, rng=rng)
        results = augment(img_lqs + [img_gt], self.opt.get('use_hflip', True),
                          self.opt.get('use_rot', True), rng=rng)
        lq = np.stack([np.transpose(v, (2, 0, 1)) for v in results[:-1]])
        gt = np.transpose(results[-1], (2, 0, 1))
        return {'lq': lq, 'gt': gt, 'key': f'{fi}/{center}'}

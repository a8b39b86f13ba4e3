"""Validation dataset: whole clips from image folders + synthetic Gaussian
noise at a fixed sigma (reference: Experimental_root/data/video_dali_dataset.py:199-249).

Differences from the reference, by design:
- noise is drawn from a numpy Generator seeded per (manual_seed, clip index)
  instead of the torch global RNG — deterministic across runs and processes;
- arrays stay on host (numpy); the model moves them to device.
"""

import glob
import os

import numpy as np

from bsvd_tpu.data.utils_common import get_imagenames, open_sequence
from bsvd_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class ValFolderDataset:
    """Loads entire image-folder clips; adds fixed-sigma Gaussian noise.

    opt keys: valsetdir, num_validation_frames, valnoisestd,
    optional: gray_mode, scene_name, blind, manual_seed.
    """

    def __init__(self, opt):
        self.opt = opt
        self.valsetdir = opt['valsetdir']
        self.gray_mode = opt.get('gray_mode', False)
        self.num_input_frames = opt['num_validation_frames']
        self.valnoisestd = opt['valnoisestd']
        self.scene_name = opt.get('scene_name', None)
        self.seed = opt.get('manual_seed', 0)
        self.seqs_dirs = sorted(
            pth for pth in glob.glob(os.path.join(self.valsetdir, '*'))
            if os.path.isdir(pth))
        self.base_folder = [os.path.basename(p) for p in self.seqs_dirs]
        if self.scene_name is not None:
            keep = [i for i, d in enumerate(self.seqs_dirs) if self.scene_name in d]
            self.seqs_dirs = [self.seqs_dirs[i] for i in keep]
            self.base_folder = [self.base_folder[i] for i in keep]
        self.num_frames = [
            min(len(get_imagenames(d)), self.num_input_frames)
            for d in self.seqs_dirs]

    def __getitem__(self, index):
        seq, _, _ = open_sequence(self.seqs_dirs[index], self.gray_mode,
                                  expand_if_needed=False,
                                  max_num_fr=self.num_input_frames)
        gt = seq[None, ...]                                  # (1, T, C, H, W)
        n, t, c, h, w = gt.shape
        rng = np.random.default_rng((self.seed, index))
        sigma = self.valnoisestd / 255.0
        noise = rng.normal(0.0, sigma, size=gt.shape).astype(np.float32)
        lq = gt + noise
        noise_map = np.full((n, t, 1, h, w), sigma, dtype=np.float32)

        out = {'gt': gt, 'lq': lq, 'noise_map': noise_map,
               'folder': self.base_folder[index], 'index': index}
        if self.opt.get('blind', False):
            out.pop('noise_map')
        return out

    def __len__(self):
        return len(self.seqs_dirs)

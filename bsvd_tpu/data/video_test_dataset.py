"""Video test datasets (reference: BasicSR/basicsr/data/video_test_dataset.py
VideoRecurrentTestDataset — whole clips per folder — and the sliding-window
VideoTestDataset)."""

import glob
import os

import numpy as np

from bsvd_tpu.data.data_util import generate_frame_indices
from bsvd_tpu.data.utils_common import get_imagenames, open_sequence
from bsvd_tpu.utils.registry import DATASET_REGISTRY


def _clip_dirs(root):
    return sorted(p for p in glob.glob(os.path.join(root, '*'))
                  if os.path.isdir(p))


@DATASET_REGISTRY.register()
class VideoRecurrentTestDataset:
    """Whole-clip test dataset over paired folder trees.

    opt: dataroot_lq, dataroot_gt, name, optional num_frame cap.
    Returns per item: lq/gt (T, C, H, W) float32 [0,1], folder.
    """

    def __init__(self, opt):
        self.opt = opt
        self.lq_dirs = _clip_dirs(opt['dataroot_lq'])
        self.gt_dirs = _clip_dirs(opt['dataroot_gt'])
        assert len(self.lq_dirs) == len(self.gt_dirs), (
            f"lq/gt clip count mismatch under {opt['dataroot_lq']} vs "
            f"{opt['dataroot_gt']}")
        self.base_folder = [os.path.basename(p) for p in self.lq_dirs]
        cap = opt.get('num_frame', -1)
        self.max_fr = cap if cap and cap > 0 else 10**6
        self.num_frames = [min(len(get_imagenames(d)), self.max_fr)
                           for d in self.lq_dirs]

    def __getitem__(self, index):
        lq, _, _ = open_sequence(self.lq_dirs[index], max_num_fr=self.max_fr)
        gt, _, _ = open_sequence(self.gt_dirs[index], max_num_fr=self.max_fr)
        return {'lq': lq, 'gt': gt, 'folder': self.base_folder[index],
                'index': index}

    def __len__(self):
        return len(self.lq_dirs)


@DATASET_REGISTRY.register()
class VideoTestDataset:
    """Sliding-window test dataset: one item per center frame with its
    num_frame neighbors (reference VideoTestDataset for EDVR-style models)."""

    def __init__(self, opt):
        self.opt = opt
        self.num_frame = opt.get('num_frame', 5)
        self.padding = opt.get('padding', 'reflection_circle')
        self.lq_dirs = _clip_dirs(opt['dataroot_lq'])
        self.gt_dirs = _clip_dirs(opt['dataroot_gt'])
        self.items = []           # (folder_idx, frame_idx)
        self.lq_frames = []
        self.gt_frames = []
        self.base_folder = [os.path.basename(p) for p in self.lq_dirs]
        for fi, (lqd, gtd) in enumerate(zip(self.lq_dirs, self.gt_dirs)):
            lqf, gtf = get_imagenames(lqd), get_imagenames(gtd)
            self.lq_frames.append(lqf)
            self.gt_frames.append(gtf)
            for i in range(len(lqf)):
                self.items.append((fi, i))
        self.num_frames = [len(f) for f in self.lq_frames]

    def __getitem__(self, index):
        from bsvd_tpu.data.utils_common import open_image
        fi, ci = self.items[index]
        idxs = generate_frame_indices(ci, len(self.lq_frames[fi]),
                                      self.num_frame, self.padding)
        lq = np.stack([open_image(self.lq_frames[fi][i])[0] for i in idxs])
        gt = open_image(self.gt_frames[fi][ci])[0]
        return {'lq': lq, 'gt': gt, 'folder': self.base_folder[fi],
                'idx': f'{ci}/{len(self.lq_frames[fi])}'}

    def __len__(self):
        return len(self.items)


@DATASET_REGISTRY.register()
class REDSRecurrentDataset:
    """Recurrent training dataset over paired clip-folder trees (REDS layout:
    dataroot_gt/<clip>/NNNNNNNN.png) — random temporal window + paired random
    crop + augmentation (reference: BasicSR/basicsr/data/reds_dataset.py
    REDSRecurrentDataset semantics, generalized to any folder tree)."""

    def __init__(self, opt):
        import random
        self.opt = opt
        self.scale = opt.get('scale', 4)
        self.gt_size = opt.get('gt_size', 256)
        self.num_frame = opt.get('num_frame', 15)
        self.interval_list = opt.get('interval_list', [1])
        self.gt_dirs = _clip_dirs(opt['dataroot_gt'])
        self.lq_dirs = _clip_dirs(opt['dataroot_lq'])
        assert len(self.gt_dirs) == len(self.lq_dirs)
        self.gt_frames = [get_imagenames(d) for d in self.gt_dirs]
        self.lq_frames = [get_imagenames(d) for d in self.lq_dirs]
        self._rng = random.Random(opt.get('manual_seed'))

    def __len__(self):
        return len(self.gt_dirs) * 100       # virtual epoch length

    def __getitem__(self, index):
        from bsvd_tpu.data.transforms import augment, paired_random_crop
        from bsvd_tpu.data.utils_common import open_image
        rng = self._rng
        fi = index % len(self.gt_dirs)
        interval = rng.choice(self.interval_list)
        total = len(self.lq_frames[fi])
        span = (self.num_frame - 1) * interval
        start = rng.randint(0, max(total - 1 - span, 0))
        idxs = list(range(start, start + span + 1, interval))

        lq_imgs = [np.transpose(open_image(self.lq_frames[fi][i])[0], (1, 2, 0))
                   for i in idxs]
        gt_imgs = [np.transpose(open_image(self.gt_frames[fi][i])[0], (1, 2, 0))
                   for i in idxs]
        gt_imgs, lq_imgs = paired_random_crop(gt_imgs, lq_imgs, self.gt_size,
                                              self.scale, rng=rng)
        imgs = augment(lq_imgs + gt_imgs, self.opt.get('use_hflip', True),
                       self.opt.get('use_rot', True), rng=rng)
        n = len(idxs)
        lq = np.stack([np.transpose(v, (2, 0, 1)) for v in imgs[:n]])
        gt = np.stack([np.transpose(v, (2, 0, 1)) for v in imgs[n:]])
        return {'lq': lq, 'gt': gt, 'key': f'{fi}/{start}'}


@DATASET_REGISTRY.register()
class VideoTestVimeo90KDataset:
    """Vimeo90K-Test: one septuplet per item, center frame (im4) as GT
    (reference: BasicSR/basicsr/data/video_test_dataset.py:133-199).

    opt: dataroot_gt, dataroot_lq, meta_info_file, num_frame, name.
    """

    def __init__(self, opt):
        self.opt = opt
        if opt.get('cache_data'):
            raise NotImplementedError(
                'cache_data in Vimeo90K-Test dataset is not implemented.')
        gt_root, lq_root = opt['dataroot_gt'], opt['dataroot_lq']
        num_frame = opt.get('num_frame', 7)
        neighbors = [i + (9 - num_frame) // 2 for i in range(num_frame)]
        with open(opt['meta_info_file']) as fin:
            subfolders = [line.split(' ')[0] for line in fin if line.strip()]
        self.gt_paths = [os.path.join(gt_root, s, 'im4.png')
                         for s in subfolders]
        self.lq_paths = [[os.path.join(lq_root, s, f'im{i}.png')
                          for i in neighbors] for s in subfolders]
        self.total = len(subfolders)

    def __getitem__(self, index):
        from bsvd_tpu.data.utils_common import open_image
        lq = np.stack([open_image(p)[0] for p in self.lq_paths[index]])
        gt = open_image(self.gt_paths[index])[0]
        return {'lq': lq, 'gt': gt, 'folder': 'vimeo90k',
                'idx': f'{index}/{self.total}',
                'lq_path': self.lq_paths[index][len(self.lq_paths[index]) // 2]}

    def __len__(self):
        return self.total


@DATASET_REGISTRY.register()
class VideoTestDUFDataset(VideoTestDataset):
    """Sliding-window test dataset for DUF: optionally regenerates the LQ
    window by gaussian-downsampling the GT frames (official DUF protocol;
    reference: BasicSR/basicsr/data/video_test_dataset.py:202-251).

    Extra opt keys: use_duf_downsampling (bool), scale (int).
    """

    def __getitem__(self, index):
        from bsvd_tpu.data.data_util import duf_downsample
        from bsvd_tpu.data.transforms import mod_crop
        from bsvd_tpu.data.utils_common import open_image
        fi, ci = self.items[index]
        scale = self.opt.get('scale', 4)
        idxs = generate_frame_indices(ci, len(self.lq_frames[fi]),
                                      self.num_frame, self.padding)
        if self.opt.get('use_duf_downsampling'):
            gt_seq = [open_image(self.gt_frames[fi][i])[0] for i in idxs]
            gt_seq = [np.transpose(mod_crop(np.transpose(g, (1, 2, 0)), scale),
                                   (2, 0, 1)) for g in gt_seq]
            lq = duf_downsample(np.stack(gt_seq), kernel_size=13, scale=scale)
        else:
            lq = np.stack([open_image(self.lq_frames[fi][i])[0] for i in idxs])
        gt = open_image(self.gt_frames[fi][ci])[0]
        gt = np.transpose(mod_crop(np.transpose(gt, (1, 2, 0)), scale),
                          (2, 0, 1))
        return {'lq': lq, 'gt': gt, 'folder': self.base_folder[fi],
                'idx': f'{ci}/{len(self.lq_frames[fi])}'}

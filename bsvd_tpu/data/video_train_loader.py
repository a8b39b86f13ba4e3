"""Training video loader: the TPU-host replacement for the NVIDIA DALI GPU
decode pipeline (reference: Experimental_root/data/video_dali_dataset.py:23-193).

Pipeline: worker threads decode random (clip, start, crop) windows from
mp4 files (cv2.VideoCapture) or frame folders -> a bounded prefetch queue
(double-buffering the host/device boundary like DALI prefetch_queue_depth +
the reference CUDAPrefetcher) -> batch assembly -> normalize + random
augment + Gaussian noise synthesis with sigma ~ U[noise_ival]/255 per clip
('N') or per frame ('NF'), exactly the reference's __next__ semantics
(video_dali_dataset.py:155-193 + utils_common.py:28-75).

Registered both under its own name and as ``train_dali_loader`` so reference
train YAMLs run unchanged.
"""

import os
import queue
import threading

import cv2
import numpy as np

from bsvd_tpu.data.utils_common import get_imagenames
from bsvd_tpu.utils.registry import DATASET_REGISTRY

_VIDEO_EXTS = ('.mp4', '.avi', '.mov', '.mkv', '.m4v', '.webm')


def _use_native():
    """Native C++ decode pool (libjpeg/libpng, bsvd_tpu/data/_native) —
    enabled by default when it builds; BSVD_NATIVE_DECODE=0 disables."""
    if os.environ.get('BSVD_NATIVE_DECODE', '1') == '0':
        return False
    from bsvd_tpu.data import native_decode
    return native_decode.available()


class _ClipIndex:
    """Enumerates decodable clips (video files or frame folders) and their
    frame counts."""

    def __init__(self, root):
        self.entries = []   # (path, kind, num_frames)
        for name in sorted(os.listdir(root)):
            path = os.path.join(root, name)
            if os.path.isdir(path):
                frames = get_imagenames(path)
                if frames:
                    self.entries.append((path, 'frames', len(frames)))
            elif name.lower().endswith(_VIDEO_EXTS):
                cap = cv2.VideoCapture(path)
                n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
                cap.release()
                if n > 0:
                    self.entries.append((path, 'video', n))
        if not self.entries:
            raise IOError(f'no video files or frame folders under {root}')
        self._dims = {}                  # path -> (H, W) (frame folders)
        self._tls = threading.local()    # per-worker persistent cv2 handles

    def _frame_dims(self, path, files):
        """Cached (H, W) of a frame folder (one header probe per clip)."""
        dims = self._dims.get(path)
        if dims is None:
            from bsvd_tpu.data import native_decode
            dims = native_decode.image_dims(files[0])
            if dims is None:
                img = cv2.imread(files[0])
                if img is None:
                    raise IOError(f'decode failed for {files[0]}')
                dims = img.shape[:2]
            self._dims[path] = dims
        return dims

    def _capture(self, path):
        """Per-worker persistent VideoCapture (re-opening + container probe
        per sample measured ~40% of the mp4 path's time)."""
        caps = getattr(self._tls, 'caps', None)
        if caps is None:
            caps = self._tls.caps = {}
        cap = caps.get(path)
        if cap is None or not cap.isOpened():
            cap = caps[path] = cv2.VideoCapture(path)
        return cap

    def sample(self, rng, seq_len, crop_hw):
        """Pick a random window: returns (T, ch, cw, 3) uint8 RGB."""
        path, kind, n = self.entries[rng.integers(len(self.entries))]
        if n < seq_len:
            raise IOError(f'clip {path} shorter ({n}) than temp_patch_size {seq_len}')
        start = int(rng.integers(0, n - seq_len + 1))
        ch, cw = crop_hw
        if kind == 'frames':
            files = get_imagenames(path)[start:start + seq_len]
            if _use_native():
                from bsvd_tpu.data import native_decode
                # crop INSIDE the decoder: only the window's rows/columns
                # pass through IDCT/defilter (ROI decode, decoder.cpp)
                h, w = self._frame_dims(path, files)
                if h < ch or w < cw:
                    raise IOError(f'clip {path} smaller than crop {crop_hw}')
                y0 = int(rng.integers(0, h - ch + 1))
                x0 = int(rng.integers(0, w - cw + 1))
                seq = native_decode.load_crop_seq(files, y0, x0, ch, cw)
                if seq is not None:
                    return seq
            frames = []
            for f in files:
                img = cv2.imread(f)
                if img is None:            # truncated/corrupt frame
                    raise IOError(f'decode failed for {f}')
                frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            seq = np.stack(frames)
        else:
            cap = self._capture(path)
            cap.set(cv2.CAP_PROP_POS_FRAMES, start)
            frames = []
            for _ in range(seq_len):
                ok, img = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            if len(frames) < seq_len:
                cap.release()              # poisoned handle: reopen next time
                raise IOError(f'decode failed at {path}@{start}')
            seq = np.stack(frames)
        h, w = seq.shape[1:3]
        if h < ch or w < cw:
            raise IOError(f'clip {path} smaller than crop {crop_hw}')
        # same crop position for all frames (reference CropMirrorNormalize
        # with crop_pos from one uniform draw per sample)
        y0 = int(rng.integers(0, h - ch + 1))
        x0 = int(rng.integers(0, w - cw + 1))
        return seq[:, y0:y0 + ch, x0:x0 + cw]


def normalize_augment(batch, rng):
    """[0,255] (N,F,C,H,W) -> [0,1] + one random geometric/offset transform
    applied to the whole batch (reference utils_common.py:28-75: weights
    32 : 12x8 over do_nothing/flipud/rot90-family/add-constant)."""
    x = batch.astype(np.float32) / 255.0
    n, f, c, h, w = x.shape
    x = x.reshape(n, f * c, h, w)
    choice = rng.choice(9, p=np.array([32, 12, 12, 12, 12, 12, 12, 12, 12],
                                      np.float64) / 128.0)
    if choice == 0:
        pass
    elif choice == 8:
        # per-sample constant offset ~ N(0, 5/255)
        x = x + rng.normal(0.0, 5 / 255., (n, 1, 1, 1)).astype(np.float32)
    else:
        # ids: 1=flipud, 2=rot90, 3=rot90+flip, 4=rot180, 5=rot180+flip,
        #      6=rot270, 7=rot270+flip  (matching the reference list order)
        table = {1: (0, True), 2: (1, False), 3: (1, True), 4: (2, False),
                 5: (2, True), 6: (3, False), 7: (3, True)}
        k, flip = table[choice]
        if k:
            x = np.rot90(x, k=k, axes=(2, 3))
        if flip:
            x = np.flip(x, axis=2)
    # rot90 k=1/3 swaps the spatial dims — reshape with the ACTUAL trailing
    # dims, not the input's (h, w), so rectangular patches stay intact
    x = np.ascontiguousarray(x).reshape(n, f, c, *x.shape[-2:])
    return x, x


@DATASET_REGISTRY.register(suffix=None)
class train_video_loader:
    """Self-iterating train loader (the loader IS the dataset, like the
    reference DALI object — train_pipeline.py:37-39).

    opt keys (reference-compatible): trainset_dir, batch_size_per_gpu,
    temp_patch_size, patch_size, max_number_patches, noise_ival, noise_shape
    ('N'|'NF'), blind, use_shuffle, prefetch_size; extra: num_devices,
    num_workers, manual_seed.
    """

    def __init__(self, opt):
        self.opt = dict(opt)
        self.opt.setdefault('noise_shape', 'NF')
        self.batch_per_device = int(opt['batch_size_per_gpu'])
        self.num_devices = int(opt.get('num_devices', 1))
        self.batch_size = self.batch_per_device * self.num_devices
        self.seq_len = int(opt['temp_patch_size'])
        ps = opt['patch_size']
        self.crop_hw = (ps[0], ps[1]) if isinstance(ps, (list, tuple)) else (ps, ps)
        # max_number_patches counts PATCHES (samples) per epoch, like the
        # reference DALI iterator's size= (video_dali_dataset.py:88-143);
        # train.py consumes len(loader) as iterations per epoch, so divide
        # by the global batch (reference: ceil(len(set)/batch*world),
        # train_pipeline.py:49-50 — 300000/16 = 18750 iters/epoch).
        patches = int(opt.get('max_number_patches', -1))
        self.index = _ClipIndex(opt['trainset_dir'])
        if patches <= 0:
            total = sum(n for _, _, n in self.index.entries)
            patches = max(total // self.seq_len, 1)
        self.epoch_size = max(-(-patches // self.batch_size), 1)

        self.rng = np.random.default_rng(opt.get('manual_seed', 12))
        self._prefetch_size = int(opt.get('prefetch_size', 16))
        self._num_workers = int(opt.get('num_workers',
                                        min(8, os.cpu_count() or 4)))
        self._queue = queue.Queue(maxsize=self._prefetch_size)
        self._stop = threading.Event()
        self._workers = []
        self._start_workers()

    # -- background sample production ----------------------------------- #
    def _start_workers(self):
        for i in range(self._num_workers):
            seed = self.rng.integers(2**63)
            t = threading.Thread(target=self._worker, args=(int(seed),),
                                 daemon=True)
            t.start()
            self._workers.append(t)

    def _worker(self, seed):
        rng = np.random.default_rng(seed)
        while not self._stop.is_set():
            try:
                window = self.index.sample(rng, self.seq_len, self.crop_hw)
            except (IOError, cv2.error):
                # skip undecodable windows (corrupt frame, short clip) —
                # the worker stays alive and draws another sample
                continue
            # (T, H, W, 3) uint8 -> (T, 3, H, W)
            sample = np.transpose(window, (0, 3, 1, 2))
            while not self._stop.is_set():
                try:
                    self._queue.put(sample, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def close(self):
        self._stop.set()

    def __len__(self):
        return self.epoch_size

    def __iter__(self):
        self._emitted = 0
        return self

    def __next__(self):
        if getattr(self, '_emitted', 0) >= self.epoch_size:
            raise StopIteration
        self._emitted = getattr(self, '_emitted', 0) + 1

        samples = [self._queue.get() for _ in range(self.batch_size)]
        batch = np.stack(samples)                       # (N, F, 3, H, W) uint8

        img_train, gt_train = normalize_augment(batch, self.rng)
        n, f, c, h, w = img_train.shape
        lo, hi = self.opt['noise_ival']
        if self.opt['noise_shape'] == 'NF':
            stdn = self.rng.uniform(lo / 255., hi / 255., (n, f, 1, 1, 1))
        else:  # 'N': one sigma per clip
            stdn = self.rng.uniform(lo / 255., hi / 255., (n, 1, 1, 1, 1))
        stdn = stdn.astype(np.float32)
        noise = self.rng.normal(0.0, 1.0, img_train.shape).astype(np.float32) * stdn
        imgn_train = img_train + noise
        noise_map = np.broadcast_to(stdn, (n, f, 1, h, w)).astype(np.float32)

        out = {'gt': gt_train, 'lq': imgn_train, 'noise_map': noise_map}
        if self.opt.get('blind', False):
            out.pop('noise_map')
        return out


@DATASET_REGISTRY.register(suffix=None)
class train_dali_loader(train_video_loader):
    """Reference-compatible alias (the reference registers its DALI loader
    under this name — video_dali_dataset.py:76)."""

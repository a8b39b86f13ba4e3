"""Regression tests for data-layer robustness fixes: rectangular-patch
augmentation, epoch accounting in patches vs batches, loader error
propagation, and the cosine-restart boundary."""

import numpy as np
import pytest

from bsvd_tpu.data.sampler import BatchLoader
from bsvd_tpu.data.video_train_loader import normalize_augment


class _ForcedChoiceRng:
    """Forwards everything to a real rng except choice(), which is pinned."""

    def __init__(self, choice):
        self._choice = choice
        self._rng = np.random.default_rng(0)

    def choice(self, *a, **k):
        return self._choice

    def __getattr__(self, name):
        return getattr(self._rng, name)


@pytest.mark.parametrize('choice', list(range(1, 8)))
def test_normalize_augment_rectangular_patches(choice):
    """rot90 swaps H and W; the reshape back to (n, f, c, ...) must use the
    transformed dims or rectangular patches get silently scrambled."""
    n, f, c, h, w = 2, 3, 3, 8, 12
    batch = np.arange(n * f * c * h * w, dtype=np.uint8).reshape(
        n, f, c, h, w) % 255

    img, gt = normalize_augment(batch, _ForcedChoiceRng(choice))
    assert img.shape[:3] == (n, f, c)

    # oracle: the same geometric transform applied per (sample, frame, chan)
    table = {1: (0, True), 2: (1, False), 3: (1, True), 4: (2, False),
             5: (2, True), 6: (3, False), 7: (3, True)}
    k, flip = table[choice]
    ref = batch.astype(np.float32) / 255.0
    if k:
        ref = np.rot90(ref, k=k, axes=(3, 4))
    if flip:
        ref = np.flip(ref, axis=3)
    assert img.shape == ref.shape
    np.testing.assert_allclose(img, ref, rtol=0, atol=0)
    np.testing.assert_allclose(gt, img)


def test_train_loader_epoch_counts_batches_not_patches(tmp_path):
    """max_number_patches counts SAMPLES (reference DALI size=); len(loader)
    is consumed as iterations per epoch, so it must divide by the batch."""
    import cv2
    clip = tmp_path / 'clip0'
    clip.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        cv2.imwrite(str(clip / f'{i:03d}.png'),
                    rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
    from bsvd_tpu.data.video_train_loader import train_video_loader
    loader = train_video_loader({
        'trainset_dir': str(tmp_path), 'batch_size_per_gpu': 4,
        'temp_patch_size': 3, 'patch_size': 8, 'max_number_patches': 10,
        'noise_ival': [5, 55], 'num_workers': 1})
    try:
        assert len(loader) == 3          # ceil(10 / 4)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]['lq'].shape[0] == 4
    finally:
        loader.close()


def test_clip_index_native_roi_matches_cv2(tmp_path):
    """_ClipIndex.sample with the native ROI decoder (crop INSIDE the
    decoder) returns the same window, from the same rng draws, as the cv2
    full-decode fallback — decode strategy must not change the sampled
    data or the rng stream."""
    import cv2
    import os
    from bsvd_tpu.data import native_decode as nd
    from bsvd_tpu.data.video_train_loader import _ClipIndex
    if not nd.available():
        pytest.skip('native decoder unavailable')
    rng0 = np.random.default_rng(7)
    for c in range(2):
        clip = tmp_path / f'clip{c}'
        clip.mkdir()
        for i in range(6):
            img = rng0.integers(0, 255, (60, 80, 3), dtype=np.uint8)
            cv2.imwrite(str(clip / f'{i:03d}.png'), img)
    idx = _ClipIndex(str(tmp_path))
    for seed in range(4):
        a = idx.sample(np.random.default_rng(seed), 3, (32, 48))
        os.environ['BSVD_NATIVE_DECODE'] = '0'
        try:
            b = idx.sample(np.random.default_rng(seed), 3, (32, 48))
        finally:
            os.environ.pop('BSVD_NATIVE_DECODE')
        np.testing.assert_array_equal(a, b)


def test_batch_loader_propagates_dataset_errors():
    """A dataset exception must surface in the consumer, not hang the
    training loop behind a dead producer thread."""

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise IOError('corrupt sample')
            return {'x': np.zeros((2, 2), np.float32)}

    loader = BatchLoader(Bad(), batch_size=2, num_workers=2, shuffle=False)
    with pytest.raises(IOError, match='corrupt sample'):
        for _ in loader:
            pass


def test_batch_loader_parallel_workers_preserve_order():
    class Ds:
        supports_parallel_read = True    # opt-in: per-item, no shared state

        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {'i': np.asarray([i])}

    loader = BatchLoader(Ds(), batch_size=4, num_workers=4, shuffle=False,
                         drop_last=True)
    got = [b['i'].ravel().tolist() for b in loader]
    assert got == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]


def test_cosine_restart_boundary_matches_reference():
    """Reference get_position_from_periods uses ``iteration <= period``: the
    cumulative-boundary step reads the fully annealed lr; the restart fires
    one step later (lr_scheduler.py:36-55)."""
    from bsvd_tpu.models.lr_scheduler import cosine_annealing_restart_lr
    sched = cosine_annealing_restart_lr(1e-4, [100, 100],
                                        restart_weights=[1, 1], eta_min=0)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-12)
    assert float(sched(101)) == pytest.approx(
        0.5e-4 * (1 + np.cos(np.pi * 1 / 100)), rel=1e-6)
    assert float(sched(0)) == pytest.approx(1e-4, rel=1e-6)

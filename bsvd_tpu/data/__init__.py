"""Dataset registry auto-population + factory
(reference: BasicSR/basicsr/data/__init__.py:25-101)."""

import importlib
import pkgutil

from bsvd_tpu.utils.registry import DATASET_REGISTRY

for _m in pkgutil.iter_modules(__path__):
    if _m.name.endswith('_dataset') or _m.name.endswith('_loader'):
        importlib.import_module(f'bsvd_tpu.data.{_m.name}')


def build_dataset(dataset_opt):
    """Instantiate a registered dataset/loader from its options dict."""
    dataset_opt = dict(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt['type'])(dataset_opt)
    return dataset


class SimpleLoader:
    """Minimal sequential loader over an indexable dataset.

    Validation in this framework iterates datasets directly (the reference
    does the same — denoising_model.py:245-247); this wrapper only carries
    the dataset + phase metadata through the pipeline plumbing.
    """

    def __init__(self, dataset, phase='val'):
        self.dataset = dataset
        self.phase = phase

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        for i in range(len(self.dataset)):
            yield self.dataset[i]


def build_dataloader(dataset, dataset_opt, num_gpu=1, dist=False, sampler=None,
                     seed=None):
    """Phase-dispatching loader factory
    (reference: BasicSR/basicsr/data/__init__.py:40-101).

    - self-iterating loader datasets (the video training pipeline) pass
      through unchanged;
    - train phase map-style datasets get a threaded BatchLoader with an
      epoch-seeded EnlargedSampler;
    - val/test datasets get a SimpleLoader (validation indexes directly).
    """
    del dist
    phase = dataset_opt.get('phase', 'val')
    if hasattr(dataset, '__next__'):
        return dataset
    if phase == 'train':
        from bsvd_tpu.data.sampler import BatchLoader, EnlargedSampler
        if sampler is None:
            sampler = EnlargedSampler(dataset,
                                      ratio=dataset_opt.get('dataset_enlarge_ratio', 1))
        batch_size = dataset_opt.get('batch_size_per_gpu', 1) * max(num_gpu, 1)
        return BatchLoader(dataset, batch_size, sampler=sampler,
                           num_workers=dataset_opt.get('num_worker_per_gpu', 4),
                           seed=seed)
    return SimpleLoader(dataset, phase=phase)

"""Samplers + batch loader for map-style datasets.

EnlargedSampler (reference: BasicSR/basicsr/data/data_sampler.py:6-48):
epoch-seeded permutation, virtually enlarged so epochs don't restart
dataloaders. In single-controller SPMD there is no per-rank sharding — the
global batch is built on the host and sharded onto the mesh by the model —
so num_replicas/rank default to 1/0 but remain supported for symmetry.
"""

import queue
import threading

import numpy as np


class EnlargedSampler:

    def __init__(self, dataset, num_replicas=1, rank=0, ratio=1):
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = int(np.ceil(len(dataset) * ratio / num_replicas))
        self.total_size = self.num_samples * self.num_replicas

    def __iter__(self):
        rng = np.random.default_rng(self.epoch)
        indices = []
        dataset_size = len(self.dataset)
        while len(indices) < self.total_size:
            indices.extend(rng.permutation(self.total_size).tolist())
        indices = [i % dataset_size for i in indices[:self.total_size]]
        indices = indices[self.rank:self.total_size:self.num_replicas]
        return iter(indices[:self.num_samples])

    def __len__(self):
        return self.num_samples

    def set_epoch(self, epoch):
        self.epoch = epoch


class BatchLoader:
    """Threaded batching loader over a map-style dataset.

    Replaces torch DataLoader(+PrefetchGenerator / CPUPrefetcher, reference
    data/prefetch_dataloader.py): worker threads pull indices from the
    sampler, call dataset[idx], and batches are assembled into stacked numpy
    arrays; a bounded queue provides prefetch.
    """

    def __init__(self, dataset, batch_size, sampler=None, shuffle=False,
                 num_workers=4, drop_last=True, prefetch=4, seed=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed or 0) + self.epoch).shuffle(idx)
        return idx.tolist()

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor
        indices = self._indices()
        if self.drop_last:
            indices = indices[:len(indices) // self.batch_size * self.batch_size]
        out_q = queue.Queue(maxsize=self.prefetch)
        n_batches = len(indices) // self.batch_size if self.drop_last else \
            (len(indices) + self.batch_size - 1) // self.batch_size

        # Parallel __getitem__ is OPT-IN: datasets sharing one FileClient
        # socket (memcached) or one RNG across items are not thread-safe,
        # and interleaved RNG calls break manual_seed reproducibility — a
        # dataset that uses per-item seeding and reentrant IO declares
        # ``supports_parallel_read = True`` to enable the pool (the torch
        # num_workers analogue). Otherwise items decode serially on the
        # producer thread (still overlapped with device compute).
        parallel = (self.num_workers > 1
                    and getattr(self.dataset, 'supports_parallel_read', False))

        def fetch(pool, chunk):
            if pool is not None:
                return list(pool.map(self.dataset.__getitem__, chunk))
            return [self.dataset[i] for i in chunk]

        def producer(pool):
            # any dataset error is forwarded to the consumer (never skip the
            # terminator — a dead producer would hang the training loop)
            try:
                for b in range(n_batches):
                    chunk = indices[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                    samples = fetch(pool, chunk)
                    batch = {}
                    for key in samples[0]:
                        vals = [s[key] for s in samples]
                        if isinstance(vals[0], np.ndarray):
                            batch[key] = np.stack(vals)
                        else:
                            batch[key] = vals
                    out_q.put(batch)
                out_q.put(None)
            except BaseException as e:   # noqa: BLE001 — re-raised below
                out_q.put(e)

        pool = (ThreadPoolExecutor(max_workers=self.num_workers)
                if parallel else None)
        t = threading.Thread(target=producer, args=(pool,), daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
        self.epoch += 1
        if self.sampler is not None:
            self.sampler.set_epoch(self.epoch)

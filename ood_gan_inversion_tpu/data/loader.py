"""Host-side input pipeline: sharded sampler + threaded prefetch loader.

Replaces the reference's torch DataLoader worker processes, EnlargedSampler
and CUDAPrefetcher (BasicSR/basicsr/data/data_sampler.py:6-48,
prefetch_dataloader.py:63-125). Decode/augment runs in a thread pool that
stays ahead of the train step; batches are contiguous numpy arrays ready for
a single device_put with a 'data' sharding (device transfer overlaps compute
because JAX dispatch is async).
"""

import queue
import threading

import numpy as np


class EnlargedSampler:
    """Epoch-seeded permutation, enlarge ratio for iter-based training, and
    shard-strided subsampling (data_sampler.py:29-42)."""

    def __init__(self, dataset_len, num_shards=1, shard_index=0, ratio=1,
                 seed=0, shuffle=True):
        self.dataset_len = dataset_len
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.ratio = ratio
        self.seed = seed
        self.shuffle = shuffle
        self.epoch = 0
        total = int(np.ceil(dataset_len * ratio / num_shards)) * num_shards
        self.num_samples = total // num_shards
        self.total_size = total

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        if self.shuffle:
            g = np.random.default_rng(self.seed + self.epoch)
            indices = g.permutation(self.total_size)
        else:
            indices = np.arange(self.total_size)
        indices = indices % self.dataset_len
        indices = indices[self.shard_index:self.total_size:self.num_shards]
        return iter(indices.tolist())

    def __len__(self):
        return self.num_samples


def default_collate(items):
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, 0)
        else:
            out[key] = vals
    return out


class PrefetchLoader:
    """Iterates batches; `num_workers` threads decode items ahead of time."""

    def __init__(self, dataset, sampler, batch_size=1, num_workers=2,
                 drop_last=True, collate=default_collate, prefetch_batches=3):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate = collate
        self.prefetch_batches = prefetch_batches

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        idx_q: queue.Queue = queue.Queue()
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches *
                                         self.batch_size + self.num_workers)
        indices = list(self.sampler)
        if self.drop_last:
            indices = indices[:len(indices) - len(indices) % self.batch_size]
        for i, idx in enumerate(indices):
            idx_q.put((i, idx))
        stop = object()

        def worker():
            while True:
                try:
                    i, idx = idx_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    out_q.put((i, self.dataset[idx]))
                except Exception as e:  # surface errors in the main thread
                    out_q.put((i, e))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        buffered = {}
        want = 0
        batch = []
        received = 0
        total = len(indices)
        while received < total:
            i, item = out_q.get()
            buffered[i] = item
            received += 1
            while want in buffered:
                item = buffered.pop(want)
                want += 1
                if isinstance(item, Exception):
                    raise item
                batch.append(item)
                if len(batch) == self.batch_size:
                    yield self.collate(batch)
                    batch = []
        if batch and not self.drop_last:
            yield self.collate(batch)

"""Dataset factory + loaders (ref: basicsr/data/__init__.py:25-94).

The reference pairs torch DataLoader workers with an EnlargedSampler for
DDP sharding (data_sampler.py:8-50). TPU analog: the train loader is an
infinite epoch-seeded-permutation iterator, rank-strided across hosts
(same modulo-wrap semantics), with a background prefetch thread; val/test
loaders are simple sequential iterators (batch 1).
"""

from __future__ import annotations

import queue
import threading
from copy import deepcopy
from typing import Iterator

import numpy as np

from super_resolution_tpu.utils.registry import DATASET_REGISTRY

from super_resolution_tpu.data import paired_dataset  # noqa: F401 registry
from super_resolution_tpu.data import realesrgan_dataset  # noqa: F401 registry
from super_resolution_tpu.data import rawpack_dataset  # noqa: F401 registry
from super_resolution_tpu.data import onthefly_datasets  # noqa: F401 registry
from super_resolution_tpu.data import video_datasets  # noqa: F401 registry


def build_dataset(dataset_opt: dict):
    dataset_opt = deepcopy(dataset_opt)
    return DATASET_REGISTRY.get(dataset_opt["type"])(dataset_opt)


class EnlargedSampler:
    """Epoch-seeded permutation over len*ratio with modulo wrap and
    rank-strided slicing — same semantics as the reference sampler
    (ref: data_sampler.py:31-44), minus torch."""

    def __init__(self, num_samples: int, world_size: int, rank: int,
                 ratio: float = 1):
        self.num_samples = num_samples
        self.world_size = world_size
        self.rank = rank
        self.total_size = int(np.ceil(num_samples * ratio / world_size)) * world_size
        self.per_rank = self.total_size // world_size
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def indices(self) -> np.ndarray:
        g = np.random.default_rng(self.epoch)
        idx = g.permutation(self.total_size) % self.num_samples
        return idx[self.rank:self.total_size:self.world_size]


class PrefetchIterator:
    """Background-thread prefetch (analog of PrefetchGenerator,
    ref: prefetch_dataloader.py:7-36)."""

    def __init__(self, gen: Iterator, num_prefetch: int = 2):
        self._queue: queue.Queue = queue.Queue(num_prefetch)
        self._gen = gen
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._gen:
                self._queue.put(item)
        finally:
            self._queue.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is None:
            raise StopIteration
        return item


class TrainLoader:
    """Infinite batched loader with EnlargedSampler semantics."""

    def __init__(self, dataset, batch_size: int, world_size: int = 1,
                 rank: int = 0, ratio: float = 1, seed: int = 0,
                 prefetch: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = EnlargedSampler(len(dataset), world_size, rank, ratio)
        self.seed = seed
        self.prefetch = prefetch

    def __len__(self):
        return self.sampler.per_rank // self.batch_size

    def epoch_iter(self, epoch: int):
        self.sampler.set_epoch(self.seed + epoch)
        if hasattr(self.dataset, "seed"):
            self.dataset.seed(self.seed + epoch * 7919 + self.sampler.rank)

        def gen():
            idx = self.sampler.indices()
            n_batches = len(idx) // self.batch_size
            for b in range(n_batches):
                items = [self.dataset[int(i)]
                         for i in idx[b * self.batch_size:(b + 1) * self.batch_size]]
                yield _collate(items)

        it = gen()
        return PrefetchIterator(it) if self.prefetch else it

    def __iter__(self):
        epoch = 0
        while True:
            yield from self.epoch_iter(epoch)
            epoch += 1


class EvalLoader:
    """Sequential batch-1 loader (val/test, ref: data/__init__.py:84-94)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        for i in range(len(self.dataset)):
            item = self.dataset[i]
            yield _collate([item])


def _collate(items: list) -> dict:
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def build_dataloader(dataset, dataset_opt: dict, num_gpu: int = 1,
                     dist: bool = False, sampler=None, seed: int = 0,
                     mesh=None):
    """Reference-compatible surface (ref: data/__init__.py:40-94).

    batch_size_per_gpu means per-DEVICE, matching the reference's per-GPU
    semantics (global batch = batch_size_per_gpu x num_gpu). The train step
    shards the loaded batch over the mesh's 'data' axis, so each process
    must load batch_size_per_gpu x (local data-axis devices) samples.
    """
    phase = dataset_opt["phase"]
    if phase == "train":
        import jax

        per_device = dataset_opt["batch_size_per_gpu"]
        local_devices = 1
        if mesh is not None:
            data_size = int(mesh.shape.get("data", 1))
            procs = jax.process_count()
            if data_size % procs:
                raise ValueError(
                    f"mesh 'data' axis ({data_size} devices) must divide "
                    f"evenly across {procs} processes")
            local_devices = data_size // procs
        return TrainLoader(
            dataset,
            batch_size=per_device * local_devices,
            world_size=jax.process_count(), rank=jax.process_index(),
            ratio=dataset_opt.get("dataset_enlarge_ratio", 1), seed=seed)
    return EvalLoader(dataset)

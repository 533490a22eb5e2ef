"""Prefetching data loader (torch-free).

Replaces the reference's torch DataLoader + DistributedSampler stack
(seg3d/datasets/__init__.py, samplers/distributed_sampler.py): a
multiprocessing pool voxelizes/pads samples ahead of the device, per-host
sharding comes from jax.process_index (parallel.mesh.process_shard_indices),
and the epoch+seed shuffle is deterministic. Also fixes the reference's
latent `rank` NameError when dist=False with a seed (datasets/__init__.py:26).
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Iterator

import numpy as np

from .batch import collate_padded
from ..parallel.mesh import process_shard_indices

_worker_dataset = None


def _init_worker(dataset_factory, seed, worker_offset):
    global _worker_dataset
    ident = mp.current_process()._identity
    wid = ident[0] if ident else 0
    if seed is not None:
        np.random.seed(seed + worker_offset + wid)
    _worker_dataset = dataset_factory()


def _load_one(index):
    return _worker_dataset.load_padded(index)[0]


class DataLoader:
    """Iterates padded, collated [B, cap, ...] numpy batches.

    dataset_factory: zero-arg callable building the dataset (pickled to
    workers). num_workers=0 runs inline (useful for tests).
    """

    def __init__(self, dataset_factory, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int | None = None,
                 drop_last: bool = True):
        self.dataset_factory = dataset_factory
        self.dataset = dataset_factory()
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self._pool = None
        if num_workers > 0:
            # SPAWN, not fork: the parent holds a live jax runtime (TPU client
            # threads + locks) by the time loaders are built, and forked
            # children inherit those locks mid-flight — observed as workers
            # deadlocking with 0 CPU. Spawned workers boot fresh interpreters
            # and only ever run numpy code; dataset_factory must be picklable
            # (functools.partial, not a lambda).
            ctx = mp.get_context('spawn')
            self._pool = ctx.Pool(num_workers, initializer=_init_worker,
                                  initargs=(dataset_factory, seed, 1000))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        import jax
        n = len(self.dataset)
        world = jax.process_count()
        per_host = self.batch_size
        global_bs = per_host * world
        total = n // global_bs if self.drop_last else -(-n // global_bs)
        return max(total, 1)

    def __iter__(self) -> Iterator[dict]:
        idx, valid = process_shard_indices(
            len(self.dataset), (self.seed if self.shuffle else None),
            self.epoch, self.batch_size * _world(), return_valid=True)
        n_batches = len(self)
        idx = idx[:n_batches * self.batch_size]
        valid = valid[:n_batches * self.batch_size]
        batches = idx.reshape(-1, self.batch_size)
        # With drop_last=False the epoch is padded by recycling samples;
        # sample_valid marks the recycled slots so eval can exclude them from
        # the IoU histogram (they'd otherwise be double counted).
        valids = valid.reshape(-1, self.batch_size)

        def _finish(batch, bvalid):
            if not self.drop_last:
                batch['sample_valid'] = np.asarray(bvalid, bool)
            return batch

        if self._pool is None:
            for b, v in zip(batches, valids):
                yield _finish(collate_padded(
                    [self.dataset.load_padded(i)[0] for i in b]), v)
        else:
            # pipeline: keep 2 batches in flight
            pending = []
            for b, v in zip(batches, valids):
                pending.append((self._pool.map_async(_load_one, list(b)), v))
                if len(pending) >= 3:
                    job, pv = pending.pop(0)
                    yield _finish(collate_padded(job.get()), pv)
            while pending:
                job, pv = pending.pop(0)
                yield _finish(collate_padded(job.get()), pv)

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None


def _world() -> int:
    import jax
    return jax.process_count()


def build_dataloader(dataset_factory, batch_size, num_workers=4, seed=None,
                     training=True):
    """Analog of build_dataloader (seg3d/datasets/__init__.py:13-36)."""
    loader = DataLoader(dataset_factory, batch_size, shuffle=training,
                        num_workers=num_workers, seed=seed, drop_last=training)
    return loader.dataset, loader

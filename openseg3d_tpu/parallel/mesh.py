"""Device mesh + sharding for SPMD data-parallel training.

Replaces the reference's DDP/NCCL machinery (seg3d/utils/distributed.py,
tools/dist_train.sh, DistributedSampler — SURVEY.md §2.3): one jitted SPMD
program over a 1-D 'data' mesh. Batches shard on their leading axis, params
and optimizer state replicate; XLA inserts the gradient psum (DDP all-reduce
analog), cross-replica BN statistics (SyncBN analog), and the eval-histogram
reduction automatically.

Because every per-sample structure build (rulebooks, window partitions) is
vmapped over the batch axis, the forward contains NO cross-device collectives
at all — only the gradient reduction at the end of backward rides ICI.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> tuple[int, int]:
    """jax.distributed bring-up for multi-host (analog of init_dist,
    seg3d/utils/distributed.py:8-19). No-op for single-process runs."""
    if int(os.environ.get('JAX_PROCESS_COUNT', '1')) > 1 and jax.process_count() == 1:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ('data',))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded on the sample axis."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def make_sharded_train_step(train_step_fn, mesh: Mesh, donate: bool = True):
    """jit the step with explicit shardings: state/rng replicated, batch
    sharded along the leading (sample) axis."""
    repl = replicated(mesh)
    data = batch_sharding(mesh)

    def spec_like(tree, sharding):
        return jax.tree_util.tree_map(lambda _: sharding, tree,
                                      is_leaf=lambda x: x is None)

    def wrapper(state, batch, rng):
        return train_step_fn(state, batch, rng)

    return jax.jit(
        wrapper,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_eval_step(eval_step_fn, mesh: Mesh):
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(lambda state, batch: eval_step_fn(state, batch),
                   in_shardings=(repl, data), out_shardings=repl)


def process_shard_indices(n: int, shuffle_seed: int | None, epoch: int,
                          batch_size_global: int) -> np.ndarray:
    """Per-host sample indices: epoch+seed deterministic shuffle, pad to a
    multiple of the global batch, strided slice by process index — the
    DistributedSampler analog (datasets/samplers/distributed_sampler.py:35-59)
    keyed on jax.process_index()."""
    idx = np.arange(n)
    if shuffle_seed is not None:
        rng = np.random.RandomState(shuffle_seed + epoch)
        rng.shuffle(idx)
    world = jax.process_count()
    rank = jax.process_index()
    per_host_batch = batch_size_global // world
    total = int(np.ceil(n / batch_size_global)) * batch_size_global
    idx = np.concatenate([idx, idx[:total - n]])
    return idx.reshape(-1, world, per_host_batch)[:, rank, :].reshape(-1)

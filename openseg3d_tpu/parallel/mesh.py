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


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """jax.distributed bring-up for multi-host (analog of init_dist,
    seg3d/utils/distributed.py:8-19). No-op for single-process runs.

    MUST be the first jax call in the process: `jax.distributed.initialize`
    has to run before any operation that initializes the local backend
    (including jax.devices()/jax.process_count()), so this function decides
    whether to initialize purely from its arguments and the env vars JAX
    itself reads (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID — exported by tools/dist_train.sh), never from backend
    state."""
    env_np = os.environ.get('JAX_NUM_PROCESSES')
    n = num_processes if num_processes is not None else int(env_np or 1)
    want_dist = (n > 1 or coordinator_address is not None
                 or bool(os.environ.get('JAX_COORDINATOR_ADDRESS')))
    if want_dist:
        try:
            from jax._src import distributed as _dist
            already = _dist.global_state.client is not None
        except Exception:
            already = False
        if not already:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
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


def make_sharded_eval_step(eval_step_fn, mesh: Mesh, with_loss: bool = True):
    """hist/loss replicate (psum), but point_out STAYS sharded on the sample
    axis: the only consumer that wants per-point logits (tools/eval TTA) runs
    its own jit, while the train-loop evaluate() reads hist+loss only — a
    replicated point_out would all-gather [B, P, C] to every device each eval
    step for nothing (also a large rendezvous cost on the CPU-mesh multichip
    dryrun). with_loss must match the make_eval_step that built the fn."""
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    out_sh = {'hist': repl, 'point_out': data}
    if with_loss:
        out_sh['loss'] = repl
    return jax.jit(lambda state, batch: eval_step_fn(state, batch),
                   in_shardings=(repl, data), out_shardings=out_sh)


def process_shard_indices(n: int, shuffle_seed: int | None, epoch: int,
                          batch_size_global: int, return_valid: bool = False):
    """Per-host sample indices: epoch+seed deterministic shuffle, pad to a
    multiple of the global batch (cycling from the front — tiling handles
    datasets smaller than one global batch), strided slice by process index —
    the DistributedSampler analog
    (datasets/samplers/distributed_sampler.py:35-59) keyed on
    jax.process_index(). With return_valid, also returns a bool array marking
    which of this host's slots are real samples (False = pad duplicate), so
    eval can exclude recycled frames from the IoU histogram."""
    idx = np.arange(n)
    if shuffle_seed is not None:
        rng = np.random.RandomState(shuffle_seed + epoch)
        rng.shuffle(idx)
    world = jax.process_count()
    rank = jax.process_index()
    per_host_batch = batch_size_global // world
    total = int(np.ceil(n / batch_size_global)) * batch_size_global
    valid = np.concatenate([np.ones(n, bool), np.zeros(total - n, bool)])
    idx = np.resize(idx, total)
    sel = np.arange(total).reshape(-1, world, per_host_batch)[:, rank, :].reshape(-1)
    if return_valid:
        return idx[sel], valid[sel]
    return idx[sel]

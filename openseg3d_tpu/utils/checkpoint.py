"""Checkpoint save/resume via orbax.

Parity: save_checkpoint / auto-resume (tools/train.py:53-68, 262-273) — epoch
granular {params, batch_stats, opt_state, step, epoch} written to epoch_N/,
restored wholesale by --auto_resume (newest complete epoch); separate partial
(pretrained) load with non-strict matching (:251-255).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(save_dir: str, epoch: int, state, logger=None) -> None:
    if jax.process_index() != 0:
        return
    if logger:
        logger.info('Save checkpoint at epoch %d', epoch)
    payload = {
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
        'step': state.step,
        'epoch': np.array([epoch], np.int32),
    }
    # One batched D2H first: orbax otherwise pulls leaves one-by-one, which
    # over a high-RTT device tunnel dominates the save (26-30s observed for
    # 231MB saved twice; epoch_N-only from host arrays is a few seconds).
    payload = jax.device_get(payload)
    ckpt = _checkpointer()
    path = os.path.abspath(os.path.join(save_dir, f'epoch_{epoch}'))
    ckpt.save(path, payload, force=True)
    ckpt.wait_until_finished()


def _is_complete(path: str) -> bool:
    return os.path.isfile(os.path.join(path, 'manifest.ocdbt'))


def latest_checkpoint(save_dir: str) -> str | None:
    """Newest COMPLETE checkpoint: highest epoch_N with a manifest, falling
    back to a legacy latest/ dir. Robust to saves interrupted mid-write
    (orbax leaves *.orbax-checkpoint-tmp orphans which must not resume)."""
    best, best_e = None, -1
    if os.path.isdir(save_dir):
        for name in os.listdir(save_dir):
            if not name.startswith('epoch_'):
                continue
            try:
                e = int(name.split('_', 1)[1])
            except ValueError:
                continue
            p = os.path.abspath(os.path.join(save_dir, name))
            if e > best_e and _is_complete(p):
                best, best_e = p, e
    if best is None:
        p = os.path.abspath(os.path.join(save_dir, 'latest'))
        if os.path.isdir(p) and _is_complete(p):
            best = p
    return best


def restore_checkpoint(path: str, state):
    """Restore a full training state; returns (state, epoch)."""
    template = {
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
        'step': state.step,
        'epoch': np.array([0], np.int32),
    }
    restored = _checkpointer().restore(os.path.abspath(path), template)
    new_state = state.replace(params=restored['params'],
                              batch_stats=restored['batch_stats'],
                              opt_state=restored['opt_state'],
                              step=restored['step'])
    return new_state, int(np.asarray(restored['epoch'])[0])


def load_pretrained(path: str, state, logger=None):
    """Non-strict partial parameter load (tools/train.py:251-255): copies
    every leaf whose path+shape matches; leaves the rest initialized."""
    flat_cur = ocp.utils.serialize_tree(state.params)  # noqa: F841 (template)
    restored = _checkpointer().restore(os.path.abspath(path))
    src_params = restored.get('params', restored)

    cur = jax.tree_util.tree_flatten_with_path(state.params)[0]
    src_flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(src_params)[0]}
    updates, skipped = {}, []
    for k, v in cur:
        ks = jax.tree_util.keystr(k)
        s = src_flat.get(ks)
        if s is not None and np.shape(s) == np.shape(v):
            updates[ks] = s
        else:
            skipped.append(ks)
    if logger and skipped:
        logger.info('pretrained load skipped %d/%d leaves', len(skipped), len(cur))

    def pick(path, leaf):
        return updates.get(jax.tree_util.keystr(path), leaf)

    new_params = jax.tree_util.tree_map_with_path(pick, state.params)
    return state.replace(params=new_params)

"""Fixed-capacity padded batches.

The reference collates ragged, batch-concatenated tensors
(WaymoDataset.collate_batch, seg3d/datasets/waymo_dataset.py:338-376). On TPU
every shape must be static, so each sample is padded to configured capacities
(RUNTIME.MAX_POINTS_PER_SAMPLE / MAX_VOXELS_PER_SAMPLE) and batches are stacked
[B, cap, ...] — the leading axis is the data-parallel sharding axis.

Padding conventions (used everywhere downstream):
  * padded point rows:  mask False, label = ignore_index, voxel id = -1
  * padded voxel rows:  mask False, coords = -1, label = ignore_index
  * point_voxel_ids are **sample-local** voxel slots; flatten_batch() rebases
    them to global flat slots (b * V + slot) for segment ops.
"""

from __future__ import annotations

from typing import Any

import numpy as np

PAD_LABEL = 255


def pad_sample(sample: dict, max_points: int, max_voxels: int,
               ignore_index: int = PAD_LABEL, logger=None) -> dict:
    """Pad one dataset sample (output of WaymoDataset.prepare_data) to fixed
    capacity. Overflow is truncated (and counted) — the capacity knobs must be
    sized so this is rare; mirrors the reference's drop-overflow stance for
    window batching (point_transformer_layer.py:86)."""
    pts = np.asarray(sample['points'], dtype=np.float32)
    n = pts.shape[0]
    if n > max_points:
        if logger is not None:
            logger.warning('truncating %d points to capacity %d', n, max_points)
        keep = slice(0, max_points)
        pts = pts[keep]
        n = max_points
    d = pts.shape[1]

    vids = np.asarray(sample['point_voxel_ids'], dtype=np.int32)[:n]
    coords = np.asarray(sample['voxel_coords'], dtype=np.int32)
    m = coords.shape[0]
    if m > max_voxels:
        if logger is not None:
            logger.warning('truncating %d voxels to capacity %d', m, max_voxels)
        coords = coords[:max_voxels]
        # points referencing dropped voxels become unassigned
        vids = np.where(vids >= max_voxels, -1, vids)
        m = max_voxels

    out: dict[str, Any] = {}
    points = np.zeros((max_points, d), dtype=np.float32)
    points[:n] = pts
    out['points'] = points

    point_mask = np.zeros(max_points, dtype=bool)
    point_mask[:n] = True
    out['point_mask'] = point_mask

    pvi = -np.ones(max_points, dtype=np.int32)
    pvi[:n] = vids
    out['point_voxel_ids'] = pvi

    vc = -np.ones((max_voxels, 3), dtype=np.int32)
    vc[:m] = coords
    out['voxel_coords'] = vc
    voxel_mask = np.zeros(max_voxels, dtype=bool)
    voxel_mask[:m] = True
    out['voxel_mask'] = voxel_mask

    # current-frame rows: labels / image features / range-image indices are
    # aligned with the CURRENT-frame point order (multi-sweep,
    # waymo_dataset.py:204-211), so they scatter onto cur rows, not [:n].
    if 'cur_point_indices' in sample:
        cur_all = np.asarray(sample['cur_point_indices'])
        keep = cur_all < max_points              # truncation-safe selection
        rows = cur_all[keep]
        cpm = np.zeros(max_points, dtype=bool)
        cpm[rows] = True
        out['cur_point_mask'] = cpm
    else:
        out['cur_point_mask'] = point_mask.copy()
        rows = np.arange(n)
        keep = slice(0, n)

    if 'point_labels' in sample:
        pl = np.full(max_points, ignore_index, dtype=np.int32)
        pl[rows] = np.asarray(sample['point_labels'], dtype=np.int32)[keep]
        out['point_labels'] = pl
    if 'voxel_labels' in sample:
        vl = np.full(max_voxels, ignore_index, dtype=np.int32)
        vl[:m] = np.asarray(sample['voxel_labels'], dtype=np.int32)[:m]
        out['voxel_labels'] = vl
    if 'point_image_features' in sample:
        f = np.asarray(sample['point_image_features'], dtype=np.float32)
        pif = np.zeros((max_points, f.shape[1]), dtype=np.float32)
        pif[rows] = f[keep]
        out['point_image_features'] = pif
    if 'points_ri' in sample:
        ri = -np.ones((max_points, 3), dtype=np.int32)
        ri[rows] = np.asarray(sample['points_ri'], dtype=np.int32)[keep]
        out['points_ri'] = ri

    out['num_points'] = np.int32(n)
    out['num_voxels'] = np.int32(m)
    return out


def collate_padded(samples: list[dict]) -> dict:
    """Stack padded samples into [B, cap, ...] arrays; analog of
    WaymoDataset.collate_batch but with static shapes."""
    keys = samples[0].keys()
    batch = {k: np.stack([s[k] for s in samples], axis=0) for k in keys}
    batch['batch_size'] = len(samples)
    return batch


def flatten_batch(batch: dict) -> dict:
    """[B, cap, ...] -> flat per-batch views used inside the model:
    points [B*P, D], batch indices, and point_voxel_ids rebased to global flat
    voxel slots (b * V + slot). Works on jnp or np arrays."""
    import jax.numpy as jnp

    B, P = batch['points'].shape[:2]
    V = batch['voxel_coords'].shape[1]
    flat = {}
    flat['points'] = batch['points'].reshape(B * P, -1)
    flat['point_mask'] = batch['point_mask'].reshape(B * P)
    flat['cur_point_mask'] = batch['cur_point_mask'].reshape(B * P)
    pb = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
    flat['point_batch_idx'] = jnp.where(flat['point_mask'], pb, -1)

    vids = batch['point_voxel_ids'].reshape(B * P)
    offs = (pb * V).astype(jnp.int32)
    flat['point_voxel_ids'] = jnp.where(vids >= 0, vids + offs, -1)

    flat['voxel_coords'] = batch['voxel_coords'].reshape(B * V, 3)
    flat['voxel_mask'] = batch['voxel_mask'].reshape(B * V)
    vb = jnp.repeat(jnp.arange(B, dtype=jnp.int32), V)
    flat['voxel_batch_idx'] = jnp.where(flat['voxel_mask'], vb, -1)

    for k in ('point_labels', 'voxel_labels'):
        if k in batch:
            flat[k] = batch[k].reshape(-1)
    if 'point_image_features' in batch:
        flat['point_image_features'] = batch['point_image_features'].reshape(B * P, -1)
    if 'points_ri' in batch:
        flat['points_ri'] = batch['points_ri'].reshape(B * P, 3)
    flat['batch_size'] = B
    flat['voxel_capacity'] = V
    flat['point_capacity'] = P
    return flat

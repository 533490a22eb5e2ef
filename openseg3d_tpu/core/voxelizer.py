"""Dynamic voxelization (host side).

Rebuild of the reference's numba voxelizer
(seg3d/core/voxel/voxel_generator.py:55-153) as vectorized numpy with identical
semantics: every in-range point gets a voxel id, voxels are dynamic (no
fixed capacity per voxel), coords come back in **zyx** order and in first-seen
point order. Out-of-range points get id -1.

A C++ implementation (openseg3d_tpu/native) can be swapped in transparently for
the hot training input path; this numpy version is the reference oracle and the
fallback.

Also hosts the vectorized majority-vote voxel labeler, replacing the
reference's pure-Python dict loop (seg3d/datasets/waymo_dataset.py:213-246) —
a known input-pipeline bottleneck (SURVEY.md §3.1).
"""

from __future__ import annotations

import numpy as np


class VoxelGenerator:
    """Same constructor contract as the reference VoxelGenerator
    (seg3d/core/voxel/voxel_generator.py:11-26)."""

    def __init__(self, voxel_size, point_cloud_range):
        point_cloud_range = np.array(point_cloud_range, dtype=np.float32)
        voxel_size = np.array(voxel_size, dtype=np.float32)
        g = (point_cloud_range[3:] - point_cloud_range[:3]) / voxel_size
        self._grid_size = np.round(g).astype(np.int64)
        self._voxel_size = voxel_size
        self._point_cloud_range = point_cloud_range

    @property
    def voxel_size(self):
        return self._voxel_size

    @property
    def point_cloud_range(self):
        return self._point_cloud_range

    @property
    def grid_size(self):
        return self._grid_size

    def generate(self, points: np.ndarray):
        """points [N, >=3] (x,y,z,...) -> (voxel_coords [M,3] int32 zyx,
        point_voxel_ids [N] int32, -1 = out of range).

        Uses the C++ extension (openseg3d_tpu/native) when buildable — the
        production input-pipeline path — otherwise this module's vectorized
        numpy implementation (also the test oracle)."""
        try:
            from ..native import available, native_points_to_voxel
            if available():
                return native_points_to_voxel(points, self._voxel_size,
                                              self._point_cloud_range)
        except Exception:
            pass
        return points_to_voxel(points, self._voxel_size, self._point_cloud_range)

    def __repr__(self):
        return (f'{self.__class__.__name__}(voxel_size={self._voxel_size.tolist()}, '
                f'point_cloud_range={self._point_cloud_range.tolist()}, '
                f'grid_size={self._grid_size.tolist()})')


def points_to_voxel(points: np.ndarray, voxel_size, coors_range, preserve_order: bool = False):
    """Vectorized dynamic voxelization.

    Matches _points_to_voxel_reverse_kernel (voxel_generator.py:98-153):
    per-axis floor binning, strict [0, grid) bounds, zyx coords. Voxel ids are
    in ascending linearized-key order by default (the device pipeline's planar
    submanifold conv relies on key-sorted slot order; the reference's
    first-seen order — preserve_order=True — is an artifact of its canvas fill
    and semantically just a relabeling, SURVEY.md §7.3)."""
    voxel_size = np.asarray(voxel_size, dtype=points.dtype)
    coors_range = np.asarray(coors_range, dtype=points.dtype)
    gs = np.round((coors_range[3:] - coors_range[:3]) / voxel_size).astype(np.int64)

    xyz = points[:, :3]
    c = np.floor((xyz - coors_range[:3]) / voxel_size).astype(np.int64)
    valid = np.all((c >= 0) & (c < gs), axis=1)

    # linear key over (z, y, x): z-major like the reference's reversed canvas
    key = (c[:, 2] * gs[1] + c[:, 1]) * gs[0] + c[:, 0]
    key = np.where(valid, key, -1)

    vkey = key[valid]
    uniq, first_idx, inverse = np.unique(vkey, return_index=True, return_inverse=True)

    if preserve_order:
        # np.unique returns sorted keys; remap to first-seen order for exact
        # parity with the reference's single-pass canvas fill.
        order = np.argsort(first_idx, kind='stable')  # voxel ids in first-seen order
        rank = np.empty_like(order)
        rank[order] = np.arange(order.size)
        ids_for_valid = rank[inverse]
        uniq_ordered = uniq[order]
    else:
        ids_for_valid = inverse
        uniq_ordered = uniq

    point_voxel_ids = -np.ones(points.shape[0], dtype=np.int32)
    point_voxel_ids[valid] = ids_for_valid.astype(np.int32)

    z = uniq_ordered // (gs[1] * gs[0])
    rem = uniq_ordered % (gs[1] * gs[0])
    y = rem // gs[0]
    x = rem % gs[0]
    coors = np.stack([z, y, x], axis=1).astype(np.int32)
    return coors, point_voxel_ids


def majority_voxel_labels(point_voxel_ids: np.ndarray, point_labels: np.ndarray,
                          num_voxels: int, ignore_index: int = 255) -> np.ndarray:
    """Vectorized per-voxel majority label vote.

    Semantics of WaymoDataset.prepare_voxel_labels (waymo_dataset.py:213-246):
    all point labels participate (including ignore_index), ties resolve to the
    smallest label value (np.argmax-over-counter behavior), voxels with no
    points keep ignore_index.
    """
    vids = np.asarray(point_voxel_ids)
    labels = np.asarray(point_labels).astype(np.int64)
    m = vids >= 0
    vids = vids[m].astype(np.int64)
    labels = labels[m]

    out = np.full(num_voxels, ignore_index, dtype=np.int32)
    if vids.size == 0:
        return out

    # sort by (voxel, label); count run lengths; per voxel pick the label of the
    # longest run (ties -> smallest label because of the secondary sort key).
    order = np.lexsort((labels, vids))
    sv, sl = vids[order], labels[order]
    pair = sv * 256 + sl
    run_start = np.empty(pair.size, dtype=bool)
    run_start[0] = True
    run_start[1:] = pair[1:] != pair[:-1]
    starts = np.flatnonzero(run_start)
    counts = np.diff(np.append(starts, pair.size))
    run_voxel = sv[starts]
    run_label = sl[starts]

    # stable argmax per voxel: order runs by (voxel, -count, label)
    run_order = np.lexsort((run_label, -counts, run_voxel))
    rv = run_voxel[run_order]
    first_of_voxel = np.empty(rv.size, dtype=bool)
    first_of_voxel[0] = True
    first_of_voxel[1:] = rv[1:] != rv[:-1]
    win_voxel = rv[first_of_voxel]
    win_label = run_label[run_order][first_of_voxel]
    out[win_voxel] = win_label.astype(np.int32)
    return out

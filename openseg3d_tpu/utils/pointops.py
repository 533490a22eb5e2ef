"""Point-cloud coordinate utilities (parity: seg3d/utils/pointops_utils.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cart2polar(points):
    """Cartesian xyz -> (rho, phi, z); numpy, host-side (pointops_utils.py:8-11)."""
    rho = np.sqrt(points[:, 0] ** 2 + points[:, 1] ** 2)
    phi = np.arctan2(points[:, 1], points[:, 0])
    return np.stack((rho, phi, points[:, 2]), axis=1)


def get_voxel_centers(voxel_coords, downsample_scale, voxel_size, point_cloud_range):
    """zyx int coords [..., 3] -> xyz float centers (pointops_utils.py:14-22).
    Invalid coords (-1 rows) produce garbage centers — mask downstream."""
    xyz = voxel_coords[..., ::-1].astype(jnp.float32)
    vs = jnp.asarray(voxel_size, dtype=jnp.float32) * downsample_scale
    origin = jnp.asarray(point_cloud_range[0:3], dtype=jnp.float32)
    return (xyz + 0.5) * vs + origin


def query_and_group(nsample: int, xyz, new_xyz, feat, idx=None,
                    p_valid=None, q_valid=None, use_xyz: bool = True):
    """KNN gather-and-group (pointops_utils.py:25-42): for each query point,
    gather its nsample nearest source points' features, with neighbor xyz
    re-centered on the query. Padded-shape analog: validity masks replace the
    reference's batch offset arrays; invalid neighbor slots (idx == -1) zero
    their contribution.

    xyz [P,3], new_xyz [Q,3] (or None = xyz), feat [P,C] ->
    grouped [Q, nsample, 3+C] (or [Q, nsample, C] without use_xyz).
    """
    if new_xyz is None:
        new_xyz = xyz
        q_valid = p_valid
    if idx is None:
        from ..ops.knn import knn_query
        pv = p_valid if p_valid is not None else jnp.ones(xyz.shape[0], bool)
        qv = q_valid if q_valid is not None else jnp.ones(new_xyz.shape[0], bool)
        # knn_query is batched on a leading axis; run it on a singleton batch
        idx, _ = knn_query(nsample, xyz[None], new_xyz[None], pv[None], qv[None])
        idx = idx[0]
    safe = jnp.maximum(idx, 0)
    ok = (idx >= 0)[..., None]
    grouped_feat = jnp.where(ok, feat[safe], 0)                 # [Q,k,C]
    if not use_xyz:
        return grouped_feat
    grouped_xyz = jnp.where(ok, xyz[safe] - new_xyz[:, None, :], 0)
    return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)


def interpolation(idx, dist, feat):
    """Inverse-distance-weighted KNN interpolation (pointops_utils.py:44-61).
    idx [Q,k] into feat [P,C], dist [Q,k] -> [Q,C]."""
    w = 1.0 / (dist + 1e-8)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    safe = jnp.maximum(idx, 0)
    g = feat[safe]                                    # [Q,k,C]
    g = jnp.where((idx >= 0)[..., None], g, 0)
    return jnp.sum(g * w[..., None], axis=1)

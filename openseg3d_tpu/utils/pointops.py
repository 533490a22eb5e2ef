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


def interpolation(idx, dist, feat):
    """Inverse-distance-weighted KNN interpolation (pointops_utils.py:44-61).
    idx [Q,k] into feat [P,C], dist [Q,k] -> [Q,C]."""
    w = 1.0 / (dist + 1e-8)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    safe = jnp.maximum(idx, 0)
    g = feat[safe]                                    # [Q,k,C]
    g = jnp.where((idx >= 0)[..., None], g, 0)
    return jnp.sum(g * w[..., None], axis=1)

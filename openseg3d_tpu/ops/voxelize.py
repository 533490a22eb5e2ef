"""Device-side dynamic voxelization.

The host voxelizer (core/voxelizer.py, C++/numpy) feeds the training input
pipeline; this is the SAME semantics as jitted device code — floor binning,
strict [0, grid) bounds, zyx coords in ascending linearized-key order, id -1
out of range — built from one key sort + segment scans (the sparse-conv
engine's structure-build pattern, ops/sparse_conv._downsample_single).

Why it exists: test-time augmentation re-voxelizes every variant. The
reference does that on CPU per variant (test_time_aug.py:26-35) and so did
rounds 1-4 here — measured 34.5 s/frame on a 1-core host, ~75% of it host
transform+voxelize+pad (NOTES r5). With voxelization on device, the 36
variants' transforms become traced inputs of ONE jitted forward and the host
touches each frame once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .sparse_conv import INT32_SENTINEL, delinearize


def _voxelize_single(points, pmask, *, voxel_size, pc_range, grid,
                     max_voxels: int):
    """points [P, >=3] (x,y,z,...), pmask [P] -> (voxel_coords [Vcap, 3] zyx,
    voxel_mask [Vcap], point_voxel_ids [P], num_voxels)."""
    p = points.shape[0]
    gx, gy, gz = grid
    vs = jnp.asarray(voxel_size, jnp.float32)
    lo = jnp.asarray(pc_range[:3], jnp.float32)
    c = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)   # (cx, cy, cz)
    ok = pmask & jnp.all((c >= 0) & (c < jnp.asarray(grid, jnp.int32)), axis=1)
    # z-major key, identical to core/voxelizer.points_to_voxel
    key = (c[:, 2] * gy + c[:, 1]) * gx + c[:, 0]
    keyv = jnp.where(ok, key, INT32_SENTINEL)

    iota = jnp.arange(p, dtype=jnp.int32)
    ks, payload = jax.lax.sort([keyv, iota], num_keys=1, is_stable=False)
    valid_s = ks != INT32_SENTINEL
    is_new = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]]) & valid_s
    rank = (jnp.cumsum(is_new) - 1).astype(jnp.int32)
    num_voxels = jnp.sum(is_new).astype(jnp.int32)

    in_cap = valid_s & (rank < max_voxels)
    write = jnp.where(is_new & in_cap, rank, max_voxels)
    out_keys = jnp.full(max_voxels, INT32_SENTINEL, jnp.int32) \
        .at[write].set(ks, mode='drop', unique_indices=True)
    voxel_coords = delinearize(out_keys, (gz, gy, gx))
    voxel_mask = out_keys != INT32_SENTINEL

    slot_s = jnp.where(in_cap, rank, -1)
    ids = jnp.zeros(p, jnp.int32).at[payload].set(slot_s, unique_indices=True)
    return voxel_coords, voxel_mask, ids, num_voxels


def device_voxelize(points, pmask, voxel_size, pc_range, max_voxels: int):
    """Batched: points [B, P, D], pmask [B, P]. Exact VoxelGenerator parity
    (tests/test_voxelizer.py::test_device_voxelize_matches_host)."""
    import numpy as np
    rng = np.asarray(pc_range, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    grid = tuple(int(g) for g in np.round((rng[3:] - rng[:3]) / vs))
    f = partial(_voxelize_single, voxel_size=tuple(map(float, vs)),
                pc_range=tuple(map(float, rng)), grid=grid,
                max_voxels=max_voxels)
    return jax.vmap(f)(points, pmask)

"""Furthest point sampling (FPS) + sectorized FPS.

Parity: the reference's sampling extension (seg3d/ops/sampling/src/
sampling_cuda.cu:19-134 block-parallel FPS; sampling.py:28-86
SectorizedFurthestSampling). Exported-but-unused by the current models
(SURVEY.md N3) — kept as a first-class library op.

FPS is inherently sequential in the number of samples; each iteration is a
fully-vectorized distance update + argmax (lax.fori_loop), which is the
TPU-appropriate shape for this latency-bound op.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_BIG = 1e10


def furthest_point_sample(points, valid, num_samples: int):
    """points [N, 3], valid [N] -> idx [num_samples] int32 (padded with the
    first pick if fewer valid points exist than requested)."""
    n = points.shape[0]
    start = jnp.argmax(valid)                      # first valid point

    def body(i, carry):
        dist, idx = carry
        last = points[idx[i - 1]]
        d = jnp.sum(jnp.square(points - last), axis=-1)
        d = jnp.where(valid, d, -_BIG)
        dist = jnp.minimum(dist, d)
        idx = idx.at[i].set(jnp.argmax(dist).astype(jnp.int32))
        return dist, idx

    dist0 = jnp.where(valid, _BIG, -_BIG)
    idx0 = jnp.zeros(num_samples, jnp.int32).at[0].set(start.astype(jnp.int32))
    _, idx = jax.lax.fori_loop(1, num_samples, body, (dist0, idx0))
    return idx


def batched_furthest_point_sample(points, valid, num_samples: int):
    """[B, N, 3], [B, N] -> [B, num_samples]."""
    return jax.vmap(lambda p, v: furthest_point_sample(p, v, num_samples))(points, valid)


def sectorized_fps(points, valid, num_samples: int, num_sectors: int,
                   sector_capacity: int | None = None):
    """Split the scene into azimuth sectors, FPS each sector for its share of
    samples (sampling.py:28-86). points [N, 3] -> idx [num_samples].

    Static-shape scheme: each sector gets a fixed-capacity padded slot set
    (overflow voxels are ignored by that sector's FPS, matching the capped
    design used throughout the framework)."""
    n = points.shape[0]
    if sector_capacity is None:
        sector_capacity = max(256, (2 * n) // num_sectors)
    per_sector = int(math.ceil(num_samples / num_sectors))

    az = jnp.arctan2(points[:, 1], points[:, 0])       # [-pi, pi)
    sector = jnp.clip(((az + jnp.pi) / (2 * jnp.pi) * num_sectors).astype(jnp.int32),
                      0, num_sectors - 1)
    sector = jnp.where(valid, sector, num_sectors)

    # rank within sector -> slot; overflow rows dropped
    from .scatter import inner_group_ranks
    rank = inner_group_ranks(sector, valid)
    ok = valid & (rank < sector_capacity)
    slot = jnp.where(ok, sector * sector_capacity + rank, num_sectors * sector_capacity)
    gather_idx = jnp.full(num_sectors * sector_capacity, -1, jnp.int32) \
        .at[slot].set(jnp.arange(n, dtype=jnp.int32), mode='drop',
                      unique_indices=True) \
        .reshape(num_sectors, sector_capacity)

    sec_pts = jnp.where((gather_idx >= 0)[..., None],
                        points[jnp.maximum(gather_idx, 0)], 0)
    sec_valid = gather_idx >= 0
    picks = jax.vmap(lambda p, v: furthest_point_sample(p, v, per_sector))(
        sec_pts, sec_valid)                             # [S, per_sector]
    chosen = jnp.take_along_axis(gather_idx, picks, axis=1).reshape(-1)
    return chosen[:num_samples]

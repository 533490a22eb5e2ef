"""Dense-block execution of submanifold sparse convolutions.

The TPU-native alternative to gather-GEMM (SURVEY.md §2.1 N5): LiDAR voxels
cluster spatially, so the scene is tiled into fixed-size blocks (default
8x8x8); occupied blocks get dense [bs+2]^3 buffers (halo 1), all of a stage's
submanifold convs run as REAL dense 3D convolutions on the MXU
(lax.conv_general_dilated over the block batch), and results are masked back
to occupied sites — mathematically identical to submanifold conv because
outputs are only read at input sites.

Why this wins: XLA's row gather moves ~1 row per 3 cycles, so 27 gathers per
conv dominate the gather-GEMM path. Here the per-row scatters/gathers happen
ONCE per stage; between convs only a block-level halo refresh runs (gathers of
whole block faces — large contiguous rows), and the convs themselves are pure
MXU work.

Block-id lookups use a DENSE canvas over the (coarse) block grid — at block
granularity the canvas is small (e.g. 180*180*8 = 260k cells for the Waymo
grid), which removes every sort from the conv path.

STATUS: retained experiment, not wired into any model. Correct and tested
(tests/test_block_dense.py) but on measurement the halo refresh + block
scatter overhead did not beat the planar sorted-x path at Waymo occupancy
(~84k voxels / 1440^2x64 grid -> ~30% block fill); kept because it wins if
occupancy densifies (multi-sweep configs) — decide per profile, see
NOTES_NEXT.md.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BlockLayout(NamedTuple):
    """Per-sample block decomposition of a voxel set. Pure-array pytree —
    static metadata (block_size) is passed to the functions, and nb_cap is
    halo_src.shape[1]."""
    block_id: jax.Array        # [B, V] owning block slot, -1 invalid
    cell: jax.Array            # [B, V] flat cell index inside the padded block
    halo_src: jax.Array        # [B, NB, 26] neighbor block slot per direction, -1
    num_blocks: jax.Array      # [B] true occupied-block count (pre-cap)

    @property
    def nb_cap(self) -> int:
        return self.halo_src.shape[1]


def _dirs26():
    return [(dz, dy, dx)
            for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dz, dy, dx) != (0, 0, 0)]


def _layout_single(coords, spatial_shape, block_size, nb_cap):
    gz, gy, gx = spatial_shape
    bz, by, bx = block_size
    nbz, nby, nbx = (math.ceil(gz / bz), math.ceil(gy / by), math.ceil(gx / bx))
    n_cells_grid = nbz * nby * nbx
    valid = coords[..., 0] >= 0

    bc = coords // jnp.asarray(block_size, jnp.int32)
    bkey = (bc[:, 0] * nby + bc[:, 1]) * nbx + bc[:, 2]
    bkey = jnp.where(valid, bkey, n_cells_grid)

    occ = jnp.zeros(n_cells_grid, bool).at[bkey].set(True, mode='drop')
    rank = jnp.cumsum(occ.astype(jnp.int32)) - 1          # dense block-id map
    num_blocks = jnp.sum(occ).astype(jnp.int32)
    bid_map = jnp.where(occ & (rank < nb_cap), rank, -1)  # [grid] -> slot

    block_id = jnp.where(valid, bid_map[jnp.minimum(bkey, n_cells_grid - 1)], -1)

    # in-block cell (+1 halo offset), flattened over (bz+2, by+2, bx+2)
    pz, py, px = bz + 2, by + 2, bx + 2
    ib = coords - bc * jnp.asarray(block_size, jnp.int32) + 1
    cell = (ib[:, 0] * py + ib[:, 1]) * px + ib[:, 2]
    cell = jnp.where(block_id >= 0, cell, -1)

    # neighbor table: for each occupied block slot, the slot of each of its 26
    # neighbors (built by scattering the dense map through block coords)
    slot_to_key = jnp.full(nb_cap, n_cells_grid, jnp.int32).at[
        jnp.where(block_id >= 0, block_id, nb_cap)].set(
            jnp.minimum(bkey, n_cells_grid - 1).astype(jnp.int32), mode='drop')
    kz = slot_to_key // (nby * nbx)
    krem = slot_to_key % (nby * nbx)
    ky, kx = krem // nbx, krem % nbx
    srcs = []
    for dz, dy, dx in _dirs26():
        z, y, x = kz + dz, ky + dy, kx + dx
        ok = (slot_to_key < n_cells_grid) & (z >= 0) & (z < nbz) & \
             (y >= 0) & (y < nby) & (x >= 0) & (x < nbx)
        nk = (z * nby + y) * nbx + x
        s = jnp.where(ok, bid_map[jnp.clip(nk, 0, n_cells_grid - 1)], -1)
        srcs.append(s)
    halo_src = jnp.stack(srcs, axis=1)                    # [NB, 26]
    return block_id, cell, halo_src, num_blocks


def build_block_layout(coords, spatial_shape, block_size=(8, 8, 8),
                       nb_cap: int = 4096) -> BlockLayout:
    f = partial(_layout_single, spatial_shape=spatial_shape,
                block_size=block_size, nb_cap=nb_cap)
    bid, cell, halo, nb = jax.vmap(f)(coords)
    return BlockLayout(block_id=bid, cell=cell, halo_src=halo, num_blocks=nb)


def scatter_to_blocks(features, layout: BlockLayout, block_size):
    """[B, V, C] -> dense [B, NB, bz+2, by+2, bx+2, C] (zeros elsewhere)."""
    b, v, c = features.shape
    bz, by, bx = block_size
    cells = (bz + 2) * (by + 2) * (bx + 2)
    flat = jnp.where(layout.block_id >= 0,
                     layout.block_id * cells + layout.cell,
                     layout.nb_cap * cells)               # OOB drop
    out = jnp.zeros((b, layout.nb_cap * cells, c), features.dtype)
    out = jax.vmap(lambda o, t, f: o.at[t].set(f, mode='drop',
                                               unique_indices=True))(out, flat, features)
    return out.reshape(b, layout.nb_cap, bz + 2, by + 2, bx + 2, c)


def gather_from_blocks(dense, layout: BlockLayout):
    """dense [B, NB, pz, py, px, C] -> [B, V, C] at the voxel sites."""
    b = dense.shape[0]
    c = dense.shape[-1]
    cells = dense.shape[2] * dense.shape[3] * dense.shape[4]
    flat_dense = dense.reshape(b, layout.nb_cap * cells, c)
    idx = jnp.where(layout.block_id >= 0,
                    layout.block_id * cells + layout.cell, 0)
    g = jnp.take_along_axis(flat_dense, idx[..., None], axis=1)
    return jnp.where((layout.block_id >= 0)[..., None], g, 0)


def refresh_halos(dense, layout: BlockLayout):
    """Copy interior faces into neighbors' halo frames (one block-level gather
    per direction; rows are whole block faces, so this is bandwidth-, not
    latency-, bound)."""
    b, nb, pz, py, px, c = dense.shape
    bz, by, bx = pz - 2, py - 2, px - 2

    def region(d, size):
        """(src slice in neighbor, dst halo slice in me) along one axis for
        my-halo direction d: the +1 halo face mirrors the +1 neighbor's FIRST
        interior layer; the -1 face mirrors the -1 neighbor's LAST layer."""
        if d == 1:
            return slice(1, 2), slice(size + 1, size + 2)
        if d == -1:
            return slice(size, size + 1), slice(0, 1)
        return slice(1, size + 1), slice(1, size + 1)

    out = dense
    for di, (dz, dy, dx) in enumerate(_dirs26()):
        src_slot = layout.halo_src[:, :, di]               # [B, NB]
        # my halo cells in direction d are the neighbor's interior cells on
        # the opposite face
        sz, dzr = region(dz, bz)
        sy, dyr = region(dy, by)
        sx, dxr = region(dx, bx)
        # NOTE: gather-the-whole-block-then-slice fuses in XLA (verified);
        # slicing before the gather materializes 26 strided copies and OOMs
        # HBM at Waymo scale — don't "optimize" this.
        nb_dense = jnp.take_along_axis(
            dense, jnp.maximum(src_slot, 0)[..., None, None, None, None], axis=1)
        patch = nb_dense[:, :, sz, sy, sx, :]
        patch = jnp.where((src_slot >= 0)[..., None, None, None, None], patch, 0)
        out = out.at[:, :, dzr, dyr, dxr, :].set(patch)
    return out


def dense_subm_conv(dense, weights, compute_dtype=None):
    """One 3^3 VALID conv over the halo'd blocks: [B, NB, pz, py, px, Cin] ->
    [B, NB, pz-2, py-2, px-2, Cout]. weights [27, Cin, Cout] in raster (dz, dy,
    dx) order, matching apply_sparse_conv."""
    b, nb, pz, py, px, cin = dense.shape
    cout = weights.shape[-1]
    x = dense.reshape(b * nb, pz, py, px, cin)
    w = weights.reshape(3, 3, 3, cin, cout)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding='VALID',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)
    return y.reshape(b, nb, pz - 2, py - 2, px - 2, cout)


def pad_interior(y):
    """[B, NB, bz, by, bx, C] -> [B, NB, bz+2, by+2, bx+2, C] with zero halos
    (ready for refresh_halos before the next conv)."""
    return jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))


def block_subm_conv(features, layout: BlockLayout, weights, block_size,
                    compute_dtype=None):
    """Convenience one-shot: scatter -> refresh halos -> conv -> gather. For
    stages with many convs, keep the dense layout across convs instead
    (scatter once, then refresh_halos + dense_subm_conv per conv, gather
    once)."""
    dense = scatter_to_blocks(features, layout, block_size)
    dense = refresh_halos(dense, layout)
    y = dense_subm_conv(dense, weights, compute_dtype)
    return gather_from_blocks(pad_interior(y), layout)

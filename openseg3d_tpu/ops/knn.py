"""Brute-force K-nearest-neighbor search.

TPU-native replacement for the heap-based CUDA kernel
(seg3d/ops/knn_query/src/knn_query_cuda.cu:23-112, SURVEY.md N2). Distances are
computed in query tiles via an expansion around a [T,3]x[3,P] matmul and the
top-k taken per tile — static shapes, no heaps. The reference delimits batch
segments with offset arrays; here batching is the explicit leading axis.

Used by: DeepFusion cross-attention (deep_fusion.py:31), aux-loss label
transfer (tools/train.py:103), and pointops query_and_group / interpolation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .scatter import inner_group_ranks

_BIG = 1e10


def _knn_single(queries, points, q_valid, p_valid, k: int, tile: int):
    """queries [Q,3], points [P,3] -> (dist [Q,k], idx [Q,k]); invalid points
    never selected; invalid queries return idx -1."""
    q = queries.shape[0]
    pad = (-q) % tile
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    p_sq = jnp.sum(points * points, axis=-1)
    p_sq = jnp.where(p_valid, p_sq, _BIG)
    pt = points.T  # [3, P]

    def one_tile(qt):
        d = (jnp.sum(qt * qt, axis=-1, keepdims=True)
             - 2.0 * jnp.dot(qt, pt, preferred_element_type=jnp.float32)
             + p_sq[None, :])
        if k == 1:
            # argmin reduce instead of top_k: top_k lowers to a full sort of
            # the P axis (profiled ~930ms/step on the aux label transfer at
            # 12k x 98k); a min-reduction is bandwidth-bound only
            idx = jnp.argmin(d, axis=-1, keepdims=True).astype(jnp.int32)
            return jnp.take_along_axis(d, idx, axis=-1), idx
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx.astype(jnp.int32)

    tiles = qp.reshape(-1, tile, 3)
    dist, idx = jax.lax.map(one_tile, tiles)
    dist = dist.reshape(-1, k)[:q]
    idx = idx.reshape(-1, k)[:q]
    idx = jnp.where(q_valid[:, None], idx, -1)
    dist = jnp.where(q_valid[:, None], dist, _BIG)
    return dist, idx


def knn_query(k: int, points, queries, p_valid, q_valid, tile: int = 256):
    """Batched KNN: points [B,P,3], queries [B,Q,3] -> (idx [B,Q,k] int32 into
    P dim (-1 for invalid queries), dist [B,Q,k]).

    Argument order mirrors the reference `knn_query(nsample, xyz, new_xyz, ...)`
    (seg3d/ops/knn_query/knn_query.py:7-21): neighbors are searched among
    `points` for each of `queries`.
    """
    f = partial(_knn_single, k=k, tile=tile)
    dist, idx = jax.vmap(f)(queries, points, q_valid, p_valid)
    return idx, dist


def _bucket_knn_single(points, p_valid, q_valid, pvid, voxel_coords,
                       spatial_shape, k: int, bucket_cap: int, tile: int,
                       kernel_size: int = 3):
    """Self-KNN restricted to the 27-voxel neighborhood of each query's voxel.

    TPU-native analog of the reference's heap KNN at DeepFusion scale
    (seg3d/ops/knn_query/src/knn_query_cuda.cu:23-112): instead of scanning all
    P points per query (O(P^2) — measured 52.5 s/step at production caps,
    NOTES r3 #9), candidates are the points of the query's own 0.1 m voxel and
    its 26 grid neighbors. Structure reuse: the 27-neighbor voxel table IS a
    3^3 submanifold rulebook, built with the sparse-conv engine's one-sort
    builder. Points per voxel average ~2, so ~54 candidates cover the k=16
    neighborhood in typical LiDAR density; sparse regions return fewer than k
    (idx -1), which DeepFusion's validity mask already handles.

    points [P,3], pvid [P] sample-local voxel slot (-1 unassigned),
    voxel_coords [V,3] zyx (key-sorted, -1 padding) -> (dist [P,k], idx [P,k]).
    """
    from .sparse_conv import _subm_rulebook_single

    p = points.shape[0]
    v = voxel_coords.shape[0]
    c = bucket_cap
    nk = kernel_size ** 3
    nb = _subm_rulebook_single(voxel_coords, spatial_shape, kernel_size,
                               assume_sorted=True).T        # [V, nk]

    cand_valid = p_valid & (pvid >= 0)
    ranks = inner_group_ranks(pvid, valid=cand_valid)
    # Invalid/overflow points are routed to the out-of-bounds index v*c and
    # DROPPED by the scatter, so every in-bounds index really is unique and
    # the unique_indices=True promise is contractual (ADVICE r4: piling them
    # into a real dump slot made duplicates at that slot UB-by-doc).
    slot = jnp.where(cand_valid & (ranks < c), pvid * c + ranks, v * c)
    table = jnp.full(v * c, -1, jnp.int32).at[slot].set(
        jnp.arange(p, dtype=jnp.int32), mode='drop',
        unique_indices=True).reshape(v, c)

    # Packed per-voxel candidate xyz rows [V+1, C*3] f32. The hot per-query
    # gather pulls 27 WIDE rows (C*3 floats) per point instead of 27*C narrow
    # 3-float rows — row gathers are row-COUNT-bound on TPU (measured: the
    # narrow form ran 577 ms/step at production caps, ~16 ns/row over 35M
    # rows; this form issues 4.4M rows). Empty slots and the absent-neighbor
    # row V carry far-away coords (_BIG), so their distances land in a ~1e20
    # tier that never wins top-k; winner POINT indices are recovered AFTER
    # top-k with a tiny [T, k] gather of the bucket table. (Indices must NOT
    # ride along bitcast into f32 lanes: small ints are denormal bit patterns
    # and TPU float paths flush them to zero — measured, not theoretical.)
    bxyz = points[jnp.maximum(table, 0)].reshape(v, c, 3)
    slot_ok = (table >= 0)[..., None]
    packed = jnp.where(slot_ok, bxyz, _BIG).reshape(v, c * 3)
    packed = jnp.concatenate(
        [packed, jnp.full((1, c * 3), _BIG, packed.dtype)], axis=0)
    table_pad = jnp.concatenate(
        [table, jnp.full((1, c), -1, jnp.int32)], axis=0)    # [V+1, C]

    pad = (-p) % tile
    qp = jnp.pad(points, ((0, pad), (0, 0)))
    vidp = jnp.pad(pvid, (0, pad), constant_values=-1)
    qvp = jnp.pad(q_valid, (0, pad))

    def one_tile(args):
        qxyz, qvid, qok = args
        t = qxyz.shape[0]
        cv = nb[jnp.maximum(qvid, 0)]                        # [T, nk]
        # Map absent neighbors (rulebook sentinel -1) and invalid queries to
        # the _BIG pad row V EXPLICITLY — do not rely on -1 wrapping to the
        # last row of packed/table_pad (ADVICE r4: a gather-mode change would
        # silently pull voxel 0's points otherwise).
        cv = jnp.where((cv >= 0) & (qvid >= 0)[:, None], cv, v)
        x = packed[cv].reshape(t, nk * c, 3)
        diff = qxyz[:, None, :] - x
        d = jnp.sum(diff * diff, axis=-1)                    # invalid ~ 1e20
        neg_d, pos = jax.lax.top_k(-d, k)
        dist = -neg_d
        vox = jnp.take_along_axis(cv, pos // c, axis=1)      # [T, k]
        idx = table_pad[vox, pos % c]
        ok = qok[:, None] & (dist < _BIG) & (idx >= 0)
        return jnp.where(ok, dist, _BIG), jnp.where(ok, idx, -1)

    tiles = (qp.reshape(-1, tile, 3), vidp.reshape(-1, tile),
             qvp.reshape(-1, tile))
    dist, idx = jax.lax.map(one_tile, tiles)
    return dist.reshape(-1, k)[:p], idx.reshape(-1, k)[:p]


def voxel_bucket_knn(k: int, points, p_valid, q_valid, point_voxel_ids,
                     voxel_coords, spatial_shape, bucket_cap: int = 8,
                     tile: int = 8192, kernel_size: int = 3):
    """Batched voxel-bucket self-KNN: points [B,P,3] -> (idx [B,P,k], dist).

    Candidate-limited (kernel_size^3-voxel neighborhood): exact where that
    neighborhood holds >= k points, fewer/-1 neighbors where it doesn't. Used
    by DeepFusion (deep_fusion.py), where attention masks -1 slots anyway.
    kernel_size widens the shell (3 -> ±0.1 m at default voxels, 5 -> ±0.2 m)
    for parity runs where far-range point spacing exceeds the default shell
    (ADVICE r4); cost grows as kernel_size^3 candidate rows.
    """
    f = partial(_bucket_knn_single, spatial_shape=spatial_shape, k=k,
                bucket_cap=bucket_cap, tile=tile, kernel_size=kernel_size)
    dist, idx = jax.vmap(f)(points, p_valid, q_valid, point_voxel_ids,
                            voxel_coords)
    return idx, dist


def _nearest_point_pallas_single(queries, points, p_valid, tq: int = 256,
                                 pc: int = 2048):
    """Fused 1-NN argmin kernel: queries [Q,3], points [P,3] -> idx [Q] of the
    nearest valid point (ties -> lowest index within each P chunk, earliest
    chunk across chunks).

    Why a kernel: the XLA k=1 path materializes the [tile, P] distance matrix
    in HBM per tile (Q*P*4B written+read — ~9.7GB of pure HBM churn at the
    aux-transfer shapes 12k x 98k). Here each (query-block, point-chunk) tile
    of distances lives only in VMEM; HBM traffic collapses to the operands.
    Distances accumulate per-axis squared differences ((q-p)^2, VPU) instead
    of the matmul expansion — no MXU needed, no [Q,P] buffer anywhere."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = queries.shape[0]
    p = points.shape[0]
    qpad = (-q) % tq
    ppad = (-p) % pc
    qp = jnp.pad(queries, ((0, qpad), (0, 0)))
    pt = jnp.pad(points, ((0, ppad), (0, 0))).T              # [3, P']
    pbig = jnp.where(jnp.pad(p_valid, (0, ppad), constant_values=False),
                     0.0, _BIG).astype(jnp.float32)[None]    # [1, P']
    nq, npc = (q + qpad) // tq, (p + ppad) // pc

    def kernel(q_ref, p_ref, big_ref, min_ref, idx_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            min_ref[:] = jnp.full(min_ref.shape, jnp.inf, jnp.float32)
            idx_ref[:] = jnp.full(idx_ref.shape, -1, jnp.int32)

        d = big_ref[:]                                        # [1, PC] -> bcast
        d = jnp.broadcast_to(d, (tq, pc)).astype(jnp.float32)
        for k in range(3):
            diff = q_ref[:, k:k + 1] - p_ref[k:k + 1, :]      # [TQ, PC]
            d = d + diff * diff
        m = jnp.min(d, axis=1, keepdims=True)                 # [TQ, 1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tq, pc), 1)
        big_i = jnp.int32(2 ** 31 - 1)
        cand = jnp.min(jnp.where(d == m, lane, big_i), axis=1,
                       keepdims=True) + j * pc                # [TQ, 1]
        better = m < min_ref[:]
        idx_ref[:] = jnp.where(better, cand, idx_ref[:])
        min_ref[:] = jnp.where(better, m, min_ref[:])

    grid = (nq, npc)
    out_min, out_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nq * tq, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nq * tq, 1), jnp.int32)],
    )(qp, pt, pbig)
    # points padded with valid=False carry _BIG distances and never win while
    # any valid point exists; all-invalid inputs keep idx -1 via the dist gate
    idx = out_idx[:q, 0]
    dist = out_min[:q, 0]
    return jnp.where(dist < _BIG, idx, -1)


def nearest_label_transfer(src_centers, src_labels, src_valid, dst_centers, dst_valid,
                           ignore_index: int = 255, tile: int = 256):
    """1-NN label transfer: each dst gets the label of its nearest valid src
    (the aux-loss path, tools/train.py:86-108). Returns [B, Q] int32.

    On TPU the 1-NN runs as a fused Pallas argmin (no [Q, P] HBM distance
    matrix); elsewhere the tiled XLA path."""
    if jax.default_backend() == 'tpu':
        idx = jax.vmap(lambda qc, pc_, pv: _nearest_point_pallas_single(
            qc, pc_, pv))(dst_centers, src_centers, src_valid)
        idx = jnp.where(dst_valid, idx, -1)
    else:
        idx, _ = knn_query(1, src_centers, dst_centers, src_valid, dst_valid,
                           tile=tile)
        idx = idx[..., 0]
    gathered = jnp.take_along_axis(src_labels, jnp.maximum(idx, 0), axis=1)
    return jnp.where(idx >= 0, gathered, ignore_index)

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


def nearest_label_transfer(src_centers, src_labels, src_valid, dst_centers, dst_valid,
                           ignore_index: int = 255, tile: int = 256):
    """1-NN label transfer: each dst gets the label of its nearest valid src
    (the aux-loss path, tools/train.py:86-108). Returns [B, Q] int32."""
    idx, _ = knn_query(1, src_centers, dst_centers, src_valid, dst_valid, tile=tile)
    idx = idx[..., 0]
    gathered = jnp.take_along_axis(src_labels, jnp.maximum(idx, 0), axis=1)
    return jnp.where(idx >= 0, gathered, ignore_index)

"""Submanifold / strided / inverse sparse 3D convolution for TPU.

TPU-native re-design of the spconv 2.x engine the reference leans on
(seg3d/models/backbones/spconv_unet.py, pointtransformer.py; see SURVEY.md §2.1
N5). No hash tables or atomics: the rulebook is built with sorts +
binary search (``jnp.searchsorted``) over int32 linearized coordinates, and the
convolution itself is gather + GEMM — each kernel offset contributes one
[V, Cin] x [Cin, Cout] matmul that maps straight onto the MXU.

Layout: everything is batched ``[B, V, ...]`` with per-sample capacity V and
validity encoded as coords == -1. Rulebook construction is per-sample (vmapped),
so under data-parallel SPMD no collective is ever needed for structure building.

spconv semantic parity:
  * SubMConv3d      -> build_subm_rulebook + apply_sparse_conv (output coords ==
                       input coords, neighbor lookups within the same set)
  * SparseConv3d    -> build_downsample (exact output set: every site whose
                       receptive field touches an input, like spconv's
                       get_indice_pairs) + apply_sparse_conv
  * SparseInverseConv3d -> the inverse rulebook built alongside the downsample
                       (indice_key reuse, seg3d/utils/spconv_utils.py:13-32):
                       outputs are exactly the pre-downsample coords.

Determinism: output voxel order after a downsample is sorted-key order (the
reference inherits first-seen order from spconv's hash; order only affects
which voxels drop on overflow, SURVEY.md §7.3).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import struct

INT32_SENTINEL = jnp.iinfo(jnp.int32).max


@struct.dataclass
class SparseTensor:
    """Batched sparse voxel tensor. coords are (z, y, x) per sample; a row with
    z == -1 is padding. spatial_shape is (gz, gy, gx) — the reference's
    ``sparse_shape`` (grid reversed to zyx, spconv_unet.py:125)."""
    features: jax.Array                       # [B, V, C]
    coords: jax.Array                         # [B, V, 3] int32
    spatial_shape: tuple = struct.field(pytree_node=False)

    @property
    def mask(self) -> jax.Array:              # [B, V]
        return self.coords[..., 0] >= 0

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]

    @property
    def capacity(self) -> int:
        return self.features.shape[1]

    def replace_feature(self, new_features: jax.Array) -> "SparseTensor":
        """Analog of spconv replace_feature (seg3d/utils/spconv_utils.py:4-10)."""
        return self.replace(features=new_features)


class Rulebook(NamedTuple):
    """Gather-side rulebook: for each output slot and kernel offset, the input
    slot that contributes (-1 = none). Shaped [B, K^3, V_out]."""
    in_idx: jax.Array


def kernel_offsets(kernel_size: int) -> jnp.ndarray:
    """[K^3, 3] (dz, dy, dx) offsets, raster order."""
    r = kernel_size
    idx = jnp.arange(r ** 3)
    dz = idx // (r * r)
    dy = (idx // r) % r
    dx = idx % r
    return jnp.stack([dz, dy, dx], axis=1).astype(jnp.int32)


def linearize(coords: jax.Array, spatial_shape: Sequence[int],
              valid: jax.Array | None = None) -> jax.Array:
    """coords [..., 3] (z,y,x) -> int32 linear keys; invalid -> sentinel.
    Asserts the key space fits int32 (per-sample keys, so the bound is just
    prod(grid) — 1440*1440*64 = 1.33e8 << 2^31)."""
    gz, gy, gx = spatial_shape
    if gz * gy * gx >= 2 ** 31:
        raise ValueError(f'grid {spatial_shape} overflows int32 key space')
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    key = (z * gy + y) * gx + x
    in_range = (z >= 0) & (z < gz) & (y >= 0) & (y < gy) & (x >= 0) & (x < gx)
    if valid is not None:
        in_range = in_range & valid
    return jnp.where(in_range, key, INT32_SENTINEL).astype(jnp.int32)


def delinearize(keys: jax.Array, spatial_shape: Sequence[int]) -> jax.Array:
    gz, gy, gx = spatial_shape
    z = keys // (gy * gx)
    rem = keys % (gy * gx)
    valid = keys != INT32_SENTINEL
    out = jnp.stack([z, rem // gx, rem % gx], axis=-1).astype(jnp.int32)
    return jnp.where(valid[..., None], out, -1)


def sort_match(keys: jax.Array, queries: jax.Array) -> jax.Array:
    """For each query, the index of the matching entry in `keys` (-1 if absent).

    One tagged merge-sort: keys become even values (2k), queries odd (2k+1),
    one variadic sort ranks them together, and each query matches the nearest
    preceding key entry. This replaces binary search (serialized on TPU) and
    jnp.searchsorted(method='sort') (several internal sorts) with exactly ONE
    sort over |keys|+|queries| elements — the hash-table probe of spconv's
    rulebook builder, recast as a sort (SURVEY.md §2.1 N5 mapping).

    Sentinel (INT32_SENTINEL) keys/queries never match.
    """
    nk, nq = keys.shape[0], queries.shape[0]
    n = nk + nq
    # 2k / 2k+1 tagging; sentinels stay INT32_MAX (wrapped doubles discarded)
    kv = jnp.where(keys == INT32_SENTINEL, INT32_SENTINEL, keys * 2)
    qv = jnp.where(queries == INT32_SENTINEL, INT32_SENTINEL, queries * 2 + 1)
    vals = jnp.concatenate([kv, qv])
    pay = jnp.concatenate([jnp.arange(nk, dtype=jnp.int32),
                           nk + jnp.arange(nq, dtype=jnp.int32)])
    sv, sp = jax.lax.sort([vals, pay], num_keys=1)

    pos = jnp.arange(n, dtype=jnp.int32)
    is_key = ((sv & 1) == 0) & (sv != INT32_SENTINEL)
    last_key_pos = jax.lax.associative_scan(jnp.maximum, jnp.where(is_key, pos, -1))
    lk = jnp.maximum(last_key_pos, 0)
    match = (last_key_pos >= 0) & ((sv >> 1) == (sv[lk] >> 1)) & (sv != INT32_SENTINEL)
    key_row = sp[lk]                       # original index into `keys`
    # scatter results back to query positions (payload >= nk marks queries)
    is_query = sp >= nk
    tgt = jnp.where(is_query, sp - nk, nq)     # OOB drop for key entries
    res = jnp.where(match & is_query, key_row, -1)
    return jnp.full(nq, -1, jnp.int32).at[tgt].set(res, mode='drop',
                                                   unique_indices=True)


# ---------------------------------------------------------------------------
# Rulebook construction (single sample; vmapped wrappers below)
# ---------------------------------------------------------------------------

def _subm_rulebook_single(coords: jax.Array, spatial_shape, kernel_size: int) -> jax.Array:
    """[V,3] zyx -> in_idx [K^3, V]; submanifold: outputs == inputs.

    Only the (K^3-1)/2 offsets below the center are searched (one tagged
    merge-sort, sort_match); the center is the identity and each mirror offset
    is the inverse bijection of its partner, recovered with one scatter —
    halving the dominant sort (spconv builds subm rulebooks with the same
    symmetry)."""
    valid = coords[..., 0] >= 0
    v = coords.shape[0]
    keys = linearize(coords, spatial_shape, valid=valid)
    offs = kernel_offsets(kernel_size) - (kernel_size // 2)
    k3 = offs.shape[0]
    half = k3 // 2

    nb = coords[None, :, :] + offs[:half, None, :]           # [half, V, 3]
    nb_keys = linearize(nb, spatial_shape, valid=valid[None, :])
    lower = sort_match(keys, nb_keys.reshape(-1)).reshape(half, v)

    center = jnp.where(valid, jnp.arange(v, dtype=jnp.int32), -1)[None]

    # mirror offset K^3-1-k: in_idx[m][u] = v  <=>  in_idx[k][v] = u
    rows = jnp.broadcast_to(jnp.arange(half, dtype=jnp.int32)[:, None], (half, v))
    src = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[None, :], (half, v))
    tgt = jnp.where(lower >= 0, rows * v + lower, half * v)  # OOB drop
    mirror = jnp.full(half * v, -1, jnp.int32) \
        .at[tgt.reshape(-1)].set(src.reshape(-1), mode='drop',
                                 unique_indices=True).reshape(half, v)
    return jnp.concatenate([lower, center, mirror[::-1]], axis=0)


def _downsample_single(coords: jax.Array, spatial_shape, out_shape,
                       kernel_size: int, stride: int, padding: int,
                       out_capacity: int):
    """Strided sparse conv structure for one sample.

    Returns (out_coords [Vo,3], rule_in_idx [K^3,Vo], inv_in_idx [K^3,V],
    num_out scalar). Output set = exact spconv semantics: all sites o with
    o*s - p + off == some input, off in [0, K)^3.
    """
    valid = coords[..., 0] >= 0
    v = coords.shape[0]
    k3 = kernel_size ** 3
    offs = kernel_offsets(kernel_size)

    # --- output candidates: pair (out cell, contributing input, offset) for
    # every (input, offset) with (in + p - off) % s == 0. ONE sort of these
    # pairs yields the unique output set AND both rulebooks — no searches.
    t = coords[None] + padding - offs[:, None, :]          # [K^3, V, 3]
    div = jnp.all(t % stride == 0, axis=-1)
    cand_keys = linearize(t // stride, out_shape, valid=valid[None] & div)
    flat_keys = cand_keys.reshape(-1)                      # [K^3 * V]
    payload = jnp.arange(k3 * v, dtype=jnp.int32)          # encodes (k, v)
    s, sp = jax.lax.sort([flat_keys, payload], num_keys=1)

    is_new = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]]) & (s != INT32_SENTINEL)
    rank = (jnp.cumsum(is_new) - 1).astype(jnp.int32)      # shared by duplicates
    ok = (s != INT32_SENTINEL) & (rank < out_capacity)
    num_out = jnp.sum(is_new).astype(jnp.int32)

    # unique output keys -> coords (sorted ascending by construction)
    write = jnp.where(is_new & ok, rank, out_capacity)     # OOB drop otherwise
    out_keys = jnp.full(out_capacity, INT32_SENTINEL, dtype=jnp.int32) \
        .at[write].set(s, mode='drop', unique_indices=True)
    out_coords = delinearize(out_keys, out_shape)

    # inverse rulebook: inv[k, v] = output slot this (v, k) pair feeds
    inv_tgt = jnp.where(ok, sp, k3 * v)                    # payload is unique
    inv_in_idx = jnp.full(k3 * v, -1, jnp.int32) \
        .at[inv_tgt].set(rank, mode='drop', unique_indices=True).reshape(k3, v)

    # gather rulebook: rule[k, o] = the input voxel at o*s - p + off_k.
    # For fixed (o, k) there is at most one input, so (k, rank) is unique.
    kk = sp // v
    vv = sp % v
    rule_tgt = jnp.where(ok, kk * out_capacity + rank, k3 * out_capacity)
    rule_in_idx = jnp.full(k3 * out_capacity, -1, jnp.int32) \
        .at[rule_tgt].set(vv, mode='drop', unique_indices=True) \
        .reshape(k3, out_capacity)
    return out_coords, rule_in_idx, inv_in_idx, num_out


def build_subm_rulebook(st: SparseTensor, kernel_size: int = 3) -> Rulebook:
    in_idx = jax.vmap(partial(_subm_rulebook_single, spatial_shape=st.spatial_shape,
                              kernel_size=kernel_size))(st.coords)
    return Rulebook(in_idx=in_idx)


def downsample_shape(spatial_shape, kernel_size: int, stride: int, padding: int):
    return tuple(int(math.floor((g + 2 * padding - kernel_size) / stride) + 1)
                 for g in spatial_shape)


class DownsamplePlan(NamedTuple):
    """Everything the paired SparseConv3d / SparseInverseConv3d need
    (= spconv's cached indice pairs for one indice_key)."""
    out_coords: jax.Array     # [B, Vo, 3]
    rule: Rulebook            # [B, K^3, Vo] into fine level
    inv_rule: Rulebook        # [B, K^3, V]  into coarse level
    out_shape: tuple
    num_out: jax.Array        # [B] true number of outputs (pre-capacity-drop)


def build_downsample(st: SparseTensor, out_capacity: int, kernel_size: int = 3,
                     stride: int = 2, padding: int = 1) -> DownsamplePlan:
    out_shape = downsample_shape(st.spatial_shape, kernel_size, stride, padding)
    f = partial(_downsample_single, spatial_shape=st.spatial_shape,
                out_shape=out_shape, kernel_size=kernel_size, stride=stride,
                padding=padding, out_capacity=out_capacity)
    out_coords, rule_in_idx, inv_in_idx, num_out = jax.vmap(f)(st.coords)
    return DownsamplePlan(out_coords=out_coords, rule=Rulebook(rule_in_idx),
                          inv_rule=Rulebook(inv_in_idx), out_shape=out_shape,
                          num_out=num_out)


# ---------------------------------------------------------------------------
# Convolution execution: gather + GEMM per kernel offset
# ---------------------------------------------------------------------------

def apply_sparse_conv(features: jax.Array, rulebook: Rulebook, weights: jax.Array,
                      out_mask: jax.Array, compute_dtype=None,
                      offset_group: int = 9) -> jax.Array:
    """features [B, V, Cin], rulebook.in_idx [B, K^3, Vo], weights [K^3, Cin, Cout]
    -> [B, Vo, Cout].

    Kernel offsets are processed in groups of `offset_group` under a lax.scan:
    each step is ONE batched gather [B, G, Vo, Cin] + ONE dot_general
    contracting (G, Cin) — a large MXU GEMM. Scanning (vs. fully unrolling 27
    gather+matmul pairs) keeps the XLA graph small enough to compile fast while
    keeping per-step arithmetic intensity high; missing neighbors contribute
    zeros."""
    in_idx = rulebook.in_idx
    b, k3, vo = in_idx.shape
    cin = features.shape[-1]
    cout = weights.shape[-1]

    x = features
    w = weights
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)

    g_sz = min(offset_group, k3)
    pad = (-k3) % g_sz
    if pad:
        in_idx = jnp.concatenate(
            [in_idx, jnp.full((b, pad, vo), -1, in_idx.dtype)], axis=1)
        w = jnp.concatenate([w, jnp.zeros((pad, cin, cout), w.dtype)], axis=0)
    n_groups = (k3 + pad) // g_sz
    idx_groups = in_idx.reshape(b, n_groups, g_sz, vo).transpose(1, 0, 2, 3)
    w_groups = w.reshape(n_groups, g_sz, cin, cout)

    def body(acc, inputs):
        idx, wg = inputs                                       # [B,G,Vo], [G,Cin,Cout]
        flat = jnp.maximum(idx, 0).reshape(b, g_sz * vo)
        g = jnp.take_along_axis(x, flat[..., None], axis=1)
        g = g.reshape(b, g_sz, vo, cin)
        g = jnp.where((idx >= 0)[..., None], g, 0)
        # contract over (G, Cin): [B,G,Vo,Cin] x [G,Cin,Cout] -> [B,Vo,Cout]
        part = jax.lax.dot_general(
            g, wg, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + part, None

    acc = jnp.zeros((b, vo, cout), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (idx_groups, w_groups))
    out = acc.astype(features.dtype)
    return jnp.where(out_mask[..., None], out, 0)

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
import numpy as np
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
    # unstable: tagged values are distinct (sentinel ties all discarded), and
    # stable lax.sort pays a hidden iota tiebreak column (~33% on TPU)
    sv, sp = jax.lax.sort([vals, pay], num_keys=1, is_stable=False)

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

def _mirror_rows(rows_idx: jax.Array) -> jax.Array:
    """Invert each row's partial bijection: out[r][u] = v <=> rows_idx[r][v] = u."""
    n, v = rows_idx.shape
    rr = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, v))
    src = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[None, :], (n, v))
    tgt = jnp.where(rows_idx >= 0, rr * v + rows_idx, n * v)
    return jnp.full(n * v, -1, jnp.int32).at[tgt.reshape(-1)].set(
        src.reshape(-1), mode='drop', unique_indices=True).reshape(n, v)


def _subm_rulebook_k3(coords: jax.Array, spatial_shape,
                      assume_sorted: bool = False) -> jax.Array:
    """3^3 submanifold rulebook with one V-sort + one 5V tagged sort.

    Key insight: in sorted-key order, the x-axis neighbors of any voxel are the
    keys q-1 / q+1 (when not crossing a row boundary), so for each (dz, dy)
    plane ONE rank lookup of q = key(z+dz, y+dy, x) yields all three dx
    matches. Only 4 of the 8 non-center planes are searched; the mirrors are
    recovered by inverting the bijections (spconv-style symmetry)."""
    gz, gy, gx = spatial_shape
    valid = coords[..., 0] >= 0
    v = coords.shape[0]
    keys = linearize(coords, spatial_shape, valid=valid)
    arange_v = jnp.arange(v, dtype=jnp.int32)
    if assume_sorted:
        # pipeline invariant: coords already ascending by key (voxelizer /
        # downsample output order) — skip the identity argsort
        order, ks = arange_v, keys
    else:
        # unstable: keys unique among valid rows; sentinel-tail tie order is
        # irrelevant (all padding)
        order = jnp.argsort(keys, stable=False).astype(jnp.int32)
        ks = keys[order]

    def match_full(q):
        """q [M] plane-shifted keys -> (idx for dx=-1, 0, +1), each [M]."""
        m = q.shape[0]
        qv = jnp.where(q == INT32_SENTINEL, INT32_SENTINEL, q * 2 + 1)
        kv = jnp.where(ks == INT32_SENTINEL, INT32_SENTINEL, ks * 2)
        vals = jnp.concatenate([kv, qv])
        pay = jnp.concatenate([arange_v, v + jnp.arange(m, dtype=jnp.int32)])
        sv, sp = jax.lax.sort([vals, pay], num_keys=1, is_stable=False)
        is_key = ((sv & 1) == 0) & (sv != INT32_SENTINEL)
        ranks = jnp.cumsum(is_key)                       # keys <= value so far
        # rank per query, back in query order
        is_q = sp >= v
        qtgt = jnp.where(is_q, sp - v, m)
        r = jnp.zeros(m, jnp.int32).at[qtgt].set(
            ranks.astype(jnp.int32), mode='drop', unique_indices=True)

        def row_of(pos):
            """sorted-row -> original index; identity under assume_sorted
            (order == iota), which XLA does not fold away on its own — this
            skips a [4V]-row gather per call site."""
            clipped = jnp.clip(pos, 0, v - 1)
            return clipped if assume_sorted else order[clipped]

        # all three candidate keys (rows r-2..r of ks) come from ONE 3-row
        # window gather; per-candidate rows are then picked with cheap
        # elementwise selects (three separate [M]-row gathers cost ~3x more —
        # gathers are row-count-bound)
        base2 = jnp.clip(r - 2, 0, max(v - 3, 0))
        kwin = jax.vmap(lambda s: jax.lax.dynamic_slice(ks, (s,), (3,)))(base2)

        def at_row(pos):
            i = jnp.clip(pos - base2, 0, 2)
            return jnp.where(i == 0, kwin[:, 0],
                             jnp.where(i == 1, kwin[:, 1], kwin[:, 2]))

        qs = q != INT32_SENTINEL
        km1 = at_row(r - 1)
        eq0 = qs & (r >= 1) & (km1 == q)
        idx0 = jnp.where(eq0, row_of(r - 1), -1)

        # dx = -1: key q-1 sits just below q's matches
        pos_m = r - 1 - eq0.astype(jnp.int32)
        cand_m = at_row(pos_m)
        ok_m = qs & (pos_m >= 0) & (cand_m == q - 1) & (q % gx != 0)
        idx_m = jnp.where(ok_m, row_of(pos_m), -1)

        # dx = +1: the smallest key > q is at rank r
        cand_p = at_row(r)
        ok_p = qs & (r < v) & (cand_p == q + 1) & ((q + 1) % gx != 0)
        idx_p = jnp.where(ok_p, row_of(r), -1)
        return idx_m, idx0, idx_p

    # center plane (dz=0, dy=0): q == key, rank is its own position
    if assume_sorted:
        pos_in_sorted = arange_v
    else:
        pos_in_sorted = jnp.zeros(v, jnp.int32).at[order].set(
            arange_v, unique_indices=True)
    nxt = jnp.clip(pos_in_sorted + 1, 0, v - 1)
    prv = jnp.clip(pos_in_sorted - 1, 0, v - 1)
    ok_p = valid & (ks[nxt] == keys + 1) & ((keys + 1) % gx != 0) & (pos_in_sorted + 1 < v)
    ok_m = valid & (ks[prv] == keys - 1) & (keys % gx != 0) & (pos_in_sorted > 0)
    c_m = jnp.where(ok_m, prv if assume_sorted else order[prv], -1)
    c_0 = jnp.where(valid, arange_v, -1)
    c_p = jnp.where(ok_p, nxt if assume_sorted else order[nxt], -1)

    # four searched planes (their mirrors complete the 8)
    planes = ((0, 1), (1, -1), (1, 0), (1, 1))
    shifted = jnp.stack([coords + jnp.asarray([dz, dy, 0], jnp.int32)
                         for dz, dy in planes])              # [4, V, 3]
    q_all = linearize(shifted, spatial_shape,
                      valid=jnp.broadcast_to(valid, (4, v))).reshape(-1)
    pm, p0, pp = match_full(q_all)
    pm = pm.reshape(4, v)
    p0 = p0.reshape(4, v)
    pp = pp.reshape(4, v)

    def k_of(dz, dy, dx):
        return (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)

    rows = [jnp.full((v,), -1, jnp.int32)] * 27
    rows[k_of(0, 0, -1)] = c_m
    rows[k_of(0, 0, 0)] = c_0
    rows[k_of(0, 0, 1)] = c_p
    computed = []
    for i, (dz, dy) in enumerate(planes):
        rows[k_of(dz, dy, -1)] = pm[i]
        rows[k_of(dz, dy, 0)] = p0[i]
        rows[k_of(dz, dy, 1)] = pp[i]
        computed.extend([k_of(dz, dy, -1), k_of(dz, dy, 0), k_of(dz, dy, 1)])
    # mirrors: offset 26-k is the inverse bijection of offset k
    mirrored = _mirror_rows(jnp.stack([rows[k] for k in computed]))
    for i, k in enumerate(computed):
        rows[26 - k] = mirrored[i]
    return jnp.stack(rows)


def _subm_rulebook_single(coords: jax.Array, spatial_shape, kernel_size: int,
                          assume_sorted: bool = False) -> jax.Array:
    """[V,3] zyx -> in_idx [K^3, V]; submanifold: outputs == inputs."""
    if kernel_size == 3:
        return _subm_rulebook_k3(coords, spatial_shape, assume_sorted)
    # generic fallback: search the lower half via one tagged merge-sort,
    # mirror the rest
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
    mirror = _mirror_rows(lower)
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

    # --- output candidates: pair (out cell, contributing input, offset) for
    # every (input, offset) with (in + p - off) % s == 0. ONE sort of these
    # pairs yields the unique output set AND both rulebooks — no searches.
    if kernel_size == 3 and stride == 2:
        # parity specialization: per axis only offsets with
        # off = ((c + p) mod 2) + 2*choice are divisible, so each input has at
        # most 2^3 = 8 valid (offset, output) pairs instead of 27 — a 3.4x
        # smaller candidate sort.
        par = (coords + padding) % 2                        # [V, 3]
        n_cand = 8
        combos = jnp.asarray([[i, j, k] for i in (0, 1) for j in (0, 1)
                              for k in (0, 1)], dtype=jnp.int32)   # [8, 3]
        off = par[None] + 2 * combos[:, None, :]            # [8, V, 3]
        ok_off = jnp.all(off < kernel_size, axis=-1)
        t = coords[None] + padding - off
        cand_keys = linearize(t // stride, out_shape, valid=valid[None] & ok_off)
        koff = jnp.where(ok_off,
                         (off[..., 0] * kernel_size + off[..., 1]) * kernel_size
                         + off[..., 2], 0).reshape(-1)      # [8V] offset index
    else:
        offs = kernel_offsets(kernel_size)
        n_cand = k3
        t = coords[None] + padding - offs[:, None, :]       # [K^3, V, 3]
        div = jnp.all(t % stride == 0, axis=-1)
        cand_keys = linearize(t // stride, out_shape, valid=valid[None] & div)
        koff = jnp.repeat(jnp.arange(k3, dtype=jnp.int32), v)

    flat_keys = cand_keys.reshape(-1)                      # [n_cand * V]
    # ONE packed payload column (koff<<(VB+CB) | cand<<VB | v): koff and the
    # candidate index ride the sort because recovering them afterwards would
    # be a [n_cand*V]-row 1-lane gather (~5.6ms/step at stage-1 caps), and
    # packing into the voxel payload's high bits keeps the sort at 2 moved
    # columns instead of 3-4 (sort cost is per moved byte; measured 45ms/step
    # across the 3 stage sorts at 3 cols)
    vbits = max(v - 1, 1).bit_length()
    cbits = max(n_cand - 1, 1).bit_length()
    assert vbits + cbits + 5 <= 31, (v, 'voxel capacity too large for payload')
    arange_cv = jnp.arange(n_cand * v, dtype=jnp.int32)
    vv_flat = arange_cv % v
    cc_flat = arange_cv // v
    payload = (koff << (vbits + cbits)) | (cc_flat << vbits) | vv_flat
    # unstable: every post-sort consumer (rank cumsum, out_keys / rank_cv /
    # rule scatters) has unique targets independent of tie order, and a stable
    # sort carries a hidden iota tiebreak column (measured 23.1 -> 15.6ms for
    # the stage-2 8V sort)
    s, sp = jax.lax.sort([flat_keys, payload], num_keys=1, is_stable=False)
    kk = sp >> (vbits + cbits)
    cc = (sp >> vbits) & ((1 << cbits) - 1)

    is_new = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]]) & (s != INT32_SENTINEL)
    rank = (jnp.cumsum(is_new) - 1).astype(jnp.int32)      # shared by duplicates
    ok = (s != INT32_SENTINEL) & (rank < out_capacity)
    num_out = jnp.sum(is_new).astype(jnp.int32)

    # unique output keys -> coords (sorted ascending by construction)
    write = jnp.where(is_new & ok, rank, out_capacity)     # OOB drop otherwise
    out_keys = jnp.full(out_capacity, INT32_SENTINEL, dtype=jnp.int32) \
        .at[write].set(s, mode='drop', unique_indices=True)
    out_coords = delinearize(out_keys, out_shape)

    # recover the voxel of each sorted candidate (offset index kk and
    # candidate index cc came through the sort in the payload's high bits)
    vv = sp & ((1 << vbits) - 1)

    # pair structure, candidate-compact form: rank_cv[c, v] = the output slot
    # the c-th (parent, tap) pair of input v feeds (-1 = absent). The tap is
    # NOT stored: it is a static function of (candidate, input parity class),
    # which is what lets both the inverse conv and the strided conv's
    # backward select weights per parity class on the MXU instead of
    # gathering per-pair taps (see apply_inverse_conv / apply_strided_conv).
    inv_tgt = jnp.where(ok, cc * v + vv, n_cand * v)       # (c, v) is unique
    rank_cv = jnp.full(n_cand * v, -1, jnp.int32) \
        .at[inv_tgt].set(rank, mode='drop',
                         unique_indices=True).reshape(n_cand, v)
    if kernel_size == 3 and stride == 2:
        pclass = (par[:, 0] * 2 + par[:, 1]) * 2 + par[:, 2]
        pclass = jnp.where(valid, pclass, 0).astype(jnp.int32)
    else:
        pclass = jnp.zeros(v, jnp.int32)

    # gather rulebook: rule[k, o] = the input voxel at o*s - p + off_k.
    # For fixed (o, k) there is at most one input, so (k, rank) is unique.
    rule_tgt = jnp.where(ok, kk * out_capacity + rank, k3 * out_capacity)
    rule_in_idx = jnp.full(k3 * out_capacity, -1, jnp.int32) \
        .at[rule_tgt].set(vv, mode='drop', unique_indices=True) \
        .reshape(k3, out_capacity)
    return out_coords, rule_in_idx, rank_cv, pclass, num_out


def build_subm_rulebook(st: SparseTensor, kernel_size: int = 3,
                        assume_sorted: bool = False) -> Rulebook:
    in_idx = jax.vmap(partial(_subm_rulebook_single, spatial_shape=st.spatial_shape,
                              kernel_size=kernel_size,
                              assume_sorted=assume_sorted))(st.coords)
    return Rulebook(in_idx=in_idx)


def downsample_shape(spatial_shape, kernel_size: int, stride: int, padding: int):
    return tuple(int(math.floor((g + 2 * padding - kernel_size) / stride) + 1)
                 for g in spatial_shape)


class StridedRulebook(NamedTuple):
    """Forward strided conv structure (SparseConv3d analog) + the compact
    pair structure its custom VJP needs to transpose WITHOUT a scatter-add.

    rank[c, v] = output slot the c-th candidate pair of input v feeds (-1 if
    absent); with stride 2 / kernel 3 the parity argument bounds candidates
    at 8. The tap of pair (c, v) is the STATIC table tap[pclass[v], c]
    (tapok marks combinations that exist), so weight selection happens per
    parity class on the MXU — no per-pair tap data."""
    in_idx: jax.Array         # [B, K^3, Vo] gather rule into the fine level
    rank: jax.Array           # [B, n_cand, V_fine]
    pclass: jax.Array         # [B, V_fine] parity class in [0, P)
    tap: jax.Array            # [P, n_cand] static
    tapok: jax.Array          # [P, n_cand] static bool


class InverseRulebook(NamedTuple):
    """Candidate-compact inverse conv structure (SparseInverseConv3d analog):
    the same pair structure read from the fine side, plus the paired forward
    rule for the backward's coarse-side gather."""
    rank: jax.Array           # [B, n_cand, V_fine]
    pclass: jax.Array         # [B, V_fine]
    tap: jax.Array            # [P, n_cand]
    tapok: jax.Array          # [P, n_cand]
    fwd_idx: jax.Array        # [B, K^3, Vo]


def _tap_tables(kernel_size: int, stride: int):
    """Static (tap, tapok) [P, n_cand]: tap index of candidate c for an input
    in parity class P. For the k3/s2 parity specialization P decomposes as
    (pz*2+py)*2+px and candidates as (cz*2+cy)*2+cx with off = p + 2*c per
    axis; generically every offset is its own candidate and parity is unused."""
    if kernel_size == 3 and stride == 2:
        tap = np.zeros((8, 8), np.int32)
        ok = np.zeros((8, 8), bool)
        for p in range(8):
            pz, py, px = (p >> 2) & 1, (p >> 1) & 1, p & 1
            for c in range(8):
                cz, cy, cx = (c >> 2) & 1, (c >> 1) & 1, c & 1
                oz, oy, ox = pz + 2 * cz, py + 2 * cy, px + 2 * cx
                if oz < 3 and oy < 3 and ox < 3:
                    tap[p, c] = (oz * 3 + oy) * 3 + ox
                    ok[p, c] = True
        return jnp.asarray(tap), jnp.asarray(ok)
    k3 = kernel_size ** 3
    return (jnp.arange(k3, dtype=jnp.int32)[None, :],
            jnp.ones((1, k3), bool))


class DownsamplePlan(NamedTuple):
    """Everything the paired SparseConv3d / SparseInverseConv3d need
    (= spconv's cached indice pairs for one indice_key)."""
    out_coords: jax.Array     # [B, Vo, 3]
    rule: StridedRulebook
    inv_rule: InverseRulebook
    out_shape: tuple
    num_out: jax.Array        # [B] true number of outputs (pre-capacity-drop)


def build_downsample(st: SparseTensor, out_capacity: int, kernel_size: int = 3,
                     stride: int = 2, padding: int = 1) -> DownsamplePlan:
    out_shape = downsample_shape(st.spatial_shape, kernel_size, stride, padding)
    f = partial(_downsample_single, spatial_shape=st.spatial_shape,
                out_shape=out_shape, kernel_size=kernel_size, stride=stride,
                padding=padding, out_capacity=out_capacity)
    out_coords, rule_in_idx, rank_cv, pclass, num_out = jax.vmap(f)(st.coords)
    tap, tapok = _tap_tables(kernel_size, stride)
    rule = StridedRulebook(in_idx=rule_in_idx, rank=rank_cv, pclass=pclass,
                           tap=tap, tapok=tapok)
    inv = InverseRulebook(rank=rank_cv, pclass=pclass, tap=tap, tapok=tapok,
                          fwd_idx=rule_in_idx)
    return DownsamplePlan(out_coords=out_coords, rule=rule, inv_rule=inv,
                          out_shape=out_shape, num_out=num_out)


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

    # unrolled over the (typically 3) offset groups: on TPU a lax.scan here
    # costs a while-loop barrier per conv (~190ms of the profile), while the
    # unrolled form lets XLA overlap the gathers with the GEMMs.
    # Missing neighbors read a zero row appended to x instead of paying a
    # [G*Vo, Cin]-sized select after every gather (~1ms each at stage-2 caps).
    v_in = x.shape[1]
    xp = jnp.concatenate([x, jnp.zeros((b, 1, cin), x.dtype)], axis=1)
    acc = jnp.zeros((b, vo, cout), dtype=jnp.float32)
    for gi in range(n_groups):
        idx = idx_groups[gi]                                  # [B,G,Vo]
        flat = jnp.where(idx >= 0, idx, v_in).reshape(b, g_sz * vo)
        g = jnp.take_along_axis(xp, flat[..., None], axis=1)
        g = g.reshape(b, g_sz, vo, cin)
        # contract over (G, Cin): [B,G,Vo,Cin] x [G,Cin,Cout] -> [B,Vo,Cout]
        acc = acc + jax.lax.dot_general(
            g, w_groups[gi], dimension_numbers=(((1, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
    out = acc.astype(features.dtype)
    return jnp.where(out_mask[..., None], out, 0)


# ---------------------------------------------------------------------------
# Inverse conv (SparseInverseConv3d) and the strided conv's backward:
# candidate-compact gathers + per-parity-class weight selection
# ---------------------------------------------------------------------------
#
# A stride-2/k-3 fine voxel has at most 8 (parent, tap) pairs, and the tap of
# pair (c, v) depends only on (c, parity class of v) — a STATIC table. So the
# fine-side direction (inverse conv forward; strided conv's dx) is:
#   1. gather the <= 8 parent rows per fine voxel straight from the SMALL
#      coarse tensor (an earlier design pre-transformed a [Vo*27, C] tap table
#      and gathered from that; at Waymo scale the 27x larger gather source
#      blew the row cost from ~7ns to ~53ns — locality, not row count);
#   2. compute all P=8 parity-class results with one MXU contraction against
#      the statically tap-selected weights (8x FLOP inflation, trivial next
#      to the gather), and select each voxel's class with a one-hot VPU sum.
# The coarse-side direction (inverse conv's dx; handled by apply_sparse_conv
# for the strided forward) gathers through the dense K^3 forward rule, whose
# source is again the small fine-level tensor. NOTHING in either direction
# ever scatters.


def _tap_weights(w, tap, tapok):
    """[P, n_cand, Cin, Cout] statically tap-selected weights (0 where the
    (class, candidate) pair cannot exist)."""
    ws = w[tap]
    return jnp.where(tapok[..., None, None], ws, 0)


def _pair_gather(x, rank):
    """x [B, N, C], rank [B, nc, V] -> [B, nc, V, C] (zero rows where -1)."""
    b, n, c = x.shape
    nc, v = rank.shape[1], rank.shape[2]
    xp = jnp.concatenate([x, jnp.zeros((b, 1, c), x.dtype)], axis=1)
    flat = jnp.where(rank >= 0, rank, n).reshape(b, nc * v)
    g = jnp.take_along_axis(xp, flat[..., None], axis=1)
    return g.reshape(b, nc, v, c)


def _class_select(all_p, pclass):
    """all_p [B, V, P, C], pclass [B, V] -> [B, V, C] (one-hot VPU sum)."""
    p = all_p.shape[2]
    onehot = (pclass[..., None] == jnp.arange(p, dtype=pclass.dtype)) \
        .astype(all_p.dtype)
    return jnp.einsum('bvpc,bvp->bvc', all_p, onehot)


def _fine_side_apply(cd, coarse, weights, rank, pclass, tap, tapok, out_mask,
                     out_dtype, transpose_w: bool):
    """out[v] = sum_c coarse[rank[c, v]] @ W[tap(pclass[v], c)] (or W^T)."""
    x = coarse if cd is None else coarse.astype(cd)
    w = weights if cd is None else weights.astype(cd)
    gath = _pair_gather(x, rank)                    # [B, nc, Vf, C]
    wsel = _tap_weights(w, tap, tapok)              # [P, nc, Cin, Cout]
    if transpose_w:
        wsel = wsel.swapaxes(-1, -2)
    # contract (candidate, channel): [B,nc,Vf,Ci] x [P,nc,Ci,Co] -> [B,Vf,P,Co]
    all_p = jax.lax.dot_general(
        gath, wsel, dimension_numbers=(((1, 3), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32)
    out = _class_select(all_p, pclass).astype(out_dtype)
    return jnp.where(out_mask[..., None], out, 0), gath


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _inverse_conv_vjp(compute_dtype, features, weights, rank, pclass, tap,
                      tapok, fwd_idx, out_mask):
    y, _ = _fine_side_apply(compute_dtype, features, weights, rank, pclass,
                            tap, tapok, out_mask, features.dtype, False)
    return y


def _inverse_conv_fwd(compute_dtype, features, weights, rank, pclass, tap,
                      tapok, fwd_idx, out_mask):
    y = _inverse_conv_vjp(compute_dtype, features, weights, rank, pclass, tap,
                          tapok, fwd_idx, out_mask)
    return y, (features, weights, rank, pclass, tap, tapok, fwd_idx, out_mask)


def _inverse_conv_bwd(compute_dtype, res, dout):
    """Coarse-side transpose: each (parent, tap) pair is read by exactly ONE
    fine voxel, so dy[k, o] = dout[fwd_idx[k, o]] is a gather from the small
    fine-level cotangent; then dx = dy @ W^T and dW = x^T dy on the MXU."""
    features, weights, rank, pclass, tap, tapok, fwd_idx, out_mask = res
    cd = compute_dtype
    x = features if cd is None else features.astype(cd)
    w = weights if cd is None else weights.astype(cd)
    b, vo, cin = x.shape
    k3, _, cout = w.shape
    g0 = jnp.where(out_mask[..., None], dout, 0)
    g = g0 if cd is None else g0.astype(cd)
    dy = _pair_gather(g, fwd_idx)                            # [B, K3, Vo, Cout]
    dx = jax.lax.dot_general(
        dy, w, dimension_numbers=(((1, 3), (0, 2)), ((), ())),
        preferred_element_type=jnp.float32).astype(features.dtype)
    dw = jax.lax.dot_general(
        dy, x, dimension_numbers=(((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)                  # [K3, Cout, Cin]
    dw = dw.swapaxes(1, 2).astype(weights.dtype)
    z = [np.zeros(a.shape, dtype=jax.dtypes.float0)
         for a in (rank, pclass, tap, tapok, fwd_idx, out_mask)]
    return (dx, dw, *z)


_inverse_conv_vjp.defvjp(_inverse_conv_fwd, _inverse_conv_bwd)


def apply_inverse_conv(features: jax.Array, inv: InverseRulebook,
                       weights: jax.Array, out_mask: jax.Array,
                       compute_dtype=None) -> jax.Array:
    """SparseInverseConv3d execution (seg3d upsample path, spconv_unet.py:68-112
    via indice_key reuse): features [B, Vo, Cin] at the coarse level, weights
    [K^3, Cin, Cout], out_mask the FINE-level validity -> [B, V_fine, Cout].
    Exactly equivalent to apply_sparse_conv over the dense [K^3, V_fine]
    inverse rulebook; carries a custom VJP whose residuals are only the conv
    inputs (nothing to remat)."""
    cd = None if compute_dtype is None else jnp.dtype(compute_dtype)
    return _inverse_conv_vjp(cd, features, weights, inv.rank, inv.pclass,
                             inv.tap, inv.tapok, inv.fwd_idx, out_mask)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _strided_conv_vjp(compute_dtype, features, weights, in_idx, rank, pclass,
                      tap, tapok, out_mask):
    return apply_sparse_conv(features, Rulebook(in_idx), weights, out_mask,
                             compute_dtype)


def _strided_conv_fwd(compute_dtype, features, weights, in_idx, rank, pclass,
                      tap, tapok, out_mask):
    y = _strided_conv_vjp(compute_dtype, features, weights, in_idx, rank,
                          pclass, tap, tapok, out_mask)
    return y, (features, weights, in_idx, rank, pclass, tap, tapok, out_mask)


def _strided_conv_bwd(compute_dtype, res, dout):
    """Fine-side transpose via the compact pair structure (NO scatter-add,
    which XLA's autodiff of the forward gather would emit — measured 57ms at
    the d2 stage alone): dx is the fine-side apply of dout with transposed
    tap weights; dW reuses the same gathered pair rows, contracting
    class-masked x against them and folding (class, candidate) onto taps with
    a static one-hot."""
    features, weights, in_idx, rank, pclass, tap, tapok, out_mask = res
    cd = compute_dtype
    x = features if cd is None else features.astype(cd)
    w = weights if cd is None else weights.astype(cd)
    b, vf, cin = x.shape
    k3, _, cout = w.shape
    g0 = jnp.where(out_mask[..., None], dout, 0)
    g = g0 if cd is None else g0.astype(cd)

    # dx[v] = sum_c g[rank[c, v]] @ W[tap]^T — fine-side apply, transposed.
    # Rows with no pairs come out zero on their own (all gathered rows are
    # the appended zero row), so the mask argument is a tautology.
    dx, gath = _fine_side_apply(cd, g, weights, rank, pclass, tap, tapok,
                                jnp.ones(pclass.shape, bool),
                                features.dtype, True)

    # dW[k] = sum_{(v,c): tap(P(v),c)=k} x[v] (x) gath[c, v]
    p = tap.shape[0]
    onehot = (pclass[..., None] == jnp.arange(p, dtype=pclass.dtype)) \
        .astype(x.dtype)                                     # [B, Vf, P]
    xo = jnp.einsum('bvi,bvp->bpvi', x, onehot)
    dw2 = jax.lax.dot_general(
        xo, gath, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
        preferred_element_type=jnp.float32)                  # [P, Cin, nc, Cout]
    t_onehot = ((tap[..., None] == jnp.arange(k3, dtype=tap.dtype))
                & tapok[..., None]).astype(jnp.float32)      # [P, nc, K3]
    dw = jnp.einsum('pico,pck->kio', dw2, t_onehot).astype(weights.dtype)

    z = [np.zeros(a.shape, dtype=jax.dtypes.float0)
         for a in (in_idx, rank, pclass, tap, tapok, out_mask)]
    return (dx, dw, *z)


_strided_conv_vjp.defvjp(_strided_conv_fwd, _strided_conv_bwd)


def apply_strided_conv(features: jax.Array, rule: StridedRulebook,
                       weights: jax.Array, out_mask: jax.Array,
                       compute_dtype=None) -> jax.Array:
    """SparseConv3d execution (stride-2 downsample): forward is the plain
    gather-GEMM over the dense rule; the custom VJP transposes through the
    compact pair structure so no scatter-add ever appears and nothing big
    needs rematerialization."""
    cd = None if compute_dtype is None else jnp.dtype(compute_dtype)
    return _strided_conv_vjp(cd, features, weights, rule.in_idx, rule.rank,
                             rule.pclass, rule.tap, rule.tapok, out_mask)


# ---------------------------------------------------------------------------
# Planar (sorted-x) submanifold conv — the fast path for kernel_size == 3
# ---------------------------------------------------------------------------
#
# With voxels stored in ascending linearized-key order the structure BUILD is
# cheap (one payload-free merge per (dz, dy) plane pair — see
# _planar_k3_direct_single), and the EXECUTION is a plain row-gather + GEMM
# over the materialized 27-row index with a hand-written transpose:
#
#   * earlier designs gathered [3, C] windows per (plane, voxel) via vmapped
#     dynamic_slice — measured ~56ns/row on v5e at Waymo scale (the gather
#     emitter streams the big source badly). Plain per-offset row gathers via
#     one grouped take_along_axis run the same rows at ~9ns/row and let XLA
#     overlap them with the GEMMs (microbenchmark: 22ms vs ~83ms for one
#     stage-2 C=192->96 conv), so the window form was retired;
#   * the center (dz=0, dy=0) plane never gathers: in sorted order its
#     dx = -1/0/+1 neighbors sit at rows o-1/o/o+1 exactly, so two row-SHIFTS
#     and masks replace 3V gathered rows per conv;
#   * the backward uses the subm symmetry (o reads u at offset k <=> u reads
#     o at offset 26-k): dx is the same gather-GEMM of the cotangent with
#     mirrored+transposed weights, and dW reuses those gathered cotangent
#     neighbors (dW[26-k] = sum_u x[u] (x) nb_k(g)[u]) — ONE gather serves
#     both, and nothing ever scatters.


class PlanarRulebook(NamedTuple):
    """Sorted-order k=3 subm structure: in_idx[k][o] = the input row at raster
    offset k = (dz+1)*9 + (dy+1)*3 + (dx+1) of output o (-1 = absent). Same
    layout as Rulebook.in_idx but dispatched to the custom-VJP subm executor
    (apply_planar_subm_conv) instead of the checkpointed generic path."""
    in_idx: jax.Array     # [B, 27, V] int32


def _nbidx_from_base_wsel(base: jax.Array, wsel: jax.Array) -> jax.Array:
    """(base [9, V], wsel [9, V, 3]) -> in_idx [27, V] (-1 = absent): the
    3-row-window form's row for dx is base + w where wsel[w] == dx."""
    hit = wsel[:, :, :, None] == (jnp.arange(3, dtype=jnp.int8) - 1)  # [9,V,3w,3dx]
    off = jnp.argmax(hit, axis=2).astype(jnp.int32)          # [9, V, 3dx]
    any_ = jnp.any(hit, axis=2)
    rows = jnp.where(any_, base[:, :, None] + off, -1)
    return rows.transpose(0, 2, 1).reshape(27, base.shape[1])


def sort_by_key(st: SparseTensor) -> tuple[SparseTensor, jax.Array]:
    """Reorder a SparseTensor into ascending linearized-key order (invalid
    rows sort to the end). Returns (sorted_st, order) with order [B, V] such
    that sorted.features == features[order]; undo with
    ``unsort_by_order(y, order)``."""
    keys = jax.vmap(lambda c: linearize(c, st.spatial_shape,
                                        valid=c[..., 0] >= 0))(st.coords)
    order = jnp.argsort(keys, axis=-1, stable=False).astype(jnp.int32)
    coords = jnp.take_along_axis(st.coords, order[..., None], axis=1)
    feats = jnp.take_along_axis(st.features, order[..., None], axis=1) \
        if st.features.ndim == 3 else st.features
    return st.replace(features=feats, coords=coords), order


def unsort_by_order(y: jax.Array, order: jax.Array) -> jax.Array:
    """Scatter rows of y back to the pre-sort layout."""
    b, v = order.shape
    inv = jnp.zeros((b, v), jnp.int32)
    inv = jax.vmap(lambda o, a: a.at[o].set(jnp.arange(v, dtype=jnp.int32),
                                            unique_indices=True))(order, inv)
    return jnp.take_along_axis(y, inv[..., None], axis=1)


def _planar_subm_single(coords: jax.Array, spatial_shape):
    """coords [V, 3] MUST be in ascending key order (sort_by_key)."""
    gz, gy, gx = spatial_shape
    v = coords.shape[0]
    valid = coords[..., 0] >= 0
    keys = linearize(coords, spatial_shape, valid=valid)     # ascending

    planes = [(dz, dy) for dz in (-1, 0, 1) for dy in (-1, 0, 1)]
    shifted = jnp.stack([coords + jnp.asarray([dz, dy, 0], jnp.int32)
                         for dz, dy in planes])              # [9, V, 3]
    q = linearize(shifted, spatial_shape,
                  valid=jnp.broadcast_to(valid, (9, v))).reshape(-1)   # [9V]

    # one tagged merge-sort ranks all 9V queries against the V keys
    m = 9 * v
    kv = jnp.where(keys == INT32_SENTINEL, INT32_SENTINEL, keys * 2)
    qv = jnp.where(q == INT32_SENTINEL, INT32_SENTINEL, q * 2 + 1)
    vals = jnp.concatenate([kv, qv])
    pay = jnp.concatenate([jnp.arange(v, dtype=jnp.int32),
                           v + jnp.arange(m, dtype=jnp.int32)])
    sv, sp = jax.lax.sort([vals, pay], num_keys=1, is_stable=False)
    ranks = jnp.cumsum(((sv & 1) == 0) & (sv != INT32_SENTINEL))  # keys <= here
    is_q = sp >= v
    qtgt = jnp.where(is_q, sp - v, m)
    r = jnp.zeros(m, jnp.int32).at[qtgt].set(ranks.astype(jnp.int32),
                                             mode='drop', unique_indices=True)

    base = jnp.clip(r - 2, 0, max(v - 3, 0))                 # [9V]
    win = base[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]   # [9V, 3]
    kw = keys[win]                                           # window keys
    q_ok = q != INT32_SENTINEL
    kw_ok = kw != INT32_SENTINEL
    delta = jnp.where(kw_ok & q_ok[:, None],
                      kw - jnp.where(q_ok, q, 0)[:, None], 99)
    xq = jnp.where(q_ok, q % gx, 0)[:, None]
    bound_ok = jnp.where(delta == -1, xq > 0,
                         jnp.where(delta == 1, xq < gx - 1, True))
    hit = (jnp.abs(delta) <= 1) & bound_ok
    wsel = jnp.where(hit, delta, 2).astype(jnp.int8)         # [9V, 3]
    return _nbidx_from_base_wsel(base.reshape(9, v), wsel.reshape(9, v, 3))


def build_planar_subm_rulebook(st: SparseTensor) -> PlanarRulebook:
    """st.coords MUST already be in ascending key order per sample (use
    sort_by_key once per stage — downsample outputs are already sorted)."""
    in_idx = jax.vmap(partial(_planar_subm_single,
                              spatial_shape=st.spatial_shape))(st.coords)
    return PlanarRulebook(in_idx=in_idx)


def _base_wsel_from_rows(row_m, row_0, row_p, v: int):
    """(base, wsel) of one plane from the sorted-table rows of its three
    dx = -1/0/+1 neighbors (INT32_SENTINEL = absent). Present neighbors of a
    voxel occupy consecutive sorted rows (their keys are consecutive integers;
    nothing sorts between k and k+1), so the 3-row window starting at the
    minimum present row covers them all."""
    bmin = jnp.minimum(jnp.minimum(row_m, row_0), row_p)
    base = jnp.clip(jnp.where(bmin == INT32_SENTINEL, 0, bmin), 0, max(v - 3, 0))
    sels = []
    for w in range(3):
        row = base + w
        sel = jnp.full(row.shape, 2, jnp.int8)
        for e, a in ((-1, row_m), (0, row_0), (1, row_p)):
            sel = jnp.where((a != INT32_SENTINEL) & (a == row), jnp.int8(e), sel)
        sels.append(sel)
    return base, jnp.stack(sels, axis=-1)


def _planar_k3_direct_single(coords: jax.Array, spatial_shape):
    """coords [V,3] in ascending key order -> (base [9,V], wsel [9,V,3]).

    Builds the planar structure DIRECTLY, skipping the 27-row k3 rulebook +
    planar_from_k3 conversion. Key facts used:
      * a plane shift (dz, dy, 0) adds the CONSTANT C = (dz*gy + dy)*gx to the
        linearized key, so each plane's query stream keys+C is itself sorted
        (padding keys are the SENTINEL tail and stay a tail). Both merge
        inputs being sorted means original indices are recoverable from
        cumsums — the merge sort needs NO payload column;
      * ONE payload-free [2V] merge per plane PAIR yields the forward plane
        (+C: rank of query keys+C among keys = cumsum(is_key) at query
        entries) AND its mirror (-C: #{k <= k_i - C - 1} = cumsum(is_query)
        at key entries, since query tags break ties after keys) — replacing
        the previous 5V two-column sort + three [4,V,3]-sized mirror-inversion
        scatters (~50ms/step across stages at Waymo caps);
      * boundary-wrapping queries stay IN the merge (keeping the stream
        sorted); their false matches are discarded afterwards by per-plane
        y/z range masks on the voxel's own coords.
    """
    gz, gy, gx = spatial_shape
    v = coords.shape[0]
    valid = coords[..., 0] >= 0
    keys = linearize(coords, spatial_shape, valid=valid)      # ascending
    arange_v = jnp.arange(v, dtype=jnp.int32)

    planes = ((0, 1), (1, -1), (1, 0), (1, 1))                # searched half
    cs = tuple((dz * gy + dy) * gx for dz, dy in planes)      # key shift / plane
    # 2*(key + C) + 1 must fit int32 for the tag packing
    assert 2 * (gz * gy * gx + (gy + 1) * gx) < 2 ** 31, spatial_shape

    kv = jnp.where(valid, keys * 2, INT32_SENTINEL)           # [V]
    safe_k = jnp.where(valid, keys, 0)
    qv = jnp.stack([jnp.where(valid, (safe_k + c) * 2 + 1, INT32_SENTINEL)
                    for c in cs])                             # [4, V]
    merged = jnp.concatenate(
        [jnp.broadcast_to(kv, (4, v)), qv], axis=1)           # [4, 2V]
    # unstable: values are distinct per row (tag bit separates key/query
    # streams); stable would add a hidden iota column to the sort
    sv = jax.lax.sort(merged, dimension=-1, is_stable=False)
    ok_e = sv != INT32_SENTINEL
    is_key = ((sv & 1) == 0) & ok_e
    is_q = ((sv & 1) == 1) & ok_e
    ck = jnp.cumsum(is_key, axis=-1).astype(jnp.int32)
    cq = jnp.cumsum(is_q, axis=-1).astype(jnp.int32)
    # one flat scatter recovers both rank tables: queries land in [0, 4V)
    # (their index within the plane = cq-1, both streams sorted), keys in
    # [4V, 8V); sentinels drop out of bounds
    poff = (jnp.arange(4, dtype=jnp.int32) * v)[:, None]
    tgt = jnp.where(is_q, poff + cq - 1,
                    jnp.where(is_key, 4 * v + poff + ck - 1, 8 * v))
    val = jnp.where(is_q, ck, cq)
    rs = jnp.zeros(8 * v, jnp.int32).at[tgt.reshape(-1)].set(
        val.reshape(-1), mode='drop', unique_indices=True)
    r = rs[:4 * v].reshape(4, v)        # fwd:  #{k <= k_i + C}
    s = rs[4 * v:].reshape(4, v)        # mir:  #{k <= k_i - C - 1}

    # target rows: fwd keys {q-1, q, q+1} lie in [r-2, r]; mirror targets
    # {t-1, t, t+1} with t = k_i - C lie in [s-1, s+1]
    base_f = jnp.clip(r - 2, 0, max(v - 3, 0))                # [4, V]
    base_m = jnp.clip(s - 1, 0, max(v - 3, 0))

    # keys at the 3 consecutive window rows via ONE [4V]-row gather of a
    # 3-lane shifted-keys table (gather cost is per row: separate keys[win]
    # would be a [12V]-row 1-lane gather)
    sent = jnp.full((2,), INT32_SENTINEL, jnp.int32)
    ktab = jnp.stack([keys,
                      jnp.concatenate([keys[1:], sent[:1]]),
                      jnp.concatenate([keys[2:], sent])], axis=-1)   # [V, 3]
    kw_f = ktab[base_f]                                       # [4, V, 3]
    kw_m = ktab[base_m]

    zc, yc, xc = coords[..., 0], coords[..., 1], coords[..., 2]

    def plane_ok(dz, dy):
        return valid & (zc + dz >= 0) & (zc + dz < gz) \
                     & (yc + dy >= 0) & (yc + dy < gy)

    ok_f = jnp.stack([plane_ok(dz, dy) for dz, dy in planes])   # [4, V]
    ok_m = jnp.stack([plane_ok(-dz, -dy) for dz, dy in planes])
    cvec = jnp.asarray(cs, jnp.int32)[:, None]

    def wsel_of(kw, q_target, ok_pl):
        delta = jnp.where((kw != INT32_SENTINEL) & ok_pl[..., None],
                          kw - q_target[..., None], 99)
        xq = xc[None, :, None]
        bound = jnp.where(delta == -1, xq > 0,
                          jnp.where(delta == 1, xq < gx - 1, True))
        hit = (jnp.abs(delta) <= 1) & bound
        return jnp.where(hit, delta, 2).astype(jnp.int8)

    wsel_f = wsel_of(kw_f, safe_k[None] + cvec, ok_f)         # [4, V, 3]
    wsel_m = wsel_of(kw_m, safe_k[None] - cvec, ok_m)

    # center plane: x-neighbors sit at rows i-1 / i+1 exactly
    nxt = jnp.minimum(arange_v + 1, v - 1)
    prv = jnp.maximum(arange_v - 1, 0)
    ok_p = valid & (keys[nxt] == keys + 1) & ((keys + 1) % gx != 0) & (arange_v + 1 < v)
    ok_m_c = valid & (keys[prv] == keys - 1) & (keys % gx != 0) & (arange_v > 0)
    base_c, wsel_c = _base_wsel_from_rows(
        jnp.where(ok_m_c, arange_v - 1, INT32_SENTINEL),
        jnp.where(valid, arange_v, INT32_SENTINEL),
        jnp.where(ok_p, arange_v + 1, INT32_SENTINEL), v)

    # assemble raster plane order: planes 0..3 are mirrors of 8..5, plane 4 is
    # the center, planes 5..8 are the searched ones in `planes` order
    # (k raster index (dz+1)*3 + (dy+1): (0,1)->5, (1,-1)->6, (1,0)->7,
    # (1,1)->8; mirrors land at 8-p).
    order_f = {5: 0, 6: 1, 7: 2, 8: 3}
    base_rows, wsel_rows = [], []
    for p in range(9):
        if p == 4:
            base_rows.append(base_c)
            wsel_rows.append(wsel_c)
        elif p in order_f:
            base_rows.append(base_f[order_f[p]])
            wsel_rows.append(wsel_f[order_f[p]])
        else:
            fi = order_f[8 - p]
            base_rows.append(base_m[fi])
            wsel_rows.append(wsel_m[fi])
    return _nbidx_from_base_wsel(jnp.stack(base_rows), jnp.stack(wsel_rows))


def build_planar_k3_direct(st: SparseTensor) -> PlanarRulebook:
    """Planar subm structure for k=3 directly from key-sorted coords — the
    production path of build_unet_plans (equivalent to
    planar_from_k3(build_subm_rulebook(st, 3, assume_sorted=True)))."""
    in_idx = jax.vmap(partial(_planar_k3_direct_single,
                              spatial_shape=st.spatial_shape))(st.coords)
    return PlanarRulebook(in_idx=in_idx)


def apply_subm(features: jax.Array, rulebook, weights: jax.Array,
               out_mask: jax.Array, compute_dtype=None) -> jax.Array:
    """Dispatch a 3^3 conv to the planar fast path, the candidate-compact
    inverse path, or the generic gather-GEMM path, depending on the rulebook
    type. weights [27, Cin, Cout] either way (checkpoint-compatible)."""
    if isinstance(rulebook, PlanarRulebook):
        return apply_planar_subm_conv(features, rulebook, weights, out_mask,
                                      compute_dtype)
    if isinstance(rulebook, InverseRulebook):
        return apply_inverse_conv(features, rulebook, weights, out_mask,
                                  compute_dtype)
    if isinstance(rulebook, StridedRulebook):
        return apply_strided_conv(features, rulebook, weights, out_mask,
                                  compute_dtype)
    return apply_sparse_conv(features, rulebook, weights, out_mask,
                             compute_dtype)




def planar_from_k3(rulebook: Rulebook) -> PlanarRulebook:
    """The k=3 subm rulebook IS the execution structure (same [B, 27, V]
    layout); wrapping it re-dispatches execution to the custom-VJP subm path
    (mirror-symmetry backward instead of the checkpointed generic path whose
    autodiff would emit scatter-adds)."""
    assert rulebook.in_idx.shape[1] == 27, rulebook.in_idx.shape
    return PlanarRulebook(in_idx=rulebook.in_idx)


# the 24 non-center offsets in 3 gather groups (center plane 12/13/14 uses
# row shifts instead of gathers — 1/9 of the rows for free)
_SIDE_OFFS = tuple(k for k in range(27) if k not in (12, 13, 14))
_SIDE_GROUPS = tuple(_SIDE_OFFS[8 * g:8 * (g + 1)] for g in range(3))


def _center_neighbors(x, in_idx):
    """nb_{12,13,14}(x) [B, 3, V, C] by row shifts: in sorted-key order the
    center plane's dx = -1/0/+1 neighbors sit at rows u-1/u/u+1 exactly, so
    two shifts + presence masks (in_idx rows >= 0) replace 3V gathered rows."""
    b, v, c = x.shape
    pm = (in_idx[:, 12] >= 0)[..., None]
    p0 = (in_idx[:, 13] >= 0)[..., None]
    pp = (in_idx[:, 14] >= 0)[..., None]
    z = jnp.zeros((b, 1, c), x.dtype)
    xm = jnp.where(pm, jnp.concatenate([z, x[:, :-1]], axis=1), 0)
    x0 = jnp.where(p0, x, 0)
    xp = jnp.where(pp, jnp.concatenate([x[:, 1:], z], axis=1), 0)
    return jnp.stack([xm, x0, xp], axis=1)                   # [B, 3, V, C]


def _group_neighbors(x_padded, in_idx, grp):
    """nb_k(x) for the 8 offsets of one gather group: ONE take_along_axis of
    8V rows (row gathers run ~9ns/row vs ~56ns for the retired [3, C]-window
    dynamic-slice gathers; grouping lets XLA overlap them with the GEMMs)."""
    b = x_padded.shape[0]
    v = in_idx.shape[2]
    c = x_padded.shape[-1]
    idx = in_idx[:, list(grp)]                               # [B, 8, V]
    flat = jnp.where(idx >= 0, idx, v).reshape(b, 8 * v)
    g = jnp.take_along_axis(x_padded, flat[..., None], axis=1)
    return g.reshape(b, 8, v, c)


_DN_GEMM = (((1, 3), (0, 1)), ((), ()))     # [B,G,V,Ci] x [G,Ci,Co] -> [B,V,Co]
_DN_DW = (((0, 2), (0, 1)), ((), ()))       # [B,G,V,Co] x [B,V,Ci] -> [G,Co,Ci]


def _subm_apply(x, w27, in_idx, out_mask, out_dtype):
    """Forward body: x [B,V,Cin] (compute dtype), w27 [27,Cin,Cout]."""
    b, v, cin = x.shape
    xp = jnp.concatenate([x, jnp.zeros((b, 1, cin), x.dtype)], axis=1)
    ctr = _center_neighbors(x, in_idx)
    acc = jax.lax.dot_general(ctr, w27[12:15], dimension_numbers=_DN_GEMM,
                              preferred_element_type=jnp.float32)
    for grp in _SIDE_GROUPS:
        g = _group_neighbors(xp, in_idx, grp)
        acc = acc + jax.lax.dot_general(
            g, w27[np.asarray(grp)], dimension_numbers=_DN_GEMM,
            preferred_element_type=jnp.float32)
    out = acc.astype(out_dtype)
    return jnp.where(out_mask[..., None], out, 0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _subm_conv_vjp(compute_dtype, features, weights, in_idx, out_mask):
    cd = compute_dtype
    x = features if cd is None else features.astype(cd)
    w = weights if cd is None else weights.astype(cd)
    return _subm_apply(x, w, in_idx, out_mask, features.dtype)


def _subm_conv_fwd(compute_dtype, features, weights, in_idx, out_mask):
    y = _subm_conv_vjp(compute_dtype, features, weights, in_idx, out_mask)
    return y, (features, weights, in_idx, out_mask)


def _subm_conv_bwd(compute_dtype, res, dout):
    """Hand-written transpose via the subm symmetry (o reads u at offset k <=>
    u reads o at offset 26-k), so the SAME rulebook serves the backward:

      dx[u] = sum_k nb_k(g)[u] @ W[26-k]^T      (mirrored gather-GEMM)
      dW[26-k] = sum_u x[u] (x) nb_k(g)[u]      (reuses the dx pass's nb(g))

    ONE gather of the cotangent per offset group — x is never gathered and
    nothing scatters (XLA's autodiff of the forward gather would emit a
    serialized scatter-add)."""
    features, weights, in_idx, out_mask = res
    cd = compute_dtype
    x = features if cd is None else features.astype(cd)
    w = weights if cd is None else weights.astype(cd)
    b, v, cin = x.shape
    cout = w.shape[-1]
    g0 = jnp.where(out_mask[..., None], dout, 0)
    g = g0 if cd is None else g0.astype(cd)
    gp = jnp.concatenate([g, jnp.zeros((b, 1, cout), g.dtype)], axis=1)

    dws = [None] * 27
    # center plane: nb_{12,13,14}(g) by row shifts; mirror of k is 26-k
    ctr_g = _center_neighbors(g, in_idx)                     # [B,3,V,Co]
    wm_ctr = jnp.stack([w[14], w[13], w[12]]).swapaxes(1, 2)  # [3,Co,Ci]
    acc_dx = jax.lax.dot_general(ctr_g, wm_ctr, dimension_numbers=_DN_GEMM,
                                 preferred_element_type=jnp.float32)
    dw_ctr = jax.lax.dot_general(ctr_g, x, dimension_numbers=_DN_DW,
                                 preferred_element_type=jnp.float32)
    for j, k in enumerate((12, 13, 14)):
        dws[26 - k] = dw_ctr[j].swapaxes(0, 1)               # [Ci, Co]

    for grp in _SIDE_GROUPS:
        nb_g = _group_neighbors(gp, in_idx, grp)             # [B,8,V,Co]
        wm = jnp.stack([w[26 - k] for k in grp]).swapaxes(1, 2)
        acc_dx = acc_dx + jax.lax.dot_general(
            nb_g, wm, dimension_numbers=_DN_GEMM,
            preferred_element_type=jnp.float32)
        dwp = jax.lax.dot_general(nb_g, x, dimension_numbers=_DN_DW,
                                  preferred_element_type=jnp.float32)
        for j, k in enumerate(grp):
            dws[26 - k] = dwp[j].swapaxes(0, 1)
    dx = jnp.where(out_mask[..., None], acc_dx.astype(features.dtype), 0)
    dw = jnp.stack(dws).astype(weights.dtype)                # [27, Cin, Cout]
    zi = np.zeros(in_idx.shape, dtype=jax.dtypes.float0)
    zm = np.zeros(out_mask.shape, dtype=jax.dtypes.float0)
    return dx, dw, zi, zm


_subm_conv_vjp.defvjp(_subm_conv_fwd, _subm_conv_bwd)


def apply_planar_subm_conv(features: jax.Array, rulebook: PlanarRulebook,
                           weights: jax.Array, out_mask: jax.Array,
                           compute_dtype=None) -> jax.Array:
    """features [B, V, Cin] in sorted-key order, weights [27, Cin, Cout] in
    raster (dz, dy, dx) order -> [B, V, Cout] in the same sorted order.
    Exactly equivalent to apply_sparse_conv with the k=3 subm rulebook; carries
    the mirror-symmetry custom VJP (see _subm_conv_bwd)."""
    cd = None if compute_dtype is None else jnp.dtype(compute_dtype)
    return _subm_conv_vjp(cd, features, weights, rulebook.in_idx, out_mask)

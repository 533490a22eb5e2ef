"""Sparse window partition + region batching (SST/SWFormer machinery).

TPU-native redesign of the reference's window pipeline
(SparseWindowPartitionLayer, seg3d/models/layers/point_transformer_layer.py:11-220
+ seg3d/utils/swformer_utils.py):

  1. assign every voxel a window id for shift-0 and half-window shift-1
     (get_window_coors parity, swformer_utils.py:109-154);
  2. bucket windows by occupancy into 4 levels with per-level max_tokens and
     drop overflow voxels (batching_single_shift, keep both shifts' drops —
     point_transformer_layer.py:71-139);
  3. build flat<->window scatter indices per level (get_flat2win_inds,
     swformer_utils.py:8-31).

Differences forced by static shapes: the per-level window count is capped at a
configured capacity (windows beyond it drop their voxels, logged via
`num_windows`), and in-window token order is the deterministic sort rank
instead of the reference's atomic-counter order (SURVEY.md §5, §7.3).

Everything here is per-sample and vmapped by callers; one argsort per
(shift, level) provides window ranks and in-window ranks simultaneously.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .scatter import cummax

INT32_MAX = jnp.iinfo(jnp.int32).max


class LevelSpec(NamedTuple):
    max_tokens: int      # T_l
    lower: int           # occupancy range [lower, upper)
    upper: int
    num_windows: int     # static window capacity W_l


class ShiftPartition(NamedTuple):
    """Per-shift result. All arrays [B, V] unless noted."""
    scatter_idx: tuple     # per level: [B, V] slot into W_l*T_l, -1 elsewhere
    level: jax.Array       # [B, V] bucket level, -1 for dropped/invalid
    coors_in_win: jax.Array  # [B, V, 3] (z, y, x) position inside the window
    num_windows: jax.Array   # [B, L] true distinct windows per level (pre-cap)


class WindowPartition(NamedTuple):
    """Pure-array pytree (LevelSpecs stay OUTSIDE so they remain static across
    jit/remat boundaries)."""
    shifts: tuple          # (ShiftPartition, ShiftPartition)
    keep: jax.Array        # [B, V] final keep mask (both shifts' caps)


def make_level_specs(batching_info, voxel_capacity: int, fraction) -> tuple:
    """Static per-level window capacities: level l may hold up to
    `fraction[l] * voxel_capacity` tokens (a scalar fraction applies to every
    level). Window counts round up to the level's LARGEST possible
    fused-attention group size (attention_group at default channel budget);
    every runtime group size divides it, and large-T levels round to 1 instead
    of a blanket constant (which would inflate small configs 8x)."""
    from .attention import attention_group
    specs = []
    if not isinstance(fraction, (list, tuple)):
        fraction = [fraction] * len(batching_info)
    if len(fraction) != len(batching_info):
        # a short list would silently leave buckets uncovered (level -1 -> all
        # their voxels dropped); fail loudly instead (ADVICE r3)
        raise ValueError(
            f'fraction list has {len(fraction)} entries for '
            f'{len(batching_info)} buckets')
    for (_, (max_tokens, lower, upper)), frac in zip(batching_info, fraction):
        w = max(1, int(math.ceil(frac * voxel_capacity / max_tokens)))
        g = attention_group(max_tokens)
        w = (w + g - 1) // g * g
        specs.append(LevelSpec(max_tokens, lower, upper, w))
    return tuple(specs)


def window_coords(coords, valid, sparse_shape, window_shape, do_shift: bool):
    """Per-voxel window id + in-window coords (swformer_utils.py:109-154).
    coords [V,3] zyx; sparse_shape (gz,gy,gx); window_shape (wx,wy,wz)."""
    gz, gy, gx = sparse_shape
    wx, wy, wz = window_shape
    if gz == wz:
        sz = 0
    else:
        sz = wz // 2 if do_shift else 0
    sx = wx // 2 if do_shift else 0
    sy = wy // 2 if do_shift else 0

    z = coords[..., 0] + sz
    y = coords[..., 1] + sy
    x = coords[..., 2] + sx
    nwx = int(math.ceil(gx / wx)) + 1
    nwy = int(math.ceil(gy / wy)) + 1
    nwz = int(math.ceil(gz / wz)) + 1
    win = (x // wx) * (nwy * nwz) + (y // wy) * nwz + (z // wz)
    win = jnp.where(valid, win, INT32_MAX).astype(jnp.int32)
    ciw = jnp.stack([z % wz, y % wy, x % wx], axis=-1).astype(jnp.int32)
    return win, ciw, nwx * nwy * nwz


def _bucket_level(occ, valid, levels: Sequence[LevelSpec]):
    lvl = jnp.full(occ.shape, -1, jnp.int32)
    cap = jnp.zeros(occ.shape, jnp.int32)
    for i, s in enumerate(levels):
        m = valid & (occ >= s.lower) & (occ < s.upper)
        lvl = jnp.where(m, i, lvl)
        cap = jnp.where(m, s.max_tokens, cap)
    return lvl, cap


class _SortedStructure(NamedTuple):
    """ONE argsort per shift; every later phase (cap-drops with different
    masks, per-level scatter indices over the final set) is a segment scan
    over this fixed order. Replaces the previous 5 argsorts per shift."""
    order: jax.Array      # [V] original index of sorted row
    inv: jax.Array        # [V] sorted position of original row (order's inverse)
    is_new: jax.Array     # [V] first row of its window (sorted order)


def _sorted_structure(win_id, valid) -> _SortedStructure:
    v = win_id.shape[0]
    key = jnp.where(valid, win_id, INT32_MAX)
    # unstable: in-window voxel order is semantically arbitrary (the reference
    # uses nondeterministic atomics here); the fixed sorting network keeps
    # run-to-run determinism, and stable would pay a hidden iota column
    order = jnp.argsort(key, stable=False).astype(jnp.int32)
    sk = key[order]
    is_new = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    # the ONE scatter per shift: every sorted->original back-permutation
    # downstream is then a row-GATHER via inv (scatters run ~4x slower than
    # gathers on v5e)
    inv = jnp.zeros(v, jnp.int32).at[order].set(
        jnp.arange(v, dtype=jnp.int32), unique_indices=True)
    return _SortedStructure(order=order, inv=inv,
                            is_new=is_new & (sk != INT32_MAX))


def _masked_inner_sorted(is_new, ms):
    """ms: 0/1 int32 mask in SORTED order -> (inner rank among mask-True rows
    of my window, first-kept-row flag), both in sorted order — pure scans, no
    row-permutation ops."""
    c = jnp.cumsum(ms)
    e = c - ms                                      # exclusive global prefix
    run_e = cummax(jnp.where(is_new, e, -1))        # e at my window's 1st row
    inner_s = e - jnp.maximum(run_e, 0)
    return inner_s, (ms > 0) & (inner_s == 0)


def _single_shift_keep(ss: _SortedStructure, valid, levels):
    """batching_single_shift (point_transformer_layer.py:71-87): keep_mask +
    level per voxel.

    Window occupancy comes from pure scans over the shift's sorted order
    (occ = valid-prefix at next window start minus at my window start) instead
    of a scatter-add into the [num_win_total] dense window grid + gather back
    (~190k-slot grids at stage 1 — the grid ops cost more than the [V] scans).
    One 1-col row-gather in, one packed 2-col row-gather out."""
    ms = valid.astype(jnp.int32)[ss.order]
    e = jnp.cumsum(ms) - ms                         # exclusive valid prefix
    total = e[-1] + ms[-1]
    start_e = jnp.maximum(cummax(jnp.where(ss.is_new, e, -1)), 0)
    # e at the NEXT window start (exclusive suffix-min of window-start marks);
    # the last window closes at `total` (invalid rows sort to the tail)
    g = jnp.where(ss.is_new, e, INT32_MAX)
    # exclusive suffix-min via lax.cummin(reverse=True) — same optimized
    # lowering as cumsum, vs the slice/pad chains of a generic
    # associative_scan over a reversed copy
    sm = jax.lax.cummin(g, axis=0, reverse=True)    # inclusive suffix min
    nxt = jnp.concatenate([sm[1:], jnp.full((1,), INT32_MAX, g.dtype)])
    occ_s = jnp.minimum(nxt, total) - start_e
    lvl_s, cap_s = _bucket_level(occ_s, ms > 0, levels)
    inner_s = e - start_e
    keep_s = (ms > 0) & (inner_s < cap_s)
    packed = jnp.stack([keep_s.astype(jnp.int32), lvl_s], -1)[ss.inv]
    return packed[:, 0] > 0, packed[:, 1]


def _shift_partition(ss: _SortedStructure, final, lvl, levels):
    """Per-level scatter indices over the final kept set, all derived from the
    shift's single sorted order — one packed row-gather in, one packed
    row-scatter out.

    inner ranks use mask=final only: a window's voxels all share one level, so
    final & (lvl==li) within a window equals final. Window ranks within level
    li = running count of 'first kept row' markers of level-li windows,
    propagated window-wide by a cummax (a window's rows are contiguous in
    sorted order and level-li window ranks are strictly increasing)."""
    v = ss.order.shape[0]
    packed = jnp.stack([final.astype(jnp.int32), lvl], -1)[ss.order]
    fin_s, lv = packed[:, 0], packed[:, 1]
    inner_s, first_s = _masked_inner_sorted(ss.is_new, fin_s)
    idx_cols, num_windows = [], []
    for li, s in enumerate(levels):
        marks = (first_s & (lv == li)).astype(jnp.int32)
        wr_sorted = jnp.cumsum(marks) - 1
        carried = cummax(jnp.where(marks > 0, wr_sorted, -1))
        ok = ((fin_s > 0) & (lv == li) & (carried >= 0) &
              (carried < s.num_windows) & (inner_s < s.max_tokens))
        idx_cols.append(jnp.where(ok, carried * s.max_tokens + inner_s,
                                  -1).astype(jnp.int32))
        num_windows.append(jnp.sum(marks).astype(jnp.int32))
    idx_s = jnp.stack(idx_cols, axis=-1)            # [V, L] sorted order
    idx = idx_s[ss.inv]                             # back-permute by gather
    return tuple(idx[:, li] for li in range(len(levels))), jnp.stack(num_windows)


def build_window_partition(coords, valid, sparse_shape, window_shape,
                           levels: Sequence[LevelSpec]):
    """Single-sample full dual-shift partition (vmap over batch upstream).

    Mirrors batching_voxel (point_transformer_layer.py:89-139): shift-0 caps
    drop first, shift-1 caps drop from the survivors, and both shifts' final
    indices are built over the surviving set. TWO argsorts total (one per
    shift); all cap/partition phases are segment scans over those orders.
    """
    win0, ciw0, _ = window_coords(coords, valid, sparse_shape, window_shape, False)
    win1, ciw1, _ = window_coords(coords, valid, sparse_shape, window_shape, True)

    ss0 = _sorted_structure(win0, valid)
    ss1 = _sorted_structure(win1, valid)

    keep0, lvl0 = _single_shift_keep(ss0, valid, levels)
    keep1, lvl1 = _single_shift_keep(ss1, keep0, levels)
    final = keep1  # keep1 already includes keep0

    s0_idx, s0_nw = _shift_partition(ss0, final, lvl0, levels)
    s1_idx, s1_nw = _shift_partition(ss1, final, lvl1, levels)

    shift0 = ShiftPartition(scatter_idx=s0_idx, level=jnp.where(final, lvl0, -1),
                            coors_in_win=ciw0, num_windows=s0_nw)
    shift1 = ShiftPartition(scatter_idx=s1_idx, level=jnp.where(final, lvl1, -1),
                            coors_in_win=ciw1, num_windows=s1_nw)
    return WindowPartition(shifts=(shift0, shift1), keep=final)


def batched_window_partition(coords, valid, sparse_shape, window_shape, levels):
    f = lambda c, v: build_window_partition(c, v, sparse_shape, window_shape, levels)
    return jax.vmap(f)(coords, valid)


def _permute_rows_fwd_impl(x, fwd_idx):
    # missing rows read an appended zero row: one [B,1,C] concat replaces a
    # full [B,N,C]-sized select after the gather
    b, v, c = x.shape
    xp = jnp.concatenate([x, jnp.zeros((b, 1, c), x.dtype)], axis=1)
    idx = jnp.where(fwd_idx >= 0, fwd_idx, v)
    return jnp.take_along_axis(xp, idx[..., None], axis=1)


@jax.custom_vjp
def permute_rows(x, fwd_idx, bwd_idx):
    """Partial row permutation with an all-gather autodiff rule.

    out[b, i] = x[b, fwd_idx[b, i]] (zero row where fwd_idx < 0). bwd_idx must
    be the inverse map (bwd_idx[b, j] = i iff fwd_idx[b, i] = j, -1 where row
    j is never read). The VJP is then dx[b, j] = dout[b, bwd_idx[b, j]] —
    a row-GATHER, where plain autodiff of take_along_axis would emit a
    row-scatter-add (~4x slower on v5e). Used for the flat<->window slot
    permutations whose inverse the partition already knows."""
    return _permute_rows_fwd_impl(x, fwd_idx)


def _permute_rows_fwd(x, fwd_idx, bwd_idx):
    return _permute_rows_fwd_impl(x, fwd_idx), (fwd_idx, bwd_idx, x.shape[1])


def _permute_rows_bwd(res, dout):
    fwd_idx, bwd_idx, _ = res
    b, n, c = dout.shape
    dp = jnp.concatenate([dout, jnp.zeros((b, 1, c), dout.dtype)], axis=1)
    idx = jnp.where(bwd_idx >= 0, bwd_idx, n)
    dx = jnp.take_along_axis(dp, idx[..., None], axis=1)
    import numpy as _np
    zf = _np.zeros(fwd_idx.shape, dtype=jax.dtypes.float0)
    zb = _np.zeros(bwd_idx.shape, dtype=jax.dtypes.float0)
    return dx, zf, zb


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


# ---------------------------------------------------------------------------
# flat <-> window scatter/gather (flat2window/window2flat, swformer_utils.py:34-105)
# ---------------------------------------------------------------------------

def flat_to_window(feat, scatter_idx, spec: LevelSpec):
    """feat [B, V, C], scatter_idx [B, V] -> [B, W, T, C] (zeros elsewhere).

    Invalid rows scatter to an OUT-OF-BOUNDS index under mode='drop': an
    in-bounds trash slot would receive tens of thousands of colliding writes,
    which serializes the TPU scatter (measured 8ms -> 0.04ms)."""
    b, v, c = feat.shape
    size = spec.num_windows * spec.max_tokens
    tgt = jnp.where(scatter_idx >= 0, scatter_idx, size)  # size is OOB
    out = jnp.zeros((b, size, c), feat.dtype)
    out = jax.vmap(lambda o, t, f: o.at[t].set(f, mode='drop', unique_indices=True))(
        out, tgt, feat)
    return out.reshape(b, spec.num_windows, spec.max_tokens, c)


def window_mask(scatter_idx, spec: LevelSpec):
    """[B, W, T] bool: which slots hold a real voxel."""
    b, v = scatter_idx.shape
    size = spec.num_windows * spec.max_tokens
    tgt = jnp.where(scatter_idx >= 0, scatter_idx, size)
    out = jnp.zeros((b, size), bool)
    out = jax.vmap(lambda o, t: o.at[t].set(True, mode='drop', unique_indices=True))(
        out, tgt)
    return out.reshape(b, spec.num_windows, spec.max_tokens)


def window_to_flat(win_feat, scatter_idx, spec: LevelSpec):
    """[B, W, T, C] -> [B, V, C], zero where scatter_idx == -1."""
    b = win_feat.shape[0]
    c = win_feat.shape[-1]
    flat = win_feat.reshape(b, spec.num_windows * spec.max_tokens, c)
    flat = jnp.concatenate([flat, jnp.zeros((b, 1, c), flat.dtype)], axis=1)
    idx = jnp.where(scatter_idx >= 0, scatter_idx,
                    spec.num_windows * spec.max_tokens)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def positional_embedding(coors_in_win, window_shape, feat_dim: int,
                         pos_temperature: float = 1000.0, normalize_pos: bool = False):
    """Sine/cosine in-window embedding (get_pos_embed,
    point_transformer_layer.py:151-207). coors_in_win [..., 3] (z,y,x)."""
    wx, wy, wz = window_shape
    ndim = 2 if wz in (0, 1) else 3
    z = coors_in_win[..., 0].astype(jnp.float32) - wz / 2
    y = coors_in_win[..., 1].astype(jnp.float32) - wy / 2
    x = coors_in_win[..., 2].astype(jnp.float32) - wx / 2
    if normalize_pos:
        x = x / wx * 2 * math.pi
        y = y / wy * 2 * math.pi
        z = z / wz * 2 * math.pi

    pos_length = feat_dim // ndim
    i = jnp.arange(pos_length, dtype=jnp.float32)
    inv_freq = pos_temperature ** (2 * jnp.floor(i / 2) / pos_length)

    # inv_freq pairs lanes (floor(i/2)), so the reference's
    # stack([sin(e[0::2]), cos(e[1::2])]).reshape interleave is EXACTLY an
    # even/odd lane select: out[2j] = sin(e[2j]), out[2j+1] = cos(e[2j+1]).
    # The stride-2 LANE slices are Mosaic-hostile — they lowered to
    # element-wise gathers costing ~54 ms/step at stage-1 V (train profile
    # r5, window.py embed); the where-select form is pure VPU work.
    # (pos_length is even for every feat_dim/ndim in the config space; the
    # reference's slice form silently drops the last lane when odd, so odd
    # lengths were never representable anyway.)
    assert pos_length % 2 == 0, pos_length
    lane_even = (jnp.arange(pos_length, dtype=jnp.int32) % 2) == 0

    def embed(u):
        e = u[..., None] / inv_freq          # [..., pos_length]
        return jnp.where(lane_even, jnp.sin(e), jnp.cos(e))

    parts = [embed(x), embed(y)] + ([embed(z)] if ndim == 3 else [])
    pe = jnp.concatenate(parts, axis=-1)
    pad = feat_dim - pe.shape[-1]
    if pad:
        pe = jnp.concatenate([pe, jnp.zeros(pe.shape[:-1] + (pad,), pe.dtype)], axis=-1)
    return pe

"""Window partition: parity of window assignment with a python oracle, static
capacity semantics, scatter/gather round trips, positional embedding shape."""

import jax
import jax.numpy as jnp
import numpy as np

from openseg3d_tpu.ops.window import (
    make_level_specs, build_window_partition, window_coords, flat_to_window,
    window_to_flat, window_mask, positional_embedding, LevelSpec)

BATCHING = (
    (0, (2, 0, 2)),     # level 0: windows with <2 voxels, cap 2 tokens
    (1, (4, 2, 4)),     # level 1
    (2, (8, 4, 100000)),  # level 2
)


def _mk(rng, v_cap, n, shape):
    coords = np.full((v_cap, 3), -1, np.int32)
    lin = rng.choice(shape[0] * shape[1] * shape[2], size=n, replace=False)
    coords[:n] = np.stack([lin // (shape[1] * shape[2]),
                           (lin // shape[2]) % shape[1],
                           lin % shape[2]], 1)
    valid = coords[:, 0] >= 0
    return jnp.asarray(coords), jnp.asarray(valid)


def test_window_assignment_matches_oracle():
    rng = np.random.RandomState(0)
    shape = (8, 12, 12)      # gz, gy, gx
    wshape = (4, 4, 4)
    coords, valid = _mk(rng, 64, 50, shape)
    wc = jax.jit(window_coords, static_argnums=(2, 3, 4))
    win, ciw, ntot = wc(coords, valid, shape, wshape, False)
    win1, ciw1, _ = wc(coords, valid, shape, wshape, True)
    c = np.array(coords)
    for i in range(50):
        z, y, x = c[i]
        assert np.array(ciw)[i].tolist() == [z % 4, y % 4, x % 4]
        # shift-1: coords shifted by half window
        assert np.array(ciw1)[i].tolist() == [(z + 2) % 4, (y + 2) % 4, (x + 2) % 4]
        # same window iff same (x//4, y//4, z//4)
    w = np.array(win)[:50]
    key = (c[:50, 2] // 4) * 1000000 + (c[:50, 1] // 4) * 1000 + (c[:50, 0] // 4)
    for i in range(50):
        for j in range(50):
            assert (w[i] == w[j]) == (key[i] == key[j])


def test_partition_token_caps_and_round_trip():
    rng = np.random.RandomState(1)
    shape = (8, 12, 12)
    levels = make_level_specs(BATCHING, 64, fraction=1.0)
    coords, valid = _mk(rng, 64, 48, shape)
    part = jax.jit(lambda c, v: build_window_partition(c, v, shape, (4, 4, 4), levels))(
        coords, valid)

    # every kept voxel appears in exactly one level's scatter index per shift
    for sp in part.shifts:
        idx = np.stack([np.array(i) for i in sp.scatter_idx])   # [L, V]
        kept = np.array(part.keep)
        assigned = (idx >= 0).sum(axis=0)
        np.testing.assert_array_equal(assigned[kept], 1)
        np.testing.assert_array_equal(assigned[~kept], 0)
        # no slot collisions within a level
        for li, s in enumerate(levels):
            used = idx[li][idx[li] >= 0]
            assert len(np.unique(used)) == len(used)
            assert used.max(initial=-1) < s.num_windows * s.max_tokens

    # scatter -> gather round trip reproduces features on kept voxels
    feat = jnp.asarray(rng.randn(1, 64, 8).astype(np.float32))
    sp = part.shifts[0]
    total = jnp.zeros_like(feat)
    for li, s in enumerate(levels):
        sidx = sp.scatter_idx[li][None]
        w3 = flat_to_window(feat, sidx, s)
        m3 = window_mask(sidx, s)
        assert int(m3.sum()) == int((sp.scatter_idx[li] >= 0).sum())
        total = total + window_to_flat(w3, sidx, s)
    kept = np.array(part.keep)
    np.testing.assert_allclose(np.array(total[0])[kept], np.array(feat[0])[kept])
    np.testing.assert_allclose(np.array(total[0])[~kept], 0)


def test_max_tokens_cap_drops_overflow():
    # 10 voxels all in one window; level cap is 8 tokens -> 2 dropped
    coords = np.zeros((16, 3), np.int32)
    coords[:10] = [[0, 0, i % 4] for i in range(10)]
    coords[:10, 1] = [i // 4 for i in range(10)]
    coords[10:] = -1
    valid = coords[:, 0] >= 0
    levels = make_level_specs(BATCHING, 16, fraction=1.0)
    part = jax.jit(lambda c, v: build_window_partition(
        c, v, (8, 12, 12), (4, 4, 4), levels))(jnp.asarray(coords), jnp.asarray(valid))
    assert int(part.keep.sum()) == 8


def test_positional_embedding_shape_and_range():
    ciw = jnp.asarray(np.random.RandomState(0).randint(0, 4, (2, 32, 3)))
    pe = jax.jit(lambda c: positional_embedding(c, (10, 10, 8), 48))(ciw)
    assert pe.shape == (2, 32, 48)
    assert np.all(np.abs(np.array(pe)) <= 1.0 + 1e-6)


def test_permute_rows_grads_match_autodiff_oracle():
    """permute_rows' all-gather VJP == autodiff of the take_along_axis +
    mask formulation (which transposes to a row-scatter-add)."""
    import jax
    import jax.numpy as jnp
    from openseg3d_tpu.ops.window import permute_rows
    rng = np.random.RandomState(5)
    b, v, s, c = 2, 24, 40, 6
    # partial injection: some slots empty (-1), some voxels dropped (-1)
    fwd = np.full((b, s), -1, np.int32)      # slot -> voxel
    bwd = np.full((b, v), -1, np.int32)      # voxel -> slot
    for bi in range(b):
        vox = rng.permutation(v)[:20]
        slots = rng.permutation(s)[:20]
        fwd[bi, slots] = vox
        bwd[bi, vox] = slots
    x = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
    w = jnp.asarray(rng.randn(b, s, c).astype(np.float32))
    fwd_j, bwd_j = jnp.asarray(fwd), jnp.asarray(bwd)

    def f_new(x):
        return jnp.sum(permute_rows(x, fwd_j, bwd_j) * w)

    def f_ref(x):
        g = jnp.take_along_axis(x, jnp.maximum(fwd_j, 0)[..., None], axis=1)
        g = jnp.where((fwd_j >= 0)[..., None], g, 0)
        return jnp.sum(g * w)

    o_new, g_new = jax.value_and_grad(f_new)(x)
    o_ref, g_ref = jax.value_and_grad(f_ref)(x)
    np.testing.assert_allclose(float(o_new), float(o_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_level_assignment_matches_numpy_occupancy_oracle():
    """The scan-based occupancy (valid-prefix differences over the sorted
    order) must equal a straight numpy per-window count, including the
    masked-rerun case (shift-1 occupancy counted over shift-0 survivors)."""
    rng = np.random.RandomState(7)
    shape = (8, 12, 12)
    levels = make_level_specs(BATCHING, 96, fraction=1.0)
    # duplicate-heavy coords so windows have varied occupancy
    coords = np.full((96, 3), -1, np.int32)
    n = 80
    coords[:n, 0] = rng.randint(0, 8, n)
    coords[:n, 1] = rng.randint(0, 12, n)
    coords[:n, 2] = rng.randint(0, 12, n)
    valid = coords[:, 0] >= 0
    part = jax.jit(lambda c, v: build_window_partition(c, v, shape, (4, 4, 4),
                                                       levels))(
        jnp.asarray(coords), jnp.asarray(valid))

    def np_levels(mask, shift):
        win = np.array(window_coords(jnp.asarray(coords), jnp.asarray(mask),
                                     shape, (4, 4, 4), shift)[0])
        occ = {}
        for i in range(96):
            if mask[i]:
                occ[win[i]] = occ.get(win[i], 0) + 1
        lvl = np.full(96, -1)
        for i in range(96):
            if mask[i]:
                for li, (_, (t, lo, hi)) in enumerate(BATCHING):
                    if lo <= occ[win[i]] < hi:
                        lvl[i] = li
        return lvl

    kept = np.array(part.keep)
    lvl0 = np_levels(valid, False)
    np.testing.assert_array_equal(np.array(part.shifts[0].level)[kept],
                                  lvl0[kept])
    lvl1 = np_levels(kept, True)   # shift-1 occupancy over shift-0 survivors
    np.testing.assert_array_equal(np.array(part.shifts[1].level)[kept],
                                  lvl1[kept])
    assert (np.array(part.shifts[0].level)[~kept] == -1).all()

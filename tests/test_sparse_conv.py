"""Sparse conv engine vs. dense lax.conv oracle.

Strategy (SURVEY.md §4): build a dense grid from the sparse voxels, run
jax.lax.conv_general_dilated, and compare values at output voxel positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from functools import partial

from openseg3d_tpu.ops.sparse_conv import (
    SparseTensor, build_subm_rulebook, build_downsample, apply_sparse_conv,
    downsample_shape)

# jit everything: eager mode compiles each tiny op separately (slow on CPU);
# in production these always run inside the jitted train step.
build_subm_rulebook = jax.jit(build_subm_rulebook, static_argnums=1)
build_downsample = jax.jit(build_downsample, static_argnums=(1, 2, 3, 4))
apply_sparse_conv = jax.jit(apply_sparse_conv)


def make_sparse(rng, b, v_cap, n_active, shape, c):
    coords = np.full((b, v_cap, 3), -1, dtype=np.int32)
    feats = np.zeros((b, v_cap, c), dtype=np.float32)
    for i in range(b):
        # unique random sites, in ascending key order — the production
        # pipeline invariant (the voxelizer emits sorted slots, downsample
        # outputs are sorted by construction) that the window-form structures
        # (build_planar_k3_direct / build_downsample) rely on
        total = shape[0] * shape[1] * shape[2]
        lin = np.sort(rng.choice(total, size=n_active, replace=False))
        z = lin // (shape[1] * shape[2])
        y = (lin // shape[2]) % shape[1]
        x = lin % shape[2]
        coords[i, :n_active] = np.stack([z, y, x], 1)
        feats[i, :n_active] = rng.randn(n_active, c).astype(np.float32)
    return SparseTensor(features=jnp.array(feats), coords=jnp.array(coords),
                        spatial_shape=shape)


def to_dense(st):
    b, v, c = st.features.shape
    gz, gy, gx = st.spatial_shape
    dense = np.zeros((b, gz, gy, gx, c), np.float32)
    coords = np.array(st.coords)
    feats = np.array(st.features)
    for i in range(b):
        for j in range(v):
            z, y, x = coords[i, j]
            if z >= 0:
                dense[i, z, y, x] = feats[i, j]
    return dense


def dense_conv(dense, w, stride, padding):
    # dense [B, Z, Y, X, C]; w [K^3, Cin, Cout] in raster (dz,dy,dx) order
    k = round(len(w) ** (1 / 3))
    wk = np.array(w).reshape(k, k, k, w.shape[1], w.shape[2])
    out = jax.lax.conv_general_dilated(
        jnp.array(dense), jnp.array(wk),
        window_strides=(stride,) * 3,
        padding=[(padding, padding)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return np.array(out)


@pytest.mark.parametrize('seed', [0, 1])
def test_subm_conv_matches_dense(seed):
    rng = np.random.RandomState(seed)
    shape, cin, cout = (6, 7, 8), 5, 4
    st = make_sparse(rng, b=2, v_cap=40, n_active=30, shape=shape, c=cin)
    w = rng.randn(27, cin, cout).astype(np.float32)

    rb = build_subm_rulebook(st, kernel_size=3)
    out = apply_sparse_conv(st.features, rb, jnp.array(w), st.mask)

    dense_out = dense_conv(to_dense(st), w, stride=1, padding=1)
    coords = np.array(st.coords)
    for i in range(2):
        for j in range(40):
            z, y, x = coords[i, j]
            if z >= 0:
                np.testing.assert_allclose(np.array(out[i, j]), dense_out[i, z, y, x],
                                           rtol=1e-4, atol=1e-4)
            else:
                np.testing.assert_array_equal(np.array(out[i, j]), 0)


def test_downsample_output_set_and_values():
    rng = np.random.RandomState(2)
    shape, cin, cout = (8, 8, 8), 3, 6
    st = make_sparse(rng, b=2, v_cap=50, n_active=35, shape=shape, c=cin)
    w = rng.randn(27, cin, cout).astype(np.float32)

    plan = build_downsample(st, out_capacity=64, kernel_size=3, stride=2, padding=1)
    assert plan.out_shape == downsample_shape(shape, 3, 2, 1) == (4, 4, 4)
    out = apply_sparse_conv(st.features, plan.rule, jnp.array(w),
                            plan.out_coords[..., 0] >= 0)

    dense_out = dense_conv(to_dense(st), w, stride=2, padding=1)

    # exact spconv output set: sites where the conv over the dense grid is
    # structurally reachable from an active input
    dense_in = to_dense(st)
    occ = (np.abs(dense_in).sum(-1) > 0)
    coords = np.array(plan.out_coords)
    for i in range(2):
        active_out = set()
        zz, yy, xx = np.nonzero(occ[i])
        for z, y, x in zip(zz, yy, xx):
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        t = (z + 1 - dz, y + 1 - dy, x + 1 - dx)
                        if all(c % 2 == 0 for c in t):
                            o = tuple(c // 2 for c in t)
                            if all(0 <= o[d] < 4 for d in range(3)):
                                active_out.add(o)
        got = {tuple(c) for c in coords[i] if c[0] >= 0}
        assert got == active_out
        for j, c in enumerate(coords[i]):
            if c[0] >= 0:
                np.testing.assert_allclose(np.array(out[i, j]), dense_out[i, c[0], c[1], c[2]],
                                           rtol=1e-4, atol=1e-4)


def test_inverse_rulebook_round_trip():
    """Inverse conv with identity-ish weights gathers coarse features back to
    every fine voxel whose receptive field is covered."""
    rng = np.random.RandomState(3)
    shape, c = (8, 8, 8), 4
    st = make_sparse(rng, b=1, v_cap=30, n_active=20, shape=shape, c=c)
    plan = build_downsample(st, out_capacity=40)

    coarse_feats = jnp.array(rng.randn(1, 40, c).astype(np.float32))
    coarse_feats = jnp.where((plan.out_coords[..., 0] >= 0)[..., None], coarse_feats, 0)

    # weights: only the offset matching each pair passes features through; sum
    # over offsets of identity weights = sum of contributing coarse neighbors
    from openseg3d_tpu.ops.sparse_conv import apply_inverse_conv
    w = np.stack([np.eye(c, dtype=np.float32)] * 27)
    out = jax.jit(apply_inverse_conv)(coarse_feats, plan.inv_rule,
                                      jnp.array(w), st.mask)

    # oracle: for each fine voxel, sum coarse features at (t + 1 - off)/2
    coords = np.array(st.coords[0])
    ckey = {tuple(c): j for j, c in enumerate(np.array(plan.out_coords[0])) if c[0] >= 0}
    cf = np.array(coarse_feats[0])
    for j, t in enumerate(coords):
        if t[0] < 0:
            continue
        acc = np.zeros(c, np.float32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    p = (t[0] + 1 - dz, t[1] + 1 - dy, t[2] + 1 - dx)
                    if all(v % 2 == 0 for v in p):
                        o = tuple(v // 2 for v in p)
                        if o in ckey:
                            acc += cf[ckey[o]]
        np.testing.assert_allclose(np.array(out[0, j]), acc, rtol=1e-4, atol=1e-4)


def test_inverse_conv_values_and_grads_match_autodiff():
    """apply_inverse_conv (custom VJP: dtable gathered through fwd_idx) must
    match a plain-jnp formulation differentiated by autodiff, for values AND
    both gradients, with non-trivial per-tap weights."""
    from openseg3d_tpu.ops.sparse_conv import apply_inverse_conv
    rng = np.random.RandomState(7)
    shape, cin, cout = (8, 8, 8), 5, 3
    st = make_sparse(rng, b=2, v_cap=40, n_active=30, shape=shape, c=cin)
    plan = build_downsample(st, out_capacity=64)
    vo = 64
    cmask = plan.out_coords[..., 0] >= 0
    x = jnp.array(rng.randn(2, vo, cin).astype(np.float32))
    x = jnp.where(cmask[..., None], x, 0)
    w = jnp.array(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    tgt = jnp.array(rng.randn(2, st.capacity, cout).astype(np.float32))

    # The rulebook arrays are passed as jit ARGUMENTS, matching the real model
    # (sparse_unet builds plans inside the jitted step from runtime coords).
    # Capturing them as closure constants triggers a wrong-code XLA:TPU bug on
    # this toolchain: jit(grad(...)) with compile-time-constant gather indices
    # silently computes a wrong dx (verified: nojit fine, CPU fine, explicit
    # args fine; only constant-index jit grad on the axon TPU backend is off).
    # Reference formulation: a packed (slot*27 + tap) index into a
    # tap-pretransformed table — an independent path from the class-selected
    # production code (tap recovered from the static (pclass, candidate) map).
    def ref(x, w, inv, mask):
        table = jnp.einsum('bvc,kcd->bvkd', x, w).reshape(2, vo * 27, cout)
        table = jnp.concatenate([table, jnp.zeros((2, 1, cout))], axis=1)
        taps = jnp.where(inv.tapok, inv.tap, 0)[inv.pclass]   # [B, Vf, nc]
        taps = taps.transpose(0, 2, 1)                        # [B, nc, Vf]
        idx = jnp.where(inv.rank >= 0, inv.rank * 27 + taps, -1)
        flat = jnp.where(idx >= 0, idx, vo * 27).reshape(2, -1)
        g = jnp.take_along_axis(table, flat[..., None], axis=1)
        out = g.reshape(2, idx.shape[1], -1, cout).sum(axis=1)
        out = jnp.where(mask[..., None], out, 0)
        return jnp.sum(out * tgt)

    def got(x, w, inv, mask):
        y = apply_inverse_conv(x, inv, w, mask)
        return jnp.sum(y * tgt)

    (lr, (gxr, gwr)) = jax.jit(jax.value_and_grad(ref, argnums=(0, 1)))(
        x, w, plan.inv_rule, st.mask)
    (lg, (gxg, gwg)) = jax.jit(jax.value_and_grad(got, argnums=(0, 1)))(
        x, w, plan.inv_rule, st.mask)
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gxg), np.asarray(gxr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gwg), np.asarray(gwr),
                               rtol=1e-4, atol=1e-5)


def test_strided_conv_custom_vjp_matches_autodiff():
    """apply_strided_conv (custom VJP: dx via the compact pair structure with
    per-parity-class transposed taps, dW via class-masked contraction) must
    match autodiff of the plain gather-GEMM apply_sparse_conv for values and
    both gradients."""
    from openseg3d_tpu.ops.sparse_conv import Rulebook, apply_strided_conv
    rng = np.random.RandomState(11)
    shape, cin, cout = (9, 7, 5), 6, 4
    st = make_sparse(rng, b=2, v_cap=48, n_active=40, shape=shape, c=cin)
    plan = build_downsample(st, out_capacity=96)
    cmask = plan.out_coords[..., 0] >= 0
    x = jnp.array(rng.randn(2, 48, cin).astype(np.float32))
    x = jnp.where(st.mask[..., None], x, 0)
    w = jnp.array(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    tgt = jnp.array(rng.randn(2, 96, cout).astype(np.float32))

    def ref(x, w, in_idx, mask):
        y = apply_sparse_conv(x, Rulebook(in_idx), w, mask)
        return jnp.sum(y * tgt)

    def got(x, w, rule, mask):
        y = apply_strided_conv(x, rule, w, mask)
        return jnp.sum(y * tgt)

    lr, (gxr, gwr) = jax.jit(jax.value_and_grad(ref, argnums=(0, 1)))(
        x, w, plan.rule.in_idx, cmask)
    lg, (gxg, gwg) = jax.jit(jax.value_and_grad(got, argnums=(0, 1)))(
        x, w, plan.rule, cmask)
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gxg), np.asarray(gxr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gwg), np.asarray(gwr),
                               rtol=1e-4, atol=1e-5)


def test_capacity_overflow_drops_and_counts():
    rng = np.random.RandomState(4)
    st = make_sparse(rng, b=1, v_cap=64, n_active=60, shape=(8, 8, 8), c=2)
    plan = build_downsample(st, out_capacity=8)
    n_valid = int((np.array(plan.out_coords)[0, :, 0] >= 0).sum())
    assert n_valid == 8
    assert int(plan.num_out[0]) >= 8  # true count reported for drop logging


def test_planar_subm_matches_gather_gemm():
    """The sorted-x planar fast path is exactly the k=3 subm conv."""
    from openseg3d_tpu.ops.sparse_conv import (
        sort_by_key, unsort_by_order, build_planar_subm_rulebook,
        apply_planar_subm_conv)
    rng = np.random.RandomState(11)
    st = make_sparse(rng, b=2, v_cap=128, n_active=100, shape=(9, 7, 5), c=8)
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32) * 0.1)

    ref = apply_sparse_conv(st.features, build_subm_rulebook(st, 3), w, st.mask)

    @jax.jit
    def planar(st):
        sst, order = sort_by_key(st)
        prb = build_planar_subm_rulebook(sst)
        y = apply_planar_subm_conv(sst.features, prb, w, sst.mask)
        return unsort_by_order(y, order)

    np.testing.assert_allclose(np.asarray(planar(st)), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cin,cout", [(8, 8), (6, 8)])
def test_planar_subm_matches_gather_gemm_expanding(cin, cout):
    """Cout >= Cin keeps the gather-first execution (gathering Ci rows is
    cheaper there); it must stay equivalent after the Cout < Cin pretransform
    split (sparse_conv.py:_subm_apply_pre)."""
    from openseg3d_tpu.ops.sparse_conv import (
        sort_by_key, unsort_by_order, build_planar_subm_rulebook,
        apply_planar_subm_conv)
    rng = np.random.RandomState(19)
    st = make_sparse(rng, b=2, v_cap=128, n_active=100, shape=(9, 7, 5), c=cin)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    ref = apply_sparse_conv(st.features, build_subm_rulebook(st, 3), w, st.mask)

    @jax.jit
    def planar(st):
        sst, order = sort_by_key(st)
        prb = build_planar_subm_rulebook(sst)
        y = apply_planar_subm_conv(sst.features, prb, w, sst.mask)
        return unsort_by_order(y, order)

    np.testing.assert_allclose(np.asarray(planar(st)), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_planar_subm_all_padding():
    from openseg3d_tpu.ops.sparse_conv import (
        sort_by_key, build_planar_subm_rulebook, apply_planar_subm_conv)
    st = SparseTensor(features=jnp.zeros((1, 16, 4)),
                      coords=jnp.full((1, 16, 3), -1, jnp.int32),
                      spatial_shape=(4, 4, 4))
    w = jnp.ones((27, 4, 4))

    @jax.jit
    def planar(st):
        sst, _ = sort_by_key(st)
        prb = build_planar_subm_rulebook(sst)
        return apply_planar_subm_conv(sst.features, prb, w, sst.mask)

    out = np.asarray(planar(st))
    assert np.isfinite(out).all() and (out == 0).all()


def test_planar_from_k3_matches_gather_gemm():
    """planar_from_k3 over key-sorted coords == the gather-GEMM subm conv
    (the production path: build_unet_plans derives planar structure from the
    k3 rulebook under the sorted-slot pipeline invariant)."""
    from openseg3d_tpu.ops.sparse_conv import (
        sort_by_key, planar_from_k3, apply_planar_subm_conv,
        build_subm_rulebook as raw_subm_rulebook)
    rng = np.random.RandomState(13)
    st = make_sparse(rng, b=2, v_cap=128, n_active=100, shape=(9, 7, 5), c=8)
    sst, _ = sort_by_key(st)           # establish the pipeline invariant
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32) * 0.1)

    @jax.jit
    def run(sst):
        rb = raw_subm_rulebook(sst, 3, assume_sorted=True)
        ref = apply_sparse_conv(sst.features, rb, w, sst.mask)
        got = apply_planar_subm_conv(sst.features, planar_from_k3(rb), w, sst.mask)
        return ref, got

    ref, got = run(sst)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_planar_k3_direct_matches_gather_gemm():
    """build_planar_k3_direct (the production path of build_unet_plans: no
    27-row rulebook materialized) == the gather-GEMM subm conv, including on a
    fully dense grid (every mirror-scatter slot hit)."""
    from openseg3d_tpu.ops.sparse_conv import (
        sort_by_key, build_planar_k3_direct, apply_planar_subm_conv,
        build_subm_rulebook as raw_subm_rulebook)
    rng = np.random.RandomState(17)
    cases = [make_sparse(rng, b=2, v_cap=128, n_active=100, shape=(9, 7, 5), c=8),
             make_sparse(rng, b=1, v_cap=64, n_active=64, shape=(4, 4, 4), c=8)]
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32) * 0.1)
    for st in cases:
        sst, _ = sort_by_key(st)

        @jax.jit
        def run(sst):
            rb = raw_subm_rulebook(sst, 3, assume_sorted=True)
            ref = apply_sparse_conv(sst.features, rb, w, sst.mask)
            got = apply_planar_subm_conv(sst.features, build_planar_k3_direct(sst),
                                         w, sst.mask)
            return ref, got

        ref, got = run(sst)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_planar_from_k3_dense_grid_edges():
    """Fully dense tiny grid: every boundary/clamp case of the 3-row window."""
    from openseg3d_tpu.ops.sparse_conv import (
        planar_from_k3, apply_planar_subm_conv,
        build_subm_rulebook as raw_subm_rulebook)
    shape = (3, 4, 5)
    total = shape[0] * shape[1] * shape[2]
    lin = np.arange(total)
    z = lin // (shape[1] * shape[2])
    y = (lin // shape[2]) % shape[1]
    x = lin % shape[2]
    coords = np.stack([z, y, x], 1).astype(np.int32)[None]    # key-sorted
    rng = np.random.RandomState(14)
    feats = jnp.asarray(rng.randn(1, total, 4).astype(np.float32))
    st = SparseTensor(features=feats, coords=jnp.asarray(coords),
                      spatial_shape=shape)
    w = jnp.asarray(rng.randn(27, 4, 3).astype(np.float32) * 0.1)
    rb = jax.jit(raw_subm_rulebook, static_argnums=(1, 2))(st, 3, True)
    ref = apply_sparse_conv(st.features, rb, w, st.mask)
    got = apply_planar_subm_conv(st.features, planar_from_k3(rb), w, st.mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_voxelizer_emits_sorted_slots():
    """Pipeline invariant: voxel slot order is ascending linearized-key order
    (planar subm conv depends on it)."""
    from openseg3d_tpu.core.voxelizer import VoxelGenerator
    rng = np.random.RandomState(15)
    pts = rng.uniform(-5, 5, (5000, 5)).astype(np.float32)
    vg = VoxelGenerator([0.5, 0.5, 0.5], [-5, -5, -5, 5, 5, 5])
    coords, ids = vg.generate(pts)
    gz, gy, gx = 20, 20, 20
    keys = (coords[:, 0].astype(np.int64) * gy + coords[:, 1]) * gx + coords[:, 2]
    assert (np.diff(keys) > 0).all()
    # ids consistent with coords
    ok = ids >= 0
    c = np.floor((pts[ok, :3] + 5) / 0.5).astype(np.int64)
    np.testing.assert_array_equal(coords[ids[ok]],
                                  np.stack([c[:, 2], c[:, 1], c[:, 0]], 1))


def test_planar_conv_custom_vjp_matches_gather_gemm_grads():
    """The planar conv's hand-written backward (mirrored conv for dx, per-plane
    dots for dw) must match autodiff through the gather-GEMM path — XLA's own
    transpose of the window dynamic-slice is a serial DUS loop, hence the
    custom VJP."""
    from openseg3d_tpu.ops.sparse_conv import (
        sort_by_key, planar_from_k3, apply_planar_subm_conv,
        build_subm_rulebook as raw_subm_rulebook)
    rng = np.random.RandomState(17)
    st = make_sparse(rng, b=2, v_cap=128, n_active=100, shape=(9, 7, 5), c=8)
    sst, _ = sort_by_key(st)
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.randn(2, 128, 6).astype(np.float32))

    rb = raw_subm_rulebook(sst, 3, assume_sorted=True)
    prb = planar_from_k3(rb)

    def loss_ref(x, ww):
        y = apply_sparse_conv(x, rb, ww, sst.mask)
        return jnp.sum(y * tgt)

    def loss_planar(x, ww):
        y = apply_planar_subm_conv(x, prb, ww, sst.mask)
        return jnp.sum(y * tgt)

    (lr, (gxr, gwr)) = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1)))(
        sst.features, w)
    (lp, (gxp, gwp)) = jax.jit(jax.value_and_grad(loss_planar, argnums=(0, 1)))(
        sst.features, w)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gwp), np.asarray(gwr),
                               rtol=1e-4, atol=1e-5)


def test_knn_k1_matches_topk():
    from openseg3d_tpu.ops.knn import knn_query
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(1, 300, 3).astype(np.float32))
    qs = jnp.asarray(rng.randn(1, 70, 3).astype(np.float32))
    pv = jnp.ones((1, 300), bool).at[0, 250:].set(False)
    qv = jnp.ones((1, 70), bool)
    idx1, d1 = knn_query(1, pts, qs, pv, qv)           # argmin fast path
    idx2, d2 = knn_query(2, pts, qs, pv, qv)           # top_k path
    assert np.array_equal(np.asarray(idx1[..., 0]), np.asarray(idx2[..., 0]))
    np.testing.assert_allclose(np.asarray(d1[..., 0]), np.asarray(d2[..., 0]),
                               rtol=1e-5, atol=1e-5)


def test_strided_window_rule_with_fine_capacity_above_out_capacity():
    """Regression: the window-form rule's base clip must bound by the SOURCE
    (fine) row count, not the output capacity. With Vf >> Vo and active rows
    near the end of the fine buffer, a Vo-based clip silently drops taps."""
    from openseg3d_tpu.ops.sparse_conv import apply_strided_conv
    rng = np.random.RandomState(11)
    shape, cin, cout = (8, 12, 12), 4, 5
    st = make_sparse(rng, b=2, v_cap=240, n_active=200, shape=shape, c=cin)
    w = rng.randn(27, cin, cout).astype(np.float32)
    plan = build_downsample(st, out_capacity=150)
    cmask = plan.out_coords[..., 0] >= 0
    out = apply_strided_conv(st.features, plan.rule, jnp.array(w), cmask)
    dense_out = dense_conv(to_dense(st), w, stride=2, padding=1)
    coords = np.array(plan.out_coords)
    checked = 0
    for i in range(2):
        for j, c in enumerate(coords[i]):
            if c[0] >= 0:
                np.testing.assert_allclose(
                    np.array(out[i, j]), dense_out[i, c[0], c[1], c[2]],
                    rtol=1e-4, atol=1e-4)
                checked += 1
    assert checked > 100

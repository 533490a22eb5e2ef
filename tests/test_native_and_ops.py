"""Native voxelizer parity + KNN + FPS ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openseg3d_tpu.core.voxelizer import points_to_voxel, majority_voxel_labels
from openseg3d_tpu.ops.knn import knn_query, nearest_label_transfer
from openseg3d_tpu.ops.sampling import furthest_point_sample, sectorized_fps


def test_native_voxelizer_matches_numpy():
    from openseg3d_tpu import native
    if not native.available():
        pytest.skip('g++ unavailable')
    rng = np.random.RandomState(0)
    pts = rng.uniform(-5, 5, (5000, 6)).astype(np.float32)
    vs, rg = [0.5, 0.5, 0.25], [-4, -4, -1, 4, 4, 2]
    c_np, i_np = points_to_voxel(pts, vs, rg)
    c_cc, i_cc = native.native_points_to_voxel(pts, vs, rg)
    np.testing.assert_array_equal(c_np, c_cc)
    np.testing.assert_array_equal(i_np, i_cc)


def test_native_majority_matches_numpy():
    from openseg3d_tpu import native
    if not native.available():
        pytest.skip('g++ unavailable')
    rng = np.random.RandomState(1)
    ids = rng.randint(-1, 50, 2000).astype(np.int32)
    labels = rng.randint(0, 22, 2000)
    labels[rng.rand(2000) < 0.1] = 255
    a = majority_voxel_labels(ids, labels, 50)
    b = native.native_majority_labels(ids, labels, 50)
    np.testing.assert_array_equal(a, b)


def test_knn_exact():
    rng = np.random.RandomState(2)
    pts = rng.randn(1, 200, 3).astype(np.float32)
    q = rng.randn(1, 37, 3).astype(np.float32)
    pv = np.ones((1, 200), bool)
    qv = np.ones((1, 37), bool)
    idx, dist = jax.jit(lambda a, b, c, d: knn_query(4, a, b, c, d, tile=16))(
        jnp.asarray(pts), jnp.asarray(q), jnp.asarray(pv), jnp.asarray(qv))
    d_full = np.linalg.norm(q[0][:, None] - pts[0][None], axis=-1) ** 2
    expect = np.argsort(d_full, axis=1)[:, :4]
    got = np.sort(np.array(idx[0]), axis=1)
    np.testing.assert_array_equal(got, np.sort(expect, axis=1))


def test_knn_excludes_invalid_points():
    pts = np.zeros((1, 10, 3), np.float32)
    pts[0, :, 0] = np.arange(10)
    pv = np.ones((1, 10), bool)
    pv[0, 0] = False  # nearest to query but invalid
    q = np.zeros((1, 1, 3), np.float32)
    idx, _ = knn_query(1, jnp.asarray(pts), jnp.asarray(q), jnp.asarray(pv),
                       jnp.ones((1, 1), bool), tile=8)
    assert int(idx[0, 0, 0]) == 1


def test_nearest_label_transfer():
    src = np.array([[[0, 0, 0], [10, 0, 0]]], np.float32)
    dst = np.array([[[9, 0, 0], [1, 0, 0]]], np.float32)
    lbl = np.array([[7, 3]], np.int32)
    v = np.ones((1, 2), bool)
    out = nearest_label_transfer(jnp.asarray(src), jnp.asarray(lbl), jnp.asarray(v),
                                 jnp.asarray(dst), jnp.asarray(v), tile=8)
    np.testing.assert_array_equal(np.array(out[0]), [3, 7])


def test_nearest_label_transfer_pallas_matches_xla():
    """On TPU the transfer runs the fused Pallas argmin
    (ops/knn._nearest_point_pallas_single); it must agree with the tiled XLA
    path by nearest-DISTANCE (indices may differ on exact ties because the
    two paths round distances differently). On CPU both branches are the XLA
    path and the check is trivially green."""
    rng = np.random.RandomState(11)
    b, p, q = 2, 700, 300
    src = jnp.asarray(rng.randn(b, p, 3).astype(np.float32) * 5)
    dst = jnp.asarray(rng.randn(b, q, 3).astype(np.float32) * 5)
    lbl = jnp.asarray(rng.randint(0, 22, (b, p)).astype(np.int32))
    sv = jnp.asarray(rng.rand(b, p) < 0.9)
    dv = jnp.asarray(rng.rand(b, q) < 0.9)
    out = np.asarray(nearest_label_transfer(src, lbl, sv, dst, dv))
    idx_ref, dist_ref = knn_query(1, src, dst, sv, dv)
    idx_ref = np.asarray(idx_ref[..., 0])
    # invalid dst rows -> ignore everywhere
    np.testing.assert_array_equal(out[~np.asarray(dv)], 255)
    # valid rows: the produced label belongs to SOME source at the reference
    # nearest distance (distance-equivalence, robust to tie order)
    srcn = np.asarray(src)
    dstn = np.asarray(dst)
    lbln = np.asarray(lbl)
    svn = np.asarray(sv)
    for bi in range(b):
        d2 = ((dstn[bi][:, None] - srcn[bi][None]) ** 2).sum(-1)
        d2[:, ~svn[bi]] = np.inf
        best = d2.min(axis=1)
        for qi in np.where(np.asarray(dv)[bi])[0]:
            cand = lbln[bi][np.isclose(d2[qi], best[qi], rtol=1e-4, atol=1e-4)]
            assert out[bi, qi] in cand, (bi, qi, out[bi, qi], cand)


def test_fps_spread_and_validity():
    rng = np.random.RandomState(3)
    pts = rng.randn(64, 3).astype(np.float32)
    pts[40:] += 100  # far cluster must be sampled early
    valid = np.ones(64, bool)
    idx = jax.jit(lambda p, v: furthest_point_sample(p, v, 8))(
        jnp.asarray(pts), jnp.asarray(valid))
    picks = np.array(idx)
    assert len(np.unique(picks)) == 8
    assert np.any(picks >= 40)  # reached the far cluster


def test_sectorized_fps():
    rng = np.random.RandomState(4)
    pts = rng.randn(256, 3).astype(np.float32) * 5
    valid = np.ones(256, bool)
    idx = jax.jit(lambda p, v: sectorized_fps(p, v, 16, num_sectors=4,
                                              sector_capacity=128))(
        jnp.asarray(pts), jnp.asarray(valid))
    picks = np.array(idx)
    assert picks.shape == (16,)
    assert np.all(picks >= -1) and np.all(picks < 256)

def test_query_and_group_oracle():
    from openseg3d_tpu.utils.pointops import query_and_group
    rng = np.random.RandomState(5)
    P, Q, C, k = 50, 13, 4, 3
    xyz = rng.randn(P, 3).astype(np.float32)
    nxyz = rng.randn(Q, 3).astype(np.float32)
    feat = rng.randn(P, C).astype(np.float32)
    out = np.asarray(query_and_group(k, jnp.asarray(xyz), jnp.asarray(nxyz),
                                     jnp.asarray(feat)))
    assert out.shape == (Q, k, 3 + C)
    d = np.linalg.norm(nxyz[:, None] - xyz[None], axis=-1)
    for qi in range(Q):
        nbr = set(np.argsort(d[qi])[:k])
        got_xyz = out[qi, :, :3] + nxyz[qi]
        for s in range(k):
            pj = int(np.argmin(np.linalg.norm(xyz - got_xyz[s], axis=1)))
            assert pj in nbr
            np.testing.assert_allclose(out[qi, s, 3:], feat[pj], rtol=1e-5)


def test_query_and_group_invalid_idx_zeroed():
    from openseg3d_tpu.utils.pointops import query_and_group
    xyz = np.arange(12, dtype=np.float32).reshape(4, 3)
    feat = np.ones((4, 2), np.float32)
    idx = np.array([[0, -1], [2, 3]], np.int32)
    out = np.asarray(query_and_group(2, jnp.asarray(xyz), jnp.asarray(xyz[:2]),
                                     jnp.asarray(feat), idx=jnp.asarray(idx)))
    np.testing.assert_array_equal(out[0, 1], 0.0)
    assert np.all(out[1, :, 3:] == 1.0)


def _bucket_knn_setup(rng, n, k, grid=(16, 16, 8), bucket_cap=8):
    """Voxelize a random cloud and run both brute-force and bucket KNN."""
    from openseg3d_tpu.core.voxelizer import points_to_voxel
    from openseg3d_tpu.ops.knn import voxel_bucket_knn

    vs = [0.5, 0.5, 0.5]
    rg = [0, 0, 0, grid[0] * 0.5, grid[1] * 0.5, grid[2] * 0.5]
    pts = rng.uniform(0.01, 3.99, (n, 3)).astype(np.float32)  # dense 8x8x8-voxel core
    coords, pvid = points_to_voxel(pts, vs, rg)
    v_cap = coords.shape[0] + 5
    vc = -np.ones((v_cap, 3), np.int32)
    vc[:coords.shape[0]] = coords
    spatial = (grid[2], grid[1], grid[0])  # (gz, gy, gx)

    valid = np.ones((1, n), bool)
    idx, dist = jax.jit(lambda a, b, c, d, e: voxel_bucket_knn(
        k, a, b, c, d, e, spatial_shape=spatial, bucket_cap=bucket_cap,
        tile=128))(
        jnp.asarray(pts[None]), jnp.asarray(valid), jnp.asarray(valid),
        jnp.asarray(pvid[None]), jnp.asarray(vc[None]))
    return pts, coords, pvid, np.asarray(idx[0]), np.asarray(dist[0])


def test_voxel_bucket_knn_matches_brute_force_where_neighborhood_suffices():
    """Within the 27-voxel candidate neighborhood the bucket KNN is EXACT:
    for every query whose true brute-force top-k all lie in adjacent voxels
    (the designed-in approximation bound), the index sets must match."""
    rng = np.random.RandomState(7)
    k = 8
    pts, coords, pvid, idx, dist = _bucket_knn_setup(rng, 600, k, bucket_cap=64)

    d_full = np.sum((pts[:, None] - pts[None]) ** 2, axis=-1)
    brute = np.argsort(d_full, axis=1)[:, :k]

    czyx = coords[pvid]                       # [N, 3] voxel coord per point
    checked = 0
    for i in range(pts.shape[0]):
        nb_ok = np.all(np.abs(czyx[brute[i]] - czyx[i]) <= 1, axis=1)
        if not nb_ok.all():
            continue                          # true NN outside 27-neighborhood
        checked += 1
        assert set(idx[i].tolist()) == set(brute[i].tolist()), i
    assert checked > 300                      # the bound is the common case


def test_voxel_bucket_knn_masks_and_self():
    """Self is always a neighbor (dist 0, reference heap-KNN behavior); invalid
    queries return -1 everywhere; sparse isolated points get < k neighbors."""
    from openseg3d_tpu.core.voxelizer import points_to_voxel
    from openseg3d_tpu.ops.knn import voxel_bucket_knn

    vs = [0.5, 0.5, 0.5]
    rg = [0, 0, 0, 8, 8, 4]
    pts = np.array([[1.1, 1.1, 1.1],
                    [1.2, 1.2, 1.2],
                    [7.5, 7.5, 3.5]], np.float32)   # third point isolated
    coords, pvid = points_to_voxel(pts, vs, rg)
    vc = -np.ones((8, 3), np.int32)
    vc[:coords.shape[0]] = coords
    valid = np.array([[True, True, True]])
    qv = np.array([[True, False, True]])
    idx, dist = voxel_bucket_knn(2, jnp.asarray(pts[None]), jnp.asarray(valid),
                                 jnp.asarray(qv), jnp.asarray(pvid[None]),
                                 jnp.asarray(vc[None]), spatial_shape=(8, 16, 16),
                                 tile=8)
    idx = np.asarray(idx[0])
    assert set(idx[0].tolist()) == {0, 1}          # self + neighbor
    assert (idx[1] == -1).all()                    # invalid query
    assert idx[2, 0] == 2 and idx[2, 1] == -1      # isolated: self only


def test_deep_fusion_bucket_path_matches_brute_force():
    """DeepFusion output with the voxel-bucket KNN == brute-force KNN output on
    a cloud whose neighborhoods are dense (same neighbor sets -> same attn)."""
    from openseg3d_tpu.core.voxelizer import points_to_voxel
    from openseg3d_tpu.models.deep_fusion import DeepFusionBlock

    rng = np.random.RandomState(11)
    n, ci = 200, 12
    vs = [0.5, 0.5, 0.5]
    rg = [0, 0, 0, 8, 8, 4]
    pts = rng.uniform(1.0, 3.0, (n, 3)).astype(np.float32)
    coords, pvid = points_to_voxel(pts, vs, rg)
    vc = -np.ones((coords.shape[0] + 3, 3), np.int32)
    vc[:coords.shape[0]] = coords

    lidar = rng.randn(1, n, 16).astype(np.float32)
    img = rng.randn(1, n, ci).astype(np.float32)
    img[0, rng.rand(n) < 0.2] = 0                   # some no-camera points
    mask = jnp.ones((1, n), bool)

    block = DeepFusionBlock(image_channel=ci, n_neighbors=4)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(pts[None]), mask,
                        jnp.asarray(lidar), jnp.asarray(img), False)
    brute = block.apply(params, jnp.asarray(pts[None]), mask,
                        jnp.asarray(lidar), jnp.asarray(img), False)
    bucket = block.apply(params, jnp.asarray(pts[None]), mask,
                         jnp.asarray(lidar), jnp.asarray(img), False,
                         point_voxel_ids=jnp.asarray(pvid[None]),
                         voxel_coords=jnp.asarray(vc[None]),
                         spatial_shape=(8, 16, 16))
    np.testing.assert_allclose(np.asarray(bucket), np.asarray(brute),
                               rtol=1e-4, atol=1e-5)


def test_segment_max_empty_segments_are_exactly_zero():
    """Regression (round-3 NaN-dW root cause): jax.ops.segment_max fills EMPTY
    segments with -inf, not finfo.min — they must come out as exact 0, in f32
    and bf16, or downstream conv backwards NaN on 0 * -inf."""
    from openseg3d_tpu.ops.scatter import segment_max

    for dt in (jnp.float32, jnp.bfloat16):
        data = jnp.asarray([[1.0, -2.0], [3.0, -4.0]], dt)
        ids = jnp.asarray([0, 0], jnp.int32)
        out = np.asarray(jax.jit(lambda d, i: segment_max(d, i, 4))(data, ids),
                         np.float32)
        assert np.isfinite(out).all(), out
        np.testing.assert_array_equal(out[1:], 0)          # segments 1-3 empty
        np.testing.assert_array_equal(out[0], [3.0, -2.0])

    # masked-consumer gradient stays finite even when the consumer multiplies
    # empty-segment rows by zero (the production conv-backward pattern)
    def f(d):
        s = segment_max(d, ids, 4)
        w = jnp.asarray([[1.0], [0.0], [0.0], [0.0]], jnp.float32)
        return jnp.sum(s * w)
    g = np.asarray(jax.grad(f)(jnp.asarray([[1.0, -2.0], [3.0, -4.0]])))
    assert np.isfinite(g).all(), g

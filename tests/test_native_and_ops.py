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

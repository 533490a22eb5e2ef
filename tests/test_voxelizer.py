import numpy as np

from openseg3d_tpu.core.voxelizer import VoxelGenerator, points_to_voxel, majority_voxel_labels


def _reference_points_to_voxel(points, voxel_size, coors_range):
    """Direct python transcription of the reference's single-pass semantics
    (voxel_generator.py:98-153) used as the test oracle."""
    voxel_size = np.asarray(voxel_size, dtype=points.dtype)
    coors_range = np.asarray(coors_range, dtype=points.dtype)
    gs = np.round((coors_range[3:] - coors_range[:3]) / voxel_size).astype(np.int64)
    canvas = {}
    coors = []
    ids = -np.ones(points.shape[0], dtype=np.int32)
    for i in range(points.shape[0]):
        c = np.floor((points[i, :3] - coors_range[:3]) / voxel_size).astype(np.int64)
        if np.any(c < 0) or np.any(c >= gs):
            continue
        key = (c[2], c[1], c[0])
        if key not in canvas:
            canvas[key] = len(coors)
            coors.append(key)
        ids[i] = canvas[key]
    return np.array(coors, dtype=np.int32).reshape(-1, 3), ids


def test_matches_reference_semantics():
    rng = np.random.RandomState(0)
    points = rng.uniform(-5, 5, size=(2000, 6)).astype(np.float32)
    vs = [0.5, 0.5, 0.25]
    rg = [-4, -4, -1, 4, 4, 2]
    ref_coords, ref_ids = _reference_points_to_voxel(points, np.array(vs, np.float32),
                                                     np.array(rg, np.float32))
    # first-seen mode: bit-exact reference parity
    coords, ids = points_to_voxel(points, vs, rg, preserve_order=True)
    np.testing.assert_array_equal(coords, ref_coords)
    np.testing.assert_array_equal(ids, ref_ids)
    # default (key-sorted) mode: same voxel set/assignment up to relabeling
    coords_s, ids_s = points_to_voxel(points, vs, rg)
    np.testing.assert_array_equal(np.sort(ref_coords.view('i4,i4,i4'), 0),
                                  np.sort(coords_s.view('i4,i4,i4'), 0))
    np.testing.assert_array_equal(ids_s >= 0, ref_ids >= 0)
    ok = ids_s >= 0
    np.testing.assert_array_equal(coords_s[ids_s[ok]], ref_coords[ref_ids[ok]])


def test_out_of_range_points_get_minus_one():
    points = np.array([[100.0, 0, 0], [0, 0, 0]], dtype=np.float32)
    coords, ids = points_to_voxel(points, [1, 1, 1], [-4, -4, -4, 4, 4, 4])
    assert ids[0] == -1 and ids[1] == 0
    assert coords.shape == (1, 3)


def test_generator_grid_size():
    g = VoxelGenerator([0.1, 0.1, 0.1], [-72, -72, -2, 72, 72, 4.4])
    np.testing.assert_array_equal(g.grid_size, [1440, 1440, 64])


def test_majority_voxel_labels():
    # voxel 0: labels [1,1,2] -> 1 ; voxel 1: [3] -> 3 ; voxel 2: empty -> 255
    # voxel 3: tie [4,4,5,5] -> 4 (smallest label wins, argmax semantics)
    ids = np.array([0, 0, 0, 1, 3, 3, 3, 3, -1])
    labels = np.array([1, 2, 1, 3, 5, 4, 5, 4, 7])
    out = majority_voxel_labels(ids, labels, num_voxels=4)
    np.testing.assert_array_equal(out, [1, 3, 255, 4])


def test_majority_includes_ignore_label():
    # reference counts 255 in the vote (waymo_dataset.py:227-244)
    ids = np.array([0, 0, 0])
    labels = np.array([255, 255, 3])
    out = majority_voxel_labels(ids, labels, num_voxels=1)
    assert out[0] == 255


def test_device_voxelize_matches_host():
    """ops/voxelize.device_voxelize must reproduce the host VoxelGenerator
    bit-for-bit: same ascending-key voxel order, same point ids, -1 out of
    range, overflow capped with dropped-point ids -1."""
    import jax.numpy as jnp
    from openseg3d_tpu.core.voxelizer import points_to_voxel
    from openseg3d_tpu.ops.voxelize import device_voxelize

    rng = np.random.RandomState(5)
    vs = [0.2, 0.2, 0.2]
    pr = [-3.2, -3.2, -0.8, 3.2, 3.2, 0.8]
    for n, cap in [(500, 512), (500, 64)]:       # roomy + overflowing cap
        pts = rng.uniform(-3.6, 3.6, (n, 3)).astype(np.float32)  # some OOR
        pts = np.concatenate([pts, rng.randn(n, 3).astype(np.float32)], 1)
        coords, ids = points_to_voxel(pts, vs, pr)
        m = coords.shape[0]
        pmask = np.ones(n, bool)
        pmask[-7:] = False                        # padding rows
        coords_h, ids_h = points_to_voxel(pts[:-7], vs, pr)
        vc, vm, vids, nv = device_voxelize(jnp.asarray(pts[None]),
                                           jnp.asarray(pmask[None]),
                                           vs, pr, cap)
        vc, vm, vids, nv = (np.asarray(vc[0]), np.asarray(vm[0]),
                            np.asarray(vids[0]), int(nv[0]))
        mh = coords_h.shape[0]
        assert nv == mh
        k = min(mh, cap)
        np.testing.assert_array_equal(vc[:k], coords_h[:k])
        assert np.all(vc[k:, 0] == -1) and not vm[k:].any()
        exp_ids = np.where(ids_h >= cap, -1, ids_h)
        np.testing.assert_array_equal(vids[:-7], exp_ids)
        np.testing.assert_array_equal(vids[-7:], -1)

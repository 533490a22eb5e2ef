"""Data pipeline: transforms, PolarMix, instance paste, WaymoDataset on a
synthetic on-disk Waymo-layout tree, multi-sweep alignment, TTA variants."""

import os
import pickle

import numpy as np
import pytest

from openseg3d_tpu.data import transforms as T
from openseg3d_tpu.data.polarmix import PolarMix, swap_sector, rotate_copy
from openseg3d_tpu.data.instance_augmentation import InstanceAugmentation
from openseg3d_tpu.data.waymo_dataset import WaymoDataset
from openseg3d_tpu.data.test_time_aug import MultiScaleFlipAug
from openseg3d_tpu.data.loader import DataLoader

from helpers import tiny_cfg


def test_rotation_preserves_norm_and_features():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 6).astype(np.float32)
    d = {'points': pts.copy()}
    out = T.RandomGlobalRotation([0.3, 0.3])(d)['points']
    np.testing.assert_allclose(np.linalg.norm(out[:, :2], axis=1),
                               np.linalg.norm(pts[:, :2], axis=1), rtol=1e-4)
    np.testing.assert_array_equal(out[:, 3:], pts[:, 3:])


def test_shuffle_remaps_multi_sweep_labels():
    rng = np.random.RandomState(1)
    n, nc = 50, 20
    pts = rng.randn(n, 6).astype(np.float32)
    pts[:, 5] = np.arange(n)  # identity tag
    cur = np.arange(nc)       # first 20 rows are current frame
    labels = np.arange(nc) * 10
    d = {'points': pts.copy(), 'cur_point_indices': cur.copy(),
         'point_labels': labels.copy()}
    np.random.seed(3)
    d = T.PointShuffle()(d)
    # invariant: label of each current point still matches its row tag
    rows = d['cur_point_indices']
    tags = d['points'][rows, 5].astype(int)
    np.testing.assert_array_equal(d['point_labels'], tags * 10)


def test_point_sample_keeps_far_points():
    rng = np.random.RandomState(2)
    near = rng.uniform(-10, 10, (80, 3))
    far = rng.uniform(60, 70, (20, 3))
    pts = np.concatenate([near, far]).astype(np.float32)
    d = {'points': pts.copy(), 'point_labels': np.arange(100)}
    d = T.PointSample(0.5, sample_range=50.0)(d)
    kept_far = np.sum(np.linalg.norm(d['points'][:, :2], axis=1) >= 50)
    assert kept_far == 20  # all far points preferentially kept
    assert d['points'].shape[0] == 50


def test_polarmix_swap_and_copy():
    rng = np.random.RandomState(3)
    p1 = rng.randn(100, 6).astype(np.float32)
    p2 = rng.randn(120, 6).astype(np.float32)
    l1 = np.zeros(100, np.int64)
    l2 = np.ones(120, np.int64) * 5
    out_p, out_l = swap_sector(p1, l1, p2, l2, -0.5, 0.5)
    assert out_p.shape[0] == out_l.shape[0]
    cp, cl = rotate_copy(p2, l2, [5], [0.5, 1.0])
    assert cp.shape[0] == 3 * 120 and np.all(cl == 5)
    pm = PolarMix(instance_classes=[5], rot_angle_range=[0.5, 1.0])
    mp, ml = pm(p1, None, l1, p2, None, l2)
    assert mp.shape[0] == ml.shape[0] >= 100


def _make_waymo_tree(root, n_frames=3, n_points=400, with_instances=True):
    rng = np.random.RandomState(0)
    for sub in ('lidar', 'label', 'pose', 'instances'):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for f in range(n_frames):
        name = f'seg001-{1000000 + f}-{f}'
        pts = np.zeros((n_points, 15), np.float32)
        pts[:, :3] = rng.uniform(-3, 3, (n_points, 3))
        pts[:, 2] = rng.uniform(-0.7, 0.7, n_points)
        pts[:, 3] = rng.uniform(0, 75, n_points)     # range
        pts[:, 4] = rng.uniform(0, 2, n_points)      # intensity
        pts[:, 12:15] = rng.randint(0, 64, (n_points, 3))
        np.save(os.path.join(root, 'lidar', name + '.npy'), pts)
        lbl = np.zeros((n_points, 2), np.int64)
        lbl[:, 1] = rng.randint(0, 23, n_points)     # 0 = unlabeled -> 255
        np.save(os.path.join(root, 'label', name + '.npy'), lbl)
        pose = np.eye(4)
        pose[0, 3] = f * 0.5
        np.savetxt(os.path.join(root, 'pose', name + '.txt'), pose)
    if with_instances:
        bank = {3: [], 4: [], 10: []}
        for lid in bank:
            for _ in range(2):
                cp = np.zeros((30, 6), np.float32)
                cp[:, :3] = rng.uniform(-0.5, 0.5, (30, 3)) + [1.0, 1.0, -0.5]
                bank[lid].append({'cluster_points': cp, 'cluster_height': 0.4})
        with open(os.path.join(root, 'instances',
                               'lidar_instances_with_height.pkl'), 'wb') as f:
            pickle.dump(bank, f)


def test_waymo_dataset_training(tmp_path):
    _make_waymo_tree(str(tmp_path))
    cfg = tiny_cfg()
    np.random.seed(0)
    ds = WaymoDataset(cfg, str(tmp_path), mode='training')
    assert len(ds) == 3
    d = ds[0]
    assert d['points'].shape[1] == 6
    assert d['point_labels'].shape[0] == d['points'].shape[0]
    assert d['voxel_coords'].shape[0] == d['point_voxel_ids'].max() + 1
    assert (d['voxel_labels'].shape[0] == d['voxel_coords'].shape[0])
    padded, fn = ds.load_padded(0)
    assert padded['points'].shape == (1024, 6)
    assert padded['point_labels'].shape == (1024,)
    # padding rows carry ignore labels
    n = int(padded['num_points'])
    assert np.all(padded['point_labels'][n:] == 255)


def test_waymo_dataset_multi_sweep(tmp_path):
    _make_waymo_tree(str(tmp_path))
    cfg = tiny_cfg(DATASET={'USE_MULTI_SWEEPS': True, 'NUM_SWEEPS': 2,
                            'MAX_NUM_SWEEPS': 3, 'AUG_DATA': False})
    ds = WaymoDataset(cfg, str(tmp_path), mode='validation')
    d = ds[2]  # frame 2 has history
    assert 'cur_point_indices' in d
    assert d['points'].shape[0] == 800      # 2 sweeps x 400
    assert d['point_labels'].shape[0] == 400
    padded = ds.pad(d)
    # labels sit exactly on current-frame rows
    assert int(padded['cur_point_mask'].sum()) == 400
    assert np.all(padded['point_labels'][~padded['cur_point_mask']] == 255)
    # history sweep has nonzero timestamp delta on column 3
    ts = padded['points'][padded['point_mask'] & ~padded['cur_point_mask'], 3]
    assert np.all(ts > 0)


def test_cylinder_coordinates(tmp_path):
    _make_waymo_tree(str(tmp_path))
    cfg = tiny_cfg(DATASET={'USE_CYLINDER': True, 'AUG_DATA': False,
                            'POINT_CLOUD_RANGE': [0, -3.1415926, -0.8, 4.8, 3.1415926, 0.8],
                            'VOXEL_SIZE': [0.2, 0.2, 0.2]})
    ds = WaymoDataset(cfg, str(tmp_path), mode='validation')
    d = ds[0]
    rho, phi = d['points'][:, 0], d['points'][:, 1]
    assert np.all(rho >= 0) and np.all(np.abs(phi) <= np.pi + 1e-5)


def test_instance_augmentation_adds_rare_classes(tmp_path):
    _make_waymo_tree(str(tmp_path))
    cfg = tiny_cfg()
    ds = WaymoDataset(cfg, str(tmp_path), mode='training')
    rng = np.random.RandomState(0)
    pts = np.zeros((300, 6), np.float32)
    pts[:, :2] = rng.uniform(-3, 3, (300, 2))
    pts[:, 2] = -0.5
    labels = np.full(300, 17, np.int64)  # all ground -> plenty of placements
    np.random.seed(1)
    new_pts, new_labels = ds.instance_aug(pts, None, labels)
    assert new_pts.shape[0] > 300
    assert set(np.unique(new_labels[300:])) <= {3, 4, 10}


def test_tta_variants(tmp_path):
    _make_waymo_tree(str(tmp_path))
    cfg = tiny_cfg()
    ds = WaymoDataset(cfg, str(tmp_path), mode='validation')
    tta = MultiScaleFlipAug(ds, scales=[0.95, 1.05], angles=[0.0],
                            flip_x=True, flip_y=False)
    raw = ds.load_raw(0)
    variants = list(tta(raw))
    assert len(variants) == tta.num_variants() == 4
    for v in variants:
        assert v['points'].shape == (1, 1024, 6)
        assert v['voxel_labels'].shape == (1, 512)


def test_tta_identity_variant_matches_plain_pipeline(tmp_path):
    """Regression: TTA must transform the RAW sample. Feeding __getitem__
    output (already cylinder-transformed + voxelized) through TTA rotated
    (rho, phi, z) columns and re-voxelized twice. The identity variant must
    reproduce the plain eval batch exactly."""
    from openseg3d_tpu.data.batch import collate_padded
    _make_waymo_tree(str(tmp_path))
    # cylinder on: the strongest form of the bug (prepare_data REPLACES the
    # xyz columns with rho/phi/z, so a second pass visibly corrupts them)
    cfg = tiny_cfg(DATASET={'USE_CYLINDER': True})
    ds = WaymoDataset(cfg, str(tmp_path), mode='validation')
    tta = MultiScaleFlipAug(ds, scales=[1.0], angles=[0.0],
                            flip_x=False, flip_y=False)
    (ident,) = list(tta(ds.load_raw(0)))
    plain = collate_padded([ds.pad(ds[0])])
    for k in ('points', 'voxel_coords', 'point_voxel_ids', 'point_labels',
              'voxel_labels'):
        np.testing.assert_allclose(ident[k], plain[k], atol=1e-6, err_msg=k)


def test_loader_inline(tmp_path):
    _make_waymo_tree(str(tmp_path), n_frames=4)
    cfg = tiny_cfg(DATASET={'AUG_DATA': False})
    loader = DataLoader(lambda: WaymoDataset(cfg, str(tmp_path), mode='validation'),
                        batch_size=2, shuffle=True, num_workers=0, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]['points'].shape == (2, 1024, 6)


def test_parser_to_dataset_testing_contract(tmp_path, monkeypatch):
    """Integration fixture for the parser->dataset contract
    (reference tools/waymo_parser.py:212-288 + waymo_dataset.py:145-211):
    one synthetic frame in the parser's exact output layout (15-dim lidar npy,
    [N,2] label npy, pose txt, 3d_semseg_test_set_frames.txt), loaded in
    testing mode; points_ri must ride through padding into
    construct_seg_frame unchanged."""
    import zlib
    from openseg3d_tpu.data.batch import collate_padded
    from openseg3d_tpu.utils.submission import construct_seg_frame
    from test_tools_and_utils import _install_wod_stub

    root = str(tmp_path)
    rng = np.random.RandomState(7)
    for sub in ('lidar', 'label', 'pose'):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    n = 300
    name = 'ctxA-1650000000000123-0'
    pts = np.zeros((n, 15), np.float32)
    pts[:, :3] = rng.uniform(-3, 3, (n, 3))
    pts[:, 2] = rng.uniform(-0.7, 0.7, n)
    pts[:, 3] = np.linalg.norm(pts[:, :3], axis=1)   # range
    pts[:, 4] = rng.uniform(0, 2, n)                 # intensity
    pts[:, 5] = rng.uniform(0, 1, n)                 # elongation
    pts[:, 12] = rng.randint(0, 2650, n)             # ri col
    pts[:, 13] = rng.randint(0, 64, n)               # ri row
    pts[:, 14] = rng.randint(0, 2, n)                # return index
    np.save(os.path.join(root, 'lidar', name + '.npy'), pts)
    lbl = np.zeros((n, 2), np.int64)
    lbl[:, 1] = rng.randint(1, 23, n)
    np.save(os.path.join(root, 'label', name + '.npy'), lbl)
    np.savetxt(os.path.join(root, 'pose', name + '.txt'), np.eye(4))
    # a second frame NOT in the test-set list must be filtered out
    name2 = 'ctxB-1650000000000999-0'
    np.save(os.path.join(root, 'lidar', name2 + '.npy'), pts)
    np.savetxt(os.path.join(root, 'pose', name2 + '.txt'), np.eye(4))
    with open(os.path.join(root, '3d_semseg_test_set_frames.txt'), 'w') as fp:
        fp.write('ctxA,1650000000000123,extra\n')

    cfg = tiny_cfg()
    ds = WaymoDataset(cfg, root, mode='testing')
    assert len(ds) == 1  # frame-list filter applied
    raw = ds[0]
    assert 'point_labels' not in raw
    np.testing.assert_array_equal(raw['points_ri'], pts[:, 12:15].astype(np.int32))

    batch = collate_padded([ds.pad(raw)])
    assert batch['points'].shape == (1, 1024, 6)
    assert batch['points_ri'].shape == (1, 1024, 3)
    mask = np.asarray(batch['point_mask'][0], bool)
    assert mask.sum() == n
    ri = np.asarray(batch['points_ri'][0])[mask]
    np.testing.assert_array_equal(ri, pts[:, 12:15].astype(np.int32))

    pickle_mod = _install_wod_stub(monkeypatch)
    file_idx, _, ts = ds.parse_filename(raw['filename'])
    preds = rng.randint(0, 22, n)
    frame = construct_seg_frame(preds, ri, context_name=file_idx, timestamp=ts)
    assert frame.context_name == 'ctxA'
    assert frame.frame_timestamp_micros == 1650000000000123
    dims, data = pickle_mod.loads(zlib.decompress(
        frame.segmentation_labels[0].ri_return1.segmentation_label_compressed))
    arr = np.array(data).reshape(dims)
    # every return-0 label landed (seeded RNG: no duplicate cells)
    r0 = pts[:, 14] == 0
    assert arr[:, :, 1].sum() == (preds[r0] + 1).sum()


def test_tta_pool_matches_inline(tmp_path):
    """Pooled TTA (workers re-load the frame by index) must produce exactly
    the inline variants, in the same order."""
    import functools
    _make_waymo_tree(str(tmp_path))
    cfg = tiny_cfg()
    factory = functools.partial(WaymoDataset, cfg, str(tmp_path), 'validation')
    ds = factory()
    kw = dict(scales=[0.95, 1.05], angles=[0.0], flip_x=True, flip_y=False)
    inline = list(MultiScaleFlipAug(ds, **kw)(ds.load_raw(0)))
    pool_tta = MultiScaleFlipAug(ds, dataset_factory=factory, num_workers=2, **kw)
    try:
        pooled = list(pool_tta(ds.load_raw(0), index=0))
    finally:
        pool_tta.close()
    assert len(pooled) == len(inline) == 4
    for a, b in zip(inline, pooled):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=k)

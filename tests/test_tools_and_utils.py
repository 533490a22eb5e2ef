"""Offline tools + auxiliary utils: instance extraction, submission range-image
assembly, pcd writer, checkpoint round trip."""

import os

import numpy as np
import pytest

from openseg3d_tpu.utils.submission import assemble_range_image_labels
from openseg3d_tpu.utils.visualize import write_pcd, draw_points


def test_extract_instances_on_synthetic_scene(tmp_path):
    import sys
    sys.path.insert(0, 'tools')
    from extract_instances import extract_frame

    rng = np.random.RandomState(0)
    # ground plane + one dense cone-ish cluster of class 10
    ground = np.zeros((500, 6), np.float32)
    ground[:, :2] = rng.uniform(-10, 10, (500, 2))
    ground[:50, :2] = rng.normal([3, 3], 0.3, (50, 2))  # dense near the cluster
    ground[:, 2] = 0.0
    cluster = np.zeros((60, 6), np.float32)
    cluster[:, :2] = rng.normal([3, 3], 0.05, (60, 2))
    cluster[:, 2] = rng.uniform(0.0, 1.0, 60)
    points = np.concatenate([ground, cluster])
    labels = np.concatenate([np.full(500, 17), np.full(60, 10)])
    bank = extract_frame(points, labels, targets={10: 30})
    assert len(bank[10]) == 1
    inst = bank[10][0]
    assert inst['cluster_points'].shape[0] == 60
    assert 0.1 < inst['cluster_height'] < 1.2


def test_range_image_assembly():
    preds = np.array([2, 5, 7])
    ri = np.array([[10, 3, 0], [100, 20, 1], [-1, -1, -1]])
    r0, r1 = assemble_range_image_labels(preds, ri)
    assert r0[3, 10, 1] == 3      # 1-based label
    assert r1[20, 100, 1] == 6
    assert r0.sum() == 3 and r1.sum() == 6  # invalid point dropped


def _install_wod_stub(monkeypatch):
    """Install the shared waymo_open_dataset stand-in
    (openseg3d_tpu/utils/wod_stub.py — also used by tools/rehearsal.py) via
    monkeypatch so it unwinds after the test."""
    import pickle
    import sys
    from openseg3d_tpu.utils.wod_stub import build_modules

    for name, mod in build_modules().items():
        monkeypatch.setitem(sys.modules, name, mod)
    return pickle


def test_submission_proto_path(tmp_path, monkeypatch):
    """End-to-end proto packing against the stub: reference schema
    (Laser + ri_return{1,2}.segmentation_label_compressed + append)."""
    import zlib

    pickle = _install_wod_stub(monkeypatch)
    from openseg3d_tpu.utils.submission import (construct_seg_frame,
                                                write_submission_file)

    preds = np.array([2, 5, 7])
    ri = np.array([[10, 3, 0], [100, 20, 1], [5, 5, 0]])
    frame = construct_seg_frame(preds, ri, context_name='ctx123',
                                timestamp=1650000000000001)
    assert frame.context_name == 'ctx123'
    assert frame.frame_timestamp_micros == 1650000000000001
    assert len(frame.segmentation_labels) == 1
    laser = frame.segmentation_labels[0]
    assert laser.name == 1  # LaserName.TOP
    dims, data = pickle.loads(
        zlib.decompress(laser.ri_return1.segmentation_label_compressed))
    assert dims == [64, 2650, 2]
    arr = np.array(data).reshape(64, 2650, 2)
    assert arr[3, 10, 1] == 3 and arr[5, 5, 1] == 8 and arr.sum() == 11
    dims2, data2 = pickle.loads(
        zlib.decompress(laser.ri_return2.segmentation_label_compressed))
    assert np.array(data2).reshape(64, 2650, 2)[20, 100, 1] == 6

    path = write_submission_file([frame], str(tmp_path), account='a@b.c',
                                 method_name='meth')
    method, frames = pickle.loads(open(path, 'rb').read())
    assert method == 'meth' and len(frames) == 1
    assert frames[0][0] == 'ctx123' and len(frames[0][2]) == 1


def test_pcd_writer(tmp_path):
    xyz = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    rgb = np.array([[255, 0, 0], [0, 255, 0]])
    p = os.path.join(str(tmp_path), 'a.pcd')
    write_pcd(p, xyz, rgb)
    content = open(p).read()
    assert 'POINTS 2' in content and content.count('\n') == 13


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from openseg3d_tpu.engine import build_segmentor, create_train_state
    from openseg3d_tpu.models.optim import build_optimizer, build_schedule
    from openseg3d_tpu.utils.checkpoint import (save_checkpoint,
                                                restore_checkpoint,
                                                latest_checkpoint)
    from helpers import tiny_cfg, synthetic_batch

    cfg = tiny_cfg(MODEL={'SEGMENTOR': 'spnet'})
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg).items()
             if k != 'batch_size'}
    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 1, 10))
    state = create_train_state(cfg, model, tx, batch, seed=0)

    save_checkpoint(str(tmp_path), 3, state)
    latest = latest_checkpoint(str(tmp_path))
    assert latest is not None

    state2 = create_train_state(cfg, model, tx, batch, seed=99)
    state2, epoch = restore_checkpoint(latest, state2)
    assert epoch == 3
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_gather_point_features_matches_loop_oracle():
    """Vectorized camera-feature gather == the reference's per-point loop
    (reference tools/extract_image_feature.py:80-102 semantics: primary
    projection preferred even when its pixel is out of bounds)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'extract_image_feature',
        os.path.join(os.path.dirname(__file__), '..', 'tools',
                     'extract_image_feature.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    n, c = 500, 7
    lidar = np.zeros((n, 12), np.float32)
    lidar[:, 6] = rng.randint(0, 6, n)     # primary cam id (1-based; 0=none)
    lidar[:, 9] = rng.randint(0, 6, n)     # secondary cam id
    lidar[:, 7] = rng.randint(-5, 40, n)   # x (some out of bounds)
    lidar[:, 8] = rng.randint(-5, 25, n)   # y
    lidar[:, 10] = rng.randint(-5, 40, n)
    lidar[:, 11] = rng.randint(-5, 25, n)
    maps = {0: rng.randn(c, 20, 30).astype(np.float32),
            2: rng.randn(c, 24, 36).astype(np.float32),
            4: rng.randn(c, 18, 28).astype(np.float32)}

    def oracle(lidar, feature_maps):
        out = {}
        cam1 = lidar[:, 6].astype(np.int64) - 1
        cam2 = lidar[:, 9].astype(np.int64) - 1
        for i in range(lidar.shape[0]):
            if int(cam1[i]) in feature_maps:
                cam, x, y = int(cam1[i]), int(lidar[i, 7]), int(lidar[i, 8])
            elif int(cam2[i]) in feature_maps:
                cam, x, y = int(cam2[i]), int(lidar[i, 10]), int(lidar[i, 11])
            else:
                continue
            fm = feature_maps[cam]
            if 0 <= y < fm.shape[1] and 0 <= x < fm.shape[2]:
                out[i] = fm[:, y, x]
        return out

    got = mod.gather_point_features(lidar, maps)
    want = oracle(lidar, maps)
    assert set(got) == set(want)
    assert len(want) > 50
    for i in want:
        np.testing.assert_array_equal(got[i], want[i])


def test_make_level_specs_rejects_short_fraction_list():
    from openseg3d_tpu.ops.window import make_level_specs
    batching = [(0, (16, 0, 8)), (1, (32, 8, 24)), (2, (64, 24, 48))]
    with pytest.raises(ValueError, match='fraction'):
        make_level_specs(batching, 64, fraction=[1.0, 1.0])

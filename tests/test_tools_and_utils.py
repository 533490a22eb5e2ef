"""Offline tools + auxiliary utils: instance extraction, submission range-image
assembly, pcd writer, checkpoint round trip."""

import os

import numpy as np

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

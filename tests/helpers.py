"""Shared test fixtures: a tiny config + synthetic padded batches."""

import numpy as np

from openseg3d_tpu.config import cfg_from_file
from openseg3d_tpu.core.voxelizer import VoxelGenerator, majority_voxel_labels
from openseg3d_tpu.data.batch import pad_sample, collate_padded

TINY_OVERRIDES = {
    'DATASET': {
        'POINT_CLOUD_RANGE': [-3.2, -3.2, -0.8, 3.2, 3.2, 0.8],
        'VOXEL_SIZE': [0.2, 0.2, 0.2],
        'DIM_POINT': 6,
        'CLASS_NAMES': [f'c{i}' for i in range(22)],
    },
    'RUNTIME': {
        'MAX_POINTS_PER_SAMPLE': 1024,
        'MAX_VOXELS_PER_SAMPLE': 512,
        'COMPUTE_DTYPE': 'float32',
    },
    'MODEL': {
        'WINDOW_SHAPE': [4, 4, 4],
    },
}


def tiny_cfg(**extra):
    import copy
    ov = copy.deepcopy(TINY_OVERRIDES)
    for k, v in extra.items():
        ov.setdefault(k, {}).update(v)
    return cfg_from_file(None, overrides=ov)


def synthetic_batch(cfg, batch_size=2, n_points=600, seed=0, with_labels=True):
    rng = np.random.RandomState(seed)
    vg = VoxelGenerator(cfg.DATASET.VOXEL_SIZE, cfg.DATASET.POINT_CLOUD_RANGE)
    rg = np.array(cfg.DATASET.POINT_CLOUD_RANGE)
    samples = []
    for i in range(batch_size):
        xyz = rng.uniform(rg[:3] * 0.95, rg[3:] * 0.95, (n_points, 3)).astype(np.float32)
        extra = rng.randn(n_points, cfg.DATASET.DIM_POINT - 3).astype(np.float32)
        points = np.concatenate([xyz, extra], 1)
        coords, ids = vg.generate(points)
        s = dict(points=points, voxel_coords=coords, point_voxel_ids=ids)
        if with_labels:
            labels = rng.randint(0, cfg.DATASET.NUM_CLASSES, n_points)
            s['point_labels'] = labels
            s['voxel_labels'] = majority_voxel_labels(ids, labels, coords.shape[0])
        samples.append(s)
    padded = [pad_sample(s, cfg.RUNTIME.MAX_POINTS_PER_SAMPLE,
                         cfg.RUNTIME.MAX_VOXELS_PER_SAMPLE) for s in samples]
    return collate_padded(padded)

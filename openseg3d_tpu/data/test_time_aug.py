"""Test-time augmentation driver.

Parity: MultiScaleFlipAug (seg3d/datasets/transforms/test_time_aug.py) +
tools/eval.py:97-100 protocol — the cartesian product of scales x angles x
flip_x x flip_y, each variant re-voxelized and re-padded; predictions are
softmax-averaged by the caller (tools/eval.py:44-52).
"""

from __future__ import annotations

import numpy as np

from .batch import collate_padded
from .transforms import rotate_z


class MultiScaleFlipAug:
    def __init__(self, dataset, scales=(0.95, 1.0, 1.05),
                 angles=(-np.pi / 4, 0.0, np.pi / 4),
                 flip_x=True, flip_y=True):
        self.dataset = dataset
        self.scales = list(scales)
        self.angles = list(angles)
        self.flip_x = [True, False] if flip_x else [False]
        self.flip_y = [True, False] if flip_y else [False]

    def num_variants(self):
        return len(self.scales) * len(self.angles) * len(self.flip_x) * len(self.flip_y)

    def __call__(self, data):
        """data: raw sample dict with at least 'points' (+ optional labels /
        image features). Yields padded single-sample batches per variant."""
        for scale in self.scales:
            for angle in self.angles:
                for fx in self.flip_x:
                    for fy in self.flip_y:
                        d = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                             for k, v in data.items()
                             if k in ('points', 'point_image_features',
                                      'point_labels', 'cur_point_indices',
                                      'points_ri')}
                        pts = d['points']
                        pts[:, :3] *= scale
                        pts = rotate_z(pts, angle)
                        if fx:
                            pts[:, 1] = -pts[:, 1]
                        if fy:
                            pts[:, 0] = -pts[:, 0]
                        d['points'] = pts
                        d = self.dataset.prepare_data(d)
                        if 'point_labels' in d:
                            self.dataset.prepare_voxel_labels(d)
                        yield collate_padded([self.dataset.pad(d)])

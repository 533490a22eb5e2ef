"""Extract a copy-paste instance bank for rare classes.

Parity: tools/extract_instances.py — DBSCAN-cluster the points of a target
rare class in every training frame, keep clusters with enough points that sit
near ground, and record each cluster's points plus its height above the
nearest ground point. The resulting pickle feeds
openseg3d_tpu.data.instance_augmentation.

Differences: runs for ALL target classes in one pass and writes the
{label_id: [instances]} dict the augmentation consumes directly (the reference
needed one run per class + manual merging); the per-point ground-split Python
loop is vectorized.

Usage:
  python tools/extract_instances.py --data_dir /data/waymo/training \
      [--out /data/waymo/training/instances/lidar_instances_with_height.pkl]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# class id -> minimum cluster size (reference: other-vehicle 120,
# motorcyclist 30, cone 30)
TARGETS = {3: 120, 4: 30, 10: 30}
GROUND_IDS = (17, 18, 19, 20, 21)


def load_frame(label_file):
    lidar_file = label_file.replace('label', 'lidar')
    points = np.load(lidar_file)[:, :6].astype(np.float32)
    labels = np.load(label_file)[:, 1].astype(np.int64) - 1
    labels[labels == -1] = 255
    return points, labels


def extract_frame(points, labels, targets=TARGETS, eps=0.25):
    from sklearn.cluster import DBSCAN

    out = {lid: [] for lid in targets}
    ground = points[np.isin(labels, GROUND_IDS)][:, :3]
    if ground.shape[0] == 0:
        return out
    for label_id, min_pts in targets.items():
        tp = points[labels == label_id]
        if tp.shape[0] < min_pts:
            continue
        cluster_ids = DBSCAN(eps=eps, min_samples=min_pts).fit(tp[:, :2]).labels_
        for cid in set(cluster_ids) - {-1}:
            cp = tp[cluster_ids == cid]
            center = cp[:, :3].mean(axis=0)
            radius = np.max(np.linalg.norm(cp[:, :3] - center, axis=1))
            dist = np.linalg.norm(ground - center, axis=1)
            near = dist < 1.2 * radius
            if not near.any():
                continue
            ground_z = ground[near][np.argmin(dist[near])][2]
            out[label_id].append({
                'cluster_height': float(center[2] - ground_z),
                'cluster_points': cp,
            })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data_dir', required=True)
    ap.add_argument('--out', default=None)
    ap.add_argument('--eps', type=float, default=0.25)
    args = ap.parse_args()

    label_files = sorted(glob.glob(os.path.join(args.data_dir, 'label', '*.npy')))
    bank = {lid: [] for lid in TARGETS}
    for i, lf in enumerate(label_files):
        points, labels = load_frame(lf)
        frame_bank = extract_frame(points, labels, eps=args.eps)
        for lid, insts in frame_bank.items():
            bank[lid].extend(insts)
        if (i + 1) % 50 == 0:
            print(f'[{i + 1}/{len(label_files)}] bank sizes:',
                  {k: len(v) for k, v in bank.items()})

    out = args.out or os.path.join(args.data_dir, 'instances',
                                   'lidar_instances_with_height.pkl')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'wb') as f:
        pickle.dump(bank, f)
    print('wrote', out, {k: len(v) for k, v in bank.items()})


if __name__ == '__main__':
    main()

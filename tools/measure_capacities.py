"""Measure per-stage voxel occupancy and window-bucket usage, and suggest
RUNTIME.STAGE_CAPACITY_RATIOS / RUNTIME.WINDOW_BUCKET_FRACTIONS.

The TPU build replaces every dynamic count of the reference with a static
capacity (SURVEY.md §7.1); this tool sizes those capacities from data instead
of guesswork. It runs the structure pipeline (voxelize -> 3 stride-2
downsamples -> dual-shift window partition per stage) over N frames with
GENEROUS capacities so nothing truncates, records the true per-stage voxel
counts (`num_out`, pre-drop) and per-(stage, shift, level) distinct-window
counts, and prints config-ready suggestions at a chosen safety margin.

Frames come from the synthetic Waymo-like beam model (bench.py) by default, or
from a parsed Waymo directory via --data_dir (tools/waymo_parser.py layout).

Usage:
    python tools/measure_capacities.py --frames 16 --margin 1.25
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file', default='configs/waymo_one_sweep.yaml')
    ap.add_argument('--frames', type=int, default=8)
    ap.add_argument('--n_points', type=int, default=163840)
    ap.add_argument('--max_voxels', type=int, default=98304)
    ap.add_argument('--margin', type=float, default=1.25)
    ap.add_argument('--data_dir', default='',
                    help='parsed Waymo dir (lidar/*.npy); default = synthetic')
    ap.add_argument('--seed', type=int, default=1)
    args = ap.parse_args()

    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
    import jax
    import jax.numpy as jnp
    from openseg3d_tpu.config import cfg_from_file
    from openseg3d_tpu.core.voxelizer import VoxelGenerator
    from openseg3d_tpu.models.segmentors.common import ModelSpec
    from openseg3d_tpu.ops.sparse_conv import SparseTensor, build_downsample
    from openseg3d_tpu.ops.window import window_coords
    from bench import make_waymo_like_cloud

    cfg = cfg_from_file(args.cfg_file, overrides={
        'RUNTIME': {'MAX_POINTS_PER_SAMPLE': args.n_points,
                    'MAX_VOXELS_PER_SAMPLE': args.max_voxels}})
    spec = ModelSpec.from_config(cfg)
    vg = VoxelGenerator(cfg.DATASET.VOXEL_SIZE, cfg.DATASET.POINT_CLOUD_RANGE)
    rng = np.random.RandomState(args.seed)

    if args.data_dir:
        import glob
        files = sorted(glob.glob(os.path.join(args.data_dir, 'lidar', '*.npy')))
        frames = files[:args.frames]
        load = lambda f: np.load(f)[:, :6].astype(np.float32)
    else:
        frames = list(range(args.frames))
        load = lambda _: make_waymo_like_cloud(rng, args.n_points)

    # generous, truncation-free measurement capacities
    meas_caps = [args.max_voxels * m for m in (1, 2, 2, 1)]
    n_levels = len(spec.batching_info[0])
    occ_max = [0, 0, 0, 0]
    win_max = np.zeros((4, n_levels), np.int64)   # max over frames AND shifts
    tok_max = np.zeros((4, n_levels), np.int64)

    for fi, fr in enumerate(frames):
        pts = load(fr)
        coords, _ = vg.generate(pts)
        v1 = coords.shape[0]
        stage_coords, shapes = [], [spec.spatial_shape]
        pad = np.full((meas_caps[0] - v1, 3), -1, np.int32)
        cur = jnp.asarray(np.concatenate([coords.astype(np.int32), pad])[None])
        stage_coords.append(np.asarray(cur[0]))
        occ_max[0] = max(occ_max[0], v1)
        st = SparseTensor(features=jnp.zeros(()), coords=cur,
                          spatial_shape=spec.spatial_shape)
        for s in range(3):
            plan = build_downsample(st, out_capacity=meas_caps[s + 1])
            occ_max[s + 1] = max(occ_max[s + 1], int(plan.num_out[0]))
            st = SparseTensor(features=jnp.zeros(()), coords=plan.out_coords,
                              spatial_shape=plan.out_shape)
            stage_coords.append(np.asarray(plan.out_coords[0]))
            shapes.append(plan.out_shape)

        for s in range(4):
            cc = stage_coords[s]
            valid = cc[:, 0] >= 0
            for shift in (0, 1):
                win, _, _ = window_coords(jnp.asarray(cc), jnp.asarray(valid),
                                          shapes[s], spec.window_shape,
                                          bool(shift))
                w_valid = np.asarray(win)[valid]
                _, cnts = np.unique(w_valid, return_counts=True)
                for li, (_, (t, lo, hi)) in enumerate(spec.batching_info[s]):
                    m = (cnts >= lo) & (cnts < hi)
                    win_max[s, li] = max(win_max[s, li], int(m.sum()))
                    tok_max[s, li] = max(tok_max[s, li],
                                         int(np.minimum(cnts[m], t).sum()))
        print(f'frame {fi}: stage occ '
              f'{[round(o / args.max_voxels, 3) for o in occ_max]} (running max)',
              flush=True)

    print('\n== suggestions (margin %.2f, MAX_VOXELS=%d) ==' %
          (args.margin, args.max_voxels))
    ratios = [round(args.margin * o / args.max_voxels, 2) for o in occ_max]
    ratios[0] = max(ratios[0], 1.0)   # stage 1 is the voxelizer contract
    print('RUNTIME.STAGE_CAPACITY_RATIOS:', ratios)
    caps = [max(128, int(-(-args.max_voxels * r // 128) * 128)) for r in ratios]
    fracs = []
    for s in range(4):
        row = []
        for li, (_, (t, lo, hi)) in enumerate(spec.batching_info[s]):
            w_need = args.margin * win_max[s, li]
            row.append(round(max(w_need * t / caps[s], 0.02), 2))
        fracs.append(row)
    print('RUNTIME.WINDOW_BUCKET_FRACTIONS:')
    for s in range(4):
        print(f'  {fracs[s]},   # stage {s+1}: max windows {list(win_max[s])}, '
              f'max capped tokens {list(tok_max[s])}')


if __name__ == '__main__':
    main()

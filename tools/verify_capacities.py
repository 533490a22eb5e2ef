"""Verify zero capacity drops on the bench frames (pure numpy, no TPU).

Checks, for each bench frame (bench.py's synthetic generator, seed 0):
  * voxelizer output fits MAX_VOXELS_PER_SAMPLE;
  * every stage's dilated downsample output fits its STAGE_CAPACITY_RATIOS
    capacity;
  * every (stage, shift, level) distinct-window count fits the
    WINDOW_BUCKET_FRACTIONS window capacity W_l, and no window exceeds its
    bucket's max_tokens (i.e. the top-bucket 800 drop cap never binds).

Usage: python tools/verify_capacities.py [--frames 4] [--max_voxels 98304]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def dilated_downsample(coords, shape):
    gz, gy, gx = shape
    oz, oy, ox = (gz - 1) // 2 + 1, (gy - 1) // 2 + 1, (gx - 1) // 2 + 1
    outs = []
    for cz in (0, 1):
        for cy in (0, 1):
            for cx in (0, 1):
                off = (coords + 1) % 2 + 2 * np.array([cz, cy, cx])
                ok = (off < 3).all(1)
                t = (coords[ok] + 1 - off[ok]) // 2
                inb = ((t >= 0).all(1) & (t[:, 0] < oz) & (t[:, 1] < oy)
                       & (t[:, 2] < ox))
                outs.append(t[inb])
    return np.unique(np.concatenate(outs), axis=0), (oz, oy, ox)


def window_counts(coords, shape, wshape, shift):
    gz, gy, gx = shape
    wx, wy, wz = wshape
    sz = 0 if gz == wz else (wz // 2 if shift else 0)
    sx = wx // 2 if shift else 0
    sy = wy // 2 if shift else 0
    z = coords[:, 0] + sz
    y = coords[:, 1] + sy
    x = coords[:, 2] + sx
    nwy = -(-gy // wy) + 1
    nwz = -(-gz // wz) + 1
    win = (x // wx) * (nwy * nwz) + (y // wy) * nwz + (z // wz)
    _, cnts = np.unique(win, return_counts=True)
    return cnts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file', default='configs/waymo_one_sweep.yaml')
    ap.add_argument('--frames', type=int, default=4)
    ap.add_argument('--n_points', type=int, default=163840)
    ap.add_argument('--max_voxels', type=int, default=98304)
    ap.add_argument('--seed', type=int, default=0, help='bench.py uses seed 0')
    args = ap.parse_args()

    from openseg3d_tpu.config import cfg_from_file
    from openseg3d_tpu.core.voxelizer import VoxelGenerator
    from openseg3d_tpu.models.backbones.sparse_unet import stage_capacities
    from openseg3d_tpu.ops.attention import attention_group
    from bench import make_waymo_like_cloud

    cfg = cfg_from_file(args.cfg_file, overrides={
        'RUNTIME': {'MAX_POINTS_PER_SAMPLE': args.n_points,
                    'MAX_VOXELS_PER_SAMPLE': args.max_voxels}})
    vg = VoxelGenerator(cfg.DATASET.VOXEL_SIZE, cfg.DATASET.POINT_CLOUD_RANGE)
    caps = stage_capacities(args.max_voxels, cfg.RUNTIME.STAGE_CAPACITY_RATIOS)
    fracs = cfg.RUNTIME.WINDOW_BUCKET_FRACTIONS
    wshape = cfg.MODEL.WINDOW_SHAPE
    gx, gy, gz = (int(v) for v in vg.grid_size)

    rng = np.random.RandomState(args.seed)
    failures = 0
    for fi in range(args.frames):
        pts = make_waymo_like_cloud(rng, args.n_points)
        coords, _ = vg.generate(pts)
        coords = coords.astype(np.int64)
        shape = (gz, gy, gx)
        for s in range(4):
            v = len(coords)
            ok = v <= caps[s]
            failures += not ok
            print(f'frame {fi} stage {s+1}: voxels {v} / cap {caps[s]} '
                  f'{"OK" if ok else "DROP!"}', flush=True)
            info = cfg.MODEL.BATCHING_INFO[s]
            keys = sorted(info.keys(), key=int)
            for shift in (0, 1):
                cnts = window_counts(coords, shape, wshape, shift)
                for li, k in enumerate(keys):
                    t = info[k]['max_tokens']
                    lo, hi = info[k]['batching_range']
                    m = (cnts >= lo) & (cnts < hi)
                    n_win = int(m.sum())
                    w_cap = max(1, int(math.ceil(fracs[s][li] * caps[s] / t)))
                    g = attention_group(t)
                    w_cap = (w_cap + g - 1) // g * g
                    tok_drop = int(np.maximum(cnts[m] - t, 0).sum())
                    if n_win > w_cap or tok_drop:
                        failures += 1
                        print(f'  stage {s+1} shift {shift} L{li} T={t}: '
                              f'windows {n_win} / {w_cap}, token drops '
                              f'{tok_drop}  DROP!', flush=True)
            if s < 3:
                coords, shape = dilated_downsample(coords, shape)
    print('RESULT:', 'ZERO capacity drops' if failures == 0
          else f'{failures} capacity violations')
    return 0 if failures == 0 else 1


if __name__ == '__main__':
    sys.exit(main())

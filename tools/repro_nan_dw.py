"""Minimal-repro attempt for the round-3 bf16 NaN-dW incident (NOTES r3 #4).

The first cylinder training run (runs/cyl_r3) collapsed to loss=0 after a NaN
appeared in the gradient of the first strided conv. The trigger data came from
a generator bug: the cylinder POINT_CLOUD_RANGE was read as cartesian spans, so
the whole 163k-point cloud collapsed into a ~3 m-radius disk — a degenerate,
hyper-dense occupancy (tiny slab of the 1504x524x72 polar grid). All forward
intermediates were finite; the NaN appeared only in bf16, only at full scale,
only on the real TPU. This script reconstructs EXACTLY that cloud and runs
full-scale bf16 train steps, reporting per-leaf gradient finiteness.

Usage (on the TPU chip):
  python tools/repro_nan_dw.py [--steps 5] [--cfg_file configs/waymo_one_sweep_cylinder.yaml]

Outcome either way is recorded in NOTES_NEXT.md; the train step now carries a
skip-and-log non-finite-grad guard regardless (engine.make_train_step).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def degenerate_cloud(rng, n, rg):
    """The OLD (buggy) synthetic generator geometry for cylinder configs
    (pre-9abd34a): cartesian spans computed from the (rho, phi, z) range."""
    span = (rg[3:5] - rg[0:2]) / 2 * 0.95          # [35.7, 2.98] for cylinder
    zlo, zhi = rg[2] * 0.95, rg[5] * 0.95
    n_ground = int(n * 0.55)
    r = np.sqrt(rng.uniform(1.0, (min(span) * 0.98) ** 2, n_ground))
    th = rng.uniform(-np.pi, np.pi, n_ground)
    gx, gy = r * np.cos(th), r * np.sin(th)
    gz = np.full(n_ground, zlo + 0.05) + rng.normal(0, 0.02, n_ground)
    n_obj = n - n_ground
    ox = rng.uniform(-min(span), min(span), n_obj)
    oy = rng.uniform(-min(span), min(span), n_obj)
    oz = rng.uniform(zlo, zhi, n_obj)
    xyz = np.stack([np.concatenate([gx, ox]), np.concatenate([gy, oy]),
                    np.concatenate([gz, oz])], axis=1).astype(np.float32)
    feats = rng.randn(n, 3).astype(np.float32)
    return np.concatenate([xyz, feats], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file', default='configs/waymo_one_sweep_cylinder.yaml')
    ap.add_argument('--n_points', type=int, default=163840)
    ap.add_argument('--max_voxels', type=int, default=98304)
    ap.add_argument('--steps', type=int, default=5)
    args = ap.parse_args()

    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)

    from openseg3d_tpu.config import cfg_from_file
    from openseg3d_tpu.core.voxelizer import VoxelGenerator, majority_voxel_labels
    from openseg3d_tpu.data.batch import pad_sample, collate_padded
    from openseg3d_tpu.engine import (build_segmentor, create_train_state,
                                      compute_loss)
    from openseg3d_tpu.models.losses import build_criterion
    from openseg3d_tpu.models.optim import build_optimizer, build_schedule
    from openseg3d_tpu.utils.pointops import cart2polar

    cfg = cfg_from_file(args.cfg_file, overrides={
        'RUNTIME': {'MAX_POINTS_PER_SAMPLE': args.n_points,
                    'MAX_VOXELS_PER_SAMPLE': args.max_voxels}})
    rng = np.random.RandomState(0)
    rg = np.asarray(cfg.DATASET.POINT_CLOUD_RANGE, np.float32)
    pts = degenerate_cloud(rng, args.n_points, rg)
    if cfg.DATASET.USE_CYLINDER:
        pts = np.concatenate([cart2polar(pts), pts[:, :2], pts[:, 3:]],
                             axis=1).astype(np.float32)
    vg = VoxelGenerator(cfg.DATASET.VOXEL_SIZE, cfg.DATASET.POINT_CLOUD_RANGE)
    coords, ids = vg.generate(pts)
    print(f'degenerate cloud: {args.n_points} pts -> {coords.shape[0]} voxels '
          f'(healthy frames run ~85-95k)')
    labels = rng.randint(0, 22, args.n_points)
    sample = dict(points=pts, voxel_coords=coords, point_voxel_ids=ids,
                  point_labels=labels,
                  voxel_labels=majority_voxel_labels(ids, labels,
                                                     coords.shape[0]))
    batch = collate_padded([pad_sample(sample, args.n_points, args.max_voxels)])
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != 'batch_size'}

    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 30, 1000))
    state = create_train_state(cfg, model, tx, batch, seed=0)
    criterion = build_criterion(cfg)
    aux_w = float(cfg.MODEL.AUX_LOSS_WEIGHT)

    @jax.jit
    def grads_of(params, batch_stats, batch, key):
        def loss_fn(p):
            out, _ = model.apply({'params': p, 'batch_stats': batch_stats},
                                 batch, train=True, mutable=['batch_stats'],
                                 rngs={'dropout': key})
            return compute_loss(out, batch, criterion, spec, aux_w)
        loss, g = jax.value_and_grad(loss_fn)(params)
        return loss, g

    bad_total = 0
    for i in range(args.steps):
        loss, g = grads_of(state.params, state.batch_stats, batch,
                           jax.random.fold_in(jax.random.PRNGKey(7), i))
        loss = float(loss)
        flat, _ = jax.tree_util.tree_flatten_with_path(g)
        bad = [(jax.tree_util.keystr(k), np.asarray(v))
               for k, v in flat if not bool(jnp.all(jnp.isfinite(v)))]
        print(f'step {i}: loss={loss:.4f} nonfinite_leaves={len(bad)}')
        for k, v in bad[:10]:
            nn_ = int(np.sum(~np.isfinite(v)))
            print(f'  NONFINITE {k}: {nn_}/{v.size} elements')
        bad_total += len(bad)
    print('RESULT:', 'REPRODUCED' if bad_total else 'NOT REPRODUCED',
          f'({bad_total} nonfinite leaves over {args.steps} steps)')


if __name__ == '__main__':
    main()

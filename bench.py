"""End-to-end segmentation throughput benchmark (driver contract).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures single-chip end-to-end inference throughput (points/sec) of the
flagship Segformer segmentor on synthetic Waymo-scale frames (~160k points,
1440x1440x64 grid — configs/waymo_one_sweep.yaml geometry). The input pipeline
is excluded (precomputed padded batch resident in HBM), matching how the
reference's GPU-side throughput is quoted.

vs_baseline: the reference publishes no numbers (BASELINE.md); the working
baseline is an ESTIMATED A100 end-to-end rate for the reference torch pipeline
of 1.65 Mpoints/s (~10 frames/s at 165k pts). The BASELINE.json target is 2x
A100 on a v5e-8: that is the `v5e8_projection_vs_baseline` field (8x the
single-chip rate — pure data parallelism, no forward collectives), which must
reach >= 2.0. The `vs_baseline` field itself is single-chip v5e vs one A100.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

A100_BASELINE_POINTS_PER_SEC = 1.65e6  # documented estimate, see module docstring


def make_waymo_like_cloud(rng, n_points: int):
    """Synthetic LiDAR frame with a real beam model: 64 elevation beams swept
    over azimuth columns; each ray hits either the ground plane (range set by
    beam geometry — dense near-field, sparse far-field like a real spinning
    lidar) or a random vertical obstacle. This reproduces Waymo's voxel
    occupancy statistics (~60-90k occupied 0.1m voxels per ~160k-point frame)
    far better than uniform sampling, which matters because sparse-conv cost
    scales with occupancy structure."""
    sensor_h = 2.0
    n_beams = 64
    n_cols = max(n_points // n_beams, 1)
    elev = np.linspace(np.deg2rad(-18.0), np.deg2rad(2.5), n_beams)
    az = np.linspace(-np.pi, np.pi, n_cols, endpoint=False)
    az = az[None, :] + rng.normal(0, 1e-3, (n_beams, n_cols))
    el = np.broadcast_to(elev[:, None], (n_beams, n_cols)).copy()

    # ground-return range per ray; upward beams get "sky" (clipped far)
    with np.errstate(divide='ignore'):
        r_ground = np.where(el < -1e-3, sensor_h / np.tan(-el), 75.0)
    # obstacles: ~200 buildings/cars at random azimuth spans
    r = np.minimum(r_ground, 74.0)
    n_obs = 200
    ob_az = rng.uniform(-np.pi, np.pi, n_obs)
    ob_w = rng.uniform(0.02, 0.15, n_obs)        # azimuth half-width
    ob_r = rng.uniform(4.0, 70.0, n_obs)
    ob_h = rng.uniform(0.5, 5.0, n_obs)
    for i in range(n_obs):
        hit = (np.abs((az - ob_az[i] + np.pi) % (2 * np.pi) - np.pi) < ob_w[i])
        # the obstacle truncates rays whose ground range exceeds its range and
        # whose height at the obstacle is below its top
        z_at = sensor_h + np.tan(el) * ob_r[i]
        hit &= (r > ob_r[i]) & (z_at < ob_h[i] - 1.9)
        r = np.where(hit, ob_r[i] * rng.uniform(0.98, 1.0), r)

    r = (r * rng.uniform(0.995, 1.005, r.shape)).clip(1.5, 75.0)
    x = r * np.cos(el) * np.cos(az)
    y = r * np.cos(el) * np.sin(az)
    z = sensor_h + r * np.sin(el) - 1.9          # sensor ~1.9m above ground
    xyz = np.stack([x, y, z], -1).reshape(-1, 3)
    xyz = xyz[:n_points]
    if xyz.shape[0] < n_points:
        xyz = np.concatenate([xyz, xyz[:n_points - xyz.shape[0]] + 0.05])
    feats = rng.randn(n_points, 3).astype(np.float32)
    return np.concatenate([xyz.astype(np.float32), feats], 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch_size', type=int, default=1)
    ap.add_argument('--n_points', type=int, default=163840)
    # 25 iters amortize the axon tunnel's ~35ms readback RTT to ~1.4ms/step
    # (at 10 iters the RTT inflated every step by ~3.5ms of pure measurement
    # artifact — host-side, not device time)
    ap.add_argument('--iters', type=int, default=25)
    ap.add_argument('--mode', choices=['infer', 'train', 'train_fwd'],
                    default='infer')
    ap.add_argument('--segmentor', default='segformer')
    ap.add_argument('--max_voxels', type=int, default=98304)
    ap.add_argument('--stage_ratios', type=str, default='',
                    help='comma-separated RUNTIME.STAGE_CAPACITY_RATIOS '
                         'override, for capacity-cost bisection')
    ap.add_argument('--image_feature', action='store_true',
                    help='enable DATASET.USE_IMAGE_FEATURE (DeepFusion '
                         'cross-attention + KNN) with random 28-dim features')
    ap.add_argument('--cfg_file', default='configs/waymo_one_sweep.yaml')
    ap.add_argument('--scan_unroll', type=int, default=None,
                    help='override RUNTIME.SCAN_UNROLL (0/1): compile-time '
                         'vs step-time tradeoff of the depth scans')
    ap.add_argument('--losses', default='',
                    help='override MODEL.LOSSES for train-mode ablation, '
                         'e.g. "ce" or "ohem_ce,lovasz" (cost attribution '
                         'of the loss block)')
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
                                      make_train_step)
    from openseg3d_tpu.models.optim import build_optimizer, build_schedule

    runtime_over = {'MAX_POINTS_PER_SAMPLE': args.n_points,
                    'MAX_VOXELS_PER_SAMPLE': args.max_voxels}
    if args.stage_ratios:
        runtime_over['STAGE_CAPACITY_RATIOS'] = [
            float(x) for x in args.stage_ratios.split(',')]
    if args.scan_unroll is not None:
        runtime_over['SCAN_UNROLL'] = bool(args.scan_unroll)
    overrides = {
        'MODEL': {'SEGMENTOR': args.segmentor},
        'RUNTIME': runtime_over,
    }
    if args.image_feature:
        overrides['DATASET'] = {'USE_IMAGE_FEATURE': True}
    cfg = cfg_from_file(args.cfg_file, overrides=overrides)
    if args.losses:
        # wholesale LOSSES replacement (the strict merge can't introduce new
        # loss names): unfreeze -> swap -> refreeze
        cfg = cfg.unfrozen_copy()
        cfg.MODEL.LOSSES = {name: 1.0 for name in args.losses.split(',')}
        cfg = cfg.freeze()

    rng = np.random.RandomState(0)
    vg = VoxelGenerator(cfg.DATASET.VOXEL_SIZE, cfg.DATASET.POINT_CLOUD_RANGE)
    samples = []
    multi = bool(cfg.DATASET.USE_MULTI_SWEEPS)
    n_cur = args.n_points // cfg.DATASET.NUM_SWEEPS if multi else args.n_points
    for i in range(args.batch_size):
        if multi:
            # NUM_SWEEPS ego-shifted copies of a frame; col 3 = timestamp
            # delta (0 for the current sweep, waymo_dataset.py:156-202)
            sweeps = []
            for si in range(cfg.DATASET.NUM_SWEEPS):
                sw = make_waymo_like_cloud(rng, n_cur)
                sw[:, :2] += 0.4 * si              # ego motion between sweeps
                sw[:, 3] = 0.1 * si                # timestamp delta
                sweeps.append(sw)
            pts = np.concatenate(sweeps)[:args.n_points]
            cur_idx = np.arange(n_cur)
        else:
            pts = make_waymo_like_cloud(rng, args.n_points)
        if cfg.DATASET.USE_CYLINDER:
            from openseg3d_tpu.utils.pointops import cart2polar
            pts = np.concatenate([cart2polar(pts), pts[:, :2], pts[:, 3:]],
                                 axis=1).astype(np.float32)
        coords, ids = vg.generate(pts)
        labels = rng.randint(0, 22, n_cur)
        # mirror the dataset: voxel labels are voted over CURRENT-frame points
        # only (waymo_dataset.prepare_voxel_labels) — history-dominated mixed
        # voxels keep their current-point label, not ignore (ADVICE r3)
        vote_ids = ids[cur_idx] if multi else ids
        s_dict = dict(points=pts, voxel_coords=coords, point_voxel_ids=ids,
                      point_labels=labels,
                      voxel_labels=majority_voxel_labels(
                          vote_ids, labels, coords.shape[0]))
        if multi:
            s_dict['cur_point_indices'] = cur_idx
        if args.image_feature:
            # per-CURRENT-point features (dataset contract, waymo_dataset.py)
            s_dict['point_image_features'] = rng.randn(
                n_cur, cfg.DATASET.DIM_IMAGE_FEATURE).astype(np.float32)
        samples.append(s_dict)
    n_voxels = [int(s['voxel_coords'].shape[0]) for s in samples]
    batch = collate_padded([pad_sample(s, args.n_points, args.max_voxels)
                            for s in samples])
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != 'batch_size'}

    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 30, 1000))
    state = create_train_state(cfg, model, tx, batch, seed=0)

    # Timing protocol: on the axon TPU tunnel, block_until_ready is a no-op
    # until the first device->host readback. A scalar readback per iteration
    # forces true synchronization (validated against jax.profiler device
    # times); it adds ~35ms of tunnel round trip per step, so the numbers are
    # slightly conservative.
    _ = float(jax.jit(lambda: jnp.zeros(()))()[...])   # flip to sync mode

    # Per-iteration scalar readbacks would add the ~35ms tunnel RTT to every
    # step, so instead K steps are dispatched back-to-back and ONE readback
    # closes the batch: the device stream executes in order, so the last
    # step's completion implies all completed. One RTT amortized over K.
    if args.mode == 'infer':
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

        @jax.jit
        def step(b):
            return model.apply(variables, b, train=False)['point_out']

        t0 = time.time()
        _ = float(step(batch)[0, 0, 0])
        compile_s = time.time() - t0
        t0 = time.time()
        for _i in range(args.iters):
            out = step(batch)
        _ = float(out[0, 0, 0])
        med = (time.time() - t0) / args.iters
    elif args.mode == 'train_fwd':
        # decomposition probe: the TRAIN-mode forward + losses WITHOUT
        # value_and_grad/optimizer — train minus train_fwd isolates the
        # backward+update cost
        from openseg3d_tpu.engine import compute_loss
        from openseg3d_tpu.models.losses import build_criterion
        criterion = build_criterion(cfg)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def fstep(params, batch_stats, b):
            out, mut = model.apply(
                {'params': params, 'batch_stats': batch_stats}, b,
                train=True, mutable=['batch_stats'], rngs={'dropout': key})
            return compute_loss(out, b, criterion, spec,
                                float(cfg.MODEL.AUX_LOSS_WEIGHT))

        t0 = time.time()
        _ = float(fstep(state.params, state.batch_stats, batch))
        compile_s = time.time() - t0
        t0 = time.time()
        for _i in range(args.iters):
            loss = fstep(state.params, state.batch_stats, batch)
        _ = float(loss)
        med = (time.time() - t0) / args.iters
    else:
        # donate=True is the production train path (tools/train.py:144): the
        # old state's buffers are reused in place, which removes the
        # defragmentation copies a non-donated 3-tree update pays
        tstep = make_train_step(cfg, spec, model, donate=True)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        state, m = tstep(state, batch, key)
        _ = float(m['loss'])
        compile_s = time.time() - t0
        t0 = time.time()
        for _i in range(args.iters):
            state, m = tstep(state, batch, key)
        _ = float(m['loss'])
        med = (time.time() - t0) / args.iters
    pts_per_sec = args.batch_size * args.n_points / med

    print(json.dumps({
        'metric': f'{args.segmentor}{"+deepfusion" if args.image_feature else ""} '
                  f'end-to-end {args.mode} throughput '
                  f'(single chip, {args.n_points} pts/frame, '
                  f'voxels={n_voxels}, step={med * 1e3:.1f}ms)',
        'value': round(pts_per_sec / 1e6, 4),
        'unit': 'Mpoints/sec',
        # single-chip rate / estimated single-A100 reference rate (BASELINE.md
        # documents the estimate's derivation). The BASELINE.json target of
        # ">=2x A100 on a v5e-8" compares 8 chips against one A100; pure DP
        # with zero forward collectives scales ~linearly, so the v5e-8
        # projection is 8x this number — reported separately, not folded in.
        'vs_baseline': round(pts_per_sec / A100_BASELINE_POINTS_PER_SEC, 3),
        'compile_s': round(compile_s, 1),
        'step_ms': round(med * 1e3, 1),
        'v5e8_projection_vs_baseline': round(
            8 * pts_per_sec / A100_BASELINE_POINTS_PER_SEC, 2),
    }))


if __name__ == '__main__':
    main()

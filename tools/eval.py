"""Offline evaluation with test-time augmentation.

Parity: tools/eval.py — validation split, 36-variant TTA (3 scales x 3 angles
x flip_x x flip_y), softmax-averaged point predictions, IoU metric.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate a 3d segmentor')
    p.add_argument('--cfg_file', type=str, default=None)
    p.add_argument('--data_dir', type=str, default=None)
    p.add_argument('--save_dir', type=str, required=True,
                   help='directory containing latest/ checkpoint')
    p.add_argument('--log_iter_interval', default=10, type=int)
    p.add_argument('--no_tta', action='store_true')
    p.add_argument('--tta_batch', default=2, type=int,
                   help='TTA variants batched per forward (36 variants; pick '
                        'a divisor of 36 — HBM holds 2-4 at default caps)')
    p.add_argument('--synthetic', action='store_true')
    p.add_argument('--synthetic_frames', default=8, type=int)
    p.add_argument('--tta_workers', default=0, type=int,
                   help='host processes preparing TTA variants ahead of the '
                        'device (0 = inline; round-3 measured the inline host '
                        'side at ~27 s/frame on a 1-core box)')
    p.add_argument('--tta_device', action='store_true',
                   help='run the TTA transforms AND re-voxelization on device '
                        '(ops/voxelize): the 36 variant parameters become '
                        'traced inputs of one jitted forward, so the host '
                        'touches each frame once. Cartesian single-sweep '
                        'without image features only. Measured r5 on a 1-core '
                        'host: 34.5 -> 16.8 s/frame (pure device forwards; '
                        'use --tta_batch 1 — B=2 execution is ~2.3x/sample '
                        'slower, NOTES r5)')
    return p.parse_args()


def main():
    args = parse_args()
    from openseg3d_tpu.config import cfg_from_file
    from openseg3d_tpu.utils import get_root_logger
    from openseg3d_tpu.utils.checkpoint import restore_checkpoint, latest_checkpoint
    from openseg3d_tpu.engine import build_segmentor, create_train_state
    from openseg3d_tpu.models.optim import build_optimizer, build_schedule
    from openseg3d_tpu.core.metrics import IOUMetric
    from openseg3d_tpu.data.test_time_aug import MultiScaleFlipAug
    from openseg3d_tpu.data.batch import collate_padded
    from openseg3d_tpu.utils.jax_cache import enable_compilation_cache
    import jax
    import jax.numpy as jnp
    enable_compilation_cache()

    logger = get_root_logger(os.path.join(args.save_dir, 'eval.log'))
    cfg = cfg_from_file(args.cfg_file)

    import functools
    if args.synthetic:
        from openseg3d_tpu.data.synthetic import SyntheticDataset
        dataset_factory = functools.partial(
            SyntheticDataset, cfg, args.synthetic_frames, mode='validation')
    else:
        from openseg3d_tpu.data.waymo_dataset import WaymoDataset
        dataset_factory = functools.partial(
            WaymoDataset, cfg, args.data_dir, 'validation')
    dataset = dataset_factory()

    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 1, 1))
    sample = collate_padded([dataset.load_padded(0)[0]])
    sample = {k: v for k, v in sample.items() if k != 'batch_size'}
    state = create_train_state(cfg, model, tx, sample, seed=0)
    latest = latest_checkpoint(args.save_dir)
    if latest:
        state, _ = restore_checkpoint(latest, state)
        logger.info('loaded %s', latest)
    else:
        logger.warning('no checkpoint in %s; evaluating random init', args.save_dir)

    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    @jax.jit
    def forward(batch):
        out = model.apply(variables, batch, train=False)
        return jax.nn.softmax(out['point_out'].astype(jnp.float32), axis=-1)

    if args.tta_device and not args.no_tta:
        if (cfg.DATASET.USE_MULTI_SWEEPS or cfg.DATASET.USE_CYLINDER
                or cfg.DATASET.USE_IMAGE_FEATURE):
            raise ValueError('--tta_device supports cartesian single-sweep '
                             'configs without image features (the host TTA '
                             'path covers the rest)')
        from openseg3d_tpu.ops.voxelize import device_voxelize
        p_cap = int(cfg.RUNTIME.MAX_POINTS_PER_SAMPLE)
        v_cap = int(cfg.RUNTIME.MAX_VOXELS_PER_SAMPLE)
        vs = tuple(float(v) for v in cfg.DATASET.VOXEL_SIZE)
        pr = tuple(float(v) for v in cfg.DATASET.POINT_CLOUD_RANGE)

        @jax.jit
        def tta_device_group(points1, pmask1, var_params):
            """points1 [P, D], pmask1 [P], var_params [G, 4] rows of
            (scale, angle, x_mult, y_mult) -> [P, C] softmax-prob SUM over
            the G variants. Transform semantics mirror
            data/test_time_aug._prepare_variant exactly: scale, rotate_z
            (x -> y positive), then axis sign flips."""
            def tx(pp):
                scale, angle, mx, my = pp[0], pp[1], pp[2], pp[3]
                xyz = points1[:, :3] * scale
                cth, sth = jnp.cos(angle), jnp.sin(angle)
                rot = jnp.stack([
                    jnp.stack([cth, sth, jnp.float32(0)]),
                    jnp.stack([-sth, cth, jnp.float32(0)]),
                    jnp.stack([jnp.float32(0), jnp.float32(0), jnp.float32(1)]),
                ])
                xyz = xyz @ rot
                xyz = xyz * jnp.stack([mx, my, jnp.float32(1)])
                return jnp.concatenate([xyz, points1[:, 3:]], axis=1)

            pts = jax.vmap(tx)(var_params)                       # [G, P, D]
            pm = jnp.broadcast_to(pmask1[None], pts.shape[:2])
            vc, vm, vids, _ = device_voxelize(pts, pm, vs, pr, v_cap)
            batch = {'points': pts, 'point_mask': pm, 'cur_point_mask': pm,
                     'point_voxel_ids': vids, 'voxel_coords': vc,
                     'voxel_mask': vm}
            out = model.apply(variables, batch, train=False)
            probs = jax.nn.softmax(out['point_out'].astype(jnp.float32), -1)
            return probs.sum(axis=0)

    # TTA accumulation stays ON DEVICE: reading the [N, 22] prob tensor back
    # per variant costs ~14MB x 36 through the axon tunnel; accumulating in
    # HBM and reading back one int32 argmax per frame removes ~99% of that.
    accum = jax.jit(lambda a, p: a + p)
    # batched-TTA accumulation: sum the variant axis on device in the same op
    accum_b = jax.jit(lambda a, p: a + p.sum(axis=0))
    dev_argmax = jax.jit(lambda a: jnp.argmax(a, axis=-1))

    # TTA protocol (tools/eval.py:97-100)
    tta = MultiScaleFlipAug(dataset, scales=[0.95, 1.0, 1.05],
                            angles=[-np.pi / 4, 0.0, np.pi / 4],
                            flip_x=True, flip_y=True,
                            dataset_factory=dataset_factory,
                            num_workers=args.tta_workers)
    if not args.no_tta and tta.num_variants() % max(args.tta_batch, 1) != 0:
        # validate up front: a post-hoc assert would fire only after partial
        # groups were already accumulated (and vanishes under -O) (ADVICE r3)
        raise ValueError(
            f'--tta_batch={args.tta_batch} must divide the variant count '
            f'({tta.num_variants()})')

    metric = IOUMetric(dataset.class_names)
    for i in range(len(dataset)):
        # TTA must start from the RAW cartesian sample: __getitem__ output is
        # already cylinder-transformed + voxelized, and re-running
        # prepare_data on it would corrupt every variant.
        raw = dataset.load_raw(i)
        if args.no_tta:
            prepared = dataset.prepare_data(raw)
            dataset.prepare_voxel_labels(prepared)
            b = collate_padded([dataset.pad(prepared)])
            b = {k: jnp.asarray(v) for k, v in b.items() if k != 'batch_size'}
            preds = np.asarray(dev_argmax(forward(b)[0]))
            mask = np.asarray(b['point_mask'][0]) & np.asarray(b['cur_point_mask'][0])
            gt = np.asarray(b['point_labels'][0])
        elif args.tta_device:
            # host touches the frame ONCE: pad the raw cloud; every variant's
            # transform + voxelization happens inside tta_device_group
            pts_raw = np.asarray(raw['points'], np.float32)[:p_cap]
            n = pts_raw.shape[0]
            points1 = np.zeros((p_cap, pts_raw.shape[1]), np.float32)
            points1[:n] = pts_raw
            pmask1 = np.zeros(p_cap, bool)
            pmask1[:n] = True
            gt = np.full(p_cap, 255, np.int32)
            gt[:n] = np.asarray(raw['point_labels'], np.int32)[:n]
            mask = pmask1
            pts_dev = jnp.asarray(points1)
            pm_dev = jnp.asarray(pmask1)
            params = [(s, a, -1.0 if fy else 1.0, -1.0 if fx else 1.0)
                      for s, a, fx, fy in tta._variant_params()]
            g = max(args.tta_batch, 1)
            acc = None
            for lo in range(0, len(params), g):
                vp = jnp.asarray(np.asarray(params[lo:lo + g], np.float32))
                ps = tta_device_group(pts_dev, pm_dev, vp)
                acc = ps if acc is None else accum(acc, ps)
            preds = np.asarray(dev_argmax(acc))
        else:
            # softmax-mean over variants; each variant may reorder points, so
            # accumulation is in padded order (variants share the raw order
            # because eval disables the training-time shuffles). Variants are
            # batched --tta_batch per forward: one compiled executable serves
            # every group, and the variant axis is summed on device.
            acc, mask, gt = None, None, None
            group = []
            for b in tta(raw, index=i):
                if mask is None:
                    mask = np.asarray(b['point_mask'][0]) & np.asarray(b['cur_point_mask'][0])
                    gt = np.asarray(b['point_labels'][0])
                group.append(b)
                if len(group) < max(args.tta_batch, 1):
                    continue
                big = {k: np.concatenate([g[k] for g in group])
                       for k in group[0] if k != 'batch_size'}
                group = []
                ps = forward({k: jnp.asarray(v) for k, v in big.items()})
                acc = ps.sum(axis=0) if acc is None else accum_b(acc, ps)
            preds = np.asarray(dev_argmax(acc))
        metric.add(preds[mask], gt[mask])
        if (i + 1) % args.log_iter_interval == 0:
            logger.info('evaluated [%d/%d]', i + 1, len(dataset))

    tta.close()
    result = metric.get_metric()
    logger.info('Metrics on validation dataset: mIoU=%.4f', result['mIOU'])
    for k, v in result['IOU'].items():
        logger.info('  %s: %.4f', k, v)
    print('mIoU', result['mIOU'])


if __name__ == '__main__':
    main()

"""Train a 3D segmentor (SPMD data-parallel over a jax mesh).

CLI-surface parity with the reference trainer (tools/train.py:21-43): same
flags plus --synthetic (train on generated frames, no dataset needed) and
--num_devices. --launcher/--sync_bn are accepted for compatibility: multi-host
bring-up is jax.distributed (no launcher dance) and BN statistics are always
cross-replica under SPMD.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Train a 3d segmentor')
    p.add_argument('--cfg_file', type=str, default=None)
    p.add_argument('--data_dir', type=str, default=None)
    p.add_argument('--save_dir', type=str, required=True)
    p.add_argument('--pretrained_path', type=str, default=None)
    p.add_argument('--batch_size', default=2, type=int,
                   help='per-process batch size')
    p.add_argument('--num_workers', default=4, type=int)
    p.add_argument('--launcher', choices=['none', 'jax'], default='none')
    p.add_argument('--epochs', default=30, type=int)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--deterministic', action='store_true', default=False)
    p.add_argument('--sync_bn', action='store_true', default=False,
                   help='accepted for parity; BN is always cross-replica')
    p.add_argument('--no_validate', action='store_true')
    p.add_argument('--eval_epoch_interval', default=2, type=int)
    p.add_argument('--log_iter_interval', default=10, type=int)
    p.add_argument('--auto_resume', action='store_true')
    p.add_argument('--synthetic', action='store_true',
                   help='train on synthetic frames (no dataset required)')
    p.add_argument('--synthetic_frames', default=64, type=int)
    p.add_argument('--num_devices', default=0, type=int)
    return p.parse_args()


def evaluate(args, loader, state, eval_step, mesh, class_names, epoch, logger):
    import jax.numpy as jnp
    from openseg3d_tpu.core.metrics import IOUMetric
    from openseg3d_tpu.parallel.mesh import shard_batch

    metric = IOUMetric(class_names)
    losses = []
    for step_i, batch in enumerate(loader, 1):
        b = shard_batch({k: v for k, v in batch.items() if k != 'batch_size'}, mesh)
        out = eval_step(state, b)
        metric.add_hist(np.asarray(out['hist']))
        losses.append(float(out['loss']))
        if step_i % args.log_iter_interval == 0:
            logger.info('Evaluate epoch %d - Iter [%d/%d] loss: %.4f',
                        epoch, step_i, len(loader), losses[-1])
    result = metric.get_metric()
    logger.info('Metrics on validation dataset: mIoU=%.4f %s',
                result['mIOU'], result['IOU'])
    return result


def main():
    args = parse_args()
    os.makedirs(args.save_dir, exist_ok=True)

    from openseg3d_tpu.config import cfg_from_file
    from openseg3d_tpu.utils import get_root_logger, init_random_seed, set_random_seed
    from openseg3d_tpu.utils.checkpoint import (save_checkpoint, restore_checkpoint,
                                                latest_checkpoint, load_pretrained)
    from openseg3d_tpu.parallel.mesh import (init_distributed, make_mesh,
                                             make_sharded_train_step,
                                             make_sharded_eval_step, shard_batch)
    from openseg3d_tpu.engine import (build_segmentor, create_train_state,
                                      make_train_step, make_eval_step)
    from openseg3d_tpu.models.optim import build_optimizer, build_schedule
    from openseg3d_tpu.data.loader import DataLoader
    from openseg3d_tpu.utils.jax_cache import enable_compilation_cache
    import jax
    enable_compilation_cache()

    rank, world = init_distributed()
    logger = get_root_logger(os.path.join(args.save_dir, 'train.log'))
    logger.info('process %d/%d, devices: %s', rank, world, jax.devices())

    seed = init_random_seed(args.seed)
    set_random_seed(seed)
    logger.info('seed: %d', seed)

    cfg = cfg_from_file(args.cfg_file)
    mesh = make_mesh(args.num_devices or cfg.RUNTIME.NUM_DEVICES)
    logger.info('mesh: %s', mesh)

    # data (factories must pickle — loader workers are spawned, not forked)
    from functools import partial
    if args.synthetic:
        from openseg3d_tpu.data.synthetic import SyntheticDataset
        mk_train = partial(SyntheticDataset, cfg, args.synthetic_frames,
                           mode='training', seed=seed)
        mk_val = partial(SyntheticDataset, cfg,
                         max(args.synthetic_frames // 4, 2),
                         mode='validation', seed=seed + 777)
    else:
        from openseg3d_tpu.data.waymo_dataset import WaymoDataset
        mk_train = partial(WaymoDataset, cfg, args.data_dir, 'training')
        mk_val = partial(WaymoDataset, cfg, args.data_dir, 'validation')

    train_loader = DataLoader(mk_train, args.batch_size, shuffle=True,
                              num_workers=args.num_workers, seed=seed)
    val_loader = DataLoader(mk_val, args.batch_size, shuffle=False,
                            num_workers=0, drop_last=False)
    dataset = train_loader.dataset
    iters_per_epoch = len(train_loader)
    logger.info('dataset: %d frames, %d iters/epoch', len(dataset), iters_per_epoch)

    # model + optimizer + schedule (per-iteration stepping, train.py:149)
    model, spec = build_segmentor(cfg)
    schedule = build_schedule(cfg, args.epochs, iters_per_epoch)
    tx = build_optimizer(cfg, schedule)

    sample = next(iter(val_loader))
    sample = {k: v for k, v in sample.items() if k != 'batch_size'}
    t0 = time.time()
    state = create_train_state(cfg, model, tx, sample, seed=seed)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    logger.info('model: %s, %.1fM params (init %.0fs)',
                cfg.MODEL.SEGMENTOR, n_params / 1e6, time.time() - t0)

    start_epoch = 0
    if args.pretrained_path:
        state = load_pretrained(args.pretrained_path, state, logger)
    if args.auto_resume:
        latest = latest_checkpoint(args.save_dir)
        if latest:
            state, start_epoch = restore_checkpoint(latest, state)
            logger.info('resumed from %s at epoch %d', latest, start_epoch)

    train_step = make_sharded_train_step(make_train_step(cfg, spec, model, donate=False),
                                         mesh, donate=True)
    eval_step = make_sharded_eval_step(make_eval_step(cfg, spec, model), mesh)
    rng = jax.random.PRNGKey(seed)

    from openseg3d_tpu.utils.timer import Timer
    for epoch in range(start_epoch, args.epochs):
        cur_epoch = epoch + 1
        train_loader.set_epoch(epoch)
        t_epoch = time.time()
        data_timer, step_timer = Timer(), Timer()
        it = iter(train_loader)
        step_i = 0
        finite_flags = []   # device arrays; synced only at log steps
        while True:
            with data_timer:
                batch = next(it, None)
            if batch is None:
                break
            step_i += 1
            with step_timer:
                b = shard_batch({k: v for k, v in batch.items() if k != 'batch_size'}, mesh)
                state, metrics = train_step(state, b, rng)
                # grads_finite is collected EVERY iteration (ADVICE r4: a
                # skip on a non-log iteration must not vanish silently) but
                # only pulled to host at log steps, alongside loss.
                finite_flags.append(metrics['grads_finite'])
                if step_i % args.log_iter_interval == 0:
                    loss = float(metrics['loss'])   # forces device sync
                    n_skipped = sum(1 for f in finite_flags if not bool(f))
                    finite_flags.clear()
                    if n_skipped:
                        # skip-and-log policy (engine.make_train_step): the
                        # updates were dropped on device; surface them loudly
                        logger.error(
                            'NON-FINITE GRADIENTS: %d update(s) skipped in '
                            'the last %d iters (epoch %d, through iter %d, '
                            'loss=%f)', n_skipped, args.log_iter_interval,
                            cur_epoch, step_i, loss)
            if step_i % args.log_iter_interval == 0:
                lr = float(schedule(int(state.step)))
                logger.info('Train - Epoch [%d/%d] Iter [%d/%d] lr: %f, loss: %f, '
                            'step: %.0fms, data-wait: %.0fms',
                            cur_epoch, args.epochs, step_i, iters_per_epoch, lr, loss,
                            step_timer.mean * 1e3, data_timer.mean * 1e3)
                data_timer.reset(); step_timer.reset()
        n_skipped = sum(1 for f in finite_flags if not bool(f))
        if n_skipped:   # trailing iterations after the last log step
            logger.error('NON-FINITE GRADIENTS: %d update(s) skipped in the '
                         'trailing iters of epoch %d', n_skipped, cur_epoch)
        logger.info('epoch %d done in %.1fs', cur_epoch, time.time() - t_epoch)

        if rank == 0:
            save_checkpoint(args.save_dir, cur_epoch, state, logger)
        if not args.no_validate and cur_epoch % args.eval_epoch_interval == 0:
            evaluate(args, val_loader, state, eval_step, mesh,
                     dataset.class_names, cur_epoch, logger)

    train_loader.close()
    logger.info('training complete')


if __name__ == '__main__':
    main()

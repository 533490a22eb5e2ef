"""Leaderboard inference: testing split -> Waymo eval-server submission file.

Parity: tools/test.py — per-frame prediction on the testing frame list, point
predictions scattered back into the 64x2650 two-return range image, proto
submission written (seg3d/utils/submission.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Run leaderboard inference')
    p.add_argument('--cfg_file', type=str, default=None)
    p.add_argument('--data_dir', type=str, required=True)
    p.add_argument('--save_dir', type=str, required=True)
    p.add_argument('--account', type=str, default='')
    p.add_argument('--method_name', type=str, default='openseg3d_tpu')
    p.add_argument('--log_iter_interval', default=10, type=int)
    return p.parse_args()


def main():
    args = parse_args()
    if os.environ.get('OPENSEG3D_ALLOW_WOD_STUB') == '1':
        # rehearsal mode (tools/rehearsal.py): no waymo_open_dataset in the
        # environment — install the pickle-backed proto stand-in. The output
        # file is NOT a valid eval-server submission; loud by design.
        try:
            import waymo_open_dataset  # noqa: F401
        except ImportError:
            from openseg3d_tpu.utils.wod_stub import install
            install()
            print('WARNING: waymo_open_dataset stub installed — submission '
                  'file is a rehearsal artifact, not a valid proto upload',
                  flush=True)
    from openseg3d_tpu.config import cfg_from_file
    from openseg3d_tpu.utils import get_root_logger
    from openseg3d_tpu.utils.checkpoint import restore_checkpoint, latest_checkpoint
    from openseg3d_tpu.utils.submission import construct_seg_frame, write_submission_file
    from openseg3d_tpu.engine import build_segmentor, create_train_state
    from openseg3d_tpu.models.optim import build_optimizer, build_schedule
    from openseg3d_tpu.data.waymo_dataset import WaymoDataset
    from openseg3d_tpu.data.batch import collate_padded
    from openseg3d_tpu.utils.jax_cache import enable_compilation_cache
    import jax
    import jax.numpy as jnp
    enable_compilation_cache()

    logger = get_root_logger(os.path.join(args.save_dir, 'test.log'))
    cfg = cfg_from_file(args.cfg_file)
    dataset = WaymoDataset(cfg, args.data_dir, 'testing')
    logger.info('testing frames: %d', len(dataset))

    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 1, 1))
    sample = collate_padded([dataset.load_padded(0)[0]])
    sample = {k: v for k, v in sample.items() if k != 'batch_size'}
    state = create_train_state(cfg, model, tx, sample, seed=0)
    latest = latest_checkpoint(args.save_dir)
    assert latest, f'no checkpoint found in {args.save_dir}'
    state, _ = restore_checkpoint(latest, state)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    @jax.jit
    def forward(batch):
        return model.apply(variables, batch, train=False)['point_out']

    frames = []
    for i in range(len(dataset)):
        raw = dataset[i]
        file_idx, frame_idx, ts = dataset.parse_filename(raw['filename'])
        b = collate_padded([dataset.pad(raw)])
        bj = {k: jnp.asarray(v) for k, v in b.items() if k != 'batch_size'}
        logits = np.asarray(forward(bj))[0]
        mask = np.asarray(b['point_mask'][0]) & np.asarray(b['cur_point_mask'][0])
        preds = logits.argmax(-1)[mask]
        ri = np.asarray(b['points_ri'][0])[mask]
        frames.append(construct_seg_frame(preds, ri, context_name=file_idx,
                                          timestamp=ts))
        if (i + 1) % args.log_iter_interval == 0:
            logger.info('inferred [%d/%d]', i + 1, len(dataset))

    path = write_submission_file(frames, args.save_dir, account=args.account,
                                 method_name=args.method_name)
    logger.info('submission written to %s', path)


if __name__ == '__main__':
    main()

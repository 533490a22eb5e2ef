"""End-to-end Segformer (window-transformer segmentor): train + eval."""

import jax
import jax.numpy as jnp
import numpy as np

from openseg3d_tpu.engine import (build_segmentor, create_train_state,
                                  make_train_step, make_eval_step)
from openseg3d_tpu.models.optim import build_optimizer, build_schedule

from helpers import tiny_cfg, synthetic_batch


def test_segformer_train_and_eval():
    cfg = tiny_cfg(MODEL={'SEGMENTOR': 'segformer', 'DEPTHS': [2, 2, 2, 2]})
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg).items()
             if k != 'batch_size'}

    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 1, 100))
    state = create_train_state(cfg, model, tx, batch, seed=0)

    train_step = make_train_step(cfg, spec, model, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    eval_step = make_eval_step(cfg, spec, model)
    out = eval_step(state, batch)
    assert np.isfinite(float(out['loss']))
    n_valid = int(np.sum(np.array(batch['point_mask']) & np.array(batch['cur_point_mask'])))
    assert int(np.array(out['hist']).sum()) == n_valid

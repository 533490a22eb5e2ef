"""End-to-end SPNet: init, train steps (loss decreases), eval step."""

import jax
import jax.numpy as jnp
import numpy as np

from openseg3d_tpu.engine import (build_segmentor, create_train_state,
                                  make_train_step, make_eval_step)
from openseg3d_tpu.models.optim import build_optimizer, build_schedule

from helpers import tiny_cfg, synthetic_batch


def _device_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if k != 'batch_size'}


def test_spnet_train_and_eval():
    cfg = tiny_cfg(MODEL={'SEGMENTOR': 'spnet'})
    batch = _device_batch(synthetic_batch(cfg))

    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, epochs=1, iters_per_epoch=100))
    state = create_train_state(cfg, model, tx, batch, seed=0)

    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(state.params))
    assert n_params > 1e6  # real UNet, not a stub

    train_step = make_train_step(cfg, spec, model, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f'loss did not decrease: {losses}'

    eval_step = make_eval_step(cfg, spec, model)
    out = eval_step(state, batch)
    assert np.isfinite(float(out['loss']))
    hist = np.array(out['hist'])
    assert hist.shape == (22, 22)
    # every valid current point is counted exactly once
    n_valid = int(np.sum(np.array(batch['point_mask']) & np.array(batch['cur_point_mask'])))
    assert hist.sum() == n_valid


def test_spnet_batch_stats_update():
    cfg = tiny_cfg(MODEL={'SEGMENTOR': 'spnet'})
    batch = _device_batch(synthetic_batch(cfg))
    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 1, 10))
    state = create_train_state(cfg, model, tx, batch)
    train_step = make_train_step(cfg, spec, model, donate=False)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    state2, _ = train_step(state, batch, jax.random.PRNGKey(1))
    after = jax.tree_util.tree_leaves(state2.batch_stats)
    diffs = [float(np.abs(np.array(a) - np.array(b)).sum()) for a, b in zip(before, after)]
    assert sum(d > 0 for d in diffs) > len(diffs) // 2, diffs


def test_nonfinite_grad_guard_skips_update():
    """engine.make_train_step skip-and-log guard (NOTES r3 #4 bf16 NaN dW
    incident): a batch that yields non-finite gradients must leave params and
    optimizer state untouched and report grads_finite=False; a sane batch
    afterwards must update normally."""
    cfg = tiny_cfg(MODEL={'SEGMENTOR': 'spnet'})
    batch = _device_batch(synthetic_batch(cfg))
    model, spec = build_segmentor(cfg)
    tx = build_optimizer(cfg, build_schedule(cfg, 1, 10))
    state = create_train_state(cfg, model, tx, batch, seed=0)
    train_step = make_train_step(cfg, spec, model, donate=False)

    poisoned = dict(batch)
    pts = np.asarray(batch['points']).copy()
    pts[0, 0, :] = np.inf                       # valid point with inf coords
    poisoned['points'] = jnp.asarray(pts)
    state2, m = train_step(state, poisoned, jax.random.PRNGKey(0))
    assert not bool(m['grads_finite'])
    assert int(state2.step) == int(state.step) + 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # batch_stats must ALSO be untouched: the poisoned forward's BN running
    # stats are NaN, and committing them would poison every later eval
    # (ADVICE r4 medium).
    for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                    jax.tree_util.tree_leaves(state2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state3, m2 = train_step(state2, batch, jax.random.PRNGKey(0))
    assert bool(m2['grads_finite'])
    changed = any(
        np.abs(np.asarray(a) - np.asarray(b)).sum() > 0
        for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                        jax.tree_util.tree_leaves(state3.params)))
    assert changed

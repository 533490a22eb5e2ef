"""Optimizers and LR schedules.

Parity: build_optimizer / build_scheduler (seg3d/models/builder.py:43-66) and
WarmupPolyLR (seg3d/models/optimizers/lr_scheduler.py:38-83): AdamW or SGD(+
momentum), with warmup-poly / cosine-annealing / one-cycle schedules stepped
per iteration.
"""

from __future__ import annotations

import optax


def warmup_poly_schedule(base_lr: float, max_iters: int, warmup_iters: int,
                         warmup_factor: float = 0.001, power: float = 0.9):
    """lr(i) = base * warmup(i) * (1 - i/max_iters)^power with linear warmup
    (lr_scheduler.py:38-83)."""
    def schedule(count):
        import jax.numpy as jnp
        i = jnp.minimum(count, max_iters)
        alpha = jnp.minimum(i / max(warmup_iters, 1), 1.0)
        warm = warmup_factor * (1 - alpha) + alpha
        poly = jnp.power(jnp.maximum(1.0 - i / max_iters, 0.0), power)
        return base_lr * warm * poly
    return schedule


def build_schedule(cfg, epochs: int, iters_per_epoch: int):
    total = max(epochs * iters_per_epoch, 1)
    name = cfg.TRAIN.LR_SCHEDULER
    lr = cfg.TRAIN.LR
    if name == 'warmup_poly_lr':
        return warmup_poly_schedule(lr, total, warmup_iters=iters_per_epoch)
    if name == 'cosine_annealing':
        return optax.cosine_decay_schedule(lr, decay_steps=total)
    if name == 'one_cycle':
        return optax.cosine_onecycle_schedule(transition_steps=total, peak_value=lr)
    raise NotImplementedError(name)


def build_optimizer(cfg, schedule) -> optax.GradientTransformation:
    if cfg.TRAIN.OPTIMIZER == 'adamw':
        return optax.adamw(schedule, weight_decay=cfg.TRAIN.WEIGHT_DECAY)
    if cfg.TRAIN.OPTIMIZER == 'sgd':
        return optax.chain(
            optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY),
            optax.sgd(schedule, momentum=cfg.TRAIN.MOMENTUM),
        )
    raise NotImplementedError(cfg.TRAIN.OPTIMIZER)

"""Training/eval engine: state, loss composition, jitted SPMD steps.

Parity targets: the train loop of tools/train.py:71-158 (compute_loss with
point + voxel + 0.4x aux losses incl. the KNN voxel-center label transfer,
per-iteration LR stepping) — rebuilt as pure jitted step functions over padded
batches. Gradient all-reduce, BN cross-replica stats and the eval histogram all
come out of XLA SPMD over the data mesh; there is no explicit collective code
(SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .models.losses import build_criterion
from .models.segmentors.common import ModelSpec
from .ops.knn import nearest_label_transfer
from .utils.pointops import get_voxel_centers
from .core.metrics import confusion_matrix


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=batch_stats, opt_state=new_opt)


def build_segmentor(cfg):
    """Analog of build_segmentor (seg3d/models/builder.py:8-23)."""
    spec = ModelSpec.from_config(cfg)
    name = cfg.MODEL.SEGMENTOR
    if name == 'spnet':
        from .models.segmentors.spnet import SPNet
        return SPNet(spec=spec), spec
    if name == 'segformer':
        from .models.segmentors.segformer import Segformer
        return Segformer(spec=spec), spec
    raise NotImplementedError(name)


def create_train_state(cfg, model, tx, sample_batch, seed: int = 0) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    init_fn = jax.jit(model.init, static_argnames=('train',))  # flax init is eager by default
    variables = init_fn({'params': rng, 'dropout': rng}, sample_batch, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx, apply_fn=model.apply)


def compute_loss(result, batch, criterion, spec: ModelSpec, aux_loss_weight: float):
    """tools/train.py:71-110: point losses + voxel losses + aux-voxel losses
    with 1-NN label transfer from full-res voxel centers."""
    nc = spec.num_classes
    loss = 0.0

    point_out = result['point_out'].reshape(-1, nc)
    point_labels = batch['point_labels'].reshape(-1)
    for fn, w in criterion:
        loss = loss + w * fn(point_out, point_labels)

    voxel_out = result['voxel_out'].reshape(-1, nc)
    voxel_labels = batch['voxel_labels'].reshape(-1)
    for fn, w in criterion:
        loss = loss + w * fn(voxel_out, voxel_labels)

    # aux: transfer full-res voxel labels to stage-4 voxels by nearest center
    # (train.py:86-108), outside the gradient path.
    vc = jax.lax.stop_gradient(result['voxel_coords'])
    ac = jax.lax.stop_gradient(result['aux_voxel_coords'])
    centers = get_voxel_centers(vc, 1.0, spec.voxel_size, spec.point_cloud_range)
    aux_centers = get_voxel_centers(ac, 8.0, spec.voxel_size, spec.point_cloud_range)
    aux_labels = nearest_label_transfer(
        centers, batch['voxel_labels'], result['voxel_mask'],
        aux_centers, result['aux_voxel_mask'])
    aux_out = result['aux_voxel_out'].reshape(-1, nc)
    aux_labels = aux_labels.reshape(-1)
    for fn, w in criterion:
        loss = loss + aux_loss_weight * w * fn(aux_out, aux_labels)
    return loss


def make_train_step(cfg, spec: ModelSpec, model, donate: bool = True):
    criterion = build_criterion(cfg)
    aux_w = float(cfg.MODEL.AUX_LOSS_WEIGHT)

    def train_step(state: TrainState, batch, rng):
        drop_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, mut = state.apply_fn(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, mutable=['batch_stats'],
                rngs={'dropout': drop_rng})
            loss = compute_loss(out, batch, criterion, spec, aux_w)
            return loss, mut['batch_stats']

        (loss, batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        # Non-finite-gradient guard (skip-and-log policy): one unexplained NaN
        # dW was observed on the real TPU in bf16 at full scale on degenerate
        # near-planar data (runs/cyl_r3, NOTES r3 #4) and never reproduced
        # minimally. A silent NaN poisons params forever; instead the update
        # is dropped wholesale (params, opt state and step selected from the
        # pre-update state) and surfaced via the `grads_finite` metric, which
        # the train loop logs loudly. Costs one small reduction per leaf.
        finite = jnp.array(True)
        for g in jax.tree_util.tree_leaves(grads):
            finite = finite & jnp.all(jnp.isfinite(g))
        applied = state.apply_gradients(grads, batch_stats)
        # Skipped branch keeps the PRE-update batch_stats too: when grads are
        # non-finite because forward activations were non-finite, the same
        # batch's BN running stats are NaN as well, and committing them would
        # silently poison every later eval (ADVICE r4).
        skipped = state.replace(step=state.step + 1)
        new_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(finite, a, b), applied, skipped)
        return new_state, {'loss': loss, 'grads_finite': finite}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg, spec: ModelSpec, model, with_loss: bool = True):
    """with_loss=False drops the criterion from the program (forward + IoU
    histogram only): the loss path's global OHEM top-k / Lovász sorts are the
    dominant source of GSPMD-inserted collectives, which the CPU-mesh
    multichip dryrun pays ~0.75s of thread rendezvous each for."""
    criterion = build_criterion(cfg) if with_loss else ()
    aux_w = float(cfg.MODEL.AUX_LOSS_WEIGHT)
    nc = spec.num_classes

    def eval_step(state: TrainState, batch):
        out = state.apply_fn(
            {'params': state.params, 'batch_stats': state.batch_stats},
            batch, train=False)
        preds = jnp.argmax(out['point_out'], axis=-1).reshape(-1)
        labels = batch['point_labels'].reshape(-1)
        valid = batch['cur_point_mask'] & batch['point_mask']
        if 'sample_valid' in batch:
            # exclude epoch-padding duplicate frames from the histogram
            valid = valid & batch['sample_valid'][:, None]
        valid = valid.reshape(-1)
        hist = confusion_matrix(preds, labels, nc, valid)
        res = {'hist': hist, 'point_out': out['point_out']}
        if with_loss:
            res['loss'] = compute_loss(out, batch, criterion, spec, aux_w)
        return res

    return jax.jit(eval_step)

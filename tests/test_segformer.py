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
    for _ in range(6):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all(), losses
    # single-batch SGD is noisy step to step; require net descent
    assert min(losses[3:]) < losses[0], losses

    eval_step = make_eval_step(cfg, spec, model)
    out = eval_step(state, batch)
    assert np.isfinite(float(out['loss']))
    n_valid = int(np.sum(np.array(batch['point_mask']) & np.array(batch['cur_point_mask'])))
    assert int(np.array(out['hist']).sum()) == n_valid


def test_segformer_bfloat16_eval_consistent_with_f32():
    """The production COMPUTE_DTYPE=bfloat16 path must produce finite logits
    whose argmax broadly agrees with the f32 path (same params)."""
    outs = {}
    for dt in ('float32', 'bfloat16'):
        cfg = tiny_cfg(MODEL={'SEGMENTOR': 'segformer', 'DEPTHS': [2, 2, 2, 2]},
                       RUNTIME={'COMPUTE_DTYPE': dt})
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg).items()
                 if k != 'batch_size'}
        model, spec = build_segmentor(cfg)
        tx = build_optimizer(cfg, build_schedule(cfg, 1, 100))
        state = create_train_state(cfg, model, tx, batch, seed=0)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        out = jax.jit(lambda b: model.apply(variables, b, train=False))(batch)
        outs[dt] = np.asarray(out['point_out'], np.float32)
        assert np.isfinite(outs[dt]).all()
        assert out['point_out'].dtype == jnp.float32
    mask = np.abs(outs['float32']).sum(-1) > 0
    agree = (outs['float32'].argmax(-1) == outs['bfloat16'].argmax(-1))[mask].mean()
    assert agree > 0.85, agree


def test_segformer_with_image_features_deep_fusion():
    """DeepFusion camera-feature branch is reachable from config
    (DATASET.USE_IMAGE_FEATURE) and trains/evals finite (deep_fusion.py:26-45
    parity)."""
    cfg = tiny_cfg(MODEL={'SEGMENTOR': 'segformer', 'DEPTHS': [2, 2, 2, 2]},
                   DATASET={'USE_IMAGE_FEATURE': True, 'DIM_IMAGE_FEATURE': 8})
    rng = np.random.RandomState(3)
    # build the batch with per-point image features attached
    from openseg3d_tpu.core.voxelizer import VoxelGenerator, majority_voxel_labels
    from openseg3d_tpu.data.batch import pad_sample, collate_padded
    vg = VoxelGenerator(cfg.DATASET.VOXEL_SIZE, cfg.DATASET.POINT_CLOUD_RANGE)
    rg = np.array(cfg.DATASET.POINT_CLOUD_RANGE)
    samples = []
    for i in range(2):
        xyz = rng.uniform(rg[:3] * 0.95, rg[3:] * 0.95, (500, 3)).astype(np.float32)
        pts = np.concatenate([xyz, rng.randn(500, cfg.DATASET.DIM_POINT - 3)
                              .astype(np.float32)], 1)
        coords, ids = vg.generate(pts)
        labels = rng.randint(0, cfg.DATASET.NUM_CLASSES, 500)
        imgf = rng.randn(500, 8).astype(np.float32)
        imgf[::3] = 0.0                      # some points lack camera coverage
        samples.append(dict(points=pts, voxel_coords=coords,
                            point_voxel_ids=ids, point_labels=labels,
                            voxel_labels=majority_voxel_labels(ids, labels, coords.shape[0]),
                            point_image_features=imgf))
    batch = collate_padded([pad_sample(s, cfg.RUNTIME.MAX_POINTS_PER_SAMPLE,
                                       cfg.RUNTIME.MAX_VOXELS_PER_SAMPLE)
                            for s in samples])
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != 'batch_size'}
    assert 'point_image_features' in batch

    model, spec = build_segmentor(cfg)
    assert spec.use_image_feature
    tx = build_optimizer(cfg, build_schedule(cfg, 1, 100))
    state = create_train_state(cfg, model, tx, batch, seed=0)
    train_step = make_train_step(cfg, spec, model, donate=False)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))

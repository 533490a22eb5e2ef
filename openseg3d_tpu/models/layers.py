"""Shared model layers: MLP stacks, SE/SA attention, VFE.

Parity targets: seg3d/models/voxel_encoders/vfe.py, layers/se_layer.py,
layers/sa_layer.py. All operate on batched padded arrays [B, N, C] with
validity masks instead of ragged concatenated rows. (The reference's
layers/drop.py DropPath lives in swformer._drop_path — a function, not a
module, because the per-layer rate arrives as a traced nn.scan input.)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.scatter import segment_mean, segment_max
from ..ops.sparse_conv import Rulebook, apply_sparse_conv, apply_subm
from .norm import MaskedBatchNorm


class LinearBNReLU(nn.Module):
    """Linear(bias=False) + BN + optional ReLU — the reference's ubiquitous
    point-MLP building block (segformer.py:21-32)."""
    features: int
    act: bool = True
    bn_momentum: float = 0.9   # torch default BatchNorm1d momentum=0.1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # dtype-following: params stay f32, compute runs in the input dtype
        # (bf16 on the production path, RUNTIME.COMPUTE_DTYPE)
        x = nn.Dense(self.features, use_bias=False, dtype=x.dtype,
                     kernel_init=nn.initializers.kaiming_normal())(x)
        x = MaskedBatchNorm(momentum=self.bn_momentum, eps=self.bn_eps)(x, mask, train)
        if self.act:
            x = nn.relu(x)
        return x


class PointEncoder(nn.Module):
    """BN -> (64, 128, 256) LinearBNReLU tower -> Linear(out) — the per-point
    encoder of both segmentors (segformer.py:21-32, spnet.py:21-32)."""
    out_features: int = 64
    hidden: Sequence[int] = (64, 128, 256)

    @nn.compact
    def __call__(self, points, mask, train: bool):
        x = MaskedBatchNorm(momentum=0.9, eps=1e-5)(points, mask, train)
        for h in self.hidden:
            x = LinearBNReLU(h)(x, mask, train)
        x = nn.Dense(self.out_features, dtype=x.dtype,
                     kernel_init=nn.initializers.kaiming_normal())(x)
        return jnp.where(mask[..., None], x, 0)


class VFE(nn.Module):
    """Voxel feature encoder: masked scatter-reduce of point features into
    voxels (vfe.py:16-27). ids are sample-local voxel slots, -1 = unassigned."""
    reduce: str = 'mean'

    @nn.compact
    def __call__(self, features, point_voxel_ids, num_voxels: int):
        fn = segment_mean if self.reduce == 'mean' else segment_max
        return jax.vmap(lambda f, i: fn(f, i, num_voxels))(features, point_voxel_ids)


class FlattenSELayer(nn.Module):
    """Squeeze-excite where the squeeze is a per-sample masked mean over the
    ragged row dim (se_layer.py:16-29)."""
    reduction: int = 4

    @nn.compact
    def __call__(self, x, mask):
        c = x.shape[-1]
        m = mask.astype(x.dtype)[..., None]
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1)  # [B, C]
        s = nn.Dense(c // self.reduction, use_bias=False, dtype=x.dtype,
                     kernel_init=nn.initializers.kaiming_normal())(pooled)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=False, dtype=x.dtype,
                     kernel_init=nn.initializers.kaiming_normal())(s)
        s = nn.sigmoid(s)
        return x * s[:, None, :]


class SALayer(nn.Module):
    """Spatial attention: 3^3 submanifold conv -> sigmoid gate (sa_layer.py:8-25).
    Takes the stage's precomputed subm rulebook."""

    @nn.compact
    def __call__(self, features, rulebook, mask):
        cin = features.shape[-1]
        w = self.param('kernel', nn.initializers.kaiming_normal(), (27, cin, 1))
        gate = apply_subm(features, rulebook, w, mask,
                          compute_dtype=features.dtype)
        return features * nn.sigmoid(gate)



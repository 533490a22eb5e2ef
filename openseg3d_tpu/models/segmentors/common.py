"""Shared segmentor scaffold.

Both segmentors (Segformer segformer.py:94-146, SPNet spnet.py:95-148) share:
per-point encoder || VFE -> voxel backbone -> devoxelize -> fusion MLP ->
FlattenSE residual -> point classifier. Only the voxel backbone differs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import ConfigDict, grid_size
from ...ops.scatter import voxel_to_point
from ..layers import PointEncoder, VFE, FlattenSELayer, LinearBNReLU
from ..deep_fusion import DeepFusionBlock
from ..backbones.sparse_unet import stage_capacities


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static model hyper-parameters derived from the config."""
    num_classes: int
    dim_point: int
    use_multi_sweeps: bool
    use_cylinder: bool
    use_image_feature: bool
    dim_image_feature: int
    spatial_shape: tuple          # (gz, gy, gx)
    capacities: tuple             # per-stage voxel capacities
    window_shape: tuple
    depths: tuple
    drop_path_rate: float
    batching_info: tuple
    window_bucket_fractions: tuple
    voxel_size: tuple
    point_cloud_range: tuple
    compute_dtype: str = 'float32'
    fusion_knn_kernel_size: int = 3
    fusion_knn_bucket_cap: int = 8
    scan_unroll: bool = True

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @classmethod
    def from_config(cls, cfg: ConfigDict) -> 'ModelSpec':
        gx, gy, gz = grid_size(cfg)
        dim_point = cfg.DATASET.DIM_POINT + (2 if cfg.DATASET.USE_CYLINDER else 0)
        caps = stage_capacities(cfg.RUNTIME.MAX_VOXELS_PER_SAMPLE,
                                cfg.RUNTIME.STAGE_CAPACITY_RATIOS)
        batching = tuple(
            tuple(sorted(((int(k), (int(v['max_tokens']),
                                    int(v['batching_range'][0]),
                                    int(v['batching_range'][1])))
                          for k, v in stage.items()), key=lambda t: t[0]))
            for stage in cfg.MODEL.BATCHING_INFO)
        return cls(
            num_classes=cfg.DATASET.NUM_CLASSES,
            dim_point=dim_point,
            use_multi_sweeps=cfg.DATASET.USE_MULTI_SWEEPS,
            use_cylinder=cfg.DATASET.USE_CYLINDER,
            use_image_feature=cfg.DATASET.USE_IMAGE_FEATURE,
            dim_image_feature=cfg.DATASET.DIM_IMAGE_FEATURE,
            spatial_shape=(gz, gy, gx),
            capacities=tuple(caps),
            window_shape=tuple(cfg.MODEL.WINDOW_SHAPE),
            depths=tuple(cfg.MODEL.DEPTHS),
            drop_path_rate=float(cfg.MODEL.DROP_PATH_RATE),
            batching_info=batching,
            window_bucket_fractions=tuple(
                tuple(f) if isinstance(f, (list, tuple)) else f
                for f in cfg.RUNTIME.WINDOW_BUCKET_FRACTIONS),
            voxel_size=tuple(cfg.DATASET.VOXEL_SIZE),
            point_cloud_range=tuple(cfg.DATASET.POINT_CLOUD_RANGE),
            compute_dtype=str(cfg.RUNTIME.COMPUTE_DTYPE),
            fusion_knn_kernel_size=int(cfg.MODEL.get(
                'FUSION_KNN_KERNEL_SIZE', 3)),
            fusion_knn_bucket_cap=int(cfg.MODEL.get(
                'FUSION_KNN_BUCKET_CAP', 8)),
            scan_unroll=bool(cfg.RUNTIME.get('SCAN_UNROLL', True)),
        )


class SegmentorHead(nn.Module):
    """Fusion encoder + SE residual + point classifier
    (segformer.py:57-77,127-141)."""
    num_classes: int
    fusion_channel: int = 64

    @nn.compact
    def __call__(self, point_fusion_features, cur_mask, train: bool):
        x = LinearBNReLU(256)(point_fusion_features, cur_mask, train)
        x = LinearBNReLU(128)(x, cur_mask, train)
        x = LinearBNReLU(self.fusion_channel)(x, cur_mask, train)
        x = x + FlattenSELayer()(x, cur_mask)
        x = LinearBNReLU(64)(x, cur_mask, train)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        # classifier logits in f32 (loss/metric numerics)
        point_out = nn.Dense(self.num_classes, use_bias=False, dtype=jnp.float32,
                             kernel_init=nn.initializers.kaiming_normal())(x)
        return jnp.where(cur_mask[..., None], point_out, 0)


class PointBranch(nn.Module):
    """Point MLP + VFE voxelization, shared preamble of both segmentors
    (segformer.py:94-109)."""
    spec: ModelSpec
    point_feature_channel: int = 64

    @nn.compact
    def __call__(self, batch, train: bool):
        points = batch['points']
        point_mask = batch['point_mask']
        cur_mask = batch['cur_point_mask'] & point_mask
        vids = batch['point_voxel_ids']          # sample-local slots
        v_cap = batch['voxel_coords'].shape[1]
        dt = self.spec.dtype

        # compute dtype boundary: everything downstream runs in
        # RUNTIME.COMPUTE_DTYPE (bf16 in production); params stay f32
        point_per_features = PointEncoder(self.point_feature_channel)(
            points.astype(dt), cur_mask, train)

        if self.spec.use_multi_sweeps:
            # mean of raw multi-sweep points (segformer.py:34-36)
            src = jnp.where(point_mask[..., None], points, 0)
            voxel_features = VFE(reduce='mean')(
                src, jnp.where(point_mask, vids, -1), v_cap).astype(dt)
        else:
            voxel_features = VFE(reduce='max')(
                point_per_features, jnp.where(cur_mask, vids, -1), v_cap)
        return point_per_features, voxel_features, cur_mask


def fuse_and_classify(spec: ModelSpec, batch, point_per_features, voxel_features,
                      cur_mask, train: bool, head: SegmentorHead,
                      deep_fusion: DeepFusionBlock | None):
    """Devoxelize + (optional image fusion) + head (segformer.py:112-141)."""
    vids = batch['point_voxel_ids']
    pvf = jax.vmap(voxel_to_point)(voxel_features, vids)
    fusion = jnp.concatenate([point_per_features, pvf], axis=-1)
    if deep_fusion is not None:
        img = deep_fusion(batch['points'][..., :3], cur_mask, fusion,
                          batch['point_image_features'], train,
                          point_voxel_ids=vids,
                          voxel_coords=batch['voxel_coords'],
                          spatial_shape=spec.spatial_shape)
        fusion = jnp.concatenate([fusion, img], axis=-1)
    return head(fusion, cur_mask, train)

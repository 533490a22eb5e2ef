"""Segformer segmentor: point MLP || VFE -> PointTransformer -> fusion head.

Parity: seg3d/models/segmentors/segformer.py:12-146.
"""

from __future__ import annotations

from flax import linen as nn

from ...ops.sparse_conv import SparseTensor
from ..backbones.sparse_unet import build_unet_plans
from ..backbones.point_transformer import PointTransformer, build_window_plans
from ..deep_fusion import DeepFusionBlock
from .common import ModelSpec, PointBranch, SegmentorHead, fuse_and_classify


class Segformer(nn.Module):
    spec: ModelSpec
    voxel_feature_channel: int = 32

    @nn.compact
    def __call__(self, batch, train: bool = False):
        spec = self.spec
        point_per, voxel_feats, cur_mask = PointBranch(spec)(batch, train)

        st = SparseTensor(features=voxel_feats, coords=batch['voxel_coords'],
                          spatial_shape=spec.spatial_shape)
        plans = build_unet_plans(st, spec.capacities)
        window_parts, level_specs = build_window_plans(plans, spec)
        out = PointTransformer(spec, self.voxel_feature_channel)(
            voxel_feats, plans, window_parts, level_specs, train)

        fusion_df = (DeepFusionBlock(spec.dim_image_feature,
                                     knn_kernel_size=spec.fusion_knn_kernel_size,
                                     knn_bucket_cap=spec.fusion_knn_bucket_cap)
                     if spec.use_image_feature else None)
        point_out = fuse_and_classify(
            spec, batch, point_per, out['voxel_features'], cur_mask, train,
            SegmentorHead(spec.num_classes), fusion_df)

        return {
            'point_out': point_out,
            'voxel_out': out['voxel_out'],
            'aux_voxel_out': out['aux_voxel_out'],
            'voxel_coords': batch['voxel_coords'],
            'voxel_mask': batch['voxel_mask'],
            'aux_voxel_coords': out['aux_voxel_coords'],
            'aux_voxel_mask': out['aux_voxel_mask'],
        }

"""SPNet segmentor: point MLP || VFE -> SparseUnet -> fusion head.

Parity: seg3d/models/segmentors/spnet.py:12-148.
"""

from __future__ import annotations

from flax import linen as nn

from ...ops.sparse_conv import SparseTensor
from ..backbones.sparse_unet import SparseUnet, build_unet_plans
from ..deep_fusion import DeepFusionBlock
from .common import ModelSpec, PointBranch, SegmentorHead, fuse_and_classify


class SPNet(nn.Module):
    spec: ModelSpec
    voxel_feature_channel: int = 64

    @nn.compact
    def __call__(self, batch, train: bool = False):
        spec = self.spec
        point_per, voxel_feats, cur_mask = PointBranch(spec)(batch, train)

        st = SparseTensor(features=voxel_feats, coords=batch['voxel_coords'],
                          spatial_shape=spec.spatial_shape)
        plans = build_unet_plans(st, spec.capacities)
        unet_out = SparseUnet(self.voxel_feature_channel, spec.num_classes)(
            voxel_feats, plans, train)

        fusion_df = (DeepFusionBlock(spec.dim_image_feature,
                                     knn_kernel_size=spec.fusion_knn_kernel_size,
                                     knn_bucket_cap=spec.fusion_knn_bucket_cap)
                     if spec.use_image_feature else None)
        point_out = fuse_and_classify(
            spec, batch, point_per, unet_out['voxel_features'], cur_mask, train,
            SegmentorHead(spec.num_classes), fusion_df)

        return {
            'point_out': point_out,
            'voxel_out': unet_out['voxel_out'],
            'aux_voxel_out': unet_out['aux_voxel_out'],
            'voxel_coords': batch['voxel_coords'],
            'voxel_mask': batch['voxel_mask'],
            'aux_voxel_coords': unet_out['aux_voxel_coords'],
            'aux_voxel_mask': unet_out['aux_voxel_mask'],
        }

"""Sparse-conv UNet backbone (PartA^2-style).

Parity target: SparseUnet (seg3d/models/backbones/spconv_unet.py:115-233):
stem SubM 3^3, four encoder stages (channels 32/64/128/256) of
SparseBasicBlocks with stride-2 downsamples, SE at stages 3-4, aux classifier +
OCR at the bottleneck, UpBlock decoder on inverse convs, final voxel
classifier.

Structure (rulebooks / coordinate sets) is built once per forward in
`build_unet_plans` — the functional analog of spconv's indice_key cache —
and shared by every conv at the same stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.sparse_conv import (SparseTensor, Rulebook, DownsamplePlan,
                                build_downsample, build_planar_k3_direct)
from ..sparse_modules import ConvModule, SparseBasicBlock, UpBlock
from ..ocr import OCRLayer


def _round128(x: float) -> int:
    return max(128, int(-(-x // 128) * 128))


def stage_capacities(max_voxels: int, ratios) -> list[int]:
    return [_round128(max_voxels * r) for r in ratios]


class UNetPlans(NamedTuple):
    """All per-stage structure for a 4-stage UNet over one voxel set."""
    masks: tuple          # stage validity masks [B, V_s]
    coords: tuple         # stage coords [B, V_s, 3]
    subm: tuple           # stage subm rulebooks
    down: tuple           # DownsamplePlan for stages 2..4 (len 3)
    shapes: tuple         # spatial shapes per stage


def build_unet_plans(st: SparseTensor, capacities) -> UNetPlans:
    """Build rulebooks for 4 stages with stride-2/kernel-3/pad-1 downsamples
    between them (spconv_unet.py:139-169 / pointtransformer.py:159-166).

    Stage coords are in ascending linearized-key order BY PIPELINE INVARIANT
    (the voxelizer emits sorted slots; downsample outputs are sorted by
    construction), so every stage's planar fast-path structure is built
    directly (ops/sparse_conv.build_planar_k3_direct) without materializing
    the 27-row rulebook."""
    masks, coords, subm, downs, shapes = [], [], [], [], []
    cur = st
    for s in range(4):
        masks.append(cur.mask)
        coords.append(cur.coords)
        shapes.append(cur.spatial_shape)
        subm.append(build_planar_k3_direct(cur))
        if s < 3:
            plan = build_downsample(cur, out_capacity=capacities[s + 1],
                                    kernel_size=3, stride=2, padding=1)
            downs.append(plan)
            cur = SparseTensor(features=jnp.zeros(()),  # features unused here
                               coords=plan.out_coords, spatial_shape=plan.out_shape)
    return UNetPlans(masks=tuple(masks), coords=tuple(coords), subm=tuple(subm),
                     down=tuple(downs), shapes=tuple(shapes))


class SparseUnet(nn.Module):
    """forward(features, plans, train) -> dict with voxel_features, voxel_out,
    aux_voxel_out (+ the stage-4 coords/mask for the aux loss)."""
    output_channels: int
    num_classes: int
    use_ocr: bool = True

    @nn.compact
    def __call__(self, voxel_features, plans: UNetPlans, train: bool):
        m1, m2, m3, m4 = plans.masks
        rb1, rb2, rb3, rb4 = plans.subm
        d2, d3, d4 = plans.down

        # stem + stage1 (spconv_unet.py:133-141)
        x = ConvModule(32)(voxel_features, rb1, m1, train)
        x = SparseBasicBlock(32)(x, rb1, m1, train)
        x_conv1 = SparseBasicBlock(32)(x, rb1, m1, train)

        # stage2: downsample + 3 blocks (:145-151)
        x = ConvModule(64)(x_conv1, d2.rule, m2, train)
        x = SparseBasicBlock(64)(x, rb2, m2, train)
        x = SparseBasicBlock(64)(x, rb2, m2, train)
        x_conv2 = SparseBasicBlock(64)(x, rb2, m2, train)

        # stage3: downsample + 3 blocks, SE on the last (:154-160)
        x = ConvModule(128)(x_conv2, d3.rule, m3, train)
        x = SparseBasicBlock(128)(x, rb3, m3, train)
        x = SparseBasicBlock(128)(x, rb3, m3, train)
        x_conv3 = SparseBasicBlock(128, with_se=True)(x, rb3, m3, train)

        # stage4 (:163-169)
        x = ConvModule(256)(x_conv3, d4.rule, m4, train)
        x = SparseBasicBlock(256)(x, rb4, m4, train)
        x = SparseBasicBlock(256)(x, rb4, m4, train)
        x_conv4 = SparseBasicBlock(256, with_se=True)(x, rb4, m4, train)

        # auxiliary head at the bottleneck (:183,216-218)
        aux_voxel_out = nn.Dense(self.num_classes, use_bias=False,
                                 dtype=jnp.float32,
                                 kernel_init=nn.initializers.kaiming_normal(),
                                 name='aux_voxel_classifier')(x_conv4)

        if self.use_ocr:
            x_conv4 = OCRLayer(256, 128, 64)(x_conv4, aux_voxel_out, rb4, m4, train)

        # decoder (:172-178, 224-227); up4 is a self-skip (:224)
        x = UpBlock(256, 128)(x_conv4, x_conv4, rb4, m4, d4.inv_rule, m3, train)
        x = UpBlock(128, 64)(x, x_conv3, rb3, m3, d3.inv_rule, m2, train)
        x = UpBlock(64, 32)(x, x_conv2, rb2, m2, d2.inv_rule, m1, train)
        x = UpBlock(32, self.output_channels)(x, x_conv1, rb1, m1, rb1, m1, train)

        voxel_out = nn.Dense(self.num_classes, use_bias=False,
                             dtype=jnp.float32,
                             kernel_init=nn.initializers.kaiming_normal(),
                             name='voxel_classifier')(x)
        return {
            'voxel_features': x,
            'voxel_out': voxel_out,
            'aux_voxel_out': aux_voxel_out,
            'aux_voxel_coords': plans.coords[3],
            'aux_voxel_mask': m4,
        }

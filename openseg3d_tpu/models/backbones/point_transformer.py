"""SWFormer-style window-transformer backbone.

Parity: PointTransformer (seg3d/models/backbones/pointtransformer.py:115-219):
same UNet topology as SparseUnet but each encoder stage is a window partition +
SWFormerBlock stack (channels 48/96/192/384, depths [3,4,8,3], 8 heads),
strided sparse convs between stages, UpBlock decoder, aux head at 1/8 scale.

Unlike the reference — which drops voxels from the feature tensor while
keeping stale indices (the hazard flagged in SURVEY.md §2.2) — dropped voxels
here keep their slots with zeroed features, so features and coords can never
desynchronize.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ...ops.sparse_conv import SparseTensor
from ...ops.window import make_level_specs, batched_window_partition
from ..sparse_modules import ConvModule, UpBlock
from ..swformer import SWFormerBlock
from .sparse_unet import UNetPlans, build_unet_plans


CHANNELS = (48, 96, 192, 384)


def build_window_plans(plans: UNetPlans, spec):
    """Dual-shift window partitions for all 4 stages (structure-only; no
    params). spec: ModelSpec."""
    parts, level_specs = [], []
    for s in range(4):
        levels = make_level_specs(spec.batching_info[s], spec.capacities[s],
                                  spec.window_bucket_fractions[s])
        part = batched_window_partition(
            plans.coords[s], plans.masks[s], plans.shapes[s],
            spec.window_shape, levels)
        parts.append(part)
        level_specs.append(levels)
    return tuple(parts), tuple(level_specs)


class PointTransformer(nn.Module):
    spec: 'ModelSpec'           # noqa: F821  (ModelSpec from segmentors.common)
    output_channels: int = 32

    @nn.compact
    def __call__(self, voxel_features, plans: UNetPlans, window_parts,
                 level_specs, train: bool):
        spec = self.spec
        depths = spec.depths
        m1, m2, m3, m4 = plans.masks
        rb1, rb2, rb3, rb4 = plans.subm
        d2, d3, d4 = plans.down

        # stochastic depth decay rule (pointtransformer.py:142)
        dpr = np.linspace(0, spec.drop_path_rate, sum(depths)).tolist()
        bounds = np.cumsum((0,) + tuple(depths)).tolist()

        def block(stage):
            return SWFormerBlock(
                d_model=CHANNELS[stage], nhead=8, depth=depths[stage],
                window_shape=spec.window_shape, levels=level_specs[stage],
                drop_path=tuple(dpr[bounds[stage]:bounds[stage + 1]]),
                unroll=spec.scan_unroll)

        x = ConvModule(48)(voxel_features, rb1, m1, train)          # conv_input
        x_conv1 = block(0)(x, window_parts[0], train)

        x = ConvModule(96)(x_conv1, d2.rule, m2, train)             # conv_down1
        x_conv2 = block(1)(x, window_parts[1], train)

        x = ConvModule(192)(x_conv2, d3.rule, m3, train)            # conv_down2
        x_conv3 = block(2)(x, window_parts[2], train)

        x = ConvModule(384)(x_conv3, d4.rule, m4, train)            # conv_down3
        x_conv4 = block(3)(x, window_parts[3], train)

        aux_voxel_out = nn.Dense(spec.num_classes, use_bias=False,
                                 dtype=jnp.float32,
                                 kernel_init=nn.initializers.kaiming_normal(),
                                 name='aux_voxel_classifier')(x_conv4)

        # decoder (pointtransformer.py:169-179, 209-215); up4 self-skips
        x = UpBlock(384, 192)(x_conv4, x_conv4, rb4, m4, d4.inv_rule, m3, train)
        x = UpBlock(192, 96)(x, x_conv3, rb3, m3, d3.inv_rule, m2, train)
        x = UpBlock(96, 48)(x, x_conv2, rb2, m2, d2.inv_rule, m1, train)
        x = UpBlock(48, self.output_channels)(x, x_conv1, rb1, m1, rb1, m1, train)

        voxel_out = nn.Dense(spec.num_classes, use_bias=False,
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

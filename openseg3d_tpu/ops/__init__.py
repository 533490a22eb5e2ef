from .scatter import (segment_sum, segment_mean, segment_max, segment_count,
                      voxel_to_point, inner_group_ranks, cummax)
from .sparse_conv import (SparseTensor, Rulebook, DownsamplePlan,
                          PlanarRulebook, build_subm_rulebook, build_downsample,
                          apply_sparse_conv, apply_subm, planar_from_k3,
                          build_planar_k3_direct,
                          kernel_offsets, linearize, delinearize,
                          downsample_shape)
from .attention import (fused_window_attention, reference_window_attention,
                        attention_group)

__all__ = [
    'segment_sum', 'segment_mean', 'segment_max', 'segment_count',
    'voxel_to_point', 'inner_group_ranks', 'cummax',
    'SparseTensor', 'Rulebook', 'DownsamplePlan', 'PlanarRulebook',
    'build_subm_rulebook', 'build_downsample', 'apply_sparse_conv',
    'apply_subm', 'planar_from_k3', 'kernel_offsets', 'linearize',
    'delinearize', 'downsample_shape',
    'fused_window_attention', 'reference_window_attention', 'attention_group',
]

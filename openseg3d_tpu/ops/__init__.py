from .scatter import (segment_sum, segment_mean, segment_max, segment_count,
                      voxel_to_point, inner_group_ranks, cummax)
from .sparse_conv import (SparseTensor, Rulebook, DownsamplePlan,
                          build_subm_rulebook, build_downsample,
                          apply_sparse_conv, kernel_offsets, linearize,
                          delinearize, downsample_shape)

__all__ = [
    'segment_sum', 'segment_mean', 'segment_max', 'segment_count',
    'voxel_to_point', 'inner_group_ranks', 'cummax',
    'SparseTensor', 'Rulebook', 'DownsamplePlan', 'build_subm_rulebook',
    'build_downsample', 'apply_sparse_conv', 'kernel_offsets', 'linearize',
    'delinearize', 'downsample_shape',
]

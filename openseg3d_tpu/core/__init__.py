from .voxelizer import VoxelGenerator, points_to_voxel, majority_voxel_labels
from .metrics import IOUMetric, confusion_matrix, per_class_iou

__all__ = ['VoxelGenerator', 'points_to_voxel', 'majority_voxel_labels',
           'IOUMetric', 'confusion_matrix', 'per_class_iou']

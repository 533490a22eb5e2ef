"""openseg3d_tpu — TPU-native 3D semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of WPCLab/OpenSeg3D
(LiDAR 3D semantic segmentation on Waymo): dynamic voxelization, submanifold
sparse-conv UNet (SPNet) and sparse-window-transformer (Segformer) segmentors,
the full augmentation/TTA suite, and SPMD data-parallel training over a
jax.sharding Mesh.

Design stance (see SURVEY.md §7): every dynamic count becomes a padded,
capacity-bucketed buffer with a validity mask so that the whole train step is
one statically-shaped jitted SPMD program.
"""

__version__ = '0.1.0'

from .config import cfg_from_file, default_config, ConfigDict, grid_size

__all__ = ['cfg_from_file', 'default_config', 'ConfigDict', 'grid_size', '__version__']

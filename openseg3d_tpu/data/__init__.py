from .batch import pad_sample, collate_padded, flatten_batch
from .waymo_dataset import WaymoDataset
from .loader import DataLoader, build_dataloader
from .test_time_aug import MultiScaleFlipAug

__all__ = ['pad_sample', 'collate_padded', 'flatten_batch', 'WaymoDataset',
           'DataLoader', 'build_dataloader', 'MultiScaleFlipAug']

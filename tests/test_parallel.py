"""Sharding / sampler / loader regression tests (host-side logic).

Covers the round-1 verdict bugs: process_shard_indices under-fill on datasets
smaller than the global batch, and eval double counting of epoch-padding
duplicate frames (DataLoader drop_last=False must mark recycled slots).
"""

import numpy as np

from openseg3d_tpu.parallel.mesh import process_shard_indices
from openseg3d_tpu.data.loader import DataLoader
from helpers import tiny_cfg


def test_shard_indices_regular():
    idx = process_shard_indices(10, shuffle_seed=None, epoch=0, batch_size_global=4)
    assert idx.shape == (12,)
    assert set(idx.tolist()) == set(range(10))


def test_shard_indices_shuffle_deterministic():
    a = process_shard_indices(32, shuffle_seed=7, epoch=3, batch_size_global=8)
    b = process_shard_indices(32, shuffle_seed=7, epoch=3, batch_size_global=8)
    c = process_shard_indices(32, shuffle_seed=7, epoch=4, batch_size_global=8)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_shard_indices_small_dataset():
    """Dataset smaller than one global batch (mesh.py:95 regression): the pad
    must tile, not under-fill into a misaligned reshape."""
    idx, valid = process_shard_indices(3, shuffle_seed=1, epoch=0,
                                       batch_size_global=8, return_valid=True)
    assert idx.shape == (8,) and valid.shape == (8,)
    assert set(idx.tolist()) == {0, 1, 2}
    assert valid.sum() == 3
    assert np.array_equal(np.sort(idx[valid]), np.arange(3))


def test_shard_indices_valid_marks_pad():
    idx, valid = process_shard_indices(10, shuffle_seed=None, epoch=0,
                                       batch_size_global=4, return_valid=True)
    assert valid.sum() == 10
    # every real index appears exactly once among valid slots
    assert np.array_equal(np.sort(idx[valid]), np.arange(10))


def test_loader_sample_valid_marks_recycled_frames():
    """drop_last=False pads the epoch by recycling frames; the recycled slots
    must be flagged so eval excludes them from the IoU histogram."""
    from openseg3d_tpu.data.synthetic import SyntheticDataset

    cfg = tiny_cfg()
    loader = DataLoader(lambda: SyntheticDataset(cfg, 3, n_points=64, seed=0),
                        batch_size=2, shuffle=False, num_workers=0,
                        drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    sv = np.concatenate([b['sample_valid'] for b in batches])
    assert sv.tolist() == [True, True, True, False]


def test_loader_drop_last_has_no_sample_valid():
    from openseg3d_tpu.data.synthetic import SyntheticDataset

    cfg = tiny_cfg()
    loader = DataLoader(lambda: SyntheticDataset(cfg, 5, n_points=64, seed=0),
                        batch_size=2, shuffle=True, num_workers=0, seed=0,
                        drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert all('sample_valid' not in b for b in batches)

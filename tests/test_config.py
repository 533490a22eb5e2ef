import numpy as np
import pytest

from openseg3d_tpu.config import cfg_from_file, default_config, grid_size


def test_defaults_match_reference_schema():
    c = default_config()
    assert c.DATASET.NUM_CLASSES == 22
    assert c.DATASET.IGNORE_INDEX == 255
    assert c.MODEL.WINDOW_SHAPE == [10, 10, 8]
    assert c.MODEL.DEPTHS == [3, 4, 8, 3]
    assert len(c.MODEL.BATCHING_INFO) == 4
    for stage in c.MODEL.BATCHING_INFO:
        # power-of-2 refinement invariant: every non-top bucket's cap equals
        # its occupancy upper bound (refinement never changes drops), buckets
        # tile [0, inf) contiguously, and the top drop cap is the reference's
        # 800 (seg3d/utils/config.py:47)
        keys = sorted(stage.keys(), key=int)
        lo = 0
        for k in keys[:-1]:
            t, (a, b) = stage[k]['max_tokens'], stage[k]['batching_range']
            assert a == lo and b == t == stage[k]['max_tokens']
            lo = b
        top = stage[keys[-1]]
        assert top['max_tokens'] == 800
        assert top['batching_range'][0] == lo
    assert c.TRAIN.OPTIMIZER == 'adamw'


def test_yaml_overlay_and_freeze():
    c = cfg_from_file('configs/waymo_one_sweep.yaml')
    assert c.TRAIN.OPTIMIZER == 'sgd'
    assert c.TRAIN.LR == 0.05
    assert len(c.DATASET.CLASS_NAMES) == 22
    with pytest.raises(AttributeError):
        c.TRAIN.LR = 1.0


def test_strict_merge_rejects_unknown_keys(tmp_path):
    bad = tmp_path / 'bad.yaml'
    bad.write_text('DATASET:\n  NOT_A_KEY: 1\n')
    with pytest.raises(KeyError):
        cfg_from_file(str(bad))


def test_grid_size_cartesian_and_cylinder():
    c = cfg_from_file('configs/waymo_one_sweep.yaml')
    assert grid_size(c) == (1440, 1440, 64)
    c2 = cfg_from_file('configs/waymo_one_sweep_cylinder.yaml')
    gx, gy, gz = grid_size(c2)
    assert (gx, gz) == (1504, 72)
    assert gy == int(np.round(2 * 3.1415926 / 0.012))


def test_multi_sweep_config():
    c = cfg_from_file('configs/waymo_multi_sweeps.yaml')
    assert c.DATASET.USE_MULTI_SWEEPS and c.DATASET.NUM_SWEEPS == 3


def test_config_pickles_across_processes():
    """Spawned dataloader workers receive the config by pickle; the frozen
    flag must survive (round-2 regression: dict-subclass default pickling
    crashed on the uninitialized _frozen slot)."""
    import pickle
    from openseg3d_tpu.config import cfg_from_file
    cfg = cfg_from_file(None)
    c2 = pickle.loads(pickle.dumps(cfg))
    assert c2.DATASET.NUM_CLASSES == cfg.DATASET.NUM_CLASSES
    assert c2.RUNTIME.MAX_POINTS_PER_SAMPLE == cfg.RUNTIME.MAX_POINTS_PER_SAMPLE
    try:
        c2.DATASET.NUM_CLASSES = 5
        frozen = False
    except AttributeError:
        frozen = True
    assert frozen, 'frozenness must survive pickling'

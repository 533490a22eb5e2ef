"""IoU metric: hand-checkable confusion/IoU cases (seed: the reference's
__main__ smoke at iou_metric.py:88-100) + loud multi-host reduction failure."""

import numpy as np
import pytest

from openseg3d_tpu.core.metrics import (IOUMetric, confusion_matrix,
                                        per_class_iou)


def test_confusion_and_iou_hand_case():
    # 3 classes; gt [0,0,1,2,255], pred [0,1,1,1,0] -> ignore label 255
    gt = np.array([0, 0, 1, 2, 255])
    pred = np.array([0, 1, 1, 1, 0])
    m = IOUMetric(['a', 'b', 'c'])
    m.add(pred, gt)
    expected = np.array([[1, 1, 0], [0, 1, 0], [0, 1, 0]])
    np.testing.assert_array_equal(m.hist, expected)
    iou = per_class_iou(m.hist)
    # a: 1/(2+1-1)=0.5 ; b: 1/(1+3-1)=1/3 ; c: 0/(1+0-0)=0
    np.testing.assert_allclose(iou, [0.5, 1 / 3, 0.0])
    res = m.get_metric()
    assert res['mIOU'] == pytest.approx(np.mean([0.5, 1 / 3, 0.0]))
    assert res['IOU']['a'] == pytest.approx(0.5)


def test_device_confusion_matrix_matches_host():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    labels = rng.randint(0, 6, 500)
    labels[::7] = 255
    preds = rng.randint(0, 5, 500)
    valid = rng.rand(500) > 0.2
    m = IOUMetric([str(i) for i in range(5)])
    m.add(preds[valid], labels[valid])
    dev = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 5,
                           valid_mask=jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(dev), m.hist)


def test_multihost_reduction_failure_raises(monkeypatch):
    """A failed allgather must raise, not silently fall back to the local
    histogram (the reference's iou_metric.py:67-73 flaw)."""
    import jax
    from jax.experimental import multihost_utils

    m = IOUMetric(['a', 'b'])
    m.add(np.array([0, 1]), np.array([0, 1]))
    monkeypatch.setattr(jax, 'process_count', lambda: 2)

    def boom(x):
        raise RuntimeError('collective timed out')

    monkeypatch.setattr(multihost_utils, 'process_allgather', boom)
    with pytest.raises(RuntimeError, match='collective timed out'):
        m.get_metric()

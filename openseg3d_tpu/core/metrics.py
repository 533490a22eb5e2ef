"""IoU metric.

Parity with the reference IOUMetric (seg3d/core/evaluation/iou_metric.py):
confusion-matrix accumulation + per-class IoU + mIoU. The distributed reduction
is a psum over the data mesh instead of NCCL all_reduce; the device-side
confusion matrix (`confusion_matrix`) runs inside the jitted eval step so the
histogram rides ICI, not the host.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def confusion_matrix(preds, labels, num_classes: int, valid_mask=None):
    """Device-side confusion matrix, [C, C] (rows = gt, cols = pred).

    Labels outside [0, num_classes) are excluded (the reference's fast_hist
    `k` mask, iou_metric.py:33), as are padded rows via valid_mask.
    """
    k = (labels >= 0) & (labels < num_classes)
    if valid_mask is not None:
        k = k & valid_mask
    idx = jnp.where(k, labels * num_classes + preds, num_classes * num_classes)
    hist = jnp.zeros(num_classes * num_classes + 1, dtype=jnp.int32).at[idx].add(1)
    return hist[:-1].reshape(num_classes, num_classes)


def per_class_iou(hist: np.ndarray) -> np.ndarray:
    """iou_c = diag / (row_sum + col_sum - diag); NaN for absent classes."""
    hist = np.asarray(hist, dtype=np.float64)
    denom = hist.sum(1) + hist.sum(0) - np.diag(hist)
    with np.errstate(divide='ignore', invalid='ignore'):
        return np.diag(hist) / denom


class IOUMetric:
    """Host-side accumulator; same public surface as the reference
    (add / get_metric, iou_metric.py:15-85)."""

    def __init__(self, class_names):
        self.class_names = list(class_names)
        self.num_classes = len(self.class_names)
        self.hist = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)

    def add(self, pred_labels, gt_labels) -> None:
        preds = np.asarray(pred_labels).astype(np.int64).ravel()
        labels = np.asarray(gt_labels).astype(np.int64).ravel()
        k = (labels >= 0) & (labels < self.num_classes)
        bc = np.bincount(self.num_classes * labels[k] + preds[k],
                         minlength=self.num_classes ** 2)
        self.hist += bc[:self.num_classes ** 2].reshape(self.num_classes, self.num_classes)

    def add_hist(self, hist) -> None:
        """Accumulate a precomputed confusion matrix (e.g. from the jitted
        eval step's `confusion_matrix`)."""
        self.hist += np.asarray(hist, dtype=np.int64)

    def get_metric(self) -> dict:
        hist = self.hist
        import jax
        if jax.process_count() > 1:
            # A failed collective here must be LOUD: silently degrading to the
            # local histogram reports a wrong (per-host) mIoU as if it were
            # global — the reference's bare-except flaw (iou_metric.py:67-73)
            # that SURVEY §5 flags; we deliberately do not reproduce it.
            try:
                from jax.experimental import multihost_utils
                hist = np.asarray(
                    multihost_utils.process_allgather(hist.astype(np.int64))).sum(axis=0)
            except Exception as e:
                import logging
                logging.getLogger('openseg3d_tpu').error(
                    'multi-host IoU histogram allgather failed: %s', e)
                raise
        iou = per_class_iou(hist)
        metric = {'mIOU': float(np.nanmean(iou)),
                  'IOU': {n: float(iou[i]) for i, n in enumerate(self.class_names)}}
        return metric

"""Confusion-matrix semantic metrics (reference
src/metrics/semantic.py:27-246).

The confusion matrix is a plain int64 [C, C] array with rows=target,
cols=pred — a psum-able state: on a device mesh, per-shard matrices
are reduced with `jax.lax.psum`, replacing the reference's DDP
`all_gather(confmat)` pattern (src/models/semantic.py:949).
Void labels (y < 0 or y >= C) never enter the matrix.
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['confusion_matrix_from_histogram', 'confusion_matrix_update',
           'ConfusionMatrix', 'iou_from_confmat', 'oa_from_confmat',
           'macc_from_confmat', 'miou_from_confmat']


def confusion_matrix_from_histogram(pred, y_hist, num_classes,
                                    node_mask=None):
    """cm[target, pred] += y_hist[n, target] — jittable, matches the
    reference's histogram update (metrics/semantic.py:100-108)."""
    y = y_hist[:, :num_classes].astype(jnp.float32)
    if node_mask is not None:
        y = y * node_mask[:, None].astype(y.dtype)
    if pred.ndim == 2:
        pred = jnp.argmax(pred, axis=1)
    # one-hot MXU contraction (13 segments) instead of a serial
    # scatter; 'highest' precision keeps histogram counts exact (the
    # TPU default rounds matmul inputs to bf16)
    from ..ops.segment import _onehot_segment_sum
    cm = _onehot_segment_sum(y, pred, num_classes,
                             precision='highest')
    # int32: x64 is disabled; counts stay well within range per batch
    return cm.T.astype(jnp.int32)


def confusion_matrix_update(pred, y, num_classes, node_mask=None):
    """1D-label update: cm[target, pred] += 1 for valid rows."""
    if pred.ndim == 2:
        pred = jnp.argmax(pred, axis=1)
    valid = (y >= 0) & (y < num_classes)
    if node_mask is not None:
        valid = valid & node_mask
    # cm[t, p] = #(y==t & pred==p) = one_hot(y)^T @ one_hot(pred):
    # one MXU contraction, exact in f32 below 2^24 rows per batch,
    # instead of a serial 169-bin TPU scatter
    cls = jnp.arange(num_classes, dtype=y.dtype)
    oh_y = ((y[:, None] == cls[None, :]) & valid[:, None]).astype(
        jnp.float32)
    oh_p = (pred[:, None] == cls[None, :].astype(pred.dtype)).astype(
        jnp.float32)
    cm = jnp.einsum('nt,np->tp', oh_y, oh_p,
                    preferred_element_type=jnp.float32,
                    precision='highest')
    return cm.astype(jnp.int32)


def iou_from_confmat(cm):
    """Per-class IoU + present-class mask."""
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diag(cm)
    fn = cm.sum(1) - tp
    fp = cm.sum(0) - tp
    denom = tp + fp + fn
    present = cm.sum(1) > 0
    iou = np.divide(tp, denom, out=np.zeros_like(tp), where=denom > 0)
    return iou * 100, present


def oa_from_confmat(cm):
    cm = np.asarray(cm, dtype=np.float64)
    total = cm.sum()
    return float(np.diag(cm).sum() / total * 100) if total > 0 else 0.0


def macc_from_confmat(cm):
    cm = np.asarray(cm, dtype=np.float64)
    row = cm.sum(1)
    present = row > 0
    if present.sum() == 0:
        return 0.0
    acc = np.divide(np.diag(cm), row, out=np.zeros_like(row),
                    where=present)
    return float(acc[present].mean() * 100)


def miou_from_confmat(cm, missing_as_one=False):
    iou, present = iou_from_confmat(cm)
    if present.sum() == 0:
        return 0.0
    if missing_as_one:
        iou = np.where(present, iou, 100.0)
        return float(iou.mean())
    return float(iou[present].mean())


@dataclass
class ConfusionMatrix:
    """Stateful host-side accumulator (mirrors the torchmetrics object
    API the reference uses per train/val/test stage)."""
    num_classes: int

    def __post_init__(self):
        self.reset()

    def reset(self):
        self.confmat = np.zeros(
            (self.num_classes, self.num_classes), dtype=np.int64)

    def update(self, pred, target, node_mask=None):
        pred = np.asarray(pred)
        target = np.asarray(target)
        if target.ndim == 2 and target.shape[1] >= self.num_classes:
            cm = confusion_matrix_from_histogram(
                jnp.asarray(pred), jnp.asarray(target),
                self.num_classes,
                node_mask=None if node_mask is None
                else jnp.asarray(node_mask))
        else:
            cm = confusion_matrix_update(
                jnp.asarray(pred), jnp.asarray(target.reshape(-1)),
                self.num_classes,
                node_mask=None if node_mask is None
                else jnp.asarray(node_mask))
        self.confmat += np.asarray(cm)

    def merge(self, cm_array):
        self.confmat += np.asarray(cm_array, dtype=np.int64)

    def miou(self, **kw):
        return miou_from_confmat(self.confmat, **kw)

    def oa(self):
        return oa_from_confmat(self.confmat)

    def macc(self):
        return macc_from_confmat(self.confmat)

    def iou(self):
        return iou_from_confmat(self.confmat)

    def all_metrics(self):
        iou, present = self.iou()
        return dict(oa=self.oa(), macc=self.macc(), miou=self.miou(),
                    iou_per_class=iou, present=present)

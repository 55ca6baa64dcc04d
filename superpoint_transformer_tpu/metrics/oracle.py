"""Partition-quality oracles: the metric upper bounds achievable by a
perfect classifier on a given superpoint partition (reference
Data.semantic_segmentation_oracle src/data/data.py:976,
instance/panoptic oracles src/data/data.py:1027,1060 and
InstanceData oracles src/data/instance.py:739,776). Used as
correctness probes for partitions.
"""
import numpy as np

from .semantic import ConfusionMatrix
from .panoptic import PanopticQuality3D

__all__ = ['semantic_segmentation_oracle', 'panoptic_segmentation_oracle',
           'instance_segmentation_oracle']


def semantic_segmentation_oracle(y_hist, num_classes):
    """Best-case semantic metrics when every node predicts its
    majority label: returns dict(miou, oa, macc, confmat). `y_hist`
    [N, C(+void)] label histograms per node."""
    y_hist = np.asarray(y_hist)
    counts = y_hist[:, :num_classes].astype(np.int64)
    major = counts.argmax(1)
    cm = ConfusionMatrix(num_classes)
    conf = np.zeros((num_classes, num_classes), np.int64)
    for c in range(num_classes):
        np.add.at(conf[c], major, counts[:, c])
    cm.merge(conf)
    out = cm.all_metrics()
    out['confmat'] = conf
    return out


def _dominant_instance(inst):
    """Per cluster: the gt instance holding the largest overlap, its
    label, and the cluster's total size."""
    sup = inst.to_super_index()
    n = inst.num_groups
    best = np.full(n, -1, np.int64)
    best_y = np.full(n, -1, np.int64)
    best_cnt = np.zeros(n, np.int64)
    size = np.zeros(n, np.int64)
    np.add.at(size, sup, inst.count)
    order = np.argsort(inst.count, kind='stable')  # later wins => max
    best[sup[order]] = inst.obj[order]
    best_y[sup[order]] = inst.y[order]
    cnt = np.zeros(n, np.int64)
    np.maximum.at(cnt, sup, inst.count)
    return best, best_y, cnt, size


def panoptic_segmentation_oracle(inst, num_classes, stuff_classes=()):
    """Best-case panoptic quality when every cluster is assigned to its
    dominant ground-truth instance (reference
    instance.py:739 `panoptic_segmentation_oracle`): clusters mapping
    to the same gt instance merge into one prediction. Returns the
    PanopticQuality3D compute() dict."""
    best, best_y, _, _ = _dominant_instance(inst)
    # predicted instance = dominant gt object (remapped consecutive)
    uniq, pred_id = np.unique(best, return_inverse=True)
    pred_sem = np.full(uniq.shape[0], -1, np.int64)
    pred_sem[pred_id] = best_y
    merged = inst.merge(pred_id)
    pq = PanopticQuality3D(num_classes, stuff_classes=stuff_classes)
    pq.update_from_instance_data(merged, pred_sem)
    return pq.compute()


def instance_segmentation_oracle(inst, num_classes, stuff_classes=()):
    """Best-case instance-segmentation mAP under the same dominant-
    instance assignment (reference instance.py:776)."""
    from .mean_average_precision import MeanAveragePrecision3D
    best, best_y, _, _ = _dominant_instance(inst)
    uniq, pred_id = np.unique(best, return_inverse=True)
    pred_sem = np.full(uniq.shape[0], -1, np.int64)
    pred_sem[pred_id] = best_y
    merged = inst.merge(pred_id)
    m = MeanAveragePrecision3D(num_classes, stuff_classes=stuff_classes)
    m.update_from_instance_data(
        merged, pred_sem, np.ones(uniq.shape[0]))
    return m.compute()

"""PanopticQuality3D — PQ/SQ/RQ (+ PQ†-style 'modified' variant) from
CSR overlap data, never building dense masks (reference
src/metrics/panoptic.py:45).

Matching follows the panoptic-segmentation definition (Kirillov et
al.): a predicted and a ground-truth instance of the same class match
iff IoU > 0.5 (such matches are unique by construction).
Void handling: ground-truth void instances are ignored; unmatched
predictions whose overlap with void exceeds half their size do not
count as false positives.
"""
from dataclasses import dataclass
import numpy as np

__all__ = ['PanopticQuality3D', 'panoptic_quality_from_overlaps']


def panoptic_quality_from_overlaps(
        pred_of_item, gt_of_item, count_of_item, pred_sem, gt_sem,
        num_classes, void_label=None, stuff_classes=()):
    """Compute per-class PQ stats from flattened overlap triplets.

    :param pred_of_item: [M] predicted-instance id of each overlap
    :param gt_of_item: [M] ground-truth-instance id of each overlap
    :param count_of_item: [M] number of points in the overlap
    :param pred_sem: dict or array pred-instance -> semantic label
    :param gt_sem: array gt-instance -> semantic label (void_label for
        void instances)
    :return: dict with tp/fp/fn/iou_sum per class
    """
    pred_of_item = np.asarray(pred_of_item)
    gt_of_item = np.asarray(gt_of_item)
    count_of_item = np.asarray(count_of_item, dtype=np.float64)
    pred_sem = np.asarray(pred_sem)
    gt_sem = np.asarray(gt_sem)

    n_pred = pred_sem.shape[0]
    n_gt = gt_sem.shape[0]
    pred_size = np.zeros(n_pred)
    np.add.at(pred_size, pred_of_item, count_of_item)
    gt_size = np.zeros(n_gt)
    np.add.at(gt_size, gt_of_item, count_of_item)

    gt_void = (gt_sem < 0) | (gt_sem >= num_classes)

    # candidate matches: same-class overlaps with IoU > 0.5
    same_class = pred_sem[pred_of_item] == gt_sem[gt_of_item]
    iou = count_of_item / (pred_size[pred_of_item]
                           + gt_size[gt_of_item] - count_of_item)
    match = same_class & (iou > 0.5) & ~gt_void[gt_of_item]

    tp = np.zeros(num_classes, dtype=np.int64)
    iou_sum = np.zeros(num_classes)
    matched_pred = np.zeros(n_pred, dtype=bool)
    matched_gt = np.zeros(n_gt, dtype=bool)
    for m in np.where(match)[0]:
        c = int(pred_sem[pred_of_item[m]])
        tp[c] += 1
        iou_sum[c] += iou[m]
        matched_pred[pred_of_item[m]] = True
        matched_gt[gt_of_item[m]] = True

    # false negatives: unmatched non-void gt
    fn = np.zeros(num_classes, dtype=np.int64)
    for g in np.where(~matched_gt & ~gt_void)[0]:
        fn[int(gt_sem[g])] += 1

    # false positives: unmatched preds, unless > half void overlap
    void_overlap = np.zeros(n_pred)
    if gt_void.any():
        vo = gt_void[gt_of_item]
        np.add.at(void_overlap, pred_of_item[vo], count_of_item[vo])
    fp = np.zeros(num_classes, dtype=np.int64)
    for p in np.where(~matched_pred)[0]:
        if pred_size[p] <= 0:
            continue
        if void_overlap[p] / pred_size[p] > 0.5:
            continue
        c = int(pred_sem[p])
        if 0 <= c < num_classes:
            fp[c] += 1

    return dict(tp=tp, fp=fp, fn=fn, iou_sum=iou_sum)


@dataclass
class PanopticQuality3D:
    """Accumulating PQ metric over scenes (reference
    PanopticQuality3D)."""
    num_classes: int
    stuff_classes: tuple = ()

    def __post_init__(self):
        self.reset()

    def reset(self):
        self.tp = np.zeros(self.num_classes, dtype=np.int64)
        self.fp = np.zeros(self.num_classes, dtype=np.int64)
        self.fn = np.zeros(self.num_classes, dtype=np.int64)
        self.iou_sum = np.zeros(self.num_classes)

    def update(self, pred_of_item, gt_of_item, count_of_item, pred_sem,
               gt_sem):
        stats = panoptic_quality_from_overlaps(
            pred_of_item, gt_of_item, count_of_item, pred_sem, gt_sem,
            self.num_classes, stuff_classes=self.stuff_classes)
        self.tp += stats['tp']
        self.fp += stats['fp']
        self.fn += stats['fn']
        self.iou_sum += stats['iou_sum']

    def update_from_instance_data(self, pred_inst, pred_sem, num_classes
                                  =None):
        """Update from a predicted-instance InstanceData whose CSR rows
        are (pred instance -> gt instance overlaps)."""
        gt_objs, gt_inv = np.unique(pred_inst.obj, return_inverse=True)
        gt_sem = np.full(gt_objs.shape[0], -1, dtype=np.int64)
        gt_sem[gt_inv] = pred_inst.y  # per-overlap gt label
        self.update(pred_inst.to_super_index(), gt_inv,
                    pred_inst.count, pred_sem, gt_sem)

    def compute(self):
        present = (self.tp + self.fp + self.fn) > 0
        sq = np.divide(self.iou_sum, self.tp,
                       out=np.zeros_like(self.iou_sum),
                       where=self.tp > 0)
        denom = self.tp + 0.5 * self.fp + 0.5 * self.fn
        rq = np.divide(self.tp, denom, out=np.zeros(self.num_classes),
                       where=denom > 0)
        pq = sq * rq
        mean_pq = float(pq[present].mean() * 100) if present.any() else 0.0
        mean_sq = float(sq[present].mean() * 100) if present.any() else 0.0
        mean_rq = float(rq[present].mean() * 100) if present.any() else 0.0
        # PQ† (modified): stuff classes use segmentation IoU-style SQ
        return dict(pq=mean_pq, sq=mean_sq, rq=mean_rq,
                    pq_per_class=pq * 100, precision=None,
                    present=present)

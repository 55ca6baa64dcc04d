"""MeanAveragePrecision3D + oracle metrics."""
import numpy as np
import pytest

from superpoint_transformer_tpu.data.csr import InstanceData
from superpoint_transformer_tpu.metrics import (
    MeanAveragePrecision3D, semantic_segmentation_oracle,
    panoptic_segmentation_oracle, instance_segmentation_oracle)


def test_map_perfect_predictions():
    m = MeanAveragePrecision3D(num_classes=3)
    # 2 predictions exactly matching 2 gts of classes 0 and 1
    m.update(
        pred_of_item=[0, 1], gt_of_item=[0, 1], count_of_item=[50, 80],
        pred_sem=[0, 1], pred_score=[0.9, 0.8], gt_sem=[0, 1])
    out = m.compute()
    assert out['map'] == pytest.approx(1.0)
    assert out['map_50'] == pytest.approx(1.0)
    assert out['mar'] == pytest.approx(1.0)


def test_map_half_iou_prediction():
    m = MeanAveragePrecision3D(num_classes=2, iou_thresholds=[0.5])
    # prediction covers half of the gt: IoU = 50/(100+50-50) = 0.5
    m.update(
        pred_of_item=[0, 1], gt_of_item=[0, 0], count_of_item=[50, 50],
        pred_sem=[0, 1], pred_score=[0.9, 0.1], gt_sem=[0])
    out = m.compute()
    # IoU 0.5 >= threshold 0.5 -> matched
    assert out['map'] == pytest.approx(1.0)


def test_map_wrong_class_is_fp():
    m = MeanAveragePrecision3D(num_classes=2, iou_thresholds=[0.5])
    m.update(
        pred_of_item=[0], gt_of_item=[0], count_of_item=[100],
        pred_sem=[1], pred_score=[0.9], gt_sem=[0])
    out = m.compute()
    # class 0: no prediction -> AP 0; class 1: no gt -> NaN
    assert out['map'] == pytest.approx(0.0)


def test_map_score_ordering_matters():
    m = MeanAveragePrecision3D(num_classes=1, iou_thresholds=[0.5])
    # one gt; a high-score FP and a low-score TP
    m.update(
        pred_of_item=[0, 1], gt_of_item=[0, 0], count_of_item=[5, 95],
        pred_sem=[0, 0], pred_score=[0.9, 0.3], gt_sem=[0])
    out_bad = m.compute()['map']
    m.reset()
    # same but TP has the higher score
    m.update(
        pred_of_item=[0, 1], gt_of_item=[0, 0], count_of_item=[5, 95],
        pred_sem=[0, 0], pred_score=[0.3, 0.9], gt_sem=[0])
    out_good = m.compute()['map']
    assert out_good > out_bad


def test_map_void_pred_discarded():
    m = MeanAveragePrecision3D(num_classes=1, iou_thresholds=[0.5])
    # gt 1 is void (label -1); pred 1 overlaps it 100% -> discarded,
    # not an FP -> perfect AP from pred 0
    m.update(
        pred_of_item=[0, 1], gt_of_item=[0, 1],
        count_of_item=[100, 60], pred_sem=[0, 0],
        pred_score=[0.5, 0.9], gt_sem=[0, -1])
    assert m.compute()['map'] == pytest.approx(1.0)


def _toy_instance_data():
    """3 clusters over 2 gt instances: cluster 0 pure obj0(y=0),
    cluster 1 pure obj1(y=1), cluster 2 mixed 70/30."""
    ptr = np.array([0, 1, 2, 4])
    obj = np.array([0, 1, 0, 1])
    cnt = np.array([100, 90, 70, 30])
    y = np.array([0, 1, 0, 1])
    return InstanceData(ptr, obj, cnt, y)


def test_semantic_oracle():
    y_hist = np.array([[10, 0, 0], [0, 8, 2], [3, 7, 0]])
    out = semantic_segmentation_oracle(y_hist, num_classes=3)
    assert out['oa'] > 80
    assert out['confmat'].sum() == 30


def test_panoptic_oracle_merges_dominant():
    inst = _toy_instance_data()
    out = panoptic_segmentation_oracle(inst, num_classes=2)
    # dominant assignment: clusters 0+2 -> obj0, cluster 1 -> obj1;
    # both matched with IoU > 0.5 -> RQ=1
    assert out['rq'] == pytest.approx(100.0)
    # IoUs: pred{0,2}->obj0 = 170/200 = .85, pred1->obj1 = 90/120 = .75
    assert out['pq'] == pytest.approx(80.0)


def test_instance_oracle():
    inst = _toy_instance_data()
    out = instance_segmentation_oracle(inst, num_classes=2)
    assert out['map_50'] == pytest.approx(1.0)


def test_weighted_li_error_metrics():
    """WeightedL1/L2Error accumulators (reference
    src/metrics/weighted_li.py): weighted means across updates."""
    from superpoint_transformer_tpu.metrics import (
        WeightedL1Error, WeightedL2Error)
    m1, m2 = WeightedL1Error(), WeightedL2Error()
    p = np.array([[0., 0.], [1., 1.]])
    t = np.array([[1., 0.], [1., 3.]])
    w = np.array([1.0, 3.0])
    m1.update(p, t, w)
    m2.update(p, t, w)
    # L1: per-row |err| sums = [1, 2] -> (1*1 + 2*3)/4
    assert abs(m1.compute() - 7 / 4) < 1e-12
    # L2: per-row sq sums = [1, 4] -> (1*1 + 4*3)/4
    assert abs(m2.compute() - 13 / 4) < 1e-12
    m2.update(p, t)  # unweighted second update accumulates
    assert abs(m2.compute() - (13 + 5) / 6) < 1e-12
    m2.reset()
    assert m2.weight == 0

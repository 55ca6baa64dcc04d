"""SuperCluster panoptic subsystem tests: instance overlap ops,
instance graph + affinities, edge-affinity training step, instance
partition, PQ metric."""
import numpy as np
import pytest
import jax

from superpoint_transformer_tpu.data import Data, Cluster, InstanceData
from superpoint_transformer_tpu.ops.instance import (
    instance_major, instance_graph_affinity)
from superpoint_transformer_tpu.metrics.panoptic import (
    PanopticQuality3D, panoptic_quality_from_overlaps)
from superpoint_transformer_tpu.models.panoptic import (
    PanopticTask, instance_partition)


def make_instance_data():
    """3 clusters; clusters 0,1 mostly object A(y=0), cluster 2 object
    B(y=1)."""
    ptr = np.array([0, 2, 3, 5])
    obj = np.array([10, 11, 10, 11, 11])
    count = np.array([90, 10, 100, 5, 95])
    y = np.array([0, 1, 0, 0, 1])
    return InstanceData(ptr, obj, count, y)


def test_instance_major():
    inst = make_instance_data()
    obj, cnt, y = instance_major(inst, num_classes=5)
    np.testing.assert_array_equal(obj, [10, 10, 11])
    np.testing.assert_array_equal(cnt, [90, 100, 95])
    np.testing.assert_array_equal(y, [0, 0, 1])


def test_instance_graph_affinity():
    inst = make_instance_data()
    ei = np.array([[0, 1, 2], [1, 2, 0]])
    oei, aff = instance_graph_affinity(inst, ei, num_classes=5)
    assert (oei[0] < oei[1]).all()
    # edge (0,1): same object 10 -> high affinity
    # edge (1,2): objects 10 vs 11 -> low affinity
    d = {(int(a), int(b)): float(v)
         for a, b, v in zip(oei[0], oei[1], aff)}
    assert d[(0, 1)] > 0.8
    assert d[(1, 2)] < 0.2


def test_pq_perfect_prediction():
    """Perfect instance predictions give PQ=100."""
    # 2 gt instances; 2 predicted instances matching exactly
    pq = PanopticQuality3D(num_classes=3)
    pq.update(pred_of_item=[0, 1], gt_of_item=[0, 1],
              count_of_item=[100, 50], pred_sem=[0, 1],
              gt_sem=[0, 1])
    m = pq.compute()
    assert m['pq'] == pytest.approx(100.0)
    assert m['sq'] == pytest.approx(100.0)
    assert m['rq'] == pytest.approx(100.0)


def test_pq_half_wrong():
    pq = PanopticQuality3D(num_classes=2)
    # pred 0 covers gt 0 with IoU 0.6; pred 1 is pure false positive
    pq.update(pred_of_item=[0, 0, 1], gt_of_item=[0, 1, 1],
              count_of_item=[60, 40, 30],
              pred_sem=[0, 1], gt_sem=[0, 1])
    m = pq.compute()
    # class 0: tp=1 iou=0.6 -> pq0 = 0.6
    # class 1: gt 1 unmatched (iou 30/(70+30-30)=0.43<0.5), pred 1
    #          unmatched -> fp=1, fn=1 -> pq1 = 0
    assert m['pq'] == pytest.approx((60.0 + 0.0) / 2, abs=1e-3)


def test_pq_void_handling():
    pq = PanopticQuality3D(num_classes=2)
    # gt instance is void (label -1): pred mostly overlapping it is
    # not punished as FP
    pq.update(pred_of_item=[0], gt_of_item=[0], count_of_item=[100],
              pred_sem=[0], gt_sem=[-1])
    m = pq.compute()
    assert m['pq'] == 0.0  # nothing matched, but no fp/fn either
    assert pq.fp.sum() == 0 and pq.fn.sum() == 0


def test_instance_partition_separates():
    """Nodes of two objects with low cross affinity get separated."""
    rng = np.random.default_rng(0)
    n = 30
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    pos[15:, 0] += 10
    logits = np.zeros((n, 4), dtype=np.float32)
    logits[:15, 0] = 5.0
    logits[15:, 1] = 5.0
    # chain edges
    s = np.arange(n - 1)
    ei = np.stack([s, s + 1])
    aff_logits = np.full(n - 1, 5.0, dtype=np.float32)
    aff_logits[14] = -5.0  # cut between the two objects
    obj = instance_partition(
        pos, logits, ei, aff_logits, regularization=1.0, cutoff=1)
    assert len(np.unique(obj[:15])) == 1
    assert len(np.unique(obj[15:])) == 1
    assert obj[0] != obj[-1]


def test_instance_partition_stuff_merge():
    rng = np.random.default_rng(1)
    n = 20
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    pos[10:, 0] += 50
    logits = np.zeros((n, 3), dtype=np.float32)
    logits[:, 2] = 5.0  # all stuff class 2
    s = np.arange(n - 1)
    ei = np.stack([s, s + 1])
    aff = np.full(n - 1, 5.0, dtype=np.float32)
    aff[9] = -5.0
    obj = instance_partition(
        pos, logits, ei, aff, regularization=1.0, cutoff=1,
        stuff_classes=(2,))
    # stuff merge collapses both pieces into one instance
    assert len(np.unique(obj)) == 1


def test_panoptic_train_step():
    """Panoptic training step runs and decreases the loss on a scene
    with instance labels."""
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.transforms.preprocess import (
        preprocess_cloud)
    from tests.test_preprocess import synthetic_scene
    from tests.test_train import tiny_model

    data = synthetic_scene()
    # per-patch instances: 2 objects per class patch
    rng = np.random.default_rng(0)
    n = data.num_nodes
    data['obj'] = (data.y * 2 + (data.pos[:, 0] % 2 < 1)).astype(
        np.int64)
    nag = preprocess_cloud(
        data, voxel=0.1, knn=12, knn_r=1.0, num_classes=3,
        pcp_regularization=(0.05, 0.2), pcp_spatial_weight=(2.0, 0.5),
        pcp_cutoff=(5, 5), graph_gap=(0.5, 1.0))
    assert isinstance(nag[1].get('obj'), InstanceData)

    cfg = BatchConfig(num_classes=3, sample_graph_r=-1,
                      sample_segment_ratio=0, instance=True,
                      instance_radius=0.6)
    batch = prepare_batch([nag], cfg, train=False)
    assert batch[1].obj_edge_index is not None
    assert batch[1].obj_edge_affinity is not None

    task = PanopticTask(net=tiny_model(), num_classes=3,
                        multi_stage_loss_lambdas=(1., 50.),
                        total_steps=30, warmup_steps=2,
                        stuff_classes=())
    state = task.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    rng_j = jax.random.PRNGKey(0)
    for _ in range(8):
        rng_j, sub = jax.random.split(rng_j)
        state, metrics = task.train_step(state, batch, sub)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # full inference path: eval -> instance partition -> PQ
    out = task.eval_step(state, batch)
    lvl1 = batch[1]
    emask = np.asarray(lvl1.obj_edge_mask)
    ei = np.asarray(lvl1.obj_edge_index)[:, emask]
    ea = np.asarray(out['edge_affinity_logits'])[emask]
    nmask = np.asarray(lvl1.node_mask)
    n1 = int(np.asarray(lvl1.num_nodes))
    logits1 = np.asarray(out['logits_level1'])[:n1, :3]
    obj_pred = instance_partition(
        np.asarray(lvl1.pos)[:n1], logits1, ei, ea,
        regularization=10.0, cutoff=1)
    assert obj_pred.shape[0] == n1
    # PQ from merged overlaps
    pred_inst = nag[1].obj.merge(obj_pred)
    pq = PanopticQuality3D(num_classes=3)
    pred_sem = np.zeros(int(obj_pred.max()) + 1, dtype=np.int64)
    for c in range(pred_sem.shape[0]):
        m = obj_pred == c
        if m.any():
            pred_sem[c] = logits1[m].sum(0).argmax()
    pq.update_from_instance_data(pred_inst, pred_sem)
    m = pq.compute()
    assert 0 <= m['pq'] <= 100


def test_validate_panoptic_epoch():
    """Full panoptic validation epoch: eval -> instance partition ->
    PQ/mAP from overlaps (reference _forward_partition + epoch-end
    metrics, src/models/panoptic.py:498,952)."""
    import jax
    from superpoint_transformer_tpu.trainer import validate_panoptic
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from superpoint_transformer_tpu.models.spt import SPT

    nags = [random_nag(seed=s, n_points=300, with_instances=True)
            for s in range(2)]
    net = SPT(point_mlp=(12, 16, 32), down_dim=(16, 16),
              down_in_mlp=((4 + 32, 16), (4 + 16, 16)),
              down_num_heads=2, down_num_blocks=1, up_dim=(16,),
              up_in_mlp=((4 + 16 + 16, 16),), h_edge_mlp=(18, 8),
              in_rpe_dim=8, qk_dim=2, no_ffn=True, k_rpe=True,
              q_rpe=True, v_rpe=True, use_diameter_parent=True,
              output_stage_wise=True, num_graphs=1)
    task = PanopticTask(net=net, num_classes=13, total_steps=10,
                        warmup_steps=1)
    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0,
                      instance=True)
    example = prepare_batch([nags[0].clone()], cfg, train=False)
    state = task.init_state(jax.random.PRNGKey(0), example)

    class _Loader:
        def __iter__(self):
            for n in nags:
                yield [n.clone()]

    out = validate_panoptic(task, state, _Loader(), cfg,
                            num_classes=13)
    assert np.isfinite(out['pq'])
    assert 'map_50' in out


def test_trainer_fit_panoptic(tmp_path):
    """Trainer.fit with a PanopticTask runs the instance-partition +
    PQ validation on the partition cadence, logs panoptic.csv, and
    selects the best checkpoint by the monitored PQ (reference
    partition_every_n_epoch + optimized_metric 'val/pq')."""
    import jax
    from superpoint_transformer_tpu.trainer import Trainer
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, prepare_batch, discover_caps)
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from tests.test_trainer_fit import tiny_model, _Loader

    nags = [random_nag(seed=s, n_points=300, with_instances=True)
            for s in range(2)]
    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0,
                      instance=True, max_num_nodes=10_000)
    cfg = discover_caps([nags], cfg, rng=np.random.default_rng(0))
    task = PanopticTask(net=tiny_model(), num_classes=13,
                        total_steps=10, warmup_steps=1)
    trainer = Trainer(task=task, batch_cfg=cfg,
                      output_dir=str(tmp_path), max_epochs=1,
                      check_val_every_n_epoch=1,
                      partition_every_n_epoch=1, monitor='pq',
                      panoptic_grid_search=False)
    example = prepare_batch([n.clone() for n in nags], cfg,
                            train=True, rng=np.random.default_rng(0))
    state = task.init_state(jax.random.PRNGKey(0), example)
    state = trainer.fit(state, _Loader(nags), val_loader=_Loader(nags))

    pan = (tmp_path / 'panoptic.csv').read_text()
    assert 'pq' in pan.splitlines()[0]
    assert len(pan.splitlines()) >= 2
    # best checkpoint selected by PQ (monitor) and settings cached
    assert trainer.best_miou >= 0
    assert trainer._partition_settings is not None
    assert (tmp_path / 'checkpoints' / 'best').exists()


def test_pq_modified_stuff_class():
    """PQ† (arXiv 1905.01220): stuff classes count ALL agreeing
    overlaps (not just IoU>0.5) against a gt-count denominator
    (reference compute(), src/metrics/panoptic.py:311-327)."""
    # class 1 is stuff; two predictions each covering ~half of the
    # single stuff gt instance -> PQ=0 (no IoU>0.5 match) but PQ†>0
    pq = PanopticQuality3D(num_classes=2, stuff_classes=(1,))
    pq.update(pred_of_item=[0, 1], gt_of_item=[0, 0],
              count_of_item=[50, 50], pred_sem=[1, 1], gt_sem=[1])
    m = pq.compute()
    assert m['pq_per_class'][1] == 0.0
    # each overlap has IoU 50/(50+100-50)=0.5; PQ† = (0.5+0.5)/1 = 1
    assert m['pq_modified_per_class'][1] == pytest.approx(100.0)
    # thing/stuff splits present (all-unseen splits collapse to 0.0,
    # same convention as the empty-scene 'pq')
    assert m['pq_thing'] == 0.0  # class 0 unseen
    assert m['pq_stuff'] == pytest.approx(0.0)


def test_pq_precision_recall_fields():
    pq = PanopticQuality3D(num_classes=2)
    # class 0: 1 gt, 2 preds, one matches (IoU 0.9)
    pq.update(pred_of_item=[0, 1], gt_of_item=[0, 1],
              count_of_item=[90, 10], pred_sem=[0, 0],
              gt_sem=[0, -1])
    m = pq.compute()
    # pred 1 fully overlaps void gt -> removed, not a FP
    assert m['tp_per_class'][0] == 1
    assert m['fp_per_class'][0] == 0
    assert m['precision_per_class'][0] == pytest.approx(1.0)
    assert m['recall_per_class'][0] == pytest.approx(1.0)
    assert m['mean_precision'] == pytest.approx(1.0)


def test_instance_remove_void_and_iou():
    """remove_void drops >50%-void predictions and void targets, and
    iou_and_size corrects object sizes by the cropped void-prediction
    mass (reference src/data/instance.py:255,550)."""
    from superpoint_transformer_tpu.ops.instance import (
        instance_remove_void, instance_iou_and_size)
    # cluster 0: 80 pts of obj A (y=0) + 20 of void obj V (y=-1)
    # cluster 1: 90 pts of void obj V -> removed (>50% void)
    # cluster 2: 60 pts of obj A
    ptr = np.array([0, 2, 3, 4])
    obj = np.array([5, 9, 9, 5])
    count = np.array([80, 20, 90, 60])
    y = np.array([0, -1, -1, 0])
    inst = InstanceData(ptr, obj, count, y)
    out, mask = instance_remove_void(inst, num_classes=2)
    np.testing.assert_array_equal(mask, [True, False, True])
    assert out.num_groups == 2
    np.testing.assert_array_equal(out.obj, [5, 5])
    iou, a_size, b_size = instance_iou_and_size(
        out, getattr(out, 'pair_cropped_count', None))
    # obj A total = 140 (80 + 60); no crop from void cluster (cluster
    # 1 only overlapped void obj) -> IoU = 80/(100-?).. cluster sizes
    # shrink to the kept pairs: a=[80, 60]
    np.testing.assert_allclose(a_size, [80, 60])
    np.testing.assert_allclose(b_size, [140, 140])
    np.testing.assert_allclose(iou, [80 / 140, 60 / 140])


def test_instance_major_void_fallback():
    """A cluster whose major overlap is void but <=50% of its size is
    reassigned to its best non-void overlap (reference
    InstanceData.major, src/data/instance.py:198-228)."""
    # cluster 0: 40 void + 35 obj A + 25 obj B -> major raw = void,
    # but 40/100 <= 50% -> fall back to A
    ptr = np.array([0, 3])
    obj = np.array([9, 5, 6])
    count = np.array([40, 35, 25])
    y = np.array([-1, 0, 1])
    inst = InstanceData(ptr, obj, count, y)
    o, c, yy = instance_major(inst, num_classes=2)
    assert o[0] == 5 and c[0] == 35 and yy[0] == 0
    # >50% void keeps the void major
    inst2 = InstanceData(np.array([0, 2]), np.array([9, 5]),
                         np.array([60, 40]), np.array([-1, 0]))
    o2, c2, y2 = instance_major(inst2, num_classes=2)
    assert o2[0] == 9 and y2[0] == -1


def test_instance_data_method_api():
    """The reference's InstanceData method surface exists and
    delegates correctly (src/data/instance.py:162-550)."""
    inst = make_instance_data()
    np.testing.assert_array_equal(
        inst.indices, inst.to_super_index())
    iou, a, b = inst.iou_and_size()
    assert iou.shape == (5,) and (iou > 0).all() and (iou <= 1).all()
    o, c, y = inst.major(num_classes=5)
    np.testing.assert_array_equal(o, [10, 10, 11])
    data, mask = inst.remove_void(num_classes=5)
    assert mask.all()  # nothing void here
    pos = np.zeros((3, 3), np.float32)
    obj_pos, obj_ids = inst.estimate_centroid(pos)
    assert obj_pos.shape == (2, 3)
    ei, aff = inst.instance_graph(np.array([[0, 1], [1, 2]]),
                                  num_classes=5)
    assert ei.shape[1] == aff.shape[0] == 2


def test_instance_data_cat_offsets_objects():
    """InstanceData.cat offsets object ids per scene so instances
    never collide (reference InstanceBatch.from_list guarantee)."""
    a = InstanceData(np.array([0, 2]), np.array([0, 1]),
                     np.array([5, 3]), np.array([0, 1]))
    b = InstanceData(np.array([0, 1, 2]), np.array([0, 0]),
                     np.array([7, 2]), np.array([2, 2]))
    c = InstanceData.cat([a, b])
    assert c.num_groups == 3
    np.testing.assert_array_equal(c.obj, [0, 1, 2, 2])
    np.testing.assert_array_equal(c.count, [5, 3, 7, 2])
    np.testing.assert_array_equal(c.pointers, [0, 2, 3, 4])


def test_validate_panoptic_obj_reindex_on_shuffled_nag():
    """validate_panoptic reindexes the NAG-order gt overlaps into
    batch order via node_id (pad_nag sorts levels by parent).
    Regression for round 4's demo-room PQ: a level-1 permutation in
    the stored NAG silently misaligned obj.merge with the batch-order
    partition. Pins (a) the reindex mechanics and (b) a finite PQ on
    shuffled inputs through the full validation path."""
    import jax
    from superpoint_transformer_tpu.trainer import validate_panoptic
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from superpoint_transformer_tpu.models.spt import SPT
    from tests.test_inference import _shuffle_level1

    nag = random_nag(seed=3, n_points=300, with_instances=True)
    nag = _shuffle_level1(nag, np.random.default_rng(5))

    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0,
                      instance=True)
    batch = prepare_batch([nag.clone()], cfg, train=False,
                          device=False)
    lvl1 = batch[1]
    n1 = int(lvl1.num_nodes)
    nid = np.asarray(lvl1.node_id)[:n1]
    assert not np.array_equal(nid, np.arange(n1)), \
        'shuffle should force a non-identity sort'
    # reindex mechanics: majors of the reindexed overlaps equal the
    # NAG-order majors gathered at node_id (exact, data-independent)
    obj = nag[1].obj
    _, _, maj = obj.major(num_classes=13)
    obj_b = obj[nid][0]
    _, _, maj_b = obj_b.major(num_classes=13)
    np.testing.assert_array_equal(np.asarray(maj_b),
                                  np.asarray(maj)[nid])

    # full path: validation on the shuffled NAG produces finite PQ
    net = SPT(point_mlp=(12, 16, 32), down_dim=(16, 16),
              down_in_mlp=((4 + 32, 16), (4 + 16, 16)),
              down_num_heads=2, down_num_blocks=1, up_dim=(16,),
              up_in_mlp=((4 + 16 + 16, 16),), h_edge_mlp=(18, 8),
              in_rpe_dim=8, qk_dim=2, no_ffn=True, k_rpe=True,
              q_rpe=True, v_rpe=True, use_diameter_parent=True,
              output_stage_wise=True, num_graphs=1)
    task = PanopticTask(net=net, num_classes=13, total_steps=10,
                        warmup_steps=1)
    example = prepare_batch([nag.clone()], cfg, train=False)
    state = task.init_state(jax.random.PRNGKey(0), example)

    class _Loader:
        def __iter__(self):
            yield [nag.clone()]

    out = validate_panoptic(task, state, _Loader(), cfg,
                            num_classes=13)
    assert np.isfinite(out['pq'])

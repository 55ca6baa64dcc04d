"""Whole-cloud end-to-end inference (VERDICT r2 item 4): raw points
-> xy tiles -> preprocess -> shared-signature padded forward ->
full-resolution recovery (reference headline path,
/root/reference/README.md:103 + src/utils/output_semantic.py:139)."""
import numpy as np
import pytest


@pytest.fixture(scope='module')
def small_cloud():
    from superpoint_transformer_tpu.utils.synthetic import (
        synthetic_aerial_cloud)
    data, _ = synthetic_aerial_cloud(seed=0, n_points=120_000,
                                     extent=(45, 30), n_buildings=6)
    return data


@pytest.fixture(scope='module')
def flagship():
    import jax
    from superpoint_transformer_tpu.models.semantic import (
        SemanticSegmentationModel)
    from __graft_entry__ import _make_model, _make_batch
    model = SemanticSegmentationModel(net=_make_model(num_graphs=1),
                                      num_classes=13)
    variables = jax.jit(model.init, static_argnames=('train',))(
        jax.random.PRNGKey(0), _make_batch(), train=False)
    return model, variables


def test_tile_cloud_partitions_rows(small_cloud):
    from superpoint_transformer_tpu.inference import tile_cloud
    tiles = tile_cloud(small_cloud, (2, 3))
    idx_all = np.concatenate([idx for _, idx in tiles])
    assert idx_all.shape[0] == small_cloud.num_nodes
    assert np.array_equal(np.sort(idx_all),
                          np.arange(small_cloud.num_nodes))
    for tile, idx in tiles:
        assert tile.num_nodes == idx.shape[0]
        np.testing.assert_allclose(np.asarray(tile.pos),
                                   np.asarray(small_cloud.pos)[idx])


@pytest.mark.slow
def test_strip_for_inference_identical_logits(flagship):
    """Dropping y and host-casting x/edge_feat/v_edge_attr to the
    model's compute dtype must be BIT-identical: y never enters the
    forward, and every first consumer casts those inputs to bf16
    anyway (nn/mlp.py, nn/attention.py) — the rounding just moves from
    chip to host."""
    import dataclasses
    import jax
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.inference import (
        strip_for_inference, EVAL_BATCH_OVERRIDES)
    model, variables = flagship
    nag = random_nag(seed=3, n_points=2048)
    cfg = dataclasses.replace(BatchConfig(), **EVAL_BATCH_OVERRIDES)
    batch = prepare_batch([nag], cfg, train=False, device=False)
    sbatch = strip_for_inference(
        batch, getattr(model.net, 'compute_dtype', None))
    assert all(lvl.y is None for lvl in sbatch.levels)
    f = jax.jit(lambda v, b: model.apply(v, b, train=False))
    l1 = np.asarray(f(variables, batch)[0])
    l2 = np.asarray(f(variables, sbatch)[0])
    np.testing.assert_array_equal(l1, l2)


def test_batch_signature_matches_pad(small_cloud):
    """batch_signature must predict, without materializing a padded
    array, exactly the shapes pad_nag chooses (node capacity, dense
    K, transpose K_in) — the e2e shared-signature pin relies on it."""
    import dataclasses
    from superpoint_transformer_tpu.data.pad import pad_nag
    from superpoint_transformer_tpu.inference import (
        tile_cloud, EVAL_BATCH_OVERRIDES)
    from superpoint_transformer_tpu.transforms import BatchConfig
    from superpoint_transformer_tpu.transforms.prepare import (
        batch_signature, process_batch)
    from superpoint_transformer_tpu.transforms.preprocess import (
        preprocess_cloud)
    pre = dict(voxel=0.1, knn=25, knn_r=10.0, knn_min_search=10,
               pcp_regularization=(0.1, 0.2, 0.3),
               pcp_spatial_weight=(0.1, 0.01, 0.001),
               pcp_cutoff=(10, 30, 100), graph_gap=(5.0, 30.0, 30.0))
    cfg = dataclasses.replace(BatchConfig(), **EVAL_BATCH_OVERRIDES)
    (tile, _), _ = tile_cloud(small_cloud, (2, 1))[0], None
    big = process_batch([preprocess_cloud(tile, **pre)], cfg,
                        train=False)
    nc, kc, kic = batch_signature(big, cfg)
    padded = pad_nag(big, num_classes=cfg.num_classes,
                     bucket_mode=cfg.bucket_mode, device=False)
    for i, lvl in enumerate(padded.levels):
        li = padded.start_i_level + i
        assert nc[li] == lvl.capacity, (li, nc[li], lvl.capacity)
        if lvl.nbr_idx is not None:
            assert kc[li] == lvl.nbr_idx.shape[1], li
            assert kic[li] == lvl.nbr_in_idx.shape[1], li
        else:
            assert li not in kc


@pytest.mark.slow
def test_stacked_scan_matches_per_tile(small_cloud, flagship):
    """infer_nags_stacked (one lax.scan program over same-signature
    tiles) must produce the same argmax predictions as per-tile
    infer_nag calls — stacking is a dispatch optimization, not a
    numerical change."""
    import dataclasses
    from superpoint_transformer_tpu.inference import (
        tile_cloud, infer_nag, infer_nags_stacked,
        EVAL_BATCH_OVERRIDES)
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.transforms.preprocess import (
        preprocess_cloud)
    model, variables = flagship
    pre = dict(voxel=0.1, knn=25, knn_r=10.0, knn_min_search=10,
               pcp_regularization=(0.1, 0.2, 0.3),
               pcp_spatial_weight=(0.1, 0.01, 0.001),
               pcp_cutoff=(10, 30, 100), graph_gap=(5.0, 30.0, 30.0))
    tiles = tile_cloud(small_cloud, (2, 1))
    nags = [preprocess_cloud(t, **pre) for t, _ in tiles]
    cfg = dataclasses.replace(BatchConfig(), **EVAL_BATCH_OVERRIDES)
    node_caps, k_caps, k_in_caps = {}, {}, {}
    for nag in nags:
        probe = prepare_batch([nag], cfg, train=False, device=False)
        for i, lvl in enumerate(probe.levels):
            li = probe.start_i_level + i
            node_caps[li] = max(node_caps.get(li, 0), lvl.capacity)
            if lvl.nbr_idx is not None:
                k_caps[li] = max(k_caps.get(li, 0),
                                 lvl.nbr_idx.shape[1])
            if lvl.nbr_in_idx is not None:
                k_in_caps[li] = max(k_in_caps.get(li, 0),
                                    lvl.nbr_in_idx.shape[1])
    cfg = dataclasses.replace(cfg, node_caps=node_caps,
                              k_caps=k_caps or None,
                              k_in_caps=k_in_caps or None)
    stacked = infer_nags_stacked(model, variables, nags, cfg)
    for nag, sp in zip(nags, stacked):
        pp = infer_nag(model, variables, nag, cfg)
        assert sp.shape == pp.shape == (int(nag[1].num_nodes),)
        np.testing.assert_array_equal(sp, pp)
    # chunked execution (2 tiles through [1, ...] programs, exercising
    # the fill-and-slice path) must be identical too
    chunked = infer_nags_stacked(model, variables, nags, cfg,
                                 max_tiles_per_program=1)
    for sp, cp in zip(stacked, chunked):
        np.testing.assert_array_equal(sp, cp)
    # warmup mode runs a perturbed-variables TIMING probe, but the
    # returned predictions must come from the unperturbed weights
    # (regression for the round-4 advisor finding: warmup permanently
    # perturbed `variables` and the product output with them)
    timings = {}
    warm = infer_nags_stacked(model, variables, nags, cfg,
                              timings=timings, warmup=True)
    for sp, wp in zip(stacked, warm):
        np.testing.assert_array_equal(sp, wp)
    assert 'warmup_compile' in timings and 'forward' in timings


@pytest.mark.slow
def test_e2e_inference_full_pipeline(small_cloud, flagship):
    from superpoint_transformer_tpu.inference import e2e_inference
    model, variables = flagship
    pred, info = e2e_inference(
        model, variables, small_cloud,
        pre_cfg=dict(voxel=0.1, knn=25, knn_r=10.0, knn_min_search=10,
                     pcp_regularization=(0.1, 0.2, 0.3),
                     pcp_spatial_weight=(0.1, 0.01, 0.001),
                     pcp_cutoff=(10, 30, 100),
                     graph_gap=(5.0, 30.0, 30.0)),
        tiling=(2, 2))
    # every raw point got a class
    assert pred.shape == (small_cloud.num_nodes,)
    assert pred.min() >= 0 and pred.max() < 13
    assert info['n_tiles'] == 4
    assert info['n_voxels'] > 0
    assert info['raw_points_per_sec'] > 0
    t = info['timings_sec']
    for phase in ('tile', 'preprocess', 'transform', 'pin', 'forward',
                  'recover'):
        assert phase in t
    # the untrained model's predictions are arbitrary, but recovery
    # must broadcast segment decisions: each voxel's points agree
    # (spot-check one tile via its NAG is implicit in the pipeline;
    # here check prediction is piecewise-constant at SOME granularity)
    assert len(np.unique(pred)) <= 13

def _shuffle_level1(nag, rng):
    """Return a clone whose level-1 rows are randomly permuted (a
    consistent relabeling: level-0 super_index, level-2 sub and the
    instance graph are remapped). Models the reference-preprocessed
    H5s, whose levels are NOT sorted by parent — exercises the
    non-identity sort_nag_by_super path."""
    from superpoint_transformer_tpu.data.csr import Cluster
    nag = nag.clone()
    d1 = nag[1]
    n1 = d1.num_nodes
    perm = rng.permutation(n1)
    inv = np.empty(n1, np.int64)
    inv[perm] = np.arange(n1)
    new_d, _ = d1.select(perm)
    if 'obj_edge_index' in new_d:
        new_d._store['obj_edge_index'] = inv[new_d.obj_edge_index]
    nag[1] = new_d
    nag[0]._store['super_index'] = inv[np.asarray(nag[0].super_index)]
    if nag.absolute_num_levels > 2 and nag[2].get('sub') is not None:
        sub = nag[2].sub
        nag[2]._store['sub'] = Cluster(sub.pointers, inv[sub.points])
    return nag


def test_pad_nag_node_id_and_instance_graph_alignment(small_cloud):
    """pad_nag sorts levels by parent; node_id must map batch rows
    back to the input order, and the instance graph's endpoints must
    be remapped with the sort (regression: obj_edge_index is in
    data.py _NOT_INDEXABLE_DEFAULT, so Data.select copies it verbatim
    and the sort used to leave PRE-sort ids against POST-sort rows)."""
    import dataclasses
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.transforms.preprocess import (
        preprocess_cloud)
    from superpoint_transformer_tpu.utils.pseudo_instances import (
        add_pseudo_instances)
    from superpoint_transformer_tpu.inference import (
        EVAL_BATCH_OVERRIDES)
    pre = dict(voxel=0.2, knn=10, knn_r=5.0, knn_min_search=5,
               pcp_regularization=(0.1, 0.2), pcp_spatial_weight=(0.1, 0.01),
               pcp_cutoff=(10, 30), graph_gap=(5.0, 30.0))
    nag = preprocess_cloud(small_cloud, **pre)
    nag, _ = add_pseudo_instances(nag, num_classes=13)
    nag = _shuffle_level1(nag, np.random.default_rng(7))
    cfg = dataclasses.replace(BatchConfig(instance=True),
                              **EVAL_BATCH_OVERRIDES)
    # the instance graph is built by process_batch
    # (on_the_fly_instance_graph) in pre-sort order — this is the
    # edge set the padded batch must stay consistent with
    from superpoint_transformer_tpu.transforms.prepare import (
        process_batch)
    big = process_batch([nag], cfg, train=False)
    nag_ei = np.asarray(big[1].obj_edge_index)
    batch = prepare_batch([nag], cfg, train=False, device=False)
    lvl1 = batch[1]
    n1 = int(lvl1.num_nodes)
    nid = np.asarray(lvl1.node_id)[:n1]
    # node_id is a permutation mapping batch rows -> NAG rows
    assert np.array_equal(np.sort(nid), np.arange(n1))
    assert not np.array_equal(nid, np.arange(n1)), \
        'shuffled NAG should force a non-identity sort'
    np.testing.assert_allclose(np.asarray(lvl1.pos)[:n1],
                               np.asarray(nag[1].pos)[nid], atol=0)
    # instance-graph endpoints, mapped back to NAG ids, must equal the
    # NAG's own edge set (order-insensitive comparison)
    em = np.asarray(lvl1.obj_edge_mask)
    bei = np.asarray(lvl1.obj_edge_index)[:, em]
    got = np.sort(nid[bei], axis=0)
    want = np.sort(nag_ei, axis=0)
    got = got[:, np.lexsort(got)]
    want = want[:, np.lexsort(want)]
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_infer_nag_alignment_under_level_shuffle(small_cloud, flagship):
    """infer_nag returns NAG-row-aligned predictions: the same cloud
    with a permuted level-1 must produce the same prediction for the
    same physical segment."""
    import dataclasses
    from superpoint_transformer_tpu.inference import (
        infer_nag, EVAL_BATCH_OVERRIDES)
    from superpoint_transformer_tpu.transforms import BatchConfig
    from superpoint_transformer_tpu.transforms.preprocess import (
        preprocess_cloud)
    model, variables = flagship
    pre = dict(voxel=0.2, knn=10, knn_r=5.0, knn_min_search=5,
               pcp_regularization=(0.1, 0.2), pcp_spatial_weight=(0.1, 0.01),
               pcp_cutoff=(10, 30), graph_gap=(5.0, 30.0))
    nag = preprocess_cloud(small_cloud, **pre)
    rng = np.random.default_rng(11)
    nag_shuf = _shuffle_level1(nag, rng)
    # the shuffle moved NAG row i to shuffled row inv[i]; recover the
    # map from each shuffled row back to the original row
    cfg = dataclasses.replace(BatchConfig(), **EVAL_BATCH_OVERRIDES)
    l_orig = infer_nag(model, variables, nag, cfg, fetch='logits')
    l_shuf = infer_nag(model, variables, nag_shuf, cfg, fetch='logits')
    # same physical segment -> same logits (up to fp reduction-order
    # noise: the sorted segment ops sum children in permuted order):
    # match rows by position
    pos_o = np.asarray(nag[1].pos)
    pos_s = np.asarray(nag_shuf[1].pos)
    order_o = np.lexsort(pos_o.T)
    order_s = np.lexsort(pos_s.T)
    np.testing.assert_allclose(pos_o[order_o], pos_s[order_s], atol=0)
    # bf16 compute: permuted-order segment reductions shift logits
    # by up to ~1% of their magnitude; misalignment would shift O(all)
    np.testing.assert_allclose(l_orig[order_o], l_shuf[order_s],
                               rtol=0.1, atol=1.0)
    # a misalignment would scramble most rows; fp noise flips only
    # near-tie argmaxes
    agree = (l_orig[order_o].argmax(-1)
             == l_shuf[order_s].argmax(-1)).mean()
    assert agree > 0.95, agree

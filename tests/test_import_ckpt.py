"""Reference-checkpoint import: name mapping, transposition, full
coverage for the flagship architecture."""
import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from superpoint_transformer_tpu.utils.import_ckpt import (
    import_reference_checkpoint, reference_key_for)


def test_literal_key_examples():
    """Pin the naming convention against the reference source
    (src/models/components/spt.py:462-523, src/nn/stage.py:132,
    src/nn/transformer.py:159-192, src/nn/mlp.py:40-57,135)."""
    cases = [
        (('net', 'first_stage', 'in_mlp', 'linear_0', 'kernel'),
         'net.first_stage.in_mlp.mlp.0.weight'),
        (('net', 'first_stage', 'in_mlp', 'norm_2', 'mean_scale'),
         'net.first_stage.in_mlp.mlp.7.mean_scale'),
        (('net', 'down_stage_0', 'block_2', 'sa', 'qkv', 'kernel'),
         'net.down_stages.0.transformer_blocks.2.sa.qkv.weight'),
        (('net', 'down_stage_1', 'block_0', 'sa', 'k_rpe', 'bias'),
         'net.down_stages.1.transformer_blocks.0.sa.k_rpe.bias'),
        (('net', 'up_stage_0', 'block_0', 'sa_norm', 'weight'),
         'net.up_stages.0.transformer_blocks.0.sa_norm.weight'),
        (('net', 'up_stage_0', 'block_0', 'sa', 'out_proj', 'kernel'),
         'net.up_stages.0.transformer_blocks.0.sa.out_proj.weight'),
        (('net', 'h_edge_mlp_1', 'linear_1', 'kernel'),
         'net.h_edge_mlps.1.mlp.3.weight'),
        (('net', 'h_edge_mlp_0', 'norm_0', 'bias'),
         'net.h_edge_mlps.0.mlp.1.bias'),
        (('head_0', 'classifier', 'kernel'),
         'head.0.classifier.weight'),
        (('head_2', 'classifier', 'bias'), 'head.2.classifier.bias'),
    ]
    for path, expect in cases:
        assert reference_key_for(path) == expect, (path, expect)


@pytest.fixture(scope='module')
def flagship():
    from superpoint_transformer_tpu.models.semantic import (
        SemanticSegmentationModel)
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from __graft_entry__ import _make_model

    nag = random_nag(seed=0, n_points=512)
    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0)
    batch = prepare_batch([nag], cfg, train=False,
                          rng=np.random.default_rng(0), device=False)
    model = SemanticSegmentationModel(net=_make_model(num_graphs=1),
                                      num_classes=13)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    return jax.tree_util.tree_map(np.asarray, variables['params'])


def _fake_reference_state_dict(params):
    """Build an authentic-looking reference state_dict holding OUR
    init values (reverse of the import mapping), so a round-trip
    recovers them exactly."""
    from superpoint_transformer_tpu.utils.import_ckpt import (
        _tree_paths)
    state = {}
    for path, value in _tree_paths(params):
        key = reference_key_for(path)
        assert key is not None, f'unmapped param {path}'
        v = np.asarray(value)
        state[key] = v.T if path[-1] == 'kernel' else v
    # typical reference extras that must be ignored
    state['criterion.criteria.0.weight'] = np.ones(13)
    state['train_cm.confmat'] = np.zeros((13, 13))
    return state


def test_roundtrip_full_coverage(flagship):
    state = _fake_reference_state_dict(flagship)
    zeros = jax.tree_util.tree_map(np.zeros_like, flagship)
    new, report = import_reference_checkpoint(state, zeros,
                                              strict=True)
    assert not report['missing']
    assert not report['unused_reference_keys']
    flat_new = jax.tree_util.tree_leaves(new)
    flat_ref = jax.tree_util.tree_leaves(flagship)
    assert len(flat_new) == len(flat_ref)
    for a, b in zip(flat_new, flat_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_transposed(flagship):
    state = _fake_reference_state_dict(flagship)
    k = state['net.down_stages.0.transformer_blocks.0.sa.qkv.weight']
    ours = flagship['net']['down_stage_0']['block_0']['sa']['qkv'][
        'kernel']
    assert k.shape == tuple(reversed(ours.shape))


def test_shape_mismatch_raises(flagship):
    state = _fake_reference_state_dict(flagship)
    key = 'net.down_stages.0.transformer_blocks.0.sa.qkv.weight'
    state[key] = state[key][:, :-1]
    with pytest.raises(ValueError, match='shape mismatch'):
        import_reference_checkpoint(state, flagship, strict=True)


# --- nano / panoptic / EZ-SP key maps (VERDICT r2 item 9) ---------------

def test_literal_key_examples_extended():
    """Pin the new architecture families' naming conventions:
    - EZ-SP sparse CNN inside the SPT first stage (reference
      src/nn/stage.py:714 self.cnn_blocks = SparseCNN(...),
      src/nn/sparse.py:14 ConvBlock.conv/.norm)
    - EZ-SP stage-1 PartitionModel (our root {'cnn': ...}; reference
      stores the same weights under net.first_stage.cnn_blocks in a
      PartitionAndSemanticModule ckpt, src/transforms/point.py:724)
    - SuperCluster edge-affinity FFN on the task module (reference
      src/models/panoptic.py:257-258)"""
    cases = [
        (('net', 'first_stage', 'cnn', 'block_0', 'kernel'),
         'net.first_stage.cnn_blocks.0.conv.kernel'),
        (('net', 'first_stage', 'cnn', 'block_1', 'GraphNorm_0',
          'mean_scale'),
         'net.first_stage.cnn_blocks.1.norm.mean_scale'),
        (('net', 'first_stage', 'cnn', 'block_2', 'bias'),
         'net.first_stage.cnn_blocks.2.conv.bias'),
        (('cnn', 'block_0', 'kernel'),
         'net.first_stage.cnn_blocks.0.conv.kernel'),
        (('cnn', 'block_1', 'GraphNorm_0', 'weight'),
         'net.first_stage.cnn_blocks.1.norm.weight'),
        (('edge_affinity_head', 'linear_0', 'kernel'),
         'edge_affinity_head.mlp.0.weight'),
        (('edge_affinity_head', 'linear_1', 'bias'),
         'edge_affinity_head.mlp.2.bias'),
    ]
    for path, expect in cases:
        assert reference_key_for(path) == expect, (path, expect)


def _roundtrip(params, conv_k=None):
    """Round-trip: build an authentic reference state_dict from our
    init values, import it into a zeroed tree, require full coverage
    and exact recovery."""
    from superpoint_transformer_tpu.utils.import_ckpt import (
        _tree_paths)
    state = {}
    for path, value in _tree_paths(params):
        key = reference_key_for(path)
        assert key is not None, f'unmapped param {path}'
        v = np.asarray(value)
        if key.endswith('.conv.kernel'):
            # torchsparse layout [K, in, out] (K>1)
            if conv_k and conv_k > 1:
                v = v.reshape(conv_k, -1, v.shape[-1])
        elif path[-1] == 'kernel':
            v = v.T
        state[key] = v
    zeros = jax.tree_util.tree_map(np.zeros_like, params)
    new, report = import_reference_checkpoint(state, zeros,
                                              strict=True)
    assert not report['missing']
    assert not report['unused_reference_keys']
    for a, b in zip(jax.tree_util.tree_leaves(new),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_nano():
    """nano-2 (no point stage; first_stage is a transformer Stage,
    reference spt.py:487): full key coverage + exact round-trip."""
    import dataclasses
    import os.path as osp
    from superpoint_transformer_tpu.config.loader import load_config
    from superpoint_transformer_tpu.experiment import (
        build_model, build_batch_config)
    from superpoint_transformer_tpu.models.semantic import (
        SemanticSegmentationModel)
    from superpoint_transformer_tpu.transforms import prepare_batch
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from superpoint_transformer_tpu.data.nag import NAG

    here = osp.dirname(osp.dirname(osp.abspath(__file__)))
    cfg = load_config(osp.join(here, 'configs'), 'train',
                      ['experiment=semantic/s3dis_nano'])
    net = build_model(cfg, num_graphs=1)
    assert net.nano
    bcfg = dataclasses.replace(
        build_batch_config(cfg), sample_graph_r=-1,
        sample_segment_ratio=0)

    # nano NAGs skip level 0 and carry stored per-segment mean
    # features (reference nano datasets load with low=1)
    nag = random_nag(seed=0, n_points=512)
    rng = np.random.default_rng(0)
    levels = [nag[1], nag[2]]
    for d in levels:
        for k in bcfg.segment_hf:
            dim = 3 if k.endswith('rgb') else 1
            d[k] = rng.random((d.num_nodes, dim)).astype(np.float32)
    batch = prepare_batch([NAG(levels, start_i_level=1)], bcfg,
                          train=False, device=False)
    model = SemanticSegmentationModel(net=net, num_classes=13)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    _roundtrip(jax.tree_util.tree_map(np.asarray,
                                      variables['params']))


def test_roundtrip_panoptic():
    """PanopticSegmentationModel (backbone + heads +
    edge_affinity_head FFN): full coverage + exact round-trip."""
    from superpoint_transformer_tpu.models.panoptic import (
        PanopticSegmentationModel)
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from tests.test_train import tiny_model

    nag = random_nag(seed=0, n_points=300, with_instances=True)
    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0,
                      instance=True, instance_radius=10.0)
    batch = prepare_batch([nag], cfg, train=False, device=False)
    assert batch[1].obj_edge_index is not None
    model = PanopticSegmentationModel(net=tiny_model(num_graphs=1),
                                      num_classes=13)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    assert 'edge_affinity_head' in params
    _roundtrip(params)


def test_roundtrip_partition_model():
    """EZ-SP stage-1 PartitionModel (sparse CNN): full coverage +
    exact round-trip, including the [K, in, out] -> [K*in, out]
    torchsparse conv-kernel reshape."""
    from superpoint_transformer_tpu.data.pad import pad_point_cloud
    from superpoint_transformer_tpu.models.partition import (
        PartitionModel)
    from tests.test_ezsp import _toy_cloud

    data = _toy_cloud()
    batch = pad_point_cloud([data], num_classes=3)
    conv_k = int(np.asarray(batch.cnn_nbr_idx).shape[1])
    model = PartitionModel(channels=(16, 8), num_graphs=1)
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    _roundtrip(params, conv_k=conv_k)

"""SPT forward tests: demo-NAG golden forward + toy batches."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from superpoint_transformer_tpu.data import NAG, pad_nag, batch_nags
from superpoint_transformer_tpu.models import SPT
from superpoint_transformer_tpu.transforms import (
    BatchConfig, prepare_batch)


def make_spt2(num_graphs=8):
    """SPT-2 S3DIS configuration (reference
    configs/model/semantic/spt-2.yaml + _down/_up/_attention.yaml):
    8 point features, node injection dim 4 (pos + diameter_parent)."""
    return SPT(
        point_mlp=(12, 32, 64, 128),
        down_dim=(64, 64),
        down_in_mlp=((4 + 128, 64, 64), (4 + 64, 64, 64)),
        down_num_heads=16, down_num_blocks=3, down_ffn_ratio=1,
        up_dim=(64,),
        up_in_mlp=((4 + 64 + 64, 64, 64),),
        up_num_heads=16, up_num_blocks=1, up_ffn_ratio=1,
        h_edge_mlp=(18, 32, 32), in_rpe_dim=32,
        qk_dim=4, no_ffn=True,
        k_rpe=True, q_rpe=True, v_rpe=True,
        use_pos=True, use_diameter=False, use_diameter_parent=True,
        output_stage_wise=True, num_graphs=num_graphs)


@pytest.fixture(scope='module')
def demo_batch(demo_nag_path):
    nag = NAG.load(demo_nag_path, non_fp_to_long=True,
                   rgb_to_float=True)
    cfg = BatchConfig()
    return prepare_batch([nag], cfg, train=False)


def test_forward_demo(demo_batch):
    model = make_spt2()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, demo_batch, train=False)
    outs = model.apply(variables, demo_batch, train=False)
    assert len(outs) == 2  # level-1 + innermost level outputs
    n1 = demo_batch[1].capacity
    n2 = demo_batch[2].capacity
    assert outs[0].shape == (n1, 64)
    assert outs[1].shape == (n2, 64)
    # all finite on valid nodes
    m1 = np.asarray(demo_batch[1].node_mask)
    assert np.isfinite(np.asarray(outs[0])[m1]).all()
    # padded rows contribute nothing
    assert np.allclose(np.asarray(outs[0])[~m1], 0.0)


def test_param_count(demo_batch):
    """SPT-2 should be in the reference's ~200k-parameter class
    (reference README.md:69 reports 212k for SPT-64 with 3 stages; the
    2-stage variant is smaller)."""
    model = make_spt2()
    variables = model.init(jax.random.PRNGKey(0), demo_batch,
                           train=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables['params']))
    assert 50_000 < n_params < 400_000, n_params


def test_forward_deterministic(demo_batch):
    model = make_spt2()
    variables = model.init(jax.random.PRNGKey(0), demo_batch, train=False)
    o1 = model.apply(variables, demo_batch, train=False)
    o2 = model.apply(variables, demo_batch, train=False)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]))


def test_forward_train_batch(demo_nag_path):
    """Train-mode pipeline: sampling + augmentations + forward."""
    nag = NAG.load(demo_nag_path, non_fp_to_long=True, rgb_to_float=True)
    cfg = BatchConfig(sample_graph_r=3.0, sample_graph_k=2)
    rng = np.random.default_rng(0)
    batch = prepare_batch([nag, nag], cfg, train=True, rng=rng)
    assert batch.num_graphs == 2
    model = make_spt2()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    outs = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_compute_dtype_bf16_close_to_fp32():
    """SPT(compute_dtype='bfloat16') runs the attention path in bf16
    (fp32 softmax stats + fp32 params) and stays close to the fp32
    model under identical params — the flagship perf configuration."""
    import dataclasses
    import jax
    import numpy as np
    from superpoint_transformer_tpu.models.semantic import (
        SemanticSegmentationModel)
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from tests.test_train import tiny_model

    nag = random_nag(seed=0, n_points=256)
    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0)
    batch = prepare_batch([nag], cfg, train=False,
                          rng=np.random.default_rng(0))
    net32 = tiny_model()
    net16 = dataclasses.replace(net32, compute_dtype='bfloat16')
    m32 = SemanticSegmentationModel(net=net32, num_classes=13)
    m16 = SemanticSegmentationModel(net=net16, num_classes=13)
    v = m32.init(jax.random.PRNGKey(0), batch, train=False)
    # same params are valid for both precisions (params stay fp32)
    o32 = m32.apply(v, batch, train=False)
    o16 = m16.apply(v, batch, train=False)
    a, b = np.asarray(o32[0]), np.asarray(o16[0])
    assert np.isfinite(b).all()
    denom = np.abs(a).mean() + 1e-6
    assert np.abs(a - b).mean() / denom < 0.1, \
        np.abs(a - b).mean() / denom

"""EZ-SP family: sparse CNN, partition criterion training step,
greedy contour-prior partition, partition purity."""
import numpy as np
import pytest

import jax


def _toy_cloud(seed=0, n_side=8, num_classes=3):
    """A voxel grid split into two labeled halves, with a color step
    at the boundary — embeddings should learn the split."""
    from superpoint_transformer_tpu.data.data import Data
    rng = np.random.default_rng(seed)
    g = np.stack(np.meshgrid(
        np.arange(n_side), np.arange(n_side), np.arange(2),
        indexing='ij'), -1).reshape(-1, 3)
    pos = g.astype(np.float32) * 0.1
    n = pos.shape[0]
    y = (g[:, 0] >= n_side // 2).astype(np.int64)
    x = np.concatenate([
        y[:, None].astype(np.float32) + rng.normal(0, 0.05, (n, 1)),
        rng.normal(0, 0.05, (n, 2))], 1).astype(np.float32)
    y_hist = np.zeros((n, num_classes + 1), np.float32)
    y_hist[np.arange(n), y] = 5.0
    # 6-connected grid adjacency
    from superpoint_transformer_tpu.ops.native import radius_knn
    nbr, dist = radius_knn(pos, r=0.11, k=6)
    src = np.repeat(np.arange(n), nbr.shape[1])
    dst = nbr.reshape(-1).astype(np.int64)
    keep = dst >= 0
    ei = np.stack([src[keep], dst[keep]])
    return Data(pos=pos, x=x, y=y_hist, edge_index=ei,
                coords=g.astype(np.int64))


def test_sparse_conv_neighbors():
    from superpoint_transformer_tpu.ops.voxel_conv import (
        build_sparse_conv_neighbors)
    coords = np.array([[0, 0, 0], [1, 0, 0], [5, 5, 5]])
    nbr = build_sparse_conv_neighbors(coords, kernel_size=3)
    assert nbr.shape == (3, 27)
    # center offset (13) maps to self
    assert list(nbr[:, 13]) == [0, 1, 2]
    # voxel 0 sees voxel 1 at offset (+1,0,0); voxel 2 sees nobody else
    assert (nbr[0] == 1).sum() == 1
    assert (nbr[2] >= 0).sum() == 1


def test_sparse_conv_neighbors_batch_separation():
    from superpoint_transformer_tpu.ops.voxel_conv import (
        build_sparse_conv_neighbors)
    coords = np.array([[0, 0, 0], [1, 0, 0]])
    batch = np.array([0, 1])
    nbr = build_sparse_conv_neighbors(coords, batch=batch)
    assert (nbr[0] == 1).sum() == 0  # different graphs don't connect


def test_sparse_cnn_forward():
    import jax.numpy as jnp
    from superpoint_transformer_tpu.nn.sparse import SparseCNN
    from superpoint_transformer_tpu.ops.voxel_conv import (
        build_sparse_conv_neighbors)
    coords = np.stack(np.meshgrid(
        np.arange(4), np.arange(4), np.arange(1), indexing='ij'),
        -1).reshape(-1, 3)
    n = coords.shape[0]
    nbr = jnp.asarray(build_sparse_conv_neighbors(coords))
    x = jnp.ones((n, 3))
    model = SparseCNN(channels=(8, 8), num_graphs=1)
    vars_ = model.init(jax.random.PRNGKey(0), x, nbr)
    out = model.apply(vars_, x, nbr)
    assert out.shape == (n, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_partition_training_learns_boundary():
    from superpoint_transformer_tpu.data.pad import pad_point_cloud
    from superpoint_transformer_tpu.models.partition import (
        PartitionModel, PartitionTask)
    data = _toy_cloud()
    batch = pad_point_cloud([data], num_classes=3)
    model = PartitionModel(channels=(16, 8), num_graphs=1)
    task = PartitionTask(net=model, num_classes=3, lr=3e-3,
                         total_steps=60)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    out0 = task.eval_step(state, batch)
    assert int(out0['n_inter_edge']) > 0
    for _ in range(40):
        state, metrics = task.train_step(state, batch)
    out1 = task.eval_step(state, batch)
    assert float(out1['loss']) < float(out0['loss'])


def test_greedy_contour_prior_partition_nag():
    from superpoint_transformer_tpu.transforms.preprocess import (
        greedy_contour_prior_partition)
    from superpoint_transformer_tpu.models.partition import (
        partition_purity)
    data = _toy_cloud()
    # partition on the (noisy-but-separable) features
    nag = greedy_contour_prior_partition(
        data, reg=0.02, min_size=[5, 20],
        edge_weight_mode='exp_neg_latent_distance')
    assert nag.num_levels == 3
    assert nag[1].num_nodes < nag[0].num_nodes
    assert nag[2].num_nodes <= nag[1].num_nodes
    # purity of the level-1 partition should be near-perfect: features
    # separate the halves
    cm = partition_purity(nag[0].super_index, nag[0].y, num_classes=3)
    acc = np.trace(cm) / max(cm.sum(), 1)
    assert acc > 0.95
    # label histograms conserved per level
    assert nag[1].y.sum() == data.y.sum()


def test_partition_purity_perfect_partition():
    from superpoint_transformer_tpu.models.partition import (
        partition_purity)
    y_hist = np.zeros((4, 3), np.float32)
    y_hist[[0, 1], 0] = 1
    y_hist[[2, 3], 1] = 1
    cm = partition_purity(np.array([0, 0, 1, 1]), y_hist, 2)
    assert np.trace(cm) == cm.sum() == 4


def test_prepare_partition_batch_and_fit(tmp_path):
    """EZ-SP stage-1 through the public loop: cached-NAG style input ->
    prepare_partition_batch -> fit_partition (2 epochs)."""
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, prepare_partition_batch)
    from superpoint_transformer_tpu.trainer import fit_partition
    from superpoint_transformer_tpu.models.partition import (
        PartitionModel, PartitionTask)
    from superpoint_transformer_tpu.utils.synthetic import random_nag

    nags = [random_nag(seed=s, n_points=400) for s in range(2)]

    class _Loader:
        def __iter__(self):
            yield [n.clone() for n in nags]

    cfg = BatchConfig(num_classes=13)
    task = PartitionTask(net=PartitionModel(channels=(8, 8),
                                            num_graphs=2),
                         num_classes=13, lr=1e-3, total_steps=10)
    state = fit_partition(task, _Loader(), cfg,
                          output_dir=str(tmp_path), max_epochs=2)
    assert int(state.step) == 2
    assert (tmp_path / 'metrics.csv').exists()


def test_ezsp_two_stage_end_to_end(tmp_path):
    """Full EZ-SP recipe: stage 1 trains the CNN embedding
    (fit_partition -> orbax ckpt), stage 2 preprocesses with
    partition_mode='contour_prior' + the frozen stage-1 CNN
    (reference PretrainedCNN -> GreedyContourPriorPartition,
    src/transforms/point.py:630 + partition.py:383), and the
    resulting NAG trains a SemanticTask step."""
    import jax
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.transforms.preprocess import (
        preprocess_cloud)
    from superpoint_transformer_tpu.trainer import fit_partition
    from superpoint_transformer_tpu.models.partition import (
        PartitionModel, PartitionTask)
    from superpoint_transformer_tpu.models.semantic import SemanticTask
    from superpoint_transformer_tpu.utils.synthetic import random_nag
    from tests.test_preprocess import synthetic_scene
    from tests.test_train import tiny_model

    # ---- stage 1: train the partition CNN on synthetic NAGs
    nags = [random_nag(seed=s, n_points=400) for s in range(2)]

    class _Loader:
        def __iter__(self):
            yield [n.clone() for n in nags]

    cfg1 = BatchConfig(num_classes=13, point_hf=('rgb',))
    task1 = PartitionTask(net=PartitionModel(channels=(8, 8, 8),
                                             num_graphs=2),
                          num_classes=13, lr=1e-3, total_steps=4)
    fit_partition(task1, _Loader(), cfg1, output_dir=str(tmp_path),
                  max_epochs=2)
    ckpt = str(tmp_path / 'checkpoints' / 'last')

    # ---- stage 2: preprocessing with the learned partition
    data = synthetic_scene()
    nag = preprocess_cloud(
        data, voxel=0.1, knn=12, knn_r=1.0, num_classes=3,
        partition_hf=('rgb',),
        point_hf_preprocess=('linearity', 'planarity', 'normal'),
        partition_mode='contour_prior',
        pretrained_cnn_ckpt_path=ckpt,
        pretrained_cnn_channels=(8, 8, 8),
        contour_prior_reg=2e-2,
        contour_prior_min_size=(5, 30),
        graph_gap=(0.5, 1.0))
    assert nag.num_levels == 3  # P0 + 2 partition levels
    assert nag[1].num_nodes < nag[0].num_nodes
    # partition levels carry label histograms + horizontal graphs
    assert nag[1].y.ndim == 2
    assert nag[1].edge_index is not None

    # ---- the stage-2 NAG trains a semantic step
    cfg2 = BatchConfig(num_classes=3, sample_graph_r=-1,
                       sample_segment_ratio=0,
                       point_hf=('rgb', 'linearity', 'planarity',
                                 'elevation'))
    batch = prepare_batch([nag], cfg2, train=False)
    task2 = SemanticTask(net=tiny_model(num_graphs=1), num_classes=3,
                         total_steps=4, warmup_steps=1)
    state = task2.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = task2.train_step(state, batch,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))

"""Dataset layer: synthetic raw S3DIS directory -> process (cached by
config hash) -> load -> train batch -> model forward."""
import os
import os.path as osp

import numpy as np
import pytest

from superpoint_transformer_tpu.datasets import (
    S3DIS, MiniS3DIS, DataLoader)
from superpoint_transformer_tpu.utils.ply import read_ply, write_ply


PRE_CFG = dict(
    voxel=0.1, knn=12, knn_r=1.0,
    pcp_regularization=(0.05, 0.2), pcp_spatial_weight=(2.0, 0.5),
    pcp_cutoff=(5, 5), graph_gap=(0.5, 1.0))


def make_raw_s3dis(root, areas=('Area_1', 'Area_5'), rooms=2,
                   n_per_obj=300):
    rng = np.random.default_rng(0)
    classes = ['ceiling', 'floor', 'wall', 'chair']
    for area in areas:
        for r in range(rooms):
            ann = osp.join(root, 'raw', area, f'office_{r + 1}',
                           'Annotations')
            os.makedirs(ann, exist_ok=True)
            for i, cls in enumerate(classes):
                xyz = rng.uniform(0, 3, (n_per_obj, 3)).astype(
                    np.float32)
                xyz[:, 2] = i * 0.8 + rng.normal(
                    0, 0.02, n_per_obj)
                xyz[:, 0] += r * 5
                rgb = rng.integers(0, 255, (n_per_obj, 3))
                arr = np.concatenate([xyz, rgb], 1)
                np.savetxt(osp.join(ann, f'{cls}_1.txt'), arr,
                           fmt='%.3f')


@pytest.fixture(scope='module')
def s3dis_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('s3dis'))
    make_raw_s3dis(root)
    return root


def test_s3dis_process_and_load(s3dis_root):
    ds = MiniS3DIS(s3dis_root, fold=5, stage='train',
                   pre_transform_config=PRE_CFG)
    ds.process()
    # processed file exists under the hash dir
    p = ds.processed_path('Area_1')
    assert osp.exists(p)
    assert ds.pre_transform_hash in p
    nag = ds[0]
    assert nag.num_levels == 3
    assert nag[0].num_nodes > 100
    # labels survived as histograms at level 1
    assert nag[1].y.ndim == 2

    # second instantiation with same config hits the cache (no
    # reprocessing -> same file mtime)
    mtime = osp.getmtime(p)
    ds2 = MiniS3DIS(s3dis_root, fold=5, stage='train',
                    pre_transform_config=PRE_CFG)
    ds2.process()
    assert osp.getmtime(p) == mtime
    # different config -> different hash dir
    cfg2 = dict(PRE_CFG, voxel=0.2)
    ds3 = MiniS3DIS(s3dis_root, fold=5, stage='train',
                    pre_transform_config=cfg2)
    assert ds3.pre_transform_hash != ds.pre_transform_hash


def test_process_parallel_workers_and_tiling_kwargs(s3dis_root):
    """num_workers>1 fans the per-cloud preprocessing loop over
    spawned worker processes; xy_tiling passed as a constructor kwarg
    (the build_datasets path) splits the cloud into tiles that are
    processed independently."""
    cfg = dict(PRE_CFG, voxel=0.12)  # fresh hash -> reprocess
    ds = MiniS3DIS(s3dis_root, fold=5, stage='train',
                   pre_transform_config=cfg, num_workers=2,
                   xy_tiling=(2, 1))
    assert len(ds.cloud_ids) == 2
    ds.process()
    for c in ds.cloud_ids:
        assert osp.exists(ds.processed_path(c))
    nag = ds[0]
    assert nag.num_levels == 3
    assert nag[0].num_nodes > 10


def test_s3dis_fold_splits(s3dis_root):
    ds = S3DIS(s3dis_root, fold=5, stage='test',
               pre_transform_config=PRE_CFG)
    assert ds.cloud_ids == ['Area_5']
    ds_train = S3DIS(s3dis_root, fold=5, stage='train',
                     pre_transform_config=PRE_CFG)
    assert 'Area_5' not in ds_train.cloud_ids
    assert len(ds_train.cloud_ids) == 5


def test_dataloader_and_forward(s3dis_root):
    import jax
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from tests.test_train import tiny_model

    ds = MiniS3DIS(s3dis_root, fold=5, stage='train',
                   pre_transform_config=PRE_CFG)
    ds.process()
    loader = DataLoader(ds, batch_size=1, shuffle=True)
    nags = next(iter(loader))
    cfg = BatchConfig(num_classes=13, sample_graph_r=-1,
                      sample_segment_ratio=0)
    batch = prepare_batch(nags, cfg, train=True,
                          rng=np.random.default_rng(0))
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    outs = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_class_weights(s3dis_root):
    ds = MiniS3DIS(s3dis_root, fold=5, stage='train',
                   pre_transform_config=PRE_CFG)
    ds.process()
    w = ds.get_class_weight()
    assert w.shape == (13,)
    assert (w > 0).all()
    # rare classes get larger weights than frequent ones
    assert np.isfinite(w).all()


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    d = {'x': rng.normal(size=50).astype(np.float32),
         'y': rng.normal(size=50).astype(np.float32),
         'z': rng.normal(size=50).astype(np.float32),
         'sem_class': rng.integers(0, 8, 50).astype(np.uint8)}
    p = str(tmp_path / 't.ply')
    write_ply(p, d)
    back = read_ply(p)['vertex']
    np.testing.assert_allclose(back['x'], d['x'], rtol=1e-6)
    np.testing.assert_array_equal(back['sem_class'], d['sem_class'])

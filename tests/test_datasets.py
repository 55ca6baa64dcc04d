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
                   n_per_obj=300, z_step=0.8):
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
                xyz[:, 2] = i * z_step + rng.normal(
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


def test_prepared_dataloader_workers(s3dis_root):
    """PreparedDataLoader yields device-ready PaddedNAG batches; the
    2-worker process path produces the same shapes/masses as the
    serial path for the same seed, and batches arrive in order."""
    import jax.numpy as jnp
    from superpoint_transformer_tpu.datasets import PreparedDataLoader
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, discover_caps)

    ds = MiniS3DIS(s3dis_root, fold=5, stage='train',
                   pre_transform_config=PRE_CFG)
    ds.process()
    cfg = BatchConfig(num_classes=13, sample_graph_r=-1,
                      sample_segment_ratio=0, max_num_nodes=100_000,
                      point_hf=('rgb',))
    cfg = discover_caps([[ds[0]]], cfg, rng=np.random.default_rng(0))

    serial = PreparedDataLoader(ds, cfg, batch_size=1, seed=3,
                                train=True, num_workers=0)
    parallel = PreparedDataLoader(ds, cfg, batch_size=1, seed=3,
                                  train=True, num_workers=2)
    try:
        b0 = next(iter(serial))
        b1 = next(iter(parallel))
        assert isinstance(b1[1].pos, jnp.ndarray)
        assert b0[1].capacity == b1[1].capacity
        # same seed => identical sampled batch content
        np.testing.assert_allclose(np.asarray(b0[1].pos),
                                   np.asarray(b1[1].pos), atol=1e-6)
        assert (int(np.asarray(b0[1].num_nodes))
                == int(np.asarray(b1[1].num_nodes)))
    finally:
        parallel.close()


def test_trainer_fit_with_prepared_loader(s3dis_root):
    """Trainer.fit consumes device-ready batches from a 2-worker
    PreparedDataLoader (the production train-loop input path)."""
    import jax
    from superpoint_transformer_tpu.datasets import PreparedDataLoader
    from superpoint_transformer_tpu.models.semantic import SemanticTask
    from superpoint_transformer_tpu.trainer import Trainer
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, discover_caps, prepare_batch)
    from tests.test_trainer_fit import tiny_model

    ds = MiniS3DIS(s3dis_root, fold=5, stage='train',
                   pre_transform_config=PRE_CFG)
    ds.process()
    cfg = BatchConfig(num_classes=13, sample_graph_r=-1,
                      sample_segment_ratio=0, max_num_nodes=100_000)
    cfg = discover_caps([[ds[0]]], cfg, rng=np.random.default_rng(0))
    loader = PreparedDataLoader(ds, cfg, batch_size=1, seed=0,
                                train=True, num_workers=2)
    task = SemanticTask(net=tiny_model(num_graphs=1), num_classes=13,
                        total_steps=4, warmup_steps=1)
    example = prepare_batch([ds[0]], cfg, train=True,
                            rng=np.random.default_rng(0))
    state = task.init_state(jax.random.PRNGKey(0), example)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        trainer = Trainer(task=task, batch_cfg=cfg, output_dir=td,
                          max_epochs=2, check_val_every_n_epoch=10)
        try:
            state = trainer.fit(state, loader)
        finally:
            loader.close()
    assert int(state.step) == 2


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


def test_read_dales_tile(tmp_path):
    """DALES PLY reader: intensity normalization, semantic remap,
    instances (reference read_dales_tile, src/datasets/dales.py)."""
    from superpoint_transformer_tpu.datasets.dales import (
        read_dales_tile, DALES_ID2TRAINID)
    rng = np.random.default_rng(0)
    n = 200
    d = {'x': rng.uniform(0, 10, n).astype(np.float32),
         'y': rng.uniform(0, 10, n).astype(np.float32),
         'z': rng.uniform(0, 5, n).astype(np.float32),
         'intensity': rng.uniform(0, 60000, n).astype(np.float32),
         'sem_class': rng.integers(0, 9, n).astype(np.uint8),
         'ins_class': rng.integers(0, 5, n).astype(np.int32)}
    p = str(tmp_path / 'tile.ply')
    write_ply(p, d)
    data = read_dales_tile(p, instance=True)
    assert data.num_nodes == n
    assert data.intensity.shape == (n, 1)
    assert (data.intensity >= 0).all() and (data.intensity <= 1).all()
    np.testing.assert_array_equal(
        data.y, DALES_ID2TRAINID[d['sem_class'].astype(np.int64)])
    np.testing.assert_array_equal(data.obj, d['ins_class'])


def test_read_kitti360_window(tmp_path):
    """KITTI-360 window reader: rgb bytes, semantic id->train remap,
    instances (reference read_kitti360_window)."""
    from superpoint_transformer_tpu.datasets.kitti360 import (
        read_kitti360_window, _ID2TRAIN)
    rng = np.random.default_rng(0)
    n = 150
    sem = rng.integers(0, 45, n).astype(np.int32)
    d = {'x': rng.uniform(0, 50, n).astype(np.float32),
         'y': rng.uniform(0, 50, n).astype(np.float32),
         'z': rng.uniform(0, 10, n).astype(np.float32),
         'red': rng.integers(0, 255, n).astype(np.uint8),
         'green': rng.integers(0, 255, n).astype(np.uint8),
         'blue': rng.integers(0, 255, n).astype(np.uint8),
         'semantic': sem,
         'instance': rng.integers(0, 9, n).astype(np.int32)}
    p = str(tmp_path / 'win.ply')
    write_ply(p, d)
    data = read_kitti360_window(p, instances=True)
    assert data.num_nodes == n
    assert data.rgb.dtype == np.uint8
    np.testing.assert_array_equal(
        data.y, _ID2TRAIN[np.clip(sem.astype(np.int64), 0, 255)])
    assert data.obj is not None


def test_read_scannet_scan(tmp_path):
    """ScanNet scan-dir reader: mesh + NYU40 labels + instance
    aggregation JSONs (reference read_scannet_* helpers)."""
    import json
    from superpoint_transformer_tpu.datasets.scannet import (
        read_scannet_scan, _NYU40_TO_TRAIN)
    rng = np.random.default_rng(0)
    n = 120
    scan = 'scene0000_00'
    sdir = tmp_path / scan
    sdir.mkdir()
    base = {'x': rng.uniform(0, 6, n).astype(np.float32),
            'y': rng.uniform(0, 6, n).astype(np.float32),
            'z': rng.uniform(0, 3, n).astype(np.float32),
            'red': rng.integers(0, 255, n).astype(np.uint8),
            'green': rng.integers(0, 255, n).astype(np.uint8),
            'blue': rng.integers(0, 255, n).astype(np.uint8)}
    write_ply(str(sdir / f'{scan}_vh_clean_2.ply'), base)
    nyu = rng.integers(0, 41, n).astype(np.uint16)
    write_ply(str(sdir / f'{scan}_vh_clean_2.labels.ply'),
              {**base, 'label': nyu})
    seg_of_vertex = (np.arange(n) // 10).tolist()
    with open(sdir / f'{scan}_vh_clean_2.0.010000.segs.json', 'w') as f:
        json.dump({'segIndices': seg_of_vertex}, f)
    with open(sdir / f'{scan}.aggregation.json', 'w') as f:
        json.dump({'segGroups': [
            {'objectId': 0, 'segments': [0, 1]},
            {'objectId': 1, 'segments': [2, 3, 4]}]}, f)
    data = read_scannet_scan(str(sdir), instances=True)
    assert data.num_nodes == n
    np.testing.assert_array_equal(
        data.y, _NYU40_TO_TRAIN[np.clip(nyu.astype(np.int64), 0, 40)])
    assert (data.obj[:20] == 0).all()
    assert (data.obj[20:50] == 1).all()
    assert (data.obj[50:] == -1).all()


def test_in_memory_and_trainval(s3dis_root):
    """in_memory caches loaded NAGs; trainval concatenates the train
    and val cloud lists (reference stage handling)."""
    ds = MiniS3DIS(s3dis_root, fold=5, stage='train',
                   pre_transform_config=PRE_CFG, in_memory=True)
    ds.process()
    a = ds[0]
    b = ds[0]
    assert a is b  # cached object, no re-read
    tv = MiniS3DIS(s3dis_root, fold=5, stage='trainval',
                   pre_transform_config=PRE_CFG)
    # MiniS3DIS: train=['Area_1'], val=['Area_1'] (val mixed in train)
    assert tv.cloud_ids == ['Area_1', 'Area_1']


def test_prepared_dataloader_abandoned_epoch(s3dis_root):
    """Breaking out of an epoch mid-way must not poison the next
    iteration (stale results carry an old generation token and are
    dropped)."""
    from superpoint_transformer_tpu.datasets import PreparedDataLoader
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, discover_caps)
    ds = MiniS3DIS(s3dis_root, fold=5, stage='trainval',
                   pre_transform_config=PRE_CFG)
    ds.process()
    cfg = BatchConfig(num_classes=13, sample_graph_r=-1,
                      sample_segment_ratio=0, max_num_nodes=100_000,
                      point_hf=('rgb',))
    cfg = discover_caps([[ds[0]]], cfg, rng=np.random.default_rng(0))
    loader = PreparedDataLoader(ds, cfg, batch_size=1, seed=1,
                                train=True, num_workers=2)
    try:
        it = iter(loader)
        next(it)          # consume one batch, abandon the epoch
        del it
        batches = list(loader)   # fresh epoch must deliver ALL batches
        assert len(batches) == 2
        for b in batches:
            assert int(np.asarray(b[1].num_nodes)) > 0
    finally:
        loader.close()


def test_kitti360_submission_format(tmp_path):
    """KITTI-360 benchmark submission: train ids remapped to label ids,
    one uint8 npy per window named {seq:0>4}_{start:0>10}_{end:0>10}
    (reference make_submission, src/datasets/kitti360.py:383-440)."""
    from superpoint_transformer_tpu.datasets.kitti360 import (
        KITTI360, KITTI360_TRAINID2ID, KITTI360_NUM_CLASSES)
    from superpoint_transformer_tpu.datasets.base import make_submission
    # canonical Cityscapes-style ids for the first classes
    assert list(KITTI360_TRAINID2ID[:4]) == [7, 8, 11, 12]
    ds = KITTI360.__new__(KITTI360)
    pred = np.array([0, 1, 2, KITTI360_NUM_CLASSES])
    out = make_submission(
        ds, '2013_05_28_drive_0000_sync/0000000002_0000000385', pred,
        str(tmp_path))
    assert osp.basename(out) == '0000_0000000002_0000000385.npy'
    back = np.load(out)
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back, KITTI360_TRAINID2ID[pred])


def test_missing_raw_guides_to_download(tmp_path):
    """With neither processed caches nor raw data, process() raises
    the guided download error (reference BaseDataset.download path,
    src/datasets/base.py:686; no silent network attempt)."""
    import pytest
    from superpoint_transformer_tpu.datasets.s3dis import S3DIS
    ds = S3DIS(root=str(tmp_path), stage='train', fold=5)
    with pytest.raises(RuntimeError, match='raw'):
        ds.process()

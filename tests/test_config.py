"""Config system + experiment builder tests (analogue of reference
tests/test_configs.py: instantiate everything from config)."""
import os.path as osp

import numpy as np
import pytest

from superpoint_transformer_tpu.config.loader import load_config
from superpoint_transformer_tpu.experiment import (
    build_model, build_task, build_batch_config)

CONFIG_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                      'configs')


def test_compose_train_default():
    cfg = load_config(CONFIG_DIR, 'train')
    assert cfg.datamodule.num_classes == 13
    assert cfg.model.net.down_num_heads == 16
    # interpolation resolved
    assert cfg.model.num_classes == 13


def test_experiment_override():
    cfg = load_config(CONFIG_DIR, 'train',
                      ['experiment=semantic/s3dis'])
    assert cfg.model.optimizer.lr == 0.1
    assert cfg.trainer.max_epochs == 2000


def test_cli_override():
    cfg = load_config(CONFIG_DIR, 'train',
                      ['model.optimizer.lr=0.5',
                       'trainer.max_epochs=7',
                       'datamodule.voxel=0.05'])
    assert cfg.model.optimizer.lr == 0.5
    assert cfg.trainer.max_epochs == 7
    assert cfg.datamodule.voxel == 0.05


def test_dales_experiment():
    cfg = load_config(CONFIG_DIR, 'train',
                      ['experiment=semantic/dales'])
    assert cfg.datamodule.num_classes == 8
    assert cfg.datamodule.dataset == 'dales'
    model = build_model(cfg)
    # 3 down stages for spt-3
    assert len(model.down_dim) == 3


def test_build_model_matches_reference_dims():
    """The S3DIS SPT-2 model built from config must reproduce the
    published ~212k parameter count (reference README.md:69)."""
    import jax
    cfg = load_config(CONFIG_DIR, 'train',
                      ['experiment=semantic/s3dis'])
    model = build_model(cfg)
    assert model.point_mlp == (12, 32, 64, 128)
    assert model.down_in_mlp[0][0] == 4 + 128
    assert model.down_in_mlp[1][0] == 4 + 64
    assert model.up_in_mlp[0][0] == 4 + 64 + 64
    assert model.h_edge_mlp == (18, 32, 32)
    assert model.in_rpe_dim == 32


def test_build_task_and_batch_config():
    cfg = load_config(CONFIG_DIR, 'train',
                      ['experiment=semantic/s3dis'])
    task = build_task(cfg, total_steps=100)
    assert task.num_classes == 13
    assert task.loss_type == 'ce_kl'
    bc = build_batch_config(cfg)
    assert bc.num_classes == 13
    assert 'rgb' in bc.point_hf
    assert len(bc.edge_hf) == 12


def _all_experiments():
    import glob
    out = []
    for p in glob.glob(osp.join(CONFIG_DIR, 'experiment', '*', '*.yaml')):
        group = osp.basename(osp.dirname(p))
        name = osp.splitext(osp.basename(p))[0]
        out.append(f'{group}/{name}')
    return sorted(out)


@pytest.mark.parametrize('exp', _all_experiments())
def test_every_experiment_composes_and_builds(exp):
    """Sweep over ALL experiment configs (analogue of reference
    tests/test_sweeps.py): each must compose, resolve, and build its
    batch config + task without errors."""
    cfg = load_config(CONFIG_DIR, 'train', [f'experiment={exp}'])
    bc = build_batch_config(cfg)
    assert bc.num_classes == int(cfg.datamodule.num_classes) > 0
    task = build_task(cfg, total_steps=10)
    assert task.num_classes == bc.num_classes
    task_type = str(cfg.model.get('task', 'semantic'))
    if exp.startswith('panoptic/'):
        assert task_type == 'panoptic'
        assert bc.instance, exp
        assert tuple(task.stuff_classes) == tuple(
            cfg.datamodule.get('stuff_classes', ()))
    if exp.startswith('partition/'):
        assert task_type == 'partition'
    if 'nano' in exp:
        assert cfg.datamodule.nano
        assert cfg.model.net.nano
    if '11g' in exp:
        assert int(cfg.trainer.accumulate_grad_batches) == 2
        assert task.accumulate_grad_batches == 2
    if 'ezsp' in exp and exp.startswith('semantic/'):
        assert str(cfg.datamodule.partition_mode) == 'contour_prior'


@pytest.mark.parametrize('exp', ['semantic/s3dis', 'panoptic/s3dis',
                                 'semantic/dales', 'panoptic/scannet'])
def test_eval_config_composes(exp):
    """eval.yaml composes with experiment overlays just like train
    (reference tests/test_configs.py eval path)."""
    cfg = load_config(CONFIG_DIR, 'eval', [f'experiment={exp}'])
    bc = build_batch_config(cfg)
    assert bc.num_classes == int(cfg.datamodule.num_classes)
    assert 'ckpt_path' in cfg

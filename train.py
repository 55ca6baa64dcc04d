"""Training CLI (analogue of reference src/train.py):

    python train.py experiment=semantic/s3dis [key=value ...]

Composes configs/ (hydra-style grammar), preprocesses missing clouds,
builds the task and trains with checkpointing.
"""
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import jax

from superpoint_transformer_tpu.utils.jax_setup import setup_jax
setup_jax()
import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    here = osp.dirname(osp.abspath(__file__))

    from superpoint_transformer_tpu.config.loader import load_config
    from superpoint_transformer_tpu.experiment import (
        build_task, build_datasets, build_batch_config)
    from superpoint_transformer_tpu.datasets import DataLoader
    from superpoint_transformer_tpu.trainer import Trainer

    cfg = load_config(osp.join(here, 'configs'), 'train', argv)
    seed = int(cfg.get('seed', 0))

    datasets = build_datasets(cfg, stages=('train', 'val'))
    for ds in datasets.values():
        ds.process()

    batch_cfg = build_batch_config(cfg)
    batch_size = int(cfg.datamodule.dataloader.batch_size)
    train_loader = DataLoader(datasets['train'], batch_size=batch_size,
                              shuffle=True, seed=seed)
    val_loader = DataLoader(datasets['val'], batch_size=1)

    # EZ-SP stage 1: train the partition embedding (its own loop —
    # level-0 batches, contrastive edge loss)
    if str(cfg.model.get('task', 'semantic')) == 'partition':
        from superpoint_transformer_tpu.trainer import fit_partition
        task = build_task(
            cfg, total_steps=int(cfg.trainer.max_epochs)
            * max(len(train_loader), 1))
        fit_partition(
            task, train_loader, batch_cfg,
            output_dir=str(cfg.get('output_dir', 'outputs')),
            max_epochs=int(cfg.trainer.max_epochs), seed=seed)
        return None

    max_epochs = int(cfg.trainer.max_epochs)
    devices = int(cfg.trainer.get('devices', 1))
    # with data parallelism each global step consumes `devices` loader
    # batches (reference trainer=ddp: per-rank batches, global batch =
    # devices x batch_size)
    steps_per_epoch = max(len(train_loader) // max(devices, 1), 1)

    class_weight = None
    if cfg.model.get('weighted_loss'):
        class_weight = datasets['train'].get_class_weight(
            smooth=str(cfg.model.get('weighted_loss_smooth', 'sqrt')))

    task = build_task(cfg, total_steps=max_epochs * steps_per_epoch,
                      class_weight=class_weight)

    # pin static capacities from a few probe batches so all epochs
    # reuse one compiled program, then init on a first batch
    from superpoint_transformer_tpu.transforms.prepare import (
        prepare_batch, discover_caps)
    probe = DataLoader(datasets['train'], batch_size=batch_size,
                       shuffle=True, seed=seed)
    probe_batches = [nags for _, nags in zip(range(4), probe)]
    # eval caps: probe EVERY val tile (eval is whole-tile and
    # deterministic, so the max over the split is exact) — one
    # compiled program per level signature instead of a multi-second
    # XLA compile per new tile bucket (reference evaluates whole
    # tiles, src/models/semantic.py:1039)
    val_probe = list(DataLoader(datasets['val'], batch_size=1))
    eval_batch_cfg = discover_caps(
        val_probe, batch_cfg, train=False, headroom_levels=0) \
        if val_probe else batch_cfg
    batch_cfg = discover_caps(probe_batches, batch_cfg,
                              rng=np.random.default_rng(seed))
    example = prepare_batch(probe_batches[0], batch_cfg, train=True,
                            rng=np.random.default_rng(seed))
    state = task.init_state(jax.random.PRNGKey(seed), example)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    from superpoint_transformer_tpu.experiment import precision_to_dtype
    dtype = precision_to_dtype(cfg.trainer.get('precision')) or 'float32'
    print(f'model parameters: {n_params:,} '
          f'(compute dtype {dtype}, devices {devices})')

    # SuperCluster: run the instance partition + PQ on the partition
    # cadence and select the best checkpoint by PQ (reference
    # optimized_metric 'val/pq')
    panoptic_kwargs = {}
    if str(cfg.model.get('task', 'semantic')) == 'panoptic':
        panoptic_kwargs = dict(
            partition_every_n_epoch=int(
                cfg.model.get('partition_every_n_epoch', 50)),
            stuff_classes=tuple(
                cfg.datamodule.get('stuff_classes', ())),
            panoptic_grid_search=bool(
                cfg.get('panoptic_grid_search', True)),
            monitor='pq')

    trainer = Trainer(
        task=task, batch_cfg=batch_cfg, eval_batch_cfg=eval_batch_cfg,
        output_dir=str(cfg.get('output_dir', 'outputs')),
        max_epochs=max_epochs, devices=devices,
        check_val_every_n_epoch=int(
            cfg.trainer.check_val_every_n_epoch),
        early_stopping_patience=int(
            cfg.trainer.get('early_stopping_patience', -1)),
        loggers=tuple(cfg.trainer.get('logger', ('csv',))),
        track_val_idx=int(cfg.trainer.get('track_val_idx', -1)),
        seed=seed, **panoptic_kwargs)
    # fan host batch-prep out over worker processes (the jitted step
    # is ~ms; the host augment/sample/pad pipeline is the train-loop
    # bottleneck — see PreparedDataLoader)
    loader_workers = int(cfg.datamodule.dataloader.get(
        'num_workers', 0))
    if loader_workers > 0:
        from superpoint_transformer_tpu.datasets import (
            PreparedDataLoader)
        train_loader = PreparedDataLoader(
            datasets['train'], batch_cfg, batch_size=batch_size,
            shuffle=True, seed=seed, train=True,
            num_workers=loader_workers)

    if cfg.get('ckpt_path'):
        state = trainer.load_checkpoint(state, cfg.ckpt_path)
    state = trainer.fit(state, train_loader, val_loader)
    if loader_workers > 0:
        train_loader.close()
    return trainer.best_miou


if __name__ == '__main__':
    main()

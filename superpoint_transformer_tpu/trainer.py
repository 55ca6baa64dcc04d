"""Training/evaluation loops with checkpointing and CSV logging —
replaces the reference's Lightning Trainer + callbacks (reference
src/train.py:60-125, configs/callbacks/default.yaml: ModelCheckpoint
monitoring val/miou + save_last, resume via ckpt_path).

Checkpoints are orbax; every checkpoint carries framework version
metadata (reference on_save_checkpoint, src/models/semantic.py:1336).
"""
import csv
import json
import os
import os.path as osp
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from . import __version__
from .data.pad import PaddedNAG
from .metrics.semantic import ConfusionMatrix
from .transforms.prepare import prepare_batch

__all__ = ['Trainer', 'fit_partition', 'validate_panoptic']


class CSVLogger:
    def __init__(self, path):
        self.path = path
        os.makedirs(osp.dirname(path), exist_ok=True)
        self._keys = None

    def log(self, row):
        new_file = self._keys is None
        if new_file:
            self._keys = list(row.keys())
            if not osp.exists(self.path):
                with open(self.path, 'w', newline='') as f:
                    csv.writer(f).writerow(self._keys)
        with open(self.path, 'a', newline='') as f:
            csv.writer(f).writerow([row.get(k) for k in self._keys])


class TensorBoardLogger:
    """Scalar logging to TensorBoard event files (reference
    configs/logger/tensorboard.yaml). Rows are `{'epoch', 'split',
    metric: value, ...}`; scalars land under `<split>/<metric>`."""

    def __init__(self, logdir):
        from torch.utils.tensorboard import SummaryWriter
        self.writer = SummaryWriter(logdir)

    def log(self, row):
        epoch = int(row.get('epoch', 0))
        split = row.get('split', '')
        for k, v in row.items():
            if k in ('epoch', 'split') or v is None:
                continue
            if isinstance(v, (int, float)):
                self.writer.add_scalar(f'{split}/{k}', v, epoch)
        self.writer.flush()


class WandbLogger:
    """wandb backend (reference src/utils/wandb.py:8 +
    configs/logger/wandb.yaml): metric rows go to `run.log`, and the
    trainer pushes validation confusion-matrix figures through
    `log_figure` (falls back to local JSONL + PNG artifacts when the
    wandb package is absent — see utils/wandb.py)."""

    def __init__(self, output_dir, project='spt'):
        from .utils.wandb import WandbRun
        self.run = WandbRun(output_dir, project=project)

    def log(self, row):
        split = row.get('split', '')
        flat = {f'{split}/{k}' if split else k: v
                for k, v in row.items()
                if k not in ('split',) and v is not None}
        self.run.log(flat, step=row.get('epoch'))

    def log_figure(self, name, fig, step=None):
        self.run.log_figure(name, fig, step=step)


class MultiLogger:
    def __init__(self, loggers):
        self.loggers = list(loggers)

    def log(self, row):
        for lg in self.loggers:
            lg.log(row)

    def log_figure(self, name, fig, step=None):
        for lg in self.loggers:
            if hasattr(lg, 'log_figure'):
                lg.log_figure(name, fig, step=step)

    @property
    def wants_figures(self):
        return any(hasattr(lg, 'log_figure') for lg in self.loggers)


def make_loggers(names, output_dir, csv_name='metrics.csv'):
    """'csv' | 'tensorboard' | 'wandb' names -> MultiLogger (reference
    configs/logger/ group; csv is always a safe choice)."""
    out = []
    for name in names:
        if name == 'csv':
            out.append(CSVLogger(osp.join(output_dir, csv_name)))
        elif name == 'tensorboard':
            out.append(TensorBoardLogger(osp.join(output_dir, 'tb')))
        elif name == 'wandb':
            out.append(WandbLogger(output_dir))
        else:
            raise ValueError(f'unknown logger {name!r} '
                             "(expected 'csv', 'tensorboard' or "
                             "'wandb')")
    return MultiLogger(out)


@dataclass
class Trainer:
    task: 'SemanticTask'
    batch_cfg: 'BatchConfig'
    # eval uses whole tiles (no crops) so it needs its own (unpinned)
    # capacities; defaults to batch_cfg
    eval_batch_cfg: Optional['BatchConfig'] = None
    output_dir: str = 'outputs'
    max_epochs: int = 100
    check_val_every_n_epoch: int = 10
    # number of devices for data-parallel training (reference
    # configs/trainer/ddp.yaml devices: 4 under Lightning DDP). Each
    # global step consumes `devices` loader batches — one per device —
    # stacked over a ('data',) jax.sharding.Mesh; gradients and
    # confusion matrices psum over ICI (parallel/mesh.py). Per-step
    # metrics therefore match a single-device run that averages the
    # same `devices` batches (grad-accumulation semantics).
    devices: int = 1
    seed: int = 0
    node_caps: Optional[dict] = None
    k_caps: Optional[dict] = None
    # -- panoptic (SuperCluster) options ---------------------------------
    # run the instance partition + PQ every N validation-capable epochs
    # (reference model.partition_every_n_epoch; <=0 disables)
    partition_every_n_epoch: int = -1
    stuff_classes: tuple = ()
    panoptic_grid_search: bool = True
    # metric that selects the 'best' checkpoint: 'miou' (semantic) or
    # 'pq' (panoptic; reference optimized_metric 'val/pq',
    # configs/experiment/panoptic/s3dis.yaml:35)
    monitor: str = 'miou'
    # stop after this many consecutive non-improving validations of
    # the monitored metric (reference EarlyStopping callback,
    # configs/callbacks/default.yaml patience: 500; <=0 disables)
    early_stopping_patience: int = -1
    # dump the predictions of this val/test batch index each epoch to
    # <output_dir>/predictions/ (reference track_val_idx/track_test_idx
    # + track_batch, src/models/semantic.py:1133; -1 disables, -2 = all)
    track_val_idx: int = -1
    # logger backends: any of 'csv', 'tensorboard'
    loggers: tuple = ('csv',)
    # ReduceOnPlateau knobs (active when task.scheduler == 'plateau';
    # reference ReduceLROnPlateauWithWarmup,
    # src/optim/lr_scheduler.py:236)
    plateau_factor: float = 0.5
    plateau_patience: int = 3

    def __post_init__(self):
        if self.eval_batch_cfg is None:
            self.eval_batch_cfg = self.batch_cfg
        os.makedirs(self.output_dir, exist_ok=True)
        self.logger = make_loggers(self.loggers, self.output_dir)
        self.best_miou = -1.0
        self.epoch = 0
        self._partition_settings = None
        self._stale_validations = 0
        self._plateau = None
        if getattr(self.task, 'scheduler', 'cosine') == 'plateau':
            from .optim.lr_scheduler import ReduceOnPlateau
            self._plateau = ReduceOnPlateau(
                mode='max', factor=self.plateau_factor,
                patience=self.plateau_patience)

    # -- checkpointing ---------------------------------------------------
    def _ckpt_dir(self, name):
        return osp.abspath(osp.join(self.output_dir, 'checkpoints',
                                    name))

    def save_checkpoint(self, state, name='last'):
        import orbax.checkpoint as ocp
        path = self._ckpt_dir(name)
        ckptr = ocp.StandardCheckpointer()
        payload = {'params': state.params,
                   'opt_state': state.opt_state,
                   'step': state.step}
        if getattr(state, 'batch_stats', None) is not None:
            # BatchNorm running statistics (norm_mode='batch' configs)
            payload['batch_stats'] = state.batch_stats
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        # epoch+1 = the next epoch to run on resume (checkpoints are
        # written at the END of an epoch)
        meta = {'version': __version__, 'epoch': self.epoch + 1,
                'best_miou': self.best_miou,
                'time': time.time()}
        with open(osp.join(path, 'spt_meta.json'), 'w') as f:
            json.dump(meta, f)

    def load_checkpoint(self, state, name='last'):
        import orbax.checkpoint as ocp
        path = self._ckpt_dir(name)
        ckptr = ocp.StandardCheckpointer()
        target = {'params': state.params, 'opt_state': state.opt_state,
                  'step': state.step}
        if getattr(state, 'batch_stats', None) is not None:
            target['batch_stats'] = state.batch_stats
        restored = ckptr.restore(path, target)
        meta_path = osp.join(path, 'spt_meta.json')
        if osp.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.epoch = int(meta.get('epoch', 0))
            self.best_miou = float(meta.get('best_miou', -1))
        kw = {}
        if 'batch_stats' in restored:
            kw['batch_stats'] = restored['batch_stats']
        return state.replace(params=restored['params'],
                             opt_state=restored['opt_state'],
                             step=restored['step'], **kw)

    # -- data parallelism -------------------------------------------------
    def _make_dp(self, state):
        """Mesh + pjit-ted DP step over the first `devices` jax
        devices (reference trainer=ddp; parallel/mesh.py)."""
        from .parallel import make_data_mesh, make_dp_train_step
        have = len(jax.devices())
        if have < self.devices:
            raise RuntimeError(
                f'trainer.devices={self.devices} but only {have} JAX '
                'device(s) are visible — run on a larger slice or '
                'set trainer.devices accordingly')
        if getattr(self.task, 'accumulate_grad_batches', 1) > 1:
            raise ValueError(
                'trainer.devices > 1 is incompatible with '
                'accumulate_grad_batches > 1 (DP already averages '
                'over the device axis)')
        if getattr(state, 'batch_stats', None) is not None:
            raise ValueError(
                "trainer.devices > 1 does not support "
                "norm_mode='batch' running statistics; use the "
                "default 'graph' norms")
        mesh = make_data_mesh(jax.devices()[:self.devices])
        return make_dp_train_step(self.task, mesh), mesh

    # -- loops ----------------------------------------------------------
    def fit(self, state, train_loader, val_loader=None, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        np_rng = np.random.default_rng(self.seed)
        step = int(state.step)
        dp_step = mesh = None
        if self.devices > 1:
            from .parallel import stack_batches, shard_batch
            dp_step, mesh = self._make_dp(state)
        for epoch in range(self.epoch, self.max_epochs):
            self.epoch = epoch
            cm = ConfusionMatrix(self.task.num_classes)
            # keep per-step metrics ON DEVICE; one host fetch per epoch
            # (device->host syncs stall the dispatch pipeline — and on
            # the axon dev tunnel permanently degrade it)
            dev_losses, dev_cms = [], []
            t0 = time.time()
            group = []
            for nags in train_loader:
                # PreparedDataLoader yields device-ready batches
                batch = nags if isinstance(nags, PaddedNAG) \
                    else prepare_batch(
                        nags, self.batch_cfg, train=True, rng=np_rng,
                        device=dp_step is None)
                if dp_step is not None:
                    # one loader batch per device; step when the group
                    # is full (equal padded shapes via pinned caps)
                    group.append(batch)
                    if len(group) < self.devices:
                        continue
                    batch = shard_batch(stack_batches(group), mesh)
                    group = []
                    rng, sub = jax.random.split(rng)
                    state, metrics = dp_step(state, batch, sub)
                else:
                    rng, sub = jax.random.split(rng)
                    state, metrics = self.task.train_step(
                        state, batch, sub)
                dev_losses.append(metrics['loss'])
                dev_cms.append(metrics['confmat'])
                step += 1
            if group:
                # incomplete trailing device group: dropped, like DDP's
                # DistributedSampler drops/pads ragged last batches
                print(f"[epoch {epoch}] dropping {len(group)} trailing "
                      f"batch(es) not filling the {self.devices}-device "
                      "group")
            losses = [float(x) for x in jax.device_get(dev_losses)]
            for c in jax.device_get(dev_cms):
                cm.merge(np.asarray(c))
            m = cm.all_metrics()
            lr_at = getattr(self.task, 'lr_at', None)
            row = {'epoch': epoch, 'split': 'train',
                   'loss': float(np.mean(losses)) if losses else None,
                   'miou': m['miou'], 'oa': m['oa'], 'macc': m['macc'],
                   'lr': lr_at(step) if lr_at is not None else None,
                   'time': time.time() - t0}
            self.logger.log(row)
            loss_s = (f"{row['loss']:.4f}" if row['loss'] is not None
                      else 'n/a (no full device group this epoch)')
            print(f"[epoch {epoch}] train loss="
                  f"{loss_s} miou={m['miou']:.2f} "
                  f"({row['time']:.1f}s)")

            stop = False
            if val_loader is not None and (
                    (epoch + 1) % self.check_val_every_n_epoch == 0
                    or epoch == self.max_epochs - 1):
                vm = self.validate(state, val_loader)
                if self._panoptic_due(epoch):
                    vm = {**vm,
                          **self.validate_panoptic(state, val_loader)}
                score = vm.get(self.monitor, vm['miou'])
                if self._plateau is not None and score is not None:
                    if self._plateau.step(score):
                        from .optim.lr_scheduler import (
                            set_lr_multiplier)
                        state = state.replace(
                            opt_state=set_lr_multiplier(
                                state.opt_state,
                                self._plateau.multiplier))
                        print(f"[epoch {epoch}] plateau: lr x "
                              f"{self._plateau.multiplier:g}")
                if score is not None and score > self.best_miou:
                    self.best_miou = score
                    self.save_checkpoint(state, 'best')
                    self._stale_validations = 0
                else:
                    self._stale_validations += 1
                    p = self.early_stopping_patience
                    if 0 < p <= self._stale_validations:
                        print(f"[epoch {epoch}] early stopping: "
                              f"{self.monitor} did not improve for "
                              f"{self._stale_validations} validations")
                        stop = True
            self.save_checkpoint(state, 'last')
            if stop:
                break
        return state

    def _panoptic_due(self, epoch):
        """Instance partition + PQ runs on validation epochs that also
        hit the partition cadence (reference needs_partition,
        src/models/panoptic.py:498 + partition_every_n_epoch)."""
        n = self.partition_every_n_epoch
        if n is None or n <= 0:
            return False
        return ((epoch + 1) % n == 0 or epoch == self.max_epochs - 1)

    def validate_panoptic(self, state, loader, split='val', pq=None,
                          ap=None):
        """Panoptic validation epoch: instance partition on predictions
        + PQ/mAP vs gt overlaps; logs to panoptic.csv. Grid-searches
        the partition hyperparameters once, then reuses them.
        `pq`/`ap` accumulate across calls when provided (6-fold)."""
        out = validate_panoptic(
            self.task, state, loader, self.eval_batch_cfg,
            self.task.num_classes, stuff_classes=self.stuff_classes,
            grid_search=(self.panoptic_grid_search
                         and self._partition_settings is None),
            settings=self._partition_settings, seed=self.seed,
            pq=pq, ap=ap)
        self._partition_settings = out.get('settings')
        if not hasattr(self, '_panoptic_logger'):
            self._panoptic_logger = CSVLogger(
                osp.join(self.output_dir, 'panoptic.csv'))
        row = {'epoch': self.epoch, 'split': split}
        row.update({k: v for k, v in out.items()
                    if isinstance(v, (int, float))})
        self._panoptic_logger.log(row)
        msg = ' '.join(f'{k}={v:.2f}' for k, v in out.items()
                       if isinstance(v, float))
        print(f"[epoch {self.epoch}] {split} panoptic {msg}")
        return {k: v for k, v in out.items()
                if isinstance(v, (int, float))}

    def validate(self, state, loader, split='val', tta_runs=0):
        """`tta_runs > 0` enables multi-run test-time augmentation:
        per batch, logits from `tta_runs` augmented passes (+1 clean
        pass) accumulate positionally before the argmax (reference
        step_multi_run_inference, src/models/semantic.py:485)."""
        from .metrics.semantic import confusion_matrix_from_histogram
        cm = ConfusionMatrix(self.task.num_classes)
        losses = []
        np_rng = np.random.default_rng(self.seed)
        for i_batch, nags in enumerate(loader):
            if isinstance(nags, PaddedNAG):
                if tta_runs > 0:
                    raise ValueError(
                        'TTA validation needs raw NAG batches '
                        '(augmented re-preparation per run) — use a '
                        'plain DataLoader, not PreparedDataLoader')
                batch = nags
            else:
                batch = prepare_batch(nags, self.eval_batch_cfg,
                                      train=False)
            out = self.task.eval_step(state, batch)
            losses.append(float(out['loss']))
            if tta_runs > 0:
                acc = np.asarray(out['logits_level1'], np.float64)
                for _ in range(tta_runs):
                    b = prepare_batch(nags, self.eval_batch_cfg,
                                      train=False, rng=np_rng, tta=True)
                    o = self.task.eval_step(state, b)
                    acc += np.asarray(o['logits_level1'], np.float64)
                cm.merge(np.asarray(confusion_matrix_from_histogram(
                    jax.numpy.asarray(acc), batch[1].y,
                    self.task.num_classes,
                    node_mask=batch[1].node_mask)))
            else:
                cm.merge(np.asarray(out['confmat']))
            if self.track_val_idx == -2 or i_batch == self.track_val_idx:
                self._track_batch(batch, out, split, i_batch)
        m = cm.all_metrics()
        row = {'epoch': self.epoch, 'split': split,
               'loss': float(np.mean(losses)) if losses else None,
               'miou': m['miou'], 'oa': m['oa'], 'macc': m['macc'],
               'time': None}
        self.logger.log(row)
        if getattr(self.logger, 'wants_figures', False):
            # confusion-matrix figure at validation end (reference
            # src/utils/wandb.py:8)
            from .utils.wandb import confusion_matrix_figure
            import matplotlib.pyplot as plt
            fig = confusion_matrix_figure(cm.confmat)
            self.logger.log_figure(f'{split}/confusion_matrix', fig,
                                   step=self.epoch)
            plt.close(fig)
        print(f"[epoch {self.epoch}] {split} miou={m['miou']:.2f} "
              f"oa={m['oa']:.2f} macc={m['macc']:.2f}")
        # raw counts, so callers can concatenate across runs (the
        # S3DIS 6-fold protocol sums per-fold confusion matrices,
        # reference src/utils/semantic.py:73)
        m['confmat'] = cm.confmat.copy()
        return m

    def _track_batch(self, batch, out, split, i_batch):
        """Dump one batch's level-1 predictions for inspection
        (reference track_batch, src/models/semantic.py:1133)."""
        d = osp.join(self.output_dir, 'predictions')
        os.makedirs(d, exist_ok=True)
        n1 = int(np.asarray(batch[1].num_nodes))
        logits = np.asarray(out['logits_level1'])[:n1]
        y = batch[1].y
        payload = dict(logits=logits, pred=logits.argmax(-1),
                       pos=np.asarray(batch[1].pos)[:n1])
        if y is not None:
            payload['y_hist'] = np.asarray(y)[:n1]
        np.savez(osp.join(d, f'{split}_e{self.epoch}_b{i_batch}.npz'),
                 **payload)

    def test(self, state, loader):
        return self.validate(state, loader, split='test')


def fit_partition(task, train_loader, batch_cfg, output_dir='outputs',
                  max_epochs=50, seed=0, node_cap=None, edge_cap=None):
    """EZ-SP stage-1 training loop (reference
    PartitionAndSemanticModule with training_partition_stage=True):
    sparse-CNN embeddings + contrastive edge loss on level-0 batches.
    Returns the trained state; checkpoints go to
    <output_dir>/checkpoints/{last,best} (best = lowest loss)."""
    import jax
    from .transforms.prepare import prepare_partition_batch

    os.makedirs(output_dir, exist_ok=True)
    logger = CSVLogger(osp.join(output_dir, 'metrics.csv'))
    np_rng = np.random.default_rng(seed)

    nags0 = next(iter(train_loader))
    example = prepare_partition_batch(
        nags0, batch_cfg, train=True, rng=np_rng,
        node_cap=node_cap, edge_cap=edge_cap)
    if node_cap is None:
        node_cap = example.capacity
        edge_cap = example.edge_index.shape[1]
    state = task.init_state(jax.random.PRNGKey(seed), example)

    trainer = Trainer(task=task, batch_cfg=batch_cfg,
                      output_dir=output_dir, max_epochs=max_epochs,
                      seed=seed)
    best = np.inf
    for epoch in range(max_epochs):
        trainer.epoch = epoch
        dev_losses, dev_inter = [], []
        t0 = time.time()
        for nags in train_loader:
            batch = prepare_partition_batch(
                nags, batch_cfg, train=True, rng=np_rng,
                node_cap=node_cap, edge_cap=edge_cap)
            state, m = task.train_step(state, batch)
            dev_losses.append(m['loss'])
            dev_inter.append(m['n_inter_edge'])
        losses = [float(x) for x in jax.device_get(dev_losses)]
        inter = sum(int(x) for x in jax.device_get(dev_inter))
        row = {'epoch': epoch, 'split': 'train',
               'loss': float(np.mean(losses)) if losses else None,
               'n_inter_edge': inter, 'time': time.time() - t0}
        logger.log(row)
        print(f"[epoch {epoch}] partition loss={row['loss']:.4f} "
              f"inter_edges={inter} ({row['time']:.1f}s)")
        if inter == 0:
            # reference raises if a WHOLE epoch sees no inter-edges
            raise RuntimeError(
                'no inter-edges in a full epoch — check labels/crops')
        trainer.save_checkpoint(state, 'last')
        if row['loss'] < best:
            best = row['loss']
            trainer.save_checkpoint(state, 'best')
    return state


def validate_panoptic(task, state, loader, batch_cfg, num_classes,
                      stuff_classes=(), grid_search=False, seed=0,
                      settings=None, pq=None, ap=None):
    """Panoptic validation epoch (reference
    PanopticSegmentationModule._forward_partition + the epoch-end
    grid search, src/models/panoptic.py:498,952): per batch, run the
    instance partition on predicted logits + edge affinities, match
    against the gt InstanceData overlaps, accumulate PQ (and mAP).

    Requires batches prepared with `instance=True` (obj_edge_index on
    level 1) and host NAGs carrying `obj` InstanceData at level 1.
    Returns dict(pq, sq, rq, map_50, ...). `grid_search=True` searches
    the partition hyperparameters on the FIRST batch and reuses the
    best settings for the rest (the reference searches on stored
    outputs each validation epoch).
    """
    import jax
    from .metrics.panoptic import PanopticQuality3D
    from .metrics.mean_average_precision import MeanAveragePrecision3D
    from .models.panoptic import (instance_partition,
                                  grid_search_panoptic_partition)
    from .transforms.prepare import prepare_batch

    # external accumulators let callers concatenate epochs/folds (the
    # S3DIS 6-fold panoptic protocol, reference
    # compute_panoptic_metrics_s3dis_6fold, src/utils/instance.py:939)
    if pq is None:
        pq = PanopticQuality3D(num_classes,
                               stuff_classes=stuff_classes)
    if ap is None:
        ap = MeanAveragePrecision3D(num_classes,
                                    stuff_classes=stuff_classes)
    if settings is None:
        settings = dict(regularization=10.0, x_weight=5e-2, cutoff=1)
    first = True
    out_diag = {}
    for nags in loader:
        batch = prepare_batch(nags, batch_cfg, train=False)
        out = task.eval_step(state, batch)
        lvl1 = batch[1]
        n1 = int(np.asarray(lvl1.num_nodes))
        logits = np.asarray(out['logits_level1'])[:n1]
        ea = out.get('edge_affinity_logits')
        if ea is None or lvl1.obj_edge_index is None:
            continue
        emask = np.asarray(lvl1.obj_edge_mask)
        ei = np.asarray(lvl1.obj_edge_index)[:, emask]
        ea = np.asarray(ea)[emask]
        pos = np.asarray(lvl1.pos)[:n1]
        sizes = np.asarray(lvl1.node_size)[:n1] \
            if lvl1.node_size is not None else None
        # gt overlaps from the host NAGs (level-1 InstanceData)
        objs = [nag[1].get('obj') for nag in nags]
        if any(o is None for o in objs):
            continue
        obj = objs[0] if len(objs) == 1 else _cat_instance(objs)
        # batch levels are sorted by parent (pad.sort_nag_by_super):
        # logits/pos/edges above are in BATCH order while `obj` is in
        # the host NAGs' pre-sort order — reindex the gt overlaps into
        # batch order or the merge/metrics silently misalign (this
        # was round 4's "PQ 7.5 on the demo room": the loop was fine,
        # the gt rows were permuted)
        if lvl1.node_id is not None:
            nid = np.asarray(lvl1.node_id)[:n1]
            if not np.array_equal(nid, np.arange(n1)):
                obj = obj[nid][0]

        if grid_search and first:
            settings, _, _ = grid_search_panoptic_partition(
                pos, logits, ei, ea, obj, num_classes,
                node_size=sizes, stuff_classes=stuff_classes)
            first = False
        obj_index = instance_partition(
            pos, logits, ei, ea, node_size=sizes,
            stuff_classes=stuff_classes, num_classes=num_classes,
            **settings)
        # diagnostics: how many instances the partition produced and
        # how well the predicted affinities separate the gt graph
        # (the two failure axes of the SuperCluster loop)
        out_diag['n_pred_instances'] = (
            out_diag.get('n_pred_instances', 0)
            + int(obj_index.max()) + 1)
        if lvl1.obj_edge_affinity is not None:
            # accumulate COUNTS across loader batches (fractions are
            # computed once after the loop; a per-batch overwrite
            # would report only the last batch)
            tgt = np.asarray(lvl1.obj_edge_affinity)[emask]
            pred_pos = ea > 0.0
            gt_pos = tgt > 0.5
            out_diag['_ea_correct'] = (out_diag.get('_ea_correct', 0)
                                       + int((pred_pos == gt_pos).sum()))
            out_diag['_ea_gt_pos'] = (out_diag.get('_ea_gt_pos', 0)
                                      + int(gt_pos.sum()))
            out_diag['_ea_total'] = (out_diag.get('_ea_total', 0)
                                     + int(gt_pos.shape[0]))
        merged = obj.merge(obj_index)
        n_inst = int(obj_index.max()) + 1
        pred_sem = np.zeros(n_inst, np.int64)
        scores = np.zeros(n_inst)
        for i_ in range(n_inst):
            m = obj_index == i_
            s = logits[m].sum(0)
            pred_sem[i_] = s.argmax()
            p = np.exp(s - s.max())
            scores[i_] = (p / p.sum()).max()
        pq.update_from_instance_data(merged, pred_sem)
        ap.update_from_instance_data(merged, pred_sem, scores)
    out = pq.compute()
    out.update({f'map_{k}' if not k.startswith('map') else k: v
                for k, v in ap.compute().items()
                if k in ('map', 'map_50', 'map_25', 'mar')})
    # edge-affinity fractions from the accumulated counts
    ea_tot = out_diag.pop('_ea_total', 0)
    ea_correct = out_diag.pop('_ea_correct', 0)
    ea_gt_pos = out_diag.pop('_ea_gt_pos', 0)
    if ea_tot:
        out_diag['edge_affinity_acc'] = ea_correct / ea_tot
        out_diag['edge_affinity_gt_pos_frac'] = ea_gt_pos / ea_tot
    out.update(out_diag)
    out['settings'] = settings
    return out


def _cat_instance(objs):
    """Batch collation for gt overlaps (InstanceData.cat)."""
    from .data.csr import InstanceData
    return InstanceData.cat(objs)

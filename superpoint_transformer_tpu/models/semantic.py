"""Semantic segmentation task harness (reference
SemanticSegmentationModule, src/models/semantic.py:35): classifier
head(s) on the SPT backbone, multi-stage histogram losses, confusion-
matrix metrics, AdamW + cosine-warmup with differential transformer
LR. Replaces the Lightning module with a functional train/eval step
pair built around a flax TrainState.
"""
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.training import train_state

from ..data.pad import PaddedNAG
from ..loss.semantic import multi_stage_loss
from ..metrics.semantic import confusion_matrix_from_histogram
from ..optim.lr_scheduler import make_optimizer
from ..nn.mlp import Classifier
from .spt import SPT

__all__ = ['SemanticSegmentationModel', 'SemanticTask', 'TrainState']


class SemanticSegmentationModel(nn.Module):
    """SPT backbone + one classifier head per supervised level
    (reference semantic.py:194-199)."""
    net: SPT
    num_classes: int

    @nn.compact
    def __call__(self, nag: PaddedNAG, train: bool = True):
        outs = self.net(nag, train=train)
        if isinstance(outs, (list, tuple)):
            logits = [
                Classifier(self.num_classes, name=f'head_{i}')(x)
                for i, x in enumerate(outs)]
        else:
            logits = Classifier(self.num_classes, name='head')(outs)
        return logits


class TrainState(train_state.TrainState):
    batch_stats: Any = None


@dataclass(eq=False)
class SemanticTask:
    """Functional task wrapper: holds static config, builds the model,
    the optimizer and the jitted steps."""
    net: SPT
    num_classes: int = 13
    loss_type: str = 'ce_kl'
    multi_stage_loss_lambdas: Sequence[float] = (1., 50.)
    weighted_loss: bool = True
    lr: float = 0.01
    weight_decay: float = 1e-4
    transformer_lr_scale: float = 0.1
    total_steps: int = 100_000
    warmup_steps: int = 2_000
    class_weight: Optional[np.ndarray] = None
    # apply the optimizer every k batches, averaging gradients
    # (reference GradientAccumulator callback in the *_11g configs,
    # e.g. configs/experiment/semantic/s3dis_11g.yaml:33-37)
    accumulate_grad_batches: int = 1
    # 'cosine' (default) or 'plateau' (reference
    # ReduceLROnPlateauWithWarmup, src/optim/lr_scheduler.py:236):
    # warmup-then-constant base LR, decayed by the Trainer's
    # ReduceOnPlateau controller via the lr_mult hyperparameter
    scheduler: str = 'cosine'

    def __post_init__(self):
        self.model = SemanticSegmentationModel(
            net=self.net, num_classes=self.num_classes)

    def lr_at(self, step):
        """Host-side LR of the base parameter group at `step` (numpy
        mirror of make_optimizer's cosine-warmup schedule — for epoch
        logging without a device round-trip; reference LearningRateMonitor
        callback, configs/callbacks/lr_monitor.yaml)."""
        warmup_init_lr, eta_min = 1e-6, 1e-6
        s = float(step)
        w = float(self.warmup_steps)
        t = float(self.total_steps)
        if s < w:
            frac = 0.5 * (1 - np.cos(np.pi * min(s / max(w, 1), 1)))
            return warmup_init_lr + (self.lr - warmup_init_lr) * frac
        progress = min(max((s - w) / max(t - w, 1), 0), 1)
        return eta_min + (self.lr - eta_min) * 0.5 * (
            1 + np.cos(np.pi * progress))

    # -- state ----------------------------------------------------------
    def init_state(self, rng, example_batch):
        init_fn = jax.jit(partial(self.model.init, train=False))
        variables = init_fn(rng, example_batch)
        params = variables['params']
        if self.scheduler == 'plateau':
            from ..optim.lr_scheduler import make_plateau_optimizer
            tx = make_plateau_optimizer(
                lr=self.lr, weight_decay=self.weight_decay,
                transformer_lr_scale=self.transformer_lr_scale,
                num_warmup_steps=self.warmup_steps, params=params)
        else:
            tx = make_optimizer(
                lr=self.lr, weight_decay=self.weight_decay,
                transformer_lr_scale=self.transformer_lr_scale,
                total_steps=self.total_steps,
                num_warmup_steps=self.warmup_steps, params=params)
        if self.accumulate_grad_batches > 1:
            import optax
            tx = optax.MultiSteps(
                tx, every_k_schedule=int(self.accumulate_grad_batches))
        return TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx,
            batch_stats=variables.get('batch_stats'))

    # -- loss -----------------------------------------------------------
    def _loss_fn(self, params, batch, rng, train=True, batch_stats=None):
        variables = {'params': params}
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
        new_stats = None
        if train and batch_stats is not None:
            # batch-norm running statistics update (norm_mode='batch')
            logits, mut = self.model.apply(
                variables, batch, train=True, rngs={'dropout': rng},
                mutable=['batch_stats'])
            new_stats = mut['batch_stats']
        else:
            logits = self.model.apply(
                variables, batch, train=train,
                rngs={'dropout': rng} if train else None)
        y_hists, masks = self._targets(batch)
        cw = None
        if self.class_weight is not None:
            cw = jnp.asarray(self.class_weight, jnp.float32)
        loss = multi_stage_loss(
            logits, y_hists, self.multi_stage_loss_lambdas,
            loss_type=self.loss_type, class_weight=cw,
            node_masks=masks)
        return loss, (logits, new_stats)

    def _targets(self, batch):
        """Per supervised level: (y_hist, node_mask). Supervised levels
        are 1..L matching the stage-wise outputs (reference
        get_target, semantic.py:618)."""
        n_out = len(self.multi_stage_loss_lambdas)
        y_hists, masks = [], []
        for i in range(n_out):
            lvl = batch[1 + i]
            y_hists.append(lvl.y)
            masks.append(lvl.node_mask)
        return y_hists, masks

    # -- jitted steps ----------------------------------------------------
    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, batch, rng):
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(
            state.params, batch, rng, batch_stats=state.batch_stats)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        cm = confusion_matrix_from_histogram(
            logits[0], batch[1].y, self.num_classes,
            node_mask=batch[1].node_mask)
        return state, {'loss': loss, 'confmat': cm}

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state, batch):
        loss, (logits, _) = self._loss_fn(
            state.params, batch, jax.random.PRNGKey(0), train=False,
            batch_stats=state.batch_stats)
        cm = confusion_matrix_from_histogram(
            logits[0], batch[1].y, self.num_classes,
            node_mask=batch[1].node_mask)
        return {'loss': loss, 'confmat': cm,
                'logits_level1': logits[0]}

    def predict(self, state, batch):
        """Level-1 class predictions (argmax logits) on valid nodes."""
        out = self.eval_step(state, batch)
        return jnp.argmax(out['logits_level1'], axis=1)

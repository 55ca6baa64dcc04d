"""EZ-SP partition-learning task (reference PartitionAndSemanticModule
with training_partition_stage=True, src/models/semantic.py:1400):
train a lightweight sparse CNN so point embeddings are homogeneous
within objects and contrasted across semantic boundaries; at
validation time, run the greedy contour-prior partition on the
embeddings and report partition-purity (oracle) metrics.
"""
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from flax import linen as nn

from ..data.pad import PaddedPointCloud
from ..loss.partition_criterion import partition_criterion
from ..nn.sparse import SparseCNN
from ..optim.lr_scheduler import make_optimizer
from .semantic import TrainState

__all__ = ['PartitionModel', 'PartitionTask', 'partition_purity']


class PartitionModel(nn.Module):
    """Sparse CNN point-embedding network (the EZ-SP `first_stage`;
    default width/depth from configs/model/partition/default_ezsp.yaml:
    in -> 32 -> 32 -> 32, GraphNorm + LeakyReLU)."""
    channels: Sequence[int] = (32, 32, 32)
    norm: Optional[str] = 'graph'
    num_graphs: int = 8

    @nn.compact
    def __call__(self, cloud: PaddedPointCloud, train: bool = True):
        return SparseCNN(
            channels=tuple(self.channels), norm=self.norm,
            num_graphs=self.num_graphs, name='cnn')(
            cloud.x, cloud.cnn_nbr_idx, batch=cloud.batch,
            mask=cloud.node_mask, train=train)


@dataclass(eq=False)
class PartitionTask:
    """Stage-1 functional task: CNN embeddings + contrastive edge loss."""
    net: PartitionModel
    num_classes: int = 13
    affinity_temperature: float = 1.0
    adaptive_sampling_ratio: float = 0.9
    focal_gamma: float = 1.0
    lr: float = 1e-4
    weight_decay: float = 1e-4
    total_steps: int = 100_000
    warmup_steps: int = 0

    def init_state(self, rng, example_batch):
        variables = jax.jit(partial(self.net.init, train=False))(
            rng, example_batch)
        tx = make_optimizer(
            lr=self.lr, weight_decay=self.weight_decay,
            transformer_lr_scale=1.0, total_steps=self.total_steps,
            num_warmup_steps=self.warmup_steps,
            params=variables['params'])
        return TrainState.create(
            apply_fn=self.net.apply, params=variables['params'], tx=tx,
            batch_stats=variables.get('batch_stats'))

    def _loss_fn(self, params, batch, train=True):
        x = self.net.apply({'params': params}, batch, train=train)
        loss, aux = partition_criterion(
            x, batch.y, batch.edge_index, edge_mask=batch.edge_mask,
            num_classes=self.num_classes,
            affinity_temperature=self.affinity_temperature,
            adaptive_sampling_ratio=self.adaptive_sampling_ratio,
            gamma=self.focal_gamma, train=train)
        return loss, (x, aux)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, batch):
        (loss, (_, aux)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(state.params, batch)
        state = state.apply_gradients(grads=grads)
        return state, {'loss': loss,
                       'n_inter_edge': aux['n_inter_edge']}

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state, batch):
        loss, (x, aux) = self._loss_fn(state.params, batch, train=False)
        return {'loss': loss, 'embeddings': x,
                'n_inter_edge': aux['n_inter_edge']}

    def embed(self, state, batch):
        """Host-friendly embeddings of the valid nodes."""
        x = np.asarray(self.eval_step(state, batch)['embeddings'])
        n = int(batch.num_nodes)
        return x[:n]


def partition_purity(super_index, y_hist, num_classes):
    """Oracle metrics of a partition (reference logs these as
    `partition_omiou/ooa/omacc`, src/models/semantic.py:1671): each
    superpoint is assigned its majority ground-truth label; returns the
    resulting confusion matrix — its mIoU is the achievable upper
    bound for semantic segmentation on this partition."""
    y_hist = np.asarray(y_hist)[:, :num_classes]
    sp = np.asarray(super_index)
    n_sp = int(sp.max()) + 1 if sp.size else 0
    hist_sp = np.zeros((n_sp, num_classes), np.int64)
    np.add.at(hist_sp, sp, y_hist.astype(np.int64))
    major = hist_sp.argmax(1)
    cm = np.zeros((num_classes, num_classes), np.int64)
    # rows = ground truth, cols = (oracle) prediction
    pred_per_point = major[sp]                  # [N]
    for c in range(num_classes):
        np.add.at(cm[c], pred_per_point, y_hist[:, c].astype(np.int64))
    return cm

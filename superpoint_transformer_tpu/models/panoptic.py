"""SuperCluster panoptic segmentation (reference
src/models/panoptic.py:23): SPT backbone + semantic heads + a
symmetric edge-affinity head on the level-1 instance graph; instances
are recovered at inference by an L0 graph-clustering partition whose
inputs are the predicted class logits (KL-ish term) and edge
affinities (cut costs) — solved by the same native greedy solver as
the preprocessing partition (reference instance_cut_pursuit,
src/utils/instance.py:540).
"""
from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.pad import PaddedNAG
from ..loss.semantic import multi_stage_loss
from ..metrics.semantic import confusion_matrix_from_histogram
from ..nn.mlp import Classifier, FFN
from .semantic import SemanticTask
from .spt import SPT

__all__ = ['PanopticSegmentationModel', 'PanopticTask',
           'instance_partition']


class PanopticSegmentationModel(nn.Module):
    """Backbone + per-level classifier heads + edge-affinity head.
    Edge features are the symmetric pair encoding
    [|xi - xj| , (xi + xj)/2] (reference panoptic.py:474-483)."""
    net: SPT
    num_classes: int
    edge_affinity_hidden: int = 32

    @nn.compact
    def __call__(self, nag: PaddedNAG, train: bool = True):
        outs = self.net(nag, train=train)
        logits = [Classifier(self.num_classes, name=f'head_{i}')(x)
                  for i, x in enumerate(outs)]
        x1 = outs[0]  # level-1 features
        lvl1 = nag[1]
        ea_logits = None
        if lvl1.obj_edge_index is not None:
            s = lvl1.obj_edge_index[0]
            t = lvl1.obj_edge_index[1]
            xi, xj = x1[s], x1[t]
            ef = jnp.concatenate(
                [jnp.abs(xi - xj), (xi + xj) * 0.5], axis=1)
            h = FFN(ef.shape[1],
                    hidden_dim=self.edge_affinity_hidden,
                    out_dim=1, name='edge_affinity_head')(
                ef, train=train)
            ea_logits = h[:, 0]
        return logits, ea_logits


def _weighted_bce_with_logits(logits, target, weight=None, mask=None):
    """BCEWithLogits, optionally per-edge weighted (reference
    WeightedBCEWithLogitsLoss, src/loss/bce.py:10)."""
    z = jax.nn.log_sigmoid(logits)
    z1m = jax.nn.log_sigmoid(-logits)
    per = -(target * z + (1 - target) * z1m)
    w = jnp.ones_like(per) if weight is None else weight
    if mask is not None:
        w = w * mask.astype(per.dtype)
    denom = jnp.maximum(w.sum(), 1e-12)
    return (per * w).sum() / denom


@dataclass(eq=False)
class PanopticTask(SemanticTask):
    """Semantic loss + lambda-weighted edge-affinity BCE with 4-case
    weighting (same-class/same-object combinations — reference
    panoptic.py:726-758)."""
    edge_affinity_loss_lambda: float = 1.0
    edge_affinity_loss_weights: Sequence[float] = (1., 1., 1., 1.)
    stuff_classes: Sequence[int] = ()

    def __post_init__(self):
        self.model = PanopticSegmentationModel(
            net=self.net, num_classes=self.num_classes)

    def _loss_fn(self, params, batch, rng, train=True, batch_stats=None):
        variables = {'params': params}
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
        new_stats = None
        if train and batch_stats is not None:
            (logits, ea_logits), mut = self.model.apply(
                variables, batch, train=True, rngs={'dropout': rng},
                mutable=['batch_stats'])
            new_stats = mut['batch_stats']
        else:
            (logits, ea_logits) = self.model.apply(
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
        lvl1 = batch[1]
        if ea_logits is not None and lvl1.obj_edge_affinity is not None:
            target = lvl1.obj_edge_affinity
            emask = lvl1.obj_edge_mask
            w = self._edge_weights(batch, target)
            ea_loss = _weighted_bce_with_logits(
                ea_logits, target, weight=w, mask=emask)
            loss = loss + self.edge_affinity_loss_lambda * ea_loss
        return loss, (logits, ea_logits, new_stats)

    def _edge_weights(self, batch, target):
        w = self.edge_affinity_loss_weights
        if w is None or len(w) != 4:
            return None
        lvl1 = batch[1]
        if lvl1.y is None:
            return None
        y = jnp.argmax(lvl1.y, axis=1)
        s, t = lvl1.obj_edge_index
        same_class = y[s] == y[t]
        same_obj = target > 0.5
        ws = jnp.asarray(w, jnp.float32)
        return jnp.where(
            same_class & same_obj, ws[0],
            jnp.where(same_class & ~same_obj, ws[1],
                      jnp.where(~same_class & same_obj, ws[2], ws[3])))

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, batch, rng):
        (loss, (logits, ea, new_stats)), grads = jax.value_and_grad(
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
        loss, (logits, ea, _) = self._loss_fn(
            state.params, batch, jax.random.PRNGKey(0), train=False,
            batch_stats=state.batch_stats)
        cm = confusion_matrix_from_histogram(
            logits[0], batch[1].y, self.num_classes,
            node_mask=batch[1].node_mask)
        return {'loss': loss, 'confmat': cm,
                'logits_level1': logits[0],
                'edge_affinity_logits': ea}


def instance_partition(
        pos, node_logits, edge_index, edge_affinity_logits,
        node_size=None, regularization=10.0, x_weight=5e-2,
        p_weight=1.0, cutoff=1, temperature=1.0, dampening=0.0,
        discrepancy_epsilon=1e-3, stuff_classes=(), num_classes=None,
        batch=None):
    """Instance partition by graph clustering (reference
    instance_cut_pursuit / _instance_cut_pursuit,
    src/utils/instance.py:333-672):

      - edge weights: sigmoid(affinity) / (1 - sigmoid + eps) * reg
      - node features: [x_weight * centered pos | p_weight * softmax
        probas] — L2 metric on both (KL option approximated by L2 on
        probabilities for the greedy solver)
      - solve the L0 partition with the native greedy solver
      - merge all same-class stuff instances per batch item

    Returns obj_index [N] instance ids.
    """
    from ..ops.native import greedy_cut
    from scipy.special import softmax as _softmax

    pos = np.asarray(pos)
    node_logits = np.asarray(node_logits)
    n = pos.shape[0]
    if n < 2 or edge_index.shape[1] == 0:
        return np.zeros(n, dtype=np.int64)

    aff = 1.0 / (1.0 + np.exp(-np.asarray(edge_affinity_logits)))
    discrepancy = aff / (1 - aff + discrepancy_epsilon)

    probas = _softmax(node_logits / temperature, axis=1)
    C = probas.shape[1]
    probas = (1 - dampening) * probas + dampening / C

    x = np.concatenate(
        [(pos - pos.mean(0)) * x_weight, probas * p_weight],
        1).astype(np.float32)
    si, n_comp = greedy_cut(
        x, np.asarray(edge_index, dtype=np.int64),
        edge_weight=discrepancy.astype(np.float32),
        node_weight=(np.asarray(node_size, dtype=np.float32)
                     if node_size is not None else None),
        reg=regularization, cutoff=cutoff)

    # stuff merge: at most one instance per stuff class per batch item
    # (reference src/utils/instance.py:649-672)
    if stuff_classes is not None and len(stuff_classes):
        pred_cls = node_logits.argmax(1)
        batch = batch if batch is not None else np.zeros(n, np.int64)
        C = node_logits.shape[1]
        # majority predicted class per instance (vectorized histogram)
        hist = np.zeros((n_comp, C), dtype=np.int64)
        np.add.at(hist, (si, pred_cls), 1)
        comp_cls = hist.argmax(1)
        comp_batch = np.zeros(n_comp, dtype=np.int64)
        comp_batch[si] = batch
        # all stuff-class components of one (batch, class) collapse to
        # the first such component
        remap = np.arange(n_comp)
        is_stuff = np.isin(comp_cls, np.asarray(list(stuff_classes)))
        key = comp_batch * C + comp_cls
        stuff_idx = np.where(is_stuff)[0]
        if stuff_idx.size:
            order = stuff_idx[np.argsort(key[stuff_idx], kind='stable')]
            ks = key[order]
            first = np.ones(order.shape[0], bool)
            first[1:] = ks[1:] != ks[:-1]
            group_first = order[np.maximum.accumulate(
                np.where(first, np.arange(order.shape[0]), 0))]
            remap[order] = group_first
        si = remap[si]
        # re-compact
        _, si = np.unique(si, return_inverse=True)
    return si


def grid_search_panoptic_partition(
        pos, node_logits, edge_index, edge_affinity_logits, obj,
        num_classes, node_size=None, batch=None, stuff_classes=(),
        regularizations=(1., 10., 20., 50., 100., 200.),
        x_weights=(2e-1, 5e-2, 1e-2), cutoffs=(1, 100, 300),
        criterion='pq'):
    """Grid-search the instance-partition hyperparameters maximizing a
    panoptic metric (reference grid_search_panoptic_partition,
    src/utils/instance.py:1237 and the epoch-end search in
    PanopticSegmentationModule._compute_best_partition_settings,
    src/models/panoptic.py:952-1051).

    :param obj: InstanceData of gt overlaps per level-1 node
    :return: (best_settings dict, best_metrics dict, best_obj_index)
    """
    from ..metrics.panoptic import PanopticQuality3D

    best = (None, None, None)
    best_score = -np.inf
    for reg in regularizations:
        for xw in x_weights:
            for cut in cutoffs:
                obj_index = instance_partition(
                    pos, node_logits, edge_index,
                    edge_affinity_logits, node_size=node_size,
                    regularization=reg, x_weight=xw, cutoff=cut,
                    stuff_classes=stuff_classes,
                    num_classes=num_classes, batch=batch)
                merged = obj.merge(obj_index)
                n_inst = int(obj_index.max()) + 1
                logits_np = np.asarray(node_logits)
                acc = np.zeros((n_inst, logits_np.shape[1]))
                np.add.at(acc, obj_index, logits_np)
                pred_sem = acc.argmax(1)
                pq = PanopticQuality3D(
                    num_classes, stuff_classes=stuff_classes)
                pq.update_from_instance_data(merged, pred_sem)
                metrics = pq.compute()
                score = metrics[criterion]
                if score > best_score:
                    best_score = score
                    best = (dict(regularization=reg, x_weight=xw,
                                 cutoff=cut), metrics, obj_index)
    return best

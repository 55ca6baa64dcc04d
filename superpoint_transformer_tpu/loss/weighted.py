"""Item-weighted regression / BCE losses (reference
src/loss/weighted.py:4 WeightedLossMixIn, src/loss/bce.py:10,
src/loss/l2.py / l1.py).

Each loss sums over the feature dimension, then takes the
weight-normalized mean over items (matching the reference MixIn), with
an optional validity mask for padded rows.
"""
import jax.numpy as jnp

__all__ = ['weighted_l2_loss', 'weighted_l1_loss',
           'weighted_bce_with_logits_loss']


def _weighted_mean(per_item, weight, mask):
    if mask is not None:
        m = mask.astype(per_item.dtype)
        weight = m if weight is None else weight * m
    if weight is None:
        return per_item.mean()
    w = weight / jnp.maximum(weight.sum(), 1e-12)
    return (per_item * w).sum()


def weighted_l2_loss(input, target, weight=None, mask=None):
    per = ((input - target) ** 2)
    if per.ndim > 1:
        per = per.sum(axis=-1)
    return _weighted_mean(per, weight, mask)


def weighted_l1_loss(input, target, weight=None, mask=None):
    per = jnp.abs(input - target)
    if per.ndim > 1:
        per = per.sum(axis=-1)
    return _weighted_mean(per, weight, mask)


def weighted_bce_with_logits_loss(logits, target, weight=None,
                                  pos_weight=None, mask=None):
    """BCE-with-logits, numerically stable, item-weighted (reference
    WeightedBCEWithLogitsLoss, src/loss/bce.py:10). `pos_weight`
    scales the positive term like torch's BCEWithLogitsLoss."""
    log_p = -jnp.logaddexp(0.0, -logits)      # log sigmoid(x)
    log_not_p = -jnp.logaddexp(0.0, logits)   # log (1 - sigmoid(x))
    pw = 1.0 if pos_weight is None else pos_weight
    per = -(pw * target * log_p + (1.0 - target) * log_not_p)
    if per.ndim > 1:
        per = per.sum(axis=-1)
    return _weighted_mean(per, weight, mask)

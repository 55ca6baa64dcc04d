"""Focal losses (reference src/loss/focal.py:11,171).

Functional, jittable: all take padded arrays + an optional validity
mask instead of dynamically filtering items.
"""
import jax.numpy as jnp
import jax

__all__ = ['weighted_focal_loss', 'binary_focal_loss']


def weighted_focal_loss(logits, y, gamma=0.0, class_weight=None,
                        item_weight=None, mask=None):
    """Multi-class focal loss  -w_c (1 - p_t)^gamma log(p_t)
    (reference WeightedFocalLoss, src/loss/focal.py:11; gamma=0 reduces
    to weighted cross-entropy).

    logits [N, C]; y [N] int labels; item_weight [N] per-item weights
    (normalized to sum 1 like the reference); mask [N] bool validity.
    """
    n, c = logits.shape
    valid = jnp.ones(n, bool) if mask is None else mask
    valid = valid & (y >= 0)
    y_safe = jnp.clip(y, 0, c - 1)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    log_pt = jnp.take_along_axis(log_p, y_safe[:, None], axis=1)[:, 0]
    focal = (1.0 - jnp.exp(log_pt)) ** gamma
    cw = jnp.ones(c, logits.dtype) if class_weight is None \
        else jnp.asarray(class_weight, logits.dtype)
    w_item = cw[y_safe] * (1.0 if item_weight is None else item_weight)
    w_item = jnp.where(valid, w_item, 0.0)
    per = -focal * log_pt * w_item
    return per.sum() / jnp.maximum(w_item.sum(), 1e-12)


def binary_focal_loss(p, y, gamma=0.0, weight=0.5, epsilon=1e-6,
                      mask=None):
    """Binary focal loss on PROBABILITIES (reference BinaryFocalLoss,
    src/loss/focal.py:171): p_t = p if y else 1-p, clamped into
    [eps, 1-eps]; loss = -(1-p_t)^gamma log(p_t), class-weighted by
    `weight` for positives / `1-weight` for negatives, mean-reduced
    over valid items."""
    yf = y.astype(p.dtype)
    p_t = (1.0 - yf) + p * (2.0 * yf - 1.0)
    p_t = epsilon + (1.0 - 2.0 * epsilon) * p_t
    w = yf * weight + (1.0 - yf) * (1.0 - weight)
    per = -((1.0 - p_t) ** gamma) * jnp.log(p_t) * w
    if mask is None:
        return per.mean()
    m = mask.astype(p.dtype)
    return (per * m).sum() / jnp.maximum(m.sum(), 1.0)

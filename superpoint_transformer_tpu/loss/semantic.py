"""Semantic segmentation losses (reference src/models/semantic.py
model_step:378-476, src/utils/loss.py, src/loss/multi.py).

All losses consume PADDED arrays with node masks; padded rows carry
zero histograms so they vanish from every sum.

Conventions (reference parity):
  - logits [N, C]; y_hist [N, C+1] where column C counts void points
  - CE with ignore_index=C: void mass contributes 0 loss but IS
    counted in the weight normalization (loss_with_sample_weights
    normalizes by the total histogram mass incl. void —
    src/utils/loss.py:14-19)
  - class weights w_c multiply the per-class nll, and torch's weighted
    CE normalizes by the sum of applied weights.
"""
import jax
import jax.numpy as jnp

__all__ = ['ce_loss', 'ce_with_histogram', 'multi_stage_loss']


def _psum2(num, den, axis_name):
    if axis_name is None:
        return num, den
    return (jax.lax.psum(num, axis_name),
            jax.lax.psum(den, axis_name))


def ce_loss(logits, y_hist, class_weight=None, node_mask=None,
            axis_name=None):
    """Plain CE against the DOMINANT histogram label (reference
    loss_type='ce*' first stage: criterion(a, b.argmax(1))); matches
    torch.nn.CrossEntropyLoss(weight, ignore_index=C) semantics
    including its weighted-mean normalization."""
    C = logits.shape[1]
    y = jnp.argmax(y_hist, axis=1)
    valid = (y < C)
    if node_mask is not None:
        valid = valid & node_mask
    logp = jax.nn.log_softmax(logits, axis=1)
    y_safe = jnp.clip(y, 0, C - 1)
    nll = -jnp.take_along_axis(logp, y_safe[:, None], axis=1)[:, 0]
    if class_weight is not None:
        w = class_weight[y_safe] * valid
    else:
        w = valid.astype(logits.dtype)
    num, den = _psum2((nll * w).sum(), w.sum(), axis_name)
    return num / jnp.maximum(den, 1e-12)


def ce_with_histogram(logits, y_hist, class_weight=None,
                      node_mask=None, axis_name=None):
    """KL-style loss against the full label histogram (reference
    loss_with_target_histogram, src/utils/loss.py:25)."""
    C = logits.shape[1]
    y = y_hist[:, :C].astype(logits.dtype)
    void = y_hist[:, C].astype(logits.dtype)
    if node_mask is not None:
        m = node_mask[:, None].astype(logits.dtype)
        y = y * m
        void = void * node_mask.astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=1)
    if class_weight is not None:
        per = -(y * class_weight[None, :] * logp).sum()
    else:
        per = -(y * logp).sum()
    # reference normalizes by TOTAL mass including void entries
    num, den = _psum2(per, y.sum() + void.sum(), axis_name)
    return num / jnp.maximum(den, 1e-12)


def multi_stage_loss(logits_list, y_hist_list, lambdas,
                     loss_type='ce_kl', class_weight=None,
                     node_masks=None, axis_name=None):
    """Weighted multi-level loss (reference MultiLoss + model_step).
    loss_type in {'ce', 'wce', 'kl', 'ce_kl', 'wce_kl'}; the '*_kl'
    variants use plain/weighted CE on the first (level-1) stage and the
    histogram loss above it. `axis_name` makes every loss a global
    ratio-of-psums so node-sharded (graph-partition-parallel) training
    matches the unsharded loss exactly."""
    node_masks = node_masks or [None] * len(logits_list)
    total = 0.0
    for i, (lam, logits, y_hist, mask) in enumerate(zip(
            lambdas, logits_list, y_hist_list, node_masks)):
        cw = class_weight if loss_type in ('wce', 'wce_kl') or \
            (loss_type == 'ce_kl' and class_weight is not None) else None
        if loss_type == 'ce':
            li = ce_loss(logits, y_hist, class_weight=None,
                         node_mask=mask, axis_name=axis_name)
        elif loss_type == 'wce':
            li = _dominant_hist_loss(logits, y_hist, class_weight, mask,
                                     axis_name=axis_name)
        elif loss_type == 'kl':
            li = ce_with_histogram(logits, y_hist, class_weight=cw,
                                   node_mask=mask, axis_name=axis_name)
        elif loss_type == 'ce_kl' and i == 0:
            li = ce_loss(logits, y_hist, class_weight=cw,
                         node_mask=mask, axis_name=axis_name)
        elif loss_type == 'wce_kl' and i == 0:
            li = _dominant_hist_loss(logits, y_hist, class_weight, mask,
                                     axis_name=axis_name)
        elif loss_type in ('ce_kl', 'wce_kl'):
            li = ce_with_histogram(logits, y_hist, class_weight=cw,
                                   node_mask=mask, axis_name=axis_name)
        else:
            raise ValueError(f'Unknown loss_type {loss_type}')
        total = total + lam * li
    return total


def _dominant_hist_loss(logits, y_hist, class_weight, mask,
                        axis_name=None):
    """'wce': histogram mass collapsed onto the dominant label
    (reference model_step 'wce' branch: y_hist_dominant)."""
    y_dom = jnp.argmax(y_hist, axis=1)
    mass = y_hist.sum(axis=1)
    # one-hot compare instead of a row scatter (serial on TPU)
    dom_hist = (jnp.arange(y_hist.shape[1], dtype=y_dom.dtype)[None, :]
                == y_dom[:, None]).astype(y_hist.dtype) * mass[:, None]
    return ce_with_histogram(
        logits, dom_hist, class_weight=class_weight, node_mask=mask,
        axis_name=axis_name)

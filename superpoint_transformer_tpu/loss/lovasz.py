"""Multi-class Lovasz-Softmax loss (reference src/loss/lovasz.py:8,
itself after Berman 2018), jittable on padded inputs.

TPU-native formulation: per class, errors |fg - p_c| are sorted
descending with a single jnp.sort companion trick; the Jaccard-extension
gradient is a cumulative-sum expression, so the whole loss is
sort + cumsum + dot — no data-dependent shapes. Padded / ignored items
carry zero error and zero fg, so they contribute nothing to the dot
product regardless of their sorted position.
"""
import jax
import jax.numpy as jnp

__all__ = ['lovasz_softmax_loss']


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension of the Jaccard loss w.r.t.
    sorted errors (reference lovasz_gradient, src/loss/lovasz.py:178)."""
    gts = gt_sorted.sum(axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate(
        [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]],
        axis=-1)


def lovasz_softmax_loss(logits, y, class_to_sum='present', mask=None,
                        class_weight=None):
    """logits [N, C], y [N] int labels, mask [N] bool. Returns the
    summed per-class Lovasz loss ('present' restricts to classes that
    appear among valid items, like the reference default)."""
    n, c = logits.shape
    valid = jnp.ones(n, bool) if mask is None else mask
    valid = valid & (y >= 0) & (y < c)
    y_safe = jnp.clip(y, 0, c - 1)
    probas = jax.nn.softmax(logits, axis=-1)

    fg = (y_safe[None, :] == jnp.arange(c)[:, None]).astype(
        logits.dtype) * valid[None, :]                     # [C, N]
    errors = jnp.abs(fg - probas.T) * valid[None, :]       # [C, N]
    order = jnp.argsort(-errors, axis=1)
    errors_sorted = jnp.take_along_axis(errors, order, axis=1)
    fg_sorted = jnp.take_along_axis(fg, order, axis=1)
    grad = _lovasz_grad(fg_sorted)
    per_class = (errors_sorted * grad).sum(axis=1)          # [C]

    present = fg.sum(axis=1) > 0
    w = jnp.ones(c, logits.dtype) if class_weight is None \
        else jnp.asarray(class_weight, logits.dtype)
    if class_to_sum == 'present':
        w = w * present.astype(logits.dtype)
    return (per_class * w).sum()

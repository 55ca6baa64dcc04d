"""Segment pooling child->parent (reference src/nn/pool.py) as sorted
segment ops, plus attentive pools. Children are sorted by parent
(data/pad.py invariant) so reductions lower efficiently.
"""
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import (
    segment_sum, segment_mean, segment_max, segment_min, segment_std,
    segment_softmax)
from .mlp import xavier_uniform_gain
from .attention import qk_scale_from_degree

__all__ = ['pool', 'AttentivePool', 'AttentivePoolWithLearntQueries']


def pool(mode, x_child, index, num_parents, mask=None,
         indices_are_sorted=True):
    """String-dispatch pooling (reference pool_factory). Padded
    children carry index == num_parents and are dropped."""
    if mode == 'max':
        big = jnp.asarray(jnp.finfo(x_child.dtype).max, x_child.dtype)
        xc = x_child if mask is None else \
            jnp.where(mask[:, None], x_child, -big)
        out = segment_max(xc, index, num_parents,
                          indices_are_sorted=indices_are_sorted)
        return jnp.where(out <= -big * 0.5, 0.0, out)
    if mode == 'min':
        big = jnp.asarray(jnp.finfo(x_child.dtype).max, x_child.dtype)
        xc = x_child if mask is None else \
            jnp.where(mask[:, None], x_child, big)
        out = segment_min(xc, index, num_parents,
                          indices_are_sorted=indices_are_sorted)
        return jnp.where(out >= big * 0.5, 0.0, out)
    if mode == 'mean':
        return segment_mean(x_child, index, num_parents,
                            indices_are_sorted=indices_are_sorted,
                            mask=mask)
    if mode == 'sum':
        xc = x_child if mask is None else \
            x_child * mask[:, None].astype(x_child.dtype)
        return segment_sum(xc, index, num_parents,
                           indices_are_sorted=indices_are_sorted)
    if mode == 'std':
        return segment_std(x_child, index, num_parents,
                           indices_are_sorted=indices_are_sorted,
                           mask=mask)
    raise ValueError(f'Unknown pool mode {mode}')


class AttentivePool(nn.Module):
    """Attentive pooling child->parent: queries from parents (or a
    learnt query vector), keys and values from children, scatter
    softmax over each parent's children (reference BaseAttentivePool /
    AttentivePool / AttentivePoolWithLearntQueries,
    src/nn/pool.py:85-330). Kept as a sorted segment-softmax since
    child counts are large and variable."""
    dim: int
    num_heads: int = 1
    qkv_bias: bool = True
    qk_dim: int = 8
    qk_scale: Optional[str] = None
    in_rpe_dim: int = 9
    k_rpe: bool = False
    q_rpe: bool = False
    heads_share_rpe: bool = False
    learnt_queries: bool = False

    @nn.compact
    def __call__(self, x_child, x_parent, index, num_parents,
                 edge_attr=None, mask=None):
        Nc = x_child.shape[0]
        H, D, C = self.num_heads, self.qk_dim, self.dim
        DH = D * H

        kv = nn.Dense(DH + C, use_bias=self.qkv_bias,
                      kernel_init=xavier_uniform_gain(), name='kv')(x_child)
        if self.learnt_queries:
            qp = self.param('q', nn.initializers.truncated_normal(0.02),
                            (DH,))
            q = jnp.broadcast_to(qp, (x_parent.shape[0], DH))
        else:
            q = nn.Dense(DH, use_bias=self.qkv_bias,
                         kernel_init=xavier_uniform_gain(),
                         name='q')(x_parent)
        q = q[jnp.clip(index, 0, num_parents - 1)].reshape(Nc, H, D)
        k = kv[:, :DH].reshape(Nc, H, D)
        v = kv[:, DH:].reshape(Nc, H, C // H)

        rpe_dim = D if self.heads_share_rpe else DH
        if self.k_rpe and edge_attr is not None:
            r = nn.Dense(rpe_dim, kernel_init=xavier_uniform_gain(),
                         name='k_rpe')(edge_attr)
            if self.heads_share_rpe:
                r = jnp.tile(r, (1, H))
            k = k + r.reshape(Nc, H, D)
        if self.q_rpe and edge_attr is not None:
            r = nn.Dense(rpe_dim, kernel_init=xavier_uniform_gain(),
                         name='q_rpe')(edge_attr)
            if self.heads_share_rpe:
                r = jnp.tile(r, (1, H))
            q = q + r.reshape(Nc, H, D)

        # degree-aware scale on the child->parent index
        ones = jnp.ones(Nc, dtype=jnp.int32)
        if mask is not None:
            ones = ones * mask.astype(jnp.int32)
        degree = segment_sum(ones, index, num_parents,
                             indices_are_sorted=True)
        scale = qk_scale_from_degree(
            self.qk_scale, D, degree[jnp.clip(index, 0, num_parents - 1)])
        q = q * scale[:, None, None]

        compat = jnp.einsum('nhd,nhd->nh', q, k)
        attn = segment_softmax(compat, index, num_parents,
                               indices_are_sorted=True, mask=mask)
        out = (v * attn[..., None]).reshape(Nc, C)
        if mask is not None:
            out = out * mask[:, None].astype(out.dtype)
        out = segment_sum(out, index, num_parents,
                          indices_are_sorted=True)
        return out


def AttentivePoolWithLearntQueries(**kwargs):
    return AttentivePool(learnt_queries=True, **kwargs)

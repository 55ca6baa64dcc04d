"""TransformerBlock: pre/post-norm residual SA + FFN with DropPath
(reference src/nn/transformer.py:17). v3 semantics: the FFN residual
shortcut re-bases on the SA output (reference transformer.py:240-244).
"""
from typing import Callable, Optional

import jax
from functools import partial

import jax.numpy as jnp
from flax import linen as nn

from .attention import SelfAttentionBlock
from .mlp import FFN, leaky_relu
from .norm import (GraphNorm, LayerNorm, InstanceNorm, GroupNorm,
                   BatchNorm)

__all__ = ['TransformerBlock', 'DropPath']

_NORMS = {'graph_norm': GraphNorm, 'layer': LayerNorm,
          'instance': InstanceNorm, 'group': GroupNorm,
          'graph': GraphNorm, 'batch': BatchNorm}


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per node
    (reference src/nn/dropout.py:24)."""
    rate: float

    @nn.compact
    def __call__(self, x, train=True):
        if self.rate <= 0 or not train:
            return x
        rng = self.make_rng('dropout')
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, (x.shape[0], 1))
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int = 1
    qkv_bias: bool = True
    qk_dim: int = 8
    qk_scale: Optional[str] = None
    in_rpe_dim: int = 18
    ffn_ratio: float = 4
    residual_drop: Optional[float] = None
    attn_drop: Optional[float] = None
    drop_path: Optional[float] = None
    activation: Callable = leaky_relu
    norm: str = 'graph'
    pre_norm: bool = True
    no_sa: bool = False
    no_ffn: bool = False
    k_rpe: bool = False
    q_rpe: bool = False
    v_rpe: bool = False
    qk_share_rpe: bool = False
    q_on_minus_rpe: bool = False
    heads_share_rpe: bool = False
    num_graphs: int = 64
    compute_dtype: Optional[str] = None
    shard_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, norm_index, nbr_idx=None, nbr_mask=None,
                 edge_feat=None, mask=None, train=True,
                 nbr_in_idx=None, nbr_in_mask=None):
        def make_norm(name):
            norm = _NORMS[self.norm](self.dim,
                                     num_graphs=self.num_graphs,
                                     shard_axis=self.shard_axis,
                                     name=name)
            if self.norm == 'batch':
                # running-stats norm needs the train flag
                return partial(norm, train=train)
            return norm

        drop_path = (DropPath(self.drop_path)
                     if self.drop_path is not None and self.drop_path > 0
                     else None)

        def dp(h):
            return drop_path(h, train=train) if drop_path is not None else h

        shortcut = x
        if not self.no_sa and nbr_idx is not None:
            sa = SelfAttentionBlock(
                dim=self.dim, num_heads=self.num_heads,
                qkv_bias=self.qkv_bias, qk_dim=self.qk_dim,
                qk_scale=self.qk_scale, in_rpe_dim=self.in_rpe_dim,
                k_rpe=self.k_rpe, q_rpe=self.q_rpe, v_rpe=self.v_rpe,
                qk_share_rpe=self.qk_share_rpe,
                q_on_minus_rpe=self.q_on_minus_rpe,
                heads_share_rpe=self.heads_share_rpe,
                attn_drop=self.attn_drop, drop=self.residual_drop,
                compute_dtype=self.compute_dtype,
                shard_axis=self.shard_axis,
                name='sa')
            if self.pre_norm:
                h = make_norm('sa_norm')(x, batch=norm_index, mask=mask)
                h = sa(h, nbr_idx, nbr_mask, edge_feat=edge_feat,
                       train=train, nbr_in_idx=nbr_in_idx,
                       nbr_in_mask=nbr_in_mask)
                x = shortcut + dp(h)
            else:
                h = sa(x, nbr_idx, nbr_mask, edge_feat=edge_feat,
                       train=train, nbr_in_idx=nbr_in_idx,
                       nbr_in_mask=nbr_in_mask)
                x = make_norm('sa_norm')(shortcut + dp(h),
                                         batch=norm_index, mask=mask)

        # v3 residual semantics: FFN shortcut is the SA output
        shortcut = x
        if not self.no_ffn:
            ffn = FFN(self.dim, hidden_dim=int(self.dim * self.ffn_ratio),
                      activation=self.activation, drop=self.residual_drop,
                      name='ffn')
            if self.pre_norm:
                h = make_norm('ffn_norm')(x, batch=norm_index, mask=mask)
                x = shortcut + dp(ffn(h, train=train))
            else:
                x = make_norm('ffn_norm')(
                    shortcut + dp(ffn(x, train=train)),
                    batch=norm_index, mask=mask)
        return x

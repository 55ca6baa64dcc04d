"""Stage / DownNFuseStage / UpNFuseStage / PointStage (reference
src/nn/stage.py) over padded static-shape level arrays.

A Stage = PosInjection (unit-sphere-normalized pos + parent diameter
concat) -> in_MLP -> N x TransformerBlock -> out_MLP. Down stages pool
children into parents first; up stages broadcast parents onto children.

Deviation from the reference (documented): at the innermost level,
where the reference normalizes positions globally across the whole
batch (src/nn/norm.py:92 `_forward`), we normalize per graph via the
`batch` vector — identical for batch_size=1, strictly more correct for
larger batches.
"""
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .mlp import MLP, leaky_relu
from .norm import unit_sphere_norm
from .pool import pool, AttentivePool
from .transformer import TransformerBlock

__all__ = ['Stage', 'DownNFuseStage', 'UpNFuseStage', 'PointStage']


def _cat(*xs):
    xs = [x for x in xs if x is not None]
    if not xs:
        return None
    if len(xs) == 1:
        return xs[0]
    return jnp.concatenate(xs, axis=1)


def fuse(mode, x1, x2):
    """Fusion factory semantics (reference src/nn/fusion.py)."""
    if x1 is None:
        return x2
    if x2 is None:
        return x1
    if mode in ('cat', 'concatenate', '|'):
        return jnp.concatenate([x1, x2], axis=1)
    if mode in ('residual', 'additive', '+'):
        return x1 + x2
    if mode in ('first', '1'):
        return x1
    if mode in ('second', '2'):
        return x2
    raise ValueError(f'Unknown fusion {mode}')


class Stage(nn.Module):
    dim: int
    num_blocks: int = 1
    num_heads: int = 1
    in_mlp: Optional[Sequence[int]] = None
    out_mlp: Optional[Sequence[int]] = None
    mlp_activation: Callable = leaky_relu
    mlp_norm: str = 'graph'
    mlp_drop: Optional[float] = None
    use_pos: bool = True
    use_diameter: bool = False
    use_diameter_parent: bool = False
    qk_dim: int = 8
    qkv_bias: bool = True
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
    k_delta_rpe: bool = False
    q_delta_rpe: bool = False
    qk_share_rpe: bool = False
    q_on_minus_rpe: bool = False
    blocks_share_rpe: bool = False
    heads_share_rpe: bool = False
    num_graphs: int = 64
    compute_dtype: Optional[str] = None
    shard_axis: Optional[str] = None

    @property
    def out_dim(self):
        if self.out_mlp is not None:
            return self.out_mlp[-1]
        if self.num_blocks > 0 or self.in_mlp is not None:
            return self.dim
        return self.dim

    @nn.compact
    def __call__(self, x, norm_index, pos=None, diameter=None,
                 node_size=None, super_index=None, num_super=None,
                 nbr_idx=None, nbr_mask=None, edge_feat=None, mask=None,
                 train=True, nbr_in_idx=None, nbr_in_mask=None):
        """Returns (x [N, out_dim], diameter_parent [num_super, 1])."""
        N = (x if x is not None else pos).shape[0]

        diameter_parent = None
        if pos is not None:
            if super_index is None:
                # innermost level: per-graph normalization (see module
                # docstring); norm_index is the graph id. Graph-level
                # segments span node shards -> cross-shard stats.
                si = jnp.clip(norm_index, 0, None).astype(jnp.int32)
                ns = self.num_graphs
                usn_axis = self.shard_axis
            else:
                # parent segments are device-local by construction
                si, ns = super_index, num_super
                usn_axis = None
            normalized_pos, diameter_parent = unit_sphere_norm(
                pos, si, ns, node_size=node_size, mask=mask,
                shard_axis=usn_axis)
            if self.use_pos:
                x = _cat(normalized_pos, x)

        if self.use_diameter:
            diam = diameter if diameter is not None else \
                jnp.zeros((N, 1), dtype=jnp.float32)
            x = _cat(diam, x)

        if self.use_diameter_parent:
            if diameter_parent is None:
                diam = jnp.zeros((N, 1), dtype=jnp.float32)
            elif super_index is None:
                gi = jnp.clip(norm_index, 0, None).astype(jnp.int32)
                diam = diameter_parent[gi]
            else:
                diam = diameter_parent[
                    jnp.clip(super_index, 0, num_super - 1)]
            x = _cat(diam, x)

        if self.in_mlp is not None:
            x = MLP(self.in_mlp, activation=self.mlp_activation,
                    norm=self.mlp_norm, drop=self.mlp_drop,
                    num_graphs=self.num_graphs,
                    compute_dtype=self.compute_dtype,
                shard_axis=self.shard_axis, name='in_mlp')(
                x, batch=norm_index, mask=mask, train=train)

        for b in range(self.num_blocks):
            x = TransformerBlock(
                dim=self.dim, num_heads=self.num_heads,
                qkv_bias=self.qkv_bias, qk_dim=self.qk_dim,
                qk_scale=self.qk_scale, in_rpe_dim=self.in_rpe_dim,
                ffn_ratio=self.ffn_ratio,
                residual_drop=self.residual_drop,
                attn_drop=self.attn_drop, drop_path=self.drop_path,
                activation=self.activation, norm=self.norm,
                pre_norm=self.pre_norm, no_sa=self.no_sa,
                no_ffn=self.no_ffn, k_rpe=self.k_rpe, q_rpe=self.q_rpe,
                v_rpe=self.v_rpe, qk_share_rpe=self.qk_share_rpe,
                q_on_minus_rpe=self.q_on_minus_rpe,
                heads_share_rpe=self.heads_share_rpe,
                num_graphs=self.num_graphs,
                compute_dtype=self.compute_dtype,
                shard_axis=self.shard_axis,
                name=f'block_{b}')(
                x, norm_index, nbr_in_idx=nbr_in_idx,
                nbr_in_mask=nbr_in_mask, nbr_idx=nbr_idx, nbr_mask=nbr_mask,
                edge_feat=edge_feat, mask=mask, train=train)

        if self.out_mlp is not None:
            x = MLP(self.out_mlp, activation=self.mlp_activation,
                    norm=self.mlp_norm, drop=self.mlp_drop,
                    num_graphs=self.num_graphs,
                    compute_dtype=self.compute_dtype,
                shard_axis=self.shard_axis, name='out_mlp')(
                x, batch=norm_index, mask=mask, train=train)

        if mask is not None and x is not None:
            x = x * mask[:, None].astype(x.dtype)
        return x, diameter_parent


class DownNFuseStage(Stage):
    """Pool children into parents, fuse with parent handcrafted
    features, then Stage (reference src/nn/stage.py:316)."""
    pool: str = 'max'
    fusion: str = 'cat'

    @nn.compact
    def __call__(self, x_parent, x_child, norm_index, pool_index,
                 num_parents=None, pos=None, diameter=None,
                 node_size=None, super_index=None, num_super=None,
                 nbr_idx=None, nbr_mask=None, edge_feat=None,
                 v_edge_attr=None, child_mask=None, mask=None,
                 train=True, nbr_in_idx=None, nbr_in_mask=None):
        if self.pool in ('max', 'min', 'mean', 'sum', 'std'):
            x_pooled = pool(self.pool, x_child, pool_index, num_parents,
                            mask=child_mask)
        elif self.pool == 'attentive':
            x_pooled = AttentivePool(
                dim=self.dim, num_heads=self.num_heads,
                qk_dim=self.qk_dim, qk_scale=self.qk_scale,
                k_rpe=self.k_rpe, q_rpe=self.q_rpe,
                heads_share_rpe=self.heads_share_rpe,
                name='down_pool_block')(
                x_child, x_parent, pool_index, num_parents,
                edge_attr=v_edge_attr, mask=child_mask)
        else:
            raise ValueError(f'Unknown pool {self.pool}')
        x_fused = fuse(self.fusion, x_parent, x_pooled)
        return Stage.__call__(
            self, x_fused, norm_index, pos=pos, diameter=diameter,
            node_size=node_size, super_index=super_index,
            num_super=num_super, nbr_idx=nbr_idx, nbr_mask=nbr_mask,
            nbr_in_idx=nbr_in_idx, nbr_in_mask=nbr_in_mask,
            edge_feat=edge_feat, mask=mask, train=train)


class UpNFuseStage(Stage):
    """Broadcast parent features onto children, fuse with skip
    features, then Stage (reference src/nn/stage.py:447)."""
    fusion: str = 'cat'

    @nn.compact
    def __call__(self, x_child, x_parent, norm_index, unpool_index,
                 num_parents=None, pos=None, diameter=None,
                 node_size=None, super_index=None, num_super=None,
                 nbr_idx=None, nbr_mask=None, edge_feat=None,
                 mask=None, train=True, nbr_in_idx=None,
                 nbr_in_mask=None):
        idx = jnp.clip(unpool_index, 0, x_parent.shape[0] - 1)
        x_unpool = x_parent[idx]
        x_fused = fuse(self.fusion, x_child, x_unpool)
        return Stage.__call__(
            self, x_fused, norm_index, pos=pos, diameter=diameter,
            node_size=node_size, super_index=super_index,
            num_super=num_super, nbr_idx=nbr_idx, nbr_mask=nbr_mask,
            nbr_in_idx=nbr_in_idx, nbr_in_mask=nbr_in_mask,
            edge_feat=edge_feat, mask=mask, train=train)


class PointStage(Stage):
    """Level-0 encoder: pos injection + MLP over raw points, no
    attention (reference src/nn/stage.py:574). With `cnn_channels`,
    a sparse voxel CNN runs on the quantized coordinates first
    (reference PointStage cnn_blocks path, src/nn/stage.py:696-714 /
    EZ-SP): its embeddings are either fed into the MLP alongside pos
    (`cnn_into_mlp=True`, reference point_mlp_on_cnn_feats) or
    concatenated to the MLP output."""
    cnn_channels: Optional[Sequence[int]] = None
    cnn_norm: Optional[str] = 'graph'
    cnn_into_mlp: bool = True

    @nn.compact
    def __call__(self, x, norm_index, pos=None, node_size=None,
                 super_index=None, num_super=None, mask=None,
                 cnn_nbr_idx=None, train=True):
        x_cnn = None
        if self.cnn_channels and cnn_nbr_idx is not None:
            from .sparse import SparseCNN
            x_cnn = SparseCNN(
                channels=tuple(self.cnn_channels), norm=self.cnn_norm,
                num_graphs=self.num_graphs, name='cnn')(
                x, cnn_nbr_idx, batch=norm_index, mask=mask,
                train=train)
            if self.cnn_into_mlp:
                x = x_cnn
                x_cnn = None
        out, diameter = Stage.__call__(
            self, x, norm_index, pos=pos, node_size=node_size,
            super_index=super_index, num_super=num_super, mask=mask,
            train=train)
        if x_cnn is not None:
            out = jnp.concatenate([out, x_cnn], axis=1)
        return out, diameter

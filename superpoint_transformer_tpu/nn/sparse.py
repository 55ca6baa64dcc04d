"""Sparse 3D CNN for the EZ-SP point encoder (reference
src/nn/sparse.py:14,85 — torchsparse ConvBlock / SparseCNN).

TPU-native: submanifold convolutions consume the per-batch dense
kernel-neighbor table from `ops.voxel_conv.build_sparse_conv_neighbors`
(the host-built rulebook) and reduce to a gather plus one MXU matmul
per block — no scatter, no dynamic shapes.
"""
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .mlp import leaky_relu, xavier_uniform_gain
from .norm import GraphNorm, InstanceNorm, LayerNorm

__all__ = ['SparseConvBlock', 'SparseCNN']

_NORMS = {'graph': GraphNorm, 'instance': InstanceNorm,
          'layer': LayerNorm, None: None, 'none': None}


class SparseConvBlock(nn.Module):
    """conv -> norm -> activation (reference ConvBlock,
    src/nn/sparse.py:14). `nbr_idx` [N, K] indexes the active voxel at
    each kernel offset (-1 = empty site contributes zero)."""
    out_channels: int
    norm: Optional[str] = 'graph'
    activation: bool = True
    residual: bool = False
    num_graphs: int = 1

    @nn.compact
    def __call__(self, x, nbr_idx, batch=None, mask=None, train=True):
        n, c = x.shape
        k = nbr_idx.shape[1]
        valid = nbr_idx >= 0
        idx = jnp.clip(nbr_idx, 0, n - 1)
        gathered = x[idx] * valid[..., None].astype(x.dtype)  # [N,K,C]
        w = self.param(
            'kernel', xavier_uniform_gain(),
            (k * c, self.out_channels))
        y = jnp.einsum(
            'nf,fd->nd', gathered.reshape(n, k * c), w,
            preferred_element_type=jnp.float32)
        norm_cls = _NORMS[self.norm]
        if norm_cls is None:
            y = y + self.param('bias', nn.initializers.zeros,
                               (self.out_channels,))
        else:
            y = norm_cls(self.out_channels, num_graphs=self.num_graphs)(
                y, batch=batch, mask=mask)
        if self.residual:
            y = y + x
        if self.activation:
            y = leaky_relu(y)
        if mask is not None:
            y = y * mask[:, None].astype(y.dtype)
        return y


class SparseCNN(nn.Module):
    """Stack of SparseConvBlocks (reference SparseCNN,
    src/nn/sparse.py:85). `channels` excludes the input dim; all blocks
    share the same kernel-neighbor table (same kernel_size/dilation —
    the EZ-SP configuration)."""
    channels: Sequence[int]
    norm: Optional[str] = 'graph'
    last_norm: bool = True
    last_activation: bool = True
    residual: bool = False
    global_residual: bool = False
    num_graphs: int = 1

    @property
    def out_dim(self):
        return self.channels[-1]

    @nn.compact
    def __call__(self, x, nbr_idx, batch=None, mask=None, train=True):
        x_in = x
        n_blocks = len(self.channels)
        for i, ch in enumerate(self.channels):
            last = i == n_blocks - 1
            x = SparseConvBlock(
                out_channels=ch,
                norm=self.norm if (self.last_norm or not last) else None,
                activation=self.last_activation or not last,
                residual=self.residual and x.shape[1] == ch,
                num_graphs=self.num_graphs,
                name=f'block_{i}')(
                x, nbr_idx, batch=batch, mask=mask, train=train)
        if self.global_residual:
            x = x + x_in
        return x

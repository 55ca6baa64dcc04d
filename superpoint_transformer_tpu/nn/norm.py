"""Normalization layers (flax.linen), masked-and-padded equivalents of
the reference's norms (src/nn/norm.py): GraphNorm / LayerNorm /
InstanceNorm / GroupNorm / BatchNorm and the position-normalizing
UnitSphereNorm.

All index-based norms take `(x, batch, mask)` where `batch` is a graph
id per node and `mask` flags real (non-padding) rows; statistics ignore
padded rows, matching the reference's ragged semantics exactly.
"""
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import (
    segment_sum, segment_count, segment_max, segment_min,
    gather_rows_small)

__all__ = ['GraphNorm', 'LayerNorm', 'InstanceNorm', 'GroupNorm',
           'BatchNorm', 'UnitSphereNorm', 'INDEX_BASED_NORMS']


def _masked(x, mask):
    if mask is None:
        return x, None
    return x * mask[:, None].astype(x.dtype), mask



def _psum(x, axis_name):
    """Cross-shard reduction for norm statistics (no-op when the
    module runs unsharded)."""
    if axis_name is None:
        return x
    import jax
    return jax.lax.psum(x, axis_name)


class GraphNorm(nn.Module):
    """PyG GraphNorm: per-graph mean (scaled by a learnable alpha) and
    variance normalization + affine (reference uses this as the MLP /
    FFN norm via configs/model/semantic/_attention.yaml)."""
    num_features: int
    num_graphs: int = 64  # static upper bound on graphs per batch
    eps: float = 1e-5
    shard_axis: str = None   # psum stats across this mesh axis

    @nn.compact
    def __call__(self, x, batch=None, mask=None):
        C = self.num_features
        weight = self.param('weight', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        alpha = self.param('mean_scale', nn.initializers.ones, (C,))
        if batch is None:
            batch = jnp.zeros(x.shape[0], dtype=jnp.int32)
        g = self.num_graphs

        # single reduction pass over concat(x, x^2): with mu = E[x],
        # E[(x - a*mu)^2] = E[x^2] - 2a*mu*E[x] + (a*mu)^2 — halves
        # the HBM traffic vs the mean-then-centered-var formulation
        # (the reduce over N is the cost; stats are [G, 2C])
        in_dtype = x.dtype
        xm, _ = _masked(x, mask)
        s12 = _psum(segment_sum(
            jnp.concatenate([xm, xm * xm], axis=1), batch, g,
            acc_dtype=jnp.float32), self.shard_axis)
        n = _psum(segment_count(batch, g, mask=mask), self.shard_axis)
        n = jnp.maximum(n, 1).astype(jnp.float32)[:, None]
        C = x.shape[1]
        mean = s12[:, :C] / n
        ex2 = s12[:, C:] / n
        am = alpha * mean
        # clamp: the E[x^2] identity can go slightly negative in fp32
        var = jnp.maximum(ex2 - 2 * am * mean + am * am, 0.0)
        inv = 1.0 / jnp.sqrt(var + self.eps)
        # broadcast per-graph scale/shift via one-hot matmuls: a plain
        # am[batch] gather backpropagates as a serial TPU scatter-add
        # over all N rows (the dominant train-step cost before this);
        # the matmul form keeps both directions on the MXU
        sc = gather_rows_small(inv * weight, batch, g)
        sh = gather_rows_small(bias - am * inv * weight, batch, g)
        out = x.astype(jnp.float32) * sc + sh
        return out.astype(in_dtype)


class LayerNorm(nn.Module):
    """PyG-style LayerNorm (graph mode): normalize each node's features
    by per-graph statistics over all nodes and channels."""
    num_features: int
    num_graphs: int = 64
    eps: float = 1e-5
    mode: str = 'graph'
    shard_axis: str = None

    @nn.compact
    def __call__(self, x, batch=None, mask=None):
        C = self.num_features
        weight = self.param('weight', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        if self.mode == 'node':
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
            out = (x - mean) / jnp.sqrt(var + self.eps)
            return out * weight + bias
        if batch is None:
            batch = jnp.zeros(x.shape[0], dtype=jnp.int32)
        g = self.num_graphs
        n = _psum(segment_count(batch, g, mask=mask),
                  self.shard_axis).astype(x.dtype) * C
        n = jnp.maximum(n, 1)
        xm, _ = _masked(x, mask)
        # single pass over concat(x, x^2) + E[x^2] identity; per-graph
        # scale/shift broadcast as one-hot matmuls (scatter-free vjp)
        s12 = _psum(segment_sum(
            jnp.concatenate([xm, xm * xm], axis=1), batch, g,
            acc_dtype=jnp.float32), self.shard_axis)
        mean = s12[:, :C].sum(-1) / n
        ex2 = s12[:, C:].sum(-1) / n
        var = jnp.maximum(ex2 - mean * mean, 0.0)
        inv = 1.0 / jnp.sqrt(var + self.eps)
        sc = gather_rows_small(inv[:, None], batch, g)
        sh = gather_rows_small((-mean * inv)[:, None], batch, g)
        return (x * sc + sh) * weight + bias


class InstanceNorm(nn.Module):
    """Per-graph, per-channel mean/var normalization."""
    num_features: int
    num_graphs: int = 64
    eps: float = 1e-5
    shard_axis: str = None

    @nn.compact
    def __call__(self, x, batch=None, mask=None):
        C = self.num_features
        weight = self.param('weight', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        if batch is None:
            batch = jnp.zeros(x.shape[0], dtype=jnp.int32)
        g = self.num_graphs

        xm, _ = _masked(x, mask)
        s12 = _psum(segment_sum(
            jnp.concatenate([xm, xm * xm], axis=1), batch, g,
            acc_dtype=jnp.float32), self.shard_axis)
        n = _psum(segment_count(batch, g, mask=mask), self.shard_axis)
        n = jnp.maximum(n, 1).astype(jnp.float32)[:, None]
        mean = s12[:, :C] / n
        var = jnp.maximum(s12[:, C:] / n - mean * mean, 0.0)
        inv = 1.0 / jnp.sqrt(var + self.eps)
        sc = gather_rows_small(inv * weight, batch, g)
        sh = gather_rows_small(bias - mean * inv * weight, batch, g)
        return x.astype(jnp.float32) * sc + sh


class GroupNorm(nn.Module):
    """Graph-wise group normalization (reference src/nn/norm.py:141)."""
    num_features: int
    num_groups: int = 4
    num_graphs: int = 64
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, batch=None, mask=None):
        C, G = self.num_features, self.num_groups
        assert C % G == 0
        weight = self.param('weight', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        if batch is None:
            batch = jnp.zeros(x.shape[0], dtype=jnp.int32)
        gc = C // G
        xg = x.reshape(-1, G, gc)
        n = segment_count(batch, self.num_graphs, mask=mask)
        norm = jnp.maximum(n, 1).astype(x.dtype) * gc
        xm = xg * (mask[:, None, None].astype(x.dtype)
                   if mask is not None else 1)
        mean = segment_sum(xm, batch, self.num_graphs).sum(
            -1, keepdims=True) / norm[:, None, None]
        var = segment_sum(xm * xm, batch, self.num_graphs).sum(
            -1, keepdims=True) / norm[:, None, None] - mean * mean
        var = jnp.maximum(var, 0.0)
        inv = 1.0 / jnp.sqrt(var + self.eps)
        sc = gather_rows_small(inv, batch, self.num_graphs)
        sh = gather_rows_small(-mean * inv, batch, self.num_graphs)
        out = (xg * sc + sh).reshape(-1, C)
        return out * weight + bias


class BatchNorm(nn.Module):
    """1D batch norm over nodes with running stats (reference
    src/nn/norm.py:20). Padded rows excluded from statistics. With
    `shard_axis` set (graph-partition parallelism) the statistics are
    psum'd across node shards — the sync-batchnorm analogue of the
    reference's DDP `sync_batchnorm: True` (configs/trainer/ddp.yaml)."""
    num_features: int
    momentum: float = 0.9
    eps: float = 1e-5
    # accepted for signature parity with the index-based norms
    num_graphs: int = 1
    shard_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, batch=None, mask=None, train: bool = True):
        C = self.num_features
        weight = self.param('weight', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(C))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones(C))
        if train:
            if mask is not None:
                m = mask.astype(x.dtype)[:, None]
                s = (x * m).sum(0)
                ss = (x * x * m).sum(0)
                n = m.sum()
            else:
                s = x.sum(0)
                ss = (x * x).sum(0)
                n = jnp.asarray(x.shape[0], x.dtype)
            if self.shard_axis is not None:
                s = jax.lax.psum(s, self.shard_axis)
                ss = jax.lax.psum(ss, self.shard_axis)
                n = jax.lax.psum(n, self.shard_axis)
            n = jnp.maximum(n, 1)
            mean = s / n
            var = jnp.maximum(ss / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        out = (x - mean) / jnp.sqrt(var + self.eps)
        return out * weight + bias


def unit_sphere_norm(pos, super_index, num_super, node_size=None,
                     mask=None, log_diameter=False,
                     indices_are_sorted=True, shard_axis=None):
    """Normalize same-segment positions into a unit sphere of diameter
    1; returns (normalized pos [N, 3], per-SEGMENT diameter
    [num_super, 1]) (reference UnitSphereNorm, src/nn/norm.py:53).

    Pure function (no parameters); padded nodes (mask False or
    out-of-range super_index) contribute nothing.
    """
    big = jnp.asarray(jnp.finfo(pos.dtype).max, pos.dtype)
    p = pos
    # TPU segment reduces are serial in ROWS (cost is independent of
    # the channel count) -> fold min into the max pass over
    # concat(pos, -pos), and both weighted sums into one pass over
    # concat(pos*w, w): 4 segment ops become 2.
    if mask is not None:
        # exile padded rows so they never win min/max
        p_for_min = jnp.where(mask[:, None], pos, big)
        p_for_max = jnp.where(mask[:, None], pos, -big)
    else:
        p_for_min = p_for_max = pos
    mxmn = segment_max(
        jnp.concatenate([p_for_max, -p_for_min], axis=1),
        super_index, num_super,
        indices_are_sorted=indices_are_sorted)
    mx, mn = mxmn[:, :3], -mxmn[:, 3:]
    if shard_axis is not None:
        # graph-level segments span node shards (parallel/shard_nag.py)
        import jax
        mn = jax.lax.pmin(mn, shard_axis)
        mx = jax.lax.pmax(mx, shard_axis)
    # empty segments produce +/-inf fillers; zero them
    valid_seg = mx[:, 0] > -big * 0.5
    diameter = jnp.where(valid_seg, (mx - mn).max(axis=1), 0.0)

    if node_size is None:
        w = jnp.ones(pos.shape[0], pos.dtype)
    else:
        w = node_size
    if mask is not None:
        w = w * mask.astype(w.dtype)
    sums = segment_sum(
        jnp.concatenate([pos * w[:, None], w[:, None]], axis=1),
        super_index, num_super,
        indices_are_sorted=indices_are_sorted)
    sums = _psum(sums, shard_axis)
    wsum, wtot = sums[:, :3], sums[:, 3]
    center = wsum / jnp.maximum(wtot, 1e-12)[:, None]
    si = jnp.clip(super_index, 0, num_super - 1)
    out = (pos - center[si]) / (diameter[si][:, None] + 1e-2)
    d = diameter[:, None]
    if log_diameter:
        d = jnp.log(d + 1)
    return out, d


class UnitSphereNorm(nn.Module):
    """Module wrapper over `unit_sphere_norm` for API parity."""
    log_diameter: bool = False

    def __call__(self, pos, super_index, num_super, node_size=None,
                 mask=None):
        return unit_sphere_norm(
            pos, super_index, num_super, node_size=node_size, mask=mask,
            log_diameter=self.log_diameter)


INDEX_BASED_NORMS = (GraphNorm, LayerNorm, InstanceNorm, GroupNorm)

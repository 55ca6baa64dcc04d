"""Device-side (XLA) preprocessing kernels: voxel grid sampling and
grid-hash fixed-radius KNN with STATIC padded capacities, so the whole
front of the preprocessing pipeline (voxelize -> KNN -> eigenfeatures,
the three heaviest host stages) can run jitted on TPU.

These are the TPU-native equivalents of the reference's
`GridSampling3D` (src/transforms/sampling.py:86, torch_cluster
`grid_cluster`) and FRNN `frnn_grid_points` (src/utils/neighbors.py:24)
— redesigned around sort + segment ops + searchsorted windows instead
of CUDA hash tables, because XLA wants static shapes and fused
gather/reduce, not dynamic allocation.

Shapes: inputs padded to a static point capacity with a validity mask;
outputs padded to a static voxel capacity. One compiled program per
(capacity, k) bucket.

The host pipeline (`transforms.preprocess`) stays the default — on the
single-chip dev tunnel, D2H readbacks dominate — but
`preprocess_cloud(device_stages=True)` routes through these kernels,
which is the intended deployment path on real TPU hosts.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['voxelize_device', 'grid_knn_device']

# 21 bits per axis -> 63-bit linearized cell key (fits int64)
_AXIS_BITS = 21
_AXIS_SPAN = 1 << _AXIS_BITS


def _cell_keys(pos, size, valid):
    """Linearized voxel-cell key per point; invalid points get the
    largest key so they sort to the tail."""
    cell = jnp.floor(pos / size).astype(jnp.int64)
    cell = cell - jnp.min(jnp.where(valid[:, None], cell,
                                    jnp.iinfo(jnp.int32).max), axis=0)
    # zero invalid cells BEFORE packing so the int64 key can't overflow
    # (their key is overwritten below anyway)
    cell = jnp.where(valid[:, None], cell, 0)
    key = (cell[:, 0] * _AXIS_SPAN + cell[:, 1]) * _AXIS_SPAN \
        + cell[:, 2]
    return jnp.where(valid, key, jnp.iinfo(jnp.int64).max), cell


def voxelize_device(pos, feats, valid, size, voxel_cap):
    """Public wrapper: runs the jitted kernel under jax.enable_x64 so
    the 63-bit cell keys survive when the process default is x32
    (int64 key math is a handful of sorts/compares — fine under
    TPU's emulated s64)."""
    with jax.enable_x64(True):
        return _voxelize_device(pos, feats, valid, size,
                                voxel_cap=voxel_cap)


@partial(jax.jit, static_argnames=('voxel_cap',))
def _voxelize_device(pos, feats, valid, size, voxel_cap):
    """Voxel grid sampling on device (GridSampling3D analogue).

    :param pos: [N, 3] float32, padded
    :param feats: [N, F] float32 per-point features to average (pass
        F=0 array if none)
    :param valid: [N] bool mask of real points
    :param size: float voxel size
    :param voxel_cap: static output capacity (>= number of voxels)
    :return: dict with
        pos_mean    [voxel_cap, 3] per-voxel mean position
        feat_mean   [voxel_cap, F]
        counts      [voxel_cap] int32 (0 on padding)
        num_voxels  [] int32
        super_index [N] int32 voxel id per input point (input order;
                    -1 on padding)
    """
    n = pos.shape[0]
    key, _ = _cell_keys(pos, size, valid)
    order = jnp.argsort(key)
    k_sorted = key[order]
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        k_sorted[1:] != k_sorted[:-1]])
    valid_sorted = valid[order]
    first = first & valid_sorted
    seg_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_sorted = jnp.where(valid_sorted, seg_sorted, voxel_cap - 1)
    num_voxels = jnp.sum(first.astype(jnp.int32))

    # per-point voxel id back in input order
    super_index = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.where(valid_sorted, seg_sorted, -1))

    w = valid_sorted.astype(jnp.float32)
    counts = jax.ops.segment_sum(
        w, seg_sorted, num_segments=voxel_cap,
        indices_are_sorted=True)
    denom = jnp.maximum(counts, 1.0)[:, None]
    pos_mean = jax.ops.segment_sum(
        pos[order] * w[:, None], seg_sorted, num_segments=voxel_cap,
        indices_are_sorted=True) / denom
    feat_mean = jax.ops.segment_sum(
        feats[order] * w[:, None], seg_sorted,
        num_segments=voxel_cap, indices_are_sorted=True) / denom
    return dict(pos_mean=pos_mean, feat_mean=feat_mean,
                counts=counts.astype(jnp.int32),
                num_voxels=num_voxels, super_index=super_index)


def grid_knn_device(pos, valid, r, k, cell_cap=16, chunk=16384,
                    exclude_self=True, cell_size=None, reach=1):
    """Public wrapper: see `_grid_knn_device`; runs under
    enable_x64 for the 63-bit cell keys."""
    with jax.enable_x64(True):
        return _grid_knn_device(
            pos, valid, r, k, cell_cap=cell_cap, chunk=chunk,
            exclude_self=exclude_self, cell_size=cell_size,
            reach=reach)


@partial(jax.jit,
         static_argnames=('k', 'cell_cap', 'chunk', 'exclude_self',
                          'reach'))
def _grid_knn_device(pos, valid, r, k, cell_cap=16, chunk=16384,
                    exclude_self=True, cell_size=None, reach=1):
    """Fixed-radius KNN via a uniform grid (FRNN analogue, reference
    src/utils/neighbors.py:24): sort points by cell, then for every
    query scan the (2*reach+1)^3 neighboring cells through
    searchsorted windows capped at `cell_cap` candidates per cell, and
    keep the k nearest within r. Queries are processed in `chunk`-size
    blocks with lax.map to bound the candidate tile in VMEM/HBM.

    `cell_size` defaults to r/reach — the smallest size whose
    `reach`-window is guaranteed to cover the whole r-ball. When the
    search radius is much larger than the typical k-NN distance (the
    SPT preprocessing regime: k=45 within r_max=2m of ~3cm voxels),
    pick a small `cell_size` from the point density and a `reach` that
    covers where the k nearest realistically live; candidates outside
    the window are simply not returned (the host ring-expansion path
    is the exact fallback).

    Returns (nbr [N, k] int32 with -1 padding, dist [N, k] float32 with
    +inf padding), in input order. A denser-than-`cell_cap` cell
    truncates candidates (matches FRNN's max-points-per-cell grid
    behavior; pick cell_cap >= expected max points per cell).
    """
    n = pos.shape[0]
    if cell_size is None:
        cell_size = r / reach
    key, cell = _cell_keys(pos, cell_size, valid)
    order = jnp.argsort(key)
    k_sorted = key[order]
    pos_sorted = pos[order]
    valid_sorted = valid[order]

    # (2*reach+1)^3 neighbor-cell key offsets
    rng_off = range(-reach, reach + 1)
    offs = jnp.asarray(
        [(dx * _AXIS_SPAN + dy) * _AXIS_SPAN + dz
         for dx in rng_off for dy in rng_off
         for dz in rng_off], jnp.int64)

    r2 = jnp.asarray(r * r, jnp.float32)
    arange_cc = jnp.arange(cell_cap)

    def one_chunk(args):
        q_pos, q_key, q_idx, q_valid = args
        nk = q_key[:, None] + offs[None, :]              # [C, 27]
        start = jnp.searchsorted(k_sorted, nk)           # [C, 27]
        end = jnp.searchsorted(k_sorted, nk, side='right')
        end = jnp.minimum(end, start + cell_cap)
        cand = start[:, :, None] + arange_cc[None, None, :]
        ok = cand < end[:, :, None]                      # [C,27,cc]
        cand = jnp.clip(cand, 0, n - 1)
        cshape = cand.shape
        cand = cand.reshape(cshape[0], -1)               # [C, 27*cc]
        ok = ok.reshape(cshape[0], -1)
        cpos = pos_sorted[cand]                          # [C,27cc,3]
        d2 = jnp.sum((cpos - q_pos[:, None, :]) ** 2, -1)
        ok = ok & valid_sorted[cand] & (d2 <= r2) \
            & q_valid[:, None]
        sorted_ids = order[cand]                         # input order
        if exclude_self:
            ok = ok & (sorted_ids != q_idx[:, None])
        d2 = jnp.where(ok, d2, jnp.inf)
        neg, top_i = jax.lax.top_k(-d2, k)
        dist = jnp.sqrt(-neg)
        nbr = jnp.take_along_axis(sorted_ids, top_i, axis=1)
        nbr = jnp.where(jnp.isfinite(dist), nbr, -1)
        return nbr.astype(jnp.int32), dist.astype(jnp.float32)

    pad = (-n) % chunk
    q_pos = jnp.pad(pos, ((0, pad), (0, 0)))
    q_key = jnp.pad(key, (0, pad),
                    constant_values=jnp.iinfo(jnp.int64).max)
    q_idx = jnp.pad(jnp.arange(n), (0, pad), constant_values=-1)
    q_valid = jnp.pad(valid, (0, pad))
    n_chunks = (n + pad) // chunk
    reshape = lambda a: a.reshape((n_chunks, chunk) + a.shape[1:])
    nbr, dist = jax.lax.map(
        one_chunk, (reshape(q_pos), reshape(q_key), reshape(q_idx),
                    reshape(q_valid)))
    return (nbr.reshape(-1, k)[:n], dist.reshape(-1, k)[:n])

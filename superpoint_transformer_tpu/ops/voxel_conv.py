"""Submanifold sparse-convolution support (EZ-SP point CNN; reference
uses torchsparse spnn.Conv3d, src/nn/sparse.py:6-7, over quantized
voxel coordinates from QuantizePointCoordinates,
src/transforms/sampling.py:507).

TPU-native design: torchsparse builds gather/scatter rulebooks on GPU
per conv call. Here the rulebook is built ONCE per batch on the host as
a dense kernel-neighbor table `[N, K^3]` (int32, -1 = no voxel at that
offset), and the convolution on device is a single gather + one MXU
matmul:

    y = einsum('nkc,kcd->nd', x[nbr], W)    # [N, K^3, C] @ [K^3*C, D]

All blocks with the same (kernel_size, dilation) share the table, so a
depth-3 CNN costs one host-side sorted join + 3 batched matmuls.
The join is numpy-vectorized: voxel coords are encoded into int64 keys,
sorted once, and each of the K^3 offsets is resolved with one
searchsorted over the sorted keys.
"""
import numpy as np

__all__ = ['build_sparse_conv_neighbors', 'kernel_offsets']


def kernel_offsets(kernel_size=3, dilation=1):
    """[K^3, 3] int offsets of a cubic kernel, centered, scaled by
    dilation. Matches submanifold conv: output sites = input sites."""
    k = int(kernel_size)
    r = np.arange(k) - (k - 1) // 2
    off = np.stack(np.meshgrid(r, r, r, indexing='ij'),
                   axis=-1).reshape(-1, 3)
    return off * int(dilation)


def build_sparse_conv_neighbors(coords, kernel_size=3, dilation=1,
                                batch=None):
    """For each active voxel, the index of the active voxel at each
    kernel offset (or -1).

    :param coords: [N, 3] integer voxel coordinates (unique per batch
        item)
    :param batch: [N] optional graph id — voxels only see neighbors of
        the same graph
    :return: nbr [N, K^3] int32, -1 where the offset voxel is inactive
    """
    coords = np.asarray(coords, dtype=np.int64)
    n = coords.shape[0]
    off = kernel_offsets(kernel_size, dilation)
    K = off.shape[0]
    if n == 0:
        return np.zeros((0, K), dtype=np.int32)

    cmin = coords.min(axis=0)
    c = coords - cmin                      # nonnegative
    span = c.max(axis=0) + 2 * np.abs(off).max() + 2
    mult = np.array([span[1] * span[2], span[2], 1], dtype=np.int64)
    base = int(np.abs(off).max())
    c = c + base                           # keep offsets nonnegative
    keys = c @ mult
    if batch is not None:
        b = np.asarray(batch, dtype=np.int64)
        keys = keys + b * int(span.prod() + 1)
    order = np.argsort(keys)
    sorted_keys = keys[order]

    nbr = np.empty((n, K), dtype=np.int32)
    for j in range(K):
        qk = keys + off[j] @ mult
        pos = np.searchsorted(sorted_keys, qk)
        pos_c = np.clip(pos, 0, n - 1)
        hit = sorted_keys[pos_c] == qk
        nbr[:, j] = np.where(hit, order[pos_c], -1).astype(np.int32)
    return nbr

"""Graph-component algorithms for the EZ-SP learned partition
(reference: torch-graph-components wheels used from
src/utils/components.py:3-5 — `wcc_by_max_propagation`,
`merge_components_by_contour_prior`, `component_graph`).

TPU-native design: connected components run as an XLA while_loop of
label max-propagations over the edge list (segment_max), so they can
execute inside jit on padded graphs. The greedy contour-prior merge is
combinatorial and sequential by nature; it dispatches to the C++ host
solver (native/greedy_cut.cpp) which implements the same energy

    E(P) = sum_c  sum_{i in c} s_i ||x_i - mu_c||^2  +  reg * |contour|

with |contour| the total weight of inter-component edges — merging two
components is accepted while it decreases E, then undersized
components (< min_size) are merged into their best neighbor.
"""
import numpy as np

import jax
import jax.numpy as jnp

from .native import greedy_cut

__all__ = [
    'wcc_by_max_propagation', 'wcc_by_max_propagation_np',
    'component_graph_np', 'merge_components_by_contour_prior_np',
    'connect_isolated_knn_np',
]


def wcc_by_max_propagation(num_nodes, edge_index, edge_mask=None,
                           max_iterations=-1):
    """Weakly-connected components by iterative label max-propagation —
    jittable (static `num_nodes`; padded edges masked out).

    Each node starts with label = its own id; every round, each node
    takes the max label over itself and its neighbors (both edge
    directions); converged when no label changes. Doubling-style
    propagation (label[i] <- label[label[i]]) shortcuts long chains so
    the loop converges in O(log N) rounds on path graphs.

    Returns int32 [num_nodes] labels where each component is labeled by
    its max member id (NOT consecutive — see `consecutive_np`).
    """
    src, dst = edge_index[0], edge_index[1]
    if edge_mask is None:
        edge_mask = jnp.ones(src.shape[0], dtype=bool)
    # out-of-range scatter drops: route masked edges to num_nodes
    srcm = jnp.where(edge_mask, src, num_nodes)
    dstm = jnp.where(edge_mask, dst, num_nodes)
    max_it = max_iterations if max_iterations > 0 else num_nodes

    def body(state):
        labels, _, it = state
        up = jnp.maximum(
            jax.ops.segment_max(labels[dst], srcm,
                                num_segments=num_nodes),
            jax.ops.segment_max(labels[src], dstm,
                                num_segments=num_nodes))
        new = jnp.maximum(labels, up)
        # pointer-jumping: adopt the label of your current root
        new = jnp.maximum(new, new[new])
        return new, jnp.any(new != labels), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_it)

    labels0 = jnp.arange(num_nodes, dtype=jnp.int32)
    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.asarray(True), jnp.asarray(0)))
    return labels


def consecutive_np(labels):
    """Relabel to consecutive 0..C-1 preserving first-occurrence order
    of the sorted label values."""
    uniq, inv = np.unique(np.asarray(labels), return_inverse=True)
    return inv.astype(np.int64), int(uniq.shape[0])


def wcc_by_max_propagation_np(num_nodes, edge_index, max_iterations=-1):
    """Host wrapper: jax propagation + consecutive relabel.
    Returns (super_index [N] int64, n_components)."""
    if edge_index.shape[1] == 0:
        return np.arange(num_nodes, dtype=np.int64), num_nodes
    labels = wcc_by_max_propagation(
        int(num_nodes), jnp.asarray(edge_index, jnp.int32),
        max_iterations=max_iterations)
    return consecutive_np(labels)


def component_graph_np(super_index, edge_index, edge_weight=None,
                       reduce='add', no_self_loops=True):
    """Contract a node graph to its component graph: map endpoints
    through `super_index`, drop (optionally) self-loops, coalesce
    duplicate edges with `reduce` (add/mean/max/min/mul).

    Returns (edge_index_cp [2, E'], edge_weight_cp [E']). Matches the
    behavior of torch_graph_components.merge.component_graph used by
    merge_components_by_contour_prior_on_data (reference
    src/utils/components.py:99)."""
    I = np.asarray(super_index)
    src, dst = I[edge_index[0]], I[edge_index[1]]
    w = np.ones(src.shape[0], dtype=np.float32) if edge_weight is None \
        else np.asarray(edge_weight, dtype=np.float32).reshape(-1)
    if no_self_loops:
        keep = src != dst
        src, dst, w = src[keep], dst[keep], w[keep]
    if src.shape[0] == 0:
        return np.zeros((2, 0), dtype=np.int64), w[:0]
    # undirected coalesce on (min, max) keys
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    n = int(I.max()) + 1 if I.size else 0
    key = lo.astype(np.int64) * max(n, 1) + hi
    order = np.argsort(key, kind='stable')
    key, lo, hi, w = key[order], lo[order], hi[order], w[order]
    first = np.ones(key.shape[0], dtype=bool)
    first[1:] = key[1:] != key[:-1]
    gid = np.cumsum(first) - 1
    n_out = int(gid[-1]) + 1
    if reduce == 'add':
        w_out = np.zeros(n_out, w.dtype)
        np.add.at(w_out, gid, w)
    elif reduce == 'mean':
        w_out = np.zeros(n_out, w.dtype)
        cnt = np.zeros(n_out, np.int64)
        np.add.at(w_out, gid, w)
        np.add.at(cnt, gid, 1)
        w_out = w_out / np.maximum(cnt, 1)
    elif reduce == 'max':
        w_out = np.full(n_out, -np.inf, w.dtype)
        np.maximum.at(w_out, gid, w)
    elif reduce == 'min':
        w_out = np.full(n_out, np.inf, w.dtype)
        np.minimum.at(w_out, gid, w)
    elif reduce == 'mul':
        w_out = np.ones(n_out, w.dtype)
        np.multiply.at(w_out, gid, w)
    else:
        raise ValueError(f"unknown reduce '{reduce}'")
    ei = np.stack([lo[first], hi[first]]).astype(np.int64)
    return ei, w_out


def merge_components_by_contour_prior_np(
        x, size, edge_index, edge_weight, reg, min_size,
        merge_only_small=False, pos=None, k=0, w_adjacency=0.0,
        edge_reduce='add'):
    """Greedy contour-prior component merging (EZ-SP; reference
    src/utils/components.py:11 `merge_components_by_contour_prior_on_data`).

    Inputs describe the COMPONENT graph: per-component mean features
    `x` [C, D], sizes `size` [C], trimmed `edge_index` [2, E] with
    weights. Components are merged while the merge decreases the
    energy (unless `merge_only_small`), then every component smaller
    than `min_size` is merged into its best neighbor. If `k > 0`,
    isolated components are first connected to their k nearest
    neighbors in `pos` space so small isolated pieces can still merge.

    Returns (merged_labels [C] int64, n_merged,
             (x_m, size_m, edge_index_m, edge_weight_m, pos_m)).
    """
    x = np.asarray(x, np.float32)
    size = np.asarray(size, np.float32).reshape(-1)
    n = x.shape[0]
    ei, w = edge_index, edge_weight
    if k > 0 and pos is not None:
        ei, w = connect_isolated_knn_np(ei, w, np.asarray(pos), k,
                                        w_adjacency)
    # merge_only_small: suppress gain-positive merging by zeroing the
    # contour reward; the min-size phase still merges by best gain.
    reg_eff = 0.0 if merge_only_small else float(reg)
    labels, n_merged = greedy_cut(
        x, ei, edge_weight=w, node_weight=size,
        reg=reg_eff, cutoff=float(min_size))
    size_m = np.zeros(n_merged, np.float32)
    np.add.at(size_m, labels, size)
    x_m = np.zeros((n_merged, x.shape[1]), np.float32)
    np.add.at(x_m, labels, x * size[:, None])
    x_m /= np.maximum(size_m[:, None], 1e-12)
    pos_m = None
    if pos is not None:
        pos = np.asarray(pos, np.float32)
        pos_m = np.zeros((n_merged, pos.shape[1]), np.float32)
        np.add.at(pos_m, labels, pos * size[:, None])
        pos_m /= np.maximum(size_m[:, None], 1e-12)
    ei_m, w_m = component_graph_np(labels, ei, w, reduce=edge_reduce)
    return labels, n_merged, (x_m, size_m, ei_m, w_m, pos_m)


def connect_isolated_knn_np(edge_index, edge_weight, pos, k,
                            w_adjacency=0.0):
    """Connect isolated nodes (degree 0) to their k nearest neighbors
    in `pos` space; new edge weights are 1 if `w_adjacency <= 0` else
    `1 / (w_adjacency + d / mean(d))` (reference
    torch_graph_components merge `k`/`w_adjacency` semantics)."""
    from .native import radius_knn
    n = pos.shape[0]
    deg = np.zeros(n, np.int64)
    if edge_index.shape[1]:
        np.add.at(deg, edge_index[0], 1)
        np.add.at(deg, edge_index[1], 1)
    iso = np.where(deg == 0)[0]
    if iso.size == 0 or n < 2:
        return edge_index, edge_weight
    kk = min(k, n - 1)
    # query +1 neighbor: the queries are members of the search set, so
    # their nearest hit is themselves — dropped below
    nbr, dist = radius_knn(pos.astype(np.float32),
                           pos[iso].astype(np.float32),
                           r=np.inf, k=kk + 1, exclude_self=False)
    src = np.repeat(iso, kk + 1)
    dst = nbr.reshape(-1).astype(np.int64)
    d = dist.reshape(-1)
    keep = (dst >= 0) & (dst != src) & np.isfinite(d)
    src, dst, d = src[keep], dst[keep], d[keep]
    if w_adjacency > 0 and d.size:
        w_new = 1.0 / (w_adjacency + d / max(d.mean(), 1e-12))
    else:
        w_new = np.ones(src.shape[0], np.float32)
    ei = np.concatenate([edge_index, np.stack([src, dst])], axis=1)
    w = np.concatenate([
        np.asarray(edge_weight, np.float32).reshape(-1),
        w_new.astype(np.float32)])
    return ei, w

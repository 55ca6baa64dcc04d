"""Graph-partition-parallel sharding of a NAG across devices — the
framework's analogue of context/sequence parallelism for giant tiles
(SURVEY §2.11 / BASELINE 'Multi-host streaming': the reference has no
equivalent; its answer to scale is tiling).

Sharding scheme (host side, once per batch):
  1. the TOP level's nodes are split into `n_dev` contiguous chunks
     (nodes arrive sorted by super_index => spatially coherent);
  2. every lower-level node is assigned to its PARENT's device, so
     pooling / unpooling / UnitSphereNorm stay device-local;
  3. horizontal-attention neighbor ids are rewritten to GLOBAL slots
     (device * capacity + local slot); at each attention layer the
     devices all_gather their (small) k/v node tables and gather
     locally — the only cross-device traffic, O(N_level * C) on ICI.

Per-graph norm statistics are psum'd across the shard axis inside the
norms themselves (see nn/norm.py `shard_axis`).

Returns per-device PaddedNAGs stacked leaf-wise: leaves have a leading
[n_dev, ...] axis ready for `shard_map` over a ('shard',) mesh.
"""
import numpy as np
import jax.numpy as jnp

from ..data.pad import PaddedLevel, PaddedNAG, bucket

__all__ = ['shard_padded_nag']


def _pad_to(a, n, fill=0):
    if a.shape[0] == n:
        return a
    width = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, width, constant_values=fill)


def shard_padded_nag(nag, n_dev, num_classes=None):
    """Shard a host NAG into a device-stacked PaddedNAG.

    :param nag: host NAG (batched, sorted by super_index, transforms
        complete — same precondition as pad_nag)
    :param n_dev: number of devices on the 'shard' mesh axis
    :return: PaddedNAG whose leaves are [n_dev, ...] stacked
    """
    from ..data.pad import sort_nag_by_super
    from ..ops.graph import edges_to_dense_neighbors
    nag = sort_nag_by_super(nag)

    # --- assign nodes to devices, top-down --------------------------------
    assign = {}
    top = nag.end_i_level
    n_top = nag[top].num_nodes
    # contiguous split of the top level
    bounds = np.linspace(0, n_top, n_dev + 1).astype(np.int64)
    a = np.zeros(n_top, np.int32)
    for d in range(n_dev):
        a[bounds[d]:bounds[d + 1]] = d
    assign[top] = a
    for i in range(top - 1, nag.start_i_level - 1, -1):
        assign[i] = assign[i + 1][nag[i].super_index]

    # --- per-level shard construction -------------------------------------
    levels = []
    caps = {}
    local_of = {}   # level -> (device, local slot) per global node
    for i in nag.levels:
        counts = np.bincount(assign[i], minlength=n_dev)
        caps[i] = bucket(int(counts.max()))
        a = assign[i]
        n = a.shape[0]
        order = np.argsort(a, kind='stable')
        starts = np.zeros(n_dev + 1, np.int64)
        np.cumsum(np.bincount(a, minlength=n_dev), out=starts[1:])
        local = np.empty(n, np.int64)
        local[order] = np.arange(n) - starts[a[order]]
        local_of[i] = (a, local)
    for i in nag.levels:
        d_level = nag[i]
        n = d_level.num_nodes
        a, local = local_of[i]
        cap = caps[i]
        order = np.argsort(a, kind='stable')
        starts = np.zeros(n_dev + 1, np.int64)
        np.cumsum(np.bincount(a, minlength=n_dev), out=starts[1:])

        per_dev = dict(pos=[], node_mask=[], batch=[], num_nodes=[],
                       x=[], node_size=[], super_index=[], y=[],
                       nbr_idx=[], nbr_mask=[], edge_feat=[])
        has = {k: False for k in per_dev}

        # global slot ids for neighbors: dev * cap + local
        gslot = a.astype(np.int64) * cap + local

        if i > nag.start_i_level and d_level.get('edge_index') is not None \
                and d_level.num_edges > 0:
            nbr_idx, nbr_mask, edge_id = edges_to_dense_neighbors(
                d_level.edge_index, n)
            nbr_global = np.where(nbr_mask, gslot[nbr_idx], 0)
            ea = d_level.get('edge_attr')
        else:
            nbr_idx = nbr_mask = nbr_global = edge_id = ea = None

        for d in range(n_dev):
            sel = order[starts[d]:starts[d + 1]]
            nd = sel.shape[0]
            pad = cap - nd
            per_dev['pos'].append(_pad_to(
                np.asarray(d_level.pos, np.float32)[sel], cap))
            m = np.zeros(cap, bool)
            m[:nd] = True
            per_dev['node_mask'].append(m)
            b = np.full(cap, -1, np.int32)
            bv = d_level.get('batch')
            b[:nd] = (bv[sel] if bv is not None else 0)
            per_dev['batch'].append(b)
            per_dev['num_nodes'].append(np.asarray(nd, np.int32))

            x = d_level.get('x')
            if x is not None:
                has['x'] = True
                per_dev['x'].append(_pad_to(
                    np.asarray(x, np.float32)[sel], cap))
            ns = d_level.get('node_size')
            if ns is not None:
                has['node_size'] = True
                per_dev['node_size'].append(_pad_to(
                    np.asarray(ns, np.float32).reshape(-1)[sel], cap))
            if i < nag.end_i_level:
                has['super_index'] = True
                pa, plocal = local_of[i + 1]
                si = d_level.super_index[sel]
                # parents are on the SAME device by construction;
                # local parent slot (out-of-range for padded rows)
                siv = np.full(cap, caps[i + 1], np.int32)
                siv[:nd] = plocal[si].astype(np.int32)
                per_dev['super_index'].append(siv)
            y = d_level.get('y')
            if y is not None:
                yy = np.asarray(y)
                if yy.ndim == 1 and num_classes is not None:
                    h = np.zeros((n, num_classes + 1), np.float32)
                    valid = (yy >= 0) & (yy <= num_classes)
                    h[np.arange(n)[valid], yy[valid]] = 1.0
                    yy = h
                has['y'] = True
                per_dev['y'].append(_pad_to(
                    yy.astype(np.float32)[sel], cap))
            if nbr_idx is not None:
                has['nbr_idx'] = has['nbr_mask'] = True
                per_dev['nbr_idx'].append(_pad_to(
                    nbr_global[sel].astype(np.int32), cap))
                per_dev['nbr_mask'].append(_pad_to(nbr_mask[sel], cap))
                if ea is not None:
                    has['edge_feat'] = True
                    ef = np.asarray(ea, np.float32)[edge_id[sel]] \
                        * nbr_mask[sel][..., None]
                    per_dev['edge_feat'].append(_pad_to(ef, cap))

        kw = {}
        for k in ('x', 'node_size', 'super_index', 'y', 'nbr_idx',
                  'nbr_mask', 'edge_feat'):
            if has[k]:
                kw[k] = jnp.asarray(np.stack(per_dev[k]))
        levels.append(PaddedLevel(
            pos=jnp.asarray(np.stack(per_dev['pos'])),
            node_mask=jnp.asarray(np.stack(per_dev['node_mask'])),
            batch=jnp.asarray(np.stack(per_dev['batch'])),
            num_nodes=jnp.asarray(np.stack(per_dev['num_nodes'])),
            **kw))
    return PaddedNAG(levels=tuple(levels),
                     start_i_level=nag.start_i_level, num_graphs=1)

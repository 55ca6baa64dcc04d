"""Reference-grade superedge construction (host / numpy).

Re-implements the reference's horizontal-graph machinery
(/root/reference/src/utils/graph.py:99 `subedges`,
/root/reference/src/utils/scatter.py:128 `scatter_nearest_neighbor`,
/root/reference/src/utils/neighbors.py:491 `cluster_radius_nn_graph`)
as vectorized numpy over CSR segment layouts:

  1. candidate segment pairs: KNN over segment bbox centers with a
     conservative search radius, pruned by bbox radii, refined by
     iterative anchor nearest-neighbor search, kept if the anchor
     distance is within `gap`;
  2. subedges: for each segment pair, project both segments' points
     into the anchor basis, apply halfspace + bbox-intersection
     filters, keep the top ratio.size (>= k_min) points nearest the
     anchors, sort both sides along their first principal component
     (with the reference's target flip heuristic), and pair them up;
  3. features: per-edge mean offset, std of offsets in a basis built
     around the mean offset, and sqrt of the mean subedge distance
     (src/transforms/graph.py:957 _minimalistic_horizontal_edge_features).

All group reductions ride sorted-uid layouts (lexsort + reduceat) —
no python loops over edges.
"""
import numpy as np

from .graph import to_trimmed_np

__all__ = [
    'base_vectors_3d_np', 'scatter_nearest_neighbor_np',
    'cluster_radius_nn_graph_np', 'subedges_np',
    'minimalistic_edge_features_np', 'largest_eig3_np',
]


def base_vectors_3d_np(x):
    """Orthonormal basis per 3D vector: first axis along x, the other
    two span the orthogonal plane (reference utils/geometry.py:42)."""
    x = np.asarray(x, dtype=np.float64)
    a = x.copy()
    n = np.linalg.norm(a, axis=1)
    a[n == 0] = [1.0, 0.0, 0.0]
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = np.stack([a[:, 1] - a[:, 2], a[:, 2] - a[:, 0],
                  a[:, 0] - a[:, 1]], axis=1)
    nb = np.linalg.norm(b, axis=1)
    b[nb == 0] = [2.0, 1.0, -1.0]
    # re-orthogonalize the fallback rows against a
    b -= (b * a).sum(1, keepdims=True) * a
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    c = np.cross(a, b)
    return np.stack([a, b, c], axis=1)  # [N, 3 (basis), 3 (xyz)]


def _segment_csr(index, num_segments):
    """(order, ptr): point ids grouped by segment + CSR pointers."""
    order = np.argsort(index, kind='stable')
    counts = np.bincount(index, minlength=num_segments)
    ptr = np.zeros(num_segments + 1, dtype=np.int64)
    np.cumsum(counts, out=ptr[1:])
    return order, ptr


def _edge_wise_points(order, ptr, seg_ids):
    """Expand per-edge endpoint segments to flat point rows.

    Returns (point ids [M], edge uid [M], out_ptr [E+1]); rows are
    grouped by edge in edge order (uid ascending)."""
    sizes = ptr[seg_ids + 1] - ptr[seg_ids]
    out_ptr = np.zeros(seg_ids.shape[0] + 1, dtype=np.int64)
    np.cumsum(sizes, out=out_ptr[1:])
    uid = np.repeat(np.arange(seg_ids.shape[0]), sizes)
    rel = np.arange(out_ptr[-1], dtype=np.int64) - out_ptr[uid]
    idx = order[ptr[seg_ids][uid] + rel]
    return idx, uid, out_ptr


def _group_first_of_sorted(order, uid, ptr):
    """First element (by a lexsort order) of each uid group; `order`
    must be a permutation sorting rows by (uid, key)."""
    return order[ptr[:-1]]


def largest_eig3_np(cov):
    """Deterministic largest-eigenvalue eigenvector of symmetric 3x3
    matrices [E, 3, 3] (closed-form trigonometric eigenvalue + row
    cross-products for the eigenvector). Sign-canonicalized so the
    largest-|entry| component is positive — shared semantics with the
    native C++ twin (native/subedges.cpp), unlike np.linalg.eigh whose
    eigenvector signs are implementation-defined."""
    c = np.asarray(cov, dtype=np.float64)
    E = c.shape[0]
    c00, c11, c22 = c[:, 0, 0], c[:, 1, 1], c[:, 2, 2]
    c01, c02, c12 = c[:, 0, 1], c[:, 0, 2], c[:, 1, 2]
    p1 = c01 ** 2 + c02 ** 2 + c12 ** 2
    q = (c00 + c11 + c22) / 3.0
    p2 = (c00 - q) ** 2 + (c11 - q) ** 2 + (c22 - q) ** 2 + 2.0 * p1
    p = np.sqrt(np.maximum(p2 / 6.0, 0.0))
    safe_p = np.where(p > 0, p, 1.0)
    b = (c - q[:, None, None] * np.eye(3)) / safe_p[:, None, None]
    detb = (b[:, 0, 0] * (b[:, 1, 1] * b[:, 2, 2] - b[:, 1, 2] ** 2)
            - b[:, 0, 1] * (b[:, 0, 1] * b[:, 2, 2]
                            - b[:, 1, 2] * b[:, 0, 2])
            + b[:, 0, 2] * (b[:, 0, 1] * b[:, 1, 2]
                            - b[:, 1, 1] * b[:, 0, 2]))
    r = np.clip(detb / 2.0, -1.0, 1.0)
    lam = q + 2.0 * p * np.cos(np.arccos(r) / 3.0)
    # eigenvector: cross products of rows of (C - lam I); take the
    # most independent pair (largest cross norm)
    a = c - lam[:, None, None] * np.eye(3)
    cr = np.stack([np.cross(a[:, 0], a[:, 1]),
                   np.cross(a[:, 0], a[:, 2]),
                   np.cross(a[:, 1], a[:, 2])], axis=1)  # [E, 3, 3]
    norms = np.einsum('eij,eij->ei', cr, cr)
    best = np.argmax(norms, axis=1)
    v = cr[np.arange(E), best]
    nv = np.sqrt(np.einsum('ei,ei->e', v, v))
    degenerate = (nv <= 1e-30) | (p2 <= 0)
    v = np.where(degenerate[:, None], [1.0, 0.0, 0.0],
                 v / np.where(nv > 0, nv, 1.0)[:, None])
    # canonical sign: the largest-|entry| component is positive
    pick = np.argmax(np.abs(v), axis=1)
    sgn = np.sign(v[np.arange(E), pick])
    sgn = np.where(sgn == 0, 1.0, sgn)
    return v * sgn[:, None]


def scatter_nearest_neighbor_np(points, index, edge_index, cycles=3,
                                csr=None, use_native=True):
    """Approximate closest point pair ("anchors") per segment pair
    (reference src/utils/scatter.py:128). Returns [2, E] point ids."""
    num_segments = int(index.max()) + 1
    order, ptr = csr if csr is not None else _segment_csr(
        index, num_segments)
    if use_native and edge_index.shape[1] > 0:
        from .native import anchor_nn
        out = anchor_nn(points, order, ptr, edge_index, cycles=cycles)
        if out is not None:
            return out
    s_idx, t_idx = edge_index[0], edge_index[1]
    S_idx, S_uid, S_ptr = _edge_wise_points(order, ptr, s_idx)
    T_idx, T_uid, T_ptr = _edge_wise_points(order, ptr, t_idx)
    S_pts = points[S_idx]
    T_pts = points[T_idx]

    # init candidates at segment centroids
    centroid = np.zeros((num_segments, 3))
    np.add.at(centroid, index, points)
    centroid /= np.maximum(
        np.bincount(index, minlength=num_segments), 1)[:, None]
    s_cand = centroid[s_idx]
    t_cand = centroid[t_idx]
    s_cand_idx = np.full(s_idx.shape[0], -1, dtype=np.int64)
    t_cand_idx = np.full(s_idx.shape[0], -1, dtype=np.int64)

    n_edges = s_idx.shape[0]

    def step(X_pts, X_idx, X_uid, X_ptr, y_cand):
        # squared distance (argmin-equivalent, no sqrt) + O(n)
        # group-argmin: reduceat min then first row matching it
        diff = X_pts - y_cand[X_uid]
        d = np.einsum('ij,ij->i', diff, diff)
        gmin = np.minimum.reduceat(d, X_ptr[:-1])
        pos = np.flatnonzero(d == gmin[X_uid])
        arg = pos[np.searchsorted(X_uid[pos], np.arange(n_edges))]
        cand_idx = X_idx[arg]
        return points[cand_idx], cand_idx

    for _ in range(cycles):
        t_cand, t_cand_idx = step(T_pts, T_idx, T_uid, T_ptr, s_cand)
        s_cand, s_cand_idx = step(S_pts, S_idx, S_uid, S_ptr, t_cand)

    return np.stack([s_cand_idx, t_cand_idx])


def cluster_radius_nn_graph_np(points, index, k_max=100, gap=0.0,
                               cycles=3, csr=None):
    """Segment pairs with any two points within `gap`
    (reference src/utils/neighbors.py:491). Returns trimmed (i<j)
    [2, E] edge_index and the per-edge anchor distance."""
    from scipy.spatial import cKDTree

    num_segments = int(index.max()) + 1
    order, ptr = csr if csr is not None else _segment_csr(
        index, num_segments)
    pts_sorted = points[order]
    bbox_low = np.minimum.reduceat(pts_sorted, ptr[:-1], axis=0)
    bbox_high = np.maximum.reduceat(pts_sorted, ptr[:-1], axis=0)
    diam = (bbox_high - bbox_low).max(axis=1)
    center = (bbox_high + bbox_low) / 2

    r_search = float(diam.max() + gap)
    k = min(k_max + 1, num_segments)
    dist, nbr = cKDTree(center).query(
        center, k=k, distance_upper_bound=r_search)
    nbr = nbr[:, 1:]  # drop self
    dist = dist[:, 1:]
    src = np.repeat(np.arange(num_segments), nbr.shape[1])
    dst = nbr.reshape(-1)
    dd = dist.reshape(-1)
    valid = dst < num_segments  # cKDTree pads misses with n
    src, dst, dd = src[valid], dst[valid], dd[valid]

    # prune by actual segment radii (+ sqrt(3)*gap corner case)
    r_seg = diam / 2
    keep = dd <= r_seg[src] + r_seg[dst] + 1.7320508 * gap
    src, dst = src[keep], dst[keep]

    ei, _ = to_trimmed_np(np.stack([src, dst]))
    if ei.shape[1] == 0:
        return ei, np.zeros(0)

    anchors = scatter_nearest_neighbor_np(
        points, index, ei, cycles=cycles, csr=(order, ptr))
    d_nn = np.linalg.norm(points[anchors[0]] - points[anchors[1]],
                          axis=1)
    in_gap = d_nn <= gap
    return ei[:, in_gap], d_nn[in_gap]


def _idx_preserving_mask(mask, uid, n_groups):
    """Keep all rows of groups the mask would empty out
    (reference src/utils/scatter.py:241)."""
    kept = np.bincount(uid[mask], minlength=n_groups)
    return mask | (kept == 0)[uid]


def _apply_mask(mask, arrs, uid, n_groups):
    keep = np.where(mask)[0]
    out = [a[keep] for a in arrs]
    new_uid = out[-1]
    sizes = np.bincount(new_uid, minlength=n_groups)
    new_ptr = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(sizes, out=new_ptr[1:])
    return out, new_ptr


def subedges_np(points, index, edge_index, ratio=0.2, k_min=20,
                cycles=3, margin=0.2, halfspace_filter=True,
                bbox_filter=True, target_pc_flip=True,
                source_pc_sort=False, csr=None, use_native=True):
    """Level-0 point pairs making up each segment-pair edge
    (reference src/utils/graph.py:99). Returns
    (trimmed edge_index [2, E], ST point-id pairs [2, M], uid [M])."""
    num_segments = int(index.max()) + 1
    order, ptr = csr if csr is not None else _segment_csr(
        index, num_segments)
    edge_index, _ = to_trimmed_np(edge_index)
    E = edge_index.shape[1]
    if E == 0:
        return edge_index, np.zeros((2, 0), dtype=np.int64), \
            np.zeros(0, dtype=np.int64)
    if use_native:
        from .native import subedges_pairs
        out = subedges_pairs(
            points, order, ptr, edge_index, ratio=ratio, k_min=k_min,
            cycles=cycles, margin=margin,
            halfspace_filter=halfspace_filter, bbox_filter=bbox_filter,
            target_pc_flip=target_pc_flip,
            source_pc_sort=source_pc_sort)
        if out is not None:
            return edge_index, out[0], out[1]

    anchors = scatter_nearest_neighbor_np(
        points, index, edge_index, cycles=cycles, csr=(order, ptr))
    s_anchor = points[anchors[0]]
    t_anchor = points[anchors[1]]
    base = base_vectors_3d_np(t_anchor - s_anchor)  # [E, 3, 3]

    S_idx, S_uid, S_ptr = _edge_wise_points(order, ptr, edge_index[0])
    T_idx, T_uid, T_ptr = _edge_wise_points(order, ptr, edge_index[1])

    def to_anchor_base(X_idx, X_uid, anchor):
        rel = points[X_idx] - anchor[X_uid]
        return np.einsum('nd,nbd->nb', rel, base[X_uid])

    S_pts = to_anchor_base(S_idx, S_uid, s_anchor)
    T_pts = to_anchor_base(T_idx, T_uid, t_anchor)

    if halfspace_filter:
        m = _idx_preserving_mask(S_pts[:, 0] <= margin, S_uid, E)
        (S_pts, S_idx, S_uid), S_ptr = _apply_mask(
            m, [S_pts, S_idx, S_uid], S_uid, E)
        m = _idx_preserving_mask(T_pts[:, 0] >= -margin, T_uid, E)
        (T_pts, T_idx, T_uid), T_ptr = _apply_mask(
            m, [T_pts, T_idx, T_uid], T_uid, E)

    if bbox_filter:
        def group_minmax(v, uid, gptr):
            return (np.minimum.reduceat(v, gptr[:-1], axis=0),
                    np.maximum.reduceat(v, gptr[:-1], axis=0))
        s_min, s_max = group_minmax(S_pts[:, 1:], S_uid, S_ptr)
        t_min, t_max = group_minmax(T_pts[:, 1:], T_uid, T_ptr)
        st_min = np.minimum(np.maximum(s_min, t_min), -margin)
        st_max = np.maximum(np.minimum(s_max, t_max), margin)

        def in_bbox(X_pts, X_uid):
            return ((X_pts[:, 1:] >= st_min[X_uid]).all(axis=1)
                    & (X_pts[:, 1:] <= st_max[X_uid]).all(axis=1))

        m = _idx_preserving_mask(in_bbox(S_pts, S_uid), S_uid, E)
        (S_pts, S_idx, S_uid), S_ptr = _apply_mask(
            m, [S_pts, S_idx, S_uid], S_uid, E)
        m = _idx_preserving_mask(in_bbox(T_pts, T_uid), T_uid, E)
        (T_pts, T_idx, T_uid), T_ptr = _apply_mask(
            m, [T_pts, T_idx, T_uid], T_uid, E)

    # sort along the anchor axis: S descending (anchor first, then
    # deeper into the source segment), T ascending
    perm = np.lexsort((-S_pts[:, 0], S_uid))
    S_pts, S_idx, S_uid = S_pts[perm], S_idx[perm], S_uid[perm]
    perm = np.lexsort((T_pts[:, 0], T_uid))
    T_pts, T_idx, T_uid = T_pts[perm], T_idx[perm], T_uid[perm]

    # per-edge subedge count: top ratio.size, >= k_min, <= size,
    # equal on both sides
    s_size = S_ptr[1:] - S_ptr[:-1]
    t_size = T_ptr[1:] - T_ptr[:-1]
    s_k = np.minimum(np.maximum(
        (s_size * ratio).astype(np.int64), k_min), s_size)
    t_k = np.minimum(np.maximum(
        (t_size * ratio).astype(np.int64), k_min), t_size)
    st_k = np.minimum(s_k, t_k)

    def take_first_k(X_pts, X_idx, X_uid, gptr):
        rel = np.arange(X_uid.shape[0], dtype=np.int64) - gptr[X_uid]
        keep = rel < st_k[X_uid]
        return X_pts[keep], X_idx[keep], X_uid[keep]

    S_pts, S_idx, S_uid = take_first_k(S_pts, S_idx, S_uid, S_ptr)
    T_pts, T_idx, T_uid = take_first_k(T_pts, T_idx, T_uid, T_ptr)
    new_ptr = np.zeros(E + 1, dtype=np.int64)
    np.cumsum(st_k, out=new_ptr[1:])
    S_ptr = T_ptr = new_ptr

    # first principal component of each side's kept points
    def first_component(X_pts, X_uid):
        cnt = np.maximum(st_k, 1).astype(np.float64)
        mean = np.add.reduceat(X_pts, S_ptr[:-1], axis=0) / cnt[:, None]
        c = X_pts - mean[X_uid]
        cov = np.zeros((E, 3, 3))
        for a in range(3):
            for b in range(a, 3):
                v = np.bincount(X_uid, weights=c[:, a] * c[:, b],
                                minlength=E)
                cov[:, a, b] = v
                cov[:, b, a] = v
        cov /= cnt[:, None, None]
        return largest_eig3_np(cov)  # largest-eigenvalue component

    s_v = first_component(S_pts, S_uid)
    t_v = first_component(T_pts, T_uid)

    if target_pc_flip and not source_pc_sort:
        # flip t_v to limit subedge crossings
        # (reference src/utils/graph.py:419)
        T_proj = (T_pts * t_v[T_uid]).sum(axis=1)
        s_mean = np.add.reduceat(S_pts, S_ptr[:-1], axis=0) \
            / np.maximum(st_k, 1)[:, None].astype(np.float64)
        perm = np.lexsort((T_proj, T_uid))
        t_min_pt = T_pts[_group_first_of_sorted(perm, T_uid, T_ptr)]
        st_u = t_min_pt - s_mean
        st_u /= np.maximum(
            np.linalg.norm(st_u, axis=1, keepdims=True), 1e-12)
        flip = (s_v * t_v).sum(1) <= (s_v * st_u).sum(1)
        t_v[flip] *= -1
    elif source_pc_sort:
        t_v = s_v

    # sort both sides along their first component and pair in order
    perm = np.lexsort(((S_pts * s_v[S_uid]).sum(1), S_uid))
    S_idx = S_idx[perm]
    perm = np.lexsort(((T_pts * t_v[T_uid]).sum(1), T_uid))
    T_idx = T_idx[perm]

    return edge_index, np.stack([S_idx, T_idx]), S_uid


def minimalistic_edge_features_np(points, se_point_index, se_id,
                                  num_edges, unbiased=True):
    """[mean_off(3) | std_off(3) | sqrt(mean_dist)(1)] per trimmed edge
    (reference src/transforms/graph.py:957). std_off is computed in a
    basis built around the mean offset and clipped to [-2, 2]."""
    offset = points[se_point_index[1]] - points[se_point_index[0]]
    dist = np.linalg.norm(offset, axis=1)
    cnt = np.maximum(
        np.bincount(se_id, minlength=num_edges), 1).astype(np.float64)

    def gmean(v):
        out = np.stack(
            [np.bincount(se_id, weights=v[:, c], minlength=num_edges)
             for c in range(v.shape[1])], axis=1)
        return out / cnt[:, None]

    mean_off = gmean(offset)
    base = base_vectors_3d_np(mean_off)  # [E, 3, 3]
    proj = np.einsum('nd,nbd->nb', offset, base[se_id])
    dev = (proj - gmean(proj)[se_id]) ** 2
    denom = np.maximum(cnt - 1, 1) if unbiased else cnt
    var = np.stack(
        [np.bincount(se_id, weights=dev[:, c], minlength=num_edges)
         for c in range(3)], axis=1) / denom[:, None]
    std_off = np.clip(np.sqrt(var), -2, 2)
    mean_dist = np.sqrt(
        np.bincount(se_id, weights=dist, minlength=num_edges) / cnt)
    return np.concatenate(
        [mean_off, std_off, mean_dist[:, None]], axis=1
    ).astype(np.float32)

"""ctypes bindings for the C++ native kernels (native/libspt_native.so)
with pure-numpy fallbacks so the package works without the build step.

Native components (see native/*.cpp):
  - spt_greedy_cut: greedy L0/Potts graph-partition solver
    (replaces pycut-pursuit `cp_d0_dist` in the reference pipeline,
    src/transforms/partition.py:199)
  - spt_radius_knn: fixed-radius KNN on a voxel hash grid
    (replaces FRNN, src/utils/neighbors.py:24)
"""
import ctypes
import heapq
import os

import numpy as np

__all__ = ['greedy_cut', 'radius_knn', 'eigen_features',
           'anchor_nn', 'subedges_pairs', 'native_available']

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, 'native', 'libspt_native.so'),
                 os.path.join(os.path.dirname(here), 'native',
                              'libspt_native.so')):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.spt_greedy_cut.restype = ctypes.c_int64
            lib.spt_greedy_cut.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_double, ctypes.c_double, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32)]
            lib.spt_radius_knn.restype = None
            lib.spt_radius_knn.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float)]
            try:
                lib.spt_eigen_features.restype = None
                lib.spt_eigen_features.argtypes = [
                    ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int32)]
            except AttributeError:
                # library predates the eigen kernel
                pass
            try:
                i64p = ctypes.POINTER(ctypes.c_int64)
                f64p = ctypes.POINTER(ctypes.c_double)
                lib.spt_anchor_nn.restype = None
                lib.spt_anchor_nn.argtypes = [
                    ctypes.c_int64, f64p, ctypes.c_int64, i64p, i64p,
                    ctypes.c_int64, i64p, i64p, ctypes.c_int64,
                    i64p, i64p]
                lib.spt_subedges.restype = None
                lib.spt_subedges.argtypes = [
                    ctypes.c_int64, f64p, ctypes.c_int64, i64p, i64p,
                    ctypes.c_int64, i64p, i64p, ctypes.c_double,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                    ctypes.c_int32, i64p, i64p, i64p, i64p]
            except AttributeError:
                # library predates the subedge kernels
                pass
            _LIB = lib
            return lib
    _LIB = False
    return False


def native_available():
    return bool(_load())


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def greedy_cut(features, edge_index, edge_weight=None, node_weight=None,
               reg=0.1, cutoff=10, refine_sweeps=8):
    """Greedy L0 partition. `features` [N, D] float32 (pre-scaled),
    trimmed `edge_index` [2, E]. Returns (super_index [N] int64,
    n_components).

    `refine_sweeps` > 0 adds boundary-reassignment sweeps (Lloyd-style
    exact energy descent) + a connectivity split after the greedy
    merge — the re-assignment half of cut-pursuit's alternating
    minimization. 0 gives the merge-only solver."""
    f = np.ascontiguousarray(features, dtype=np.float32)
    n, d = f.shape
    src = np.ascontiguousarray(edge_index[0], dtype=np.int32)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int32)
    m = src.shape[0]
    ew = None if edge_weight is None else np.ascontiguousarray(
        edge_weight.reshape(-1), dtype=np.float32)
    nw = None if node_weight is None else np.ascontiguousarray(
        node_weight.reshape(-1), dtype=np.float32)
    lib = _load()
    if lib:
        out = np.empty(n, dtype=np.int32)
        n_comp = lib.spt_greedy_cut(
            n, d, _ptr(f, ctypes.c_float),
            _ptr(nw, ctypes.c_float) if nw is not None else None,
            m, _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
            _ptr(ew, ctypes.c_float) if ew is not None else None,
            float(reg), float(cutoff), int(refine_sweeps),
            _ptr(out, ctypes.c_int32))
        return out.astype(np.int64), int(n_comp)
    return _greedy_cut_py(f, src, dst, ew, nw, reg, cutoff,
                          refine_sweeps)


def _greedy_cut_py(f, src, dst, ew, nw, reg, cutoff, refine_sweeps=8):
    """Numpy/heapq fallback of native/greedy_cut.cpp (same algorithm)."""
    n, d = f.shape
    S = nw.astype(np.float64).copy() if nw is not None \
        else np.ones(n)
    mu = f.astype(np.float64).copy()
    parent = np.arange(n)
    version = np.zeros(n, dtype=np.int64)
    adj = [dict() for _ in range(n)]
    w = ew if ew is not None else np.ones(src.shape[0], dtype=np.float32)
    for u, v, x in zip(src, dst, w):
        if u == v:
            continue
        adj[u][v] = adj[u].get(v, 0.0) + float(x)
        adj[v][u] = adj[v].get(u, 0.0) + float(x)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def fid(a, b):
        diff = mu[a] - mu[b]
        return S[a] * S[b] / (S[a] + S[b]) * float(diff @ diff)

    def gain(a, b, W):
        return reg * W - fid(a, b)

    heap = []
    for a in range(n):
        for b, W in adj[a].items():
            if b > a:
                heapq.heappush(
                    heap, (-gain(a, b, W), a, b,
                           int(version[a] + version[b])))

    def merge(a, b):
        if len(adj[a]) < len(adj[b]):
            a, b = b, a
        parent[b] = a
        s = S[a] + S[b]
        mu[a] = (mu[a] * S[a] + mu[b] * S[b]) / s
        S[a] = s
        version[a] += 1
        version[b] += 1
        adj[a].pop(b, None)
        for c0, W in adj[b].items():
            c = find(c0)
            if c in (a, b):
                continue
            adj[a][c] = adj[a].get(c, 0.0) + W
            adj[c].pop(b, None)
            adj[c][a] = adj[a][c]
        adj[b].clear()
        for c0, W in list(adj[a].items()):
            c = find(c0)
            if c != a:
                heapq.heappush(
                    heap, (-gain(a, c, W), a, c,
                           int(version[a] + version[c])))
        return a

    while heap:
        neg_g, a0, b0, stamp = heapq.heappop(heap)
        if -neg_g <= 0:
            break
        a, b = find(a0), find(b0)
        if a == b or version[a0] + version[b0] != stamp:
            continue
        W = adj[a].get(b)
        if W is None:
            continue
        if gain(a, b, W) <= 0:
            continue
        merge(a, b)

    if cutoff > 0:
        changed = True
        while changed:
            changed = False
            for i in range(n):
                a = find(i)
                if a != i or S[a] >= cutoff:
                    continue
                best, best_g = -1, -np.inf
                for c0, W in adj[a].items():
                    c = find(c0)
                    if c == a:
                        continue
                    g = gain(a, c, W)
                    if g > best_g:
                        best, best_g = c, g
                if best >= 0:
                    merge(a, best)
                    changed = True

    remap = {}
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        r = find(i)
        if r not in remap:
            remap[r] = len(remap)
        out[i] = remap[r]
    if refine_sweeps > 0:
        return _refine_py(f, src, dst, ew, nw, reg, cutoff, out,
                          len(remap), refine_sweeps)
    return out, len(remap)


def _refine_py(f, src, dst, ew, nw, reg, cutoff, comp, n_comp,
               sweeps):
    """Fallback twin of the native phase 3: alternating split
    (principal-direction 2-means 2-coloring, accepted on energy
    descent) + boundary reassignment (exact energy descent), then a
    connectivity split — see native/greedy_cut.cpp."""
    n, d = f.shape
    f64 = f.astype(np.float64)
    wgt = nw.astype(np.float64) if nw is not None else np.ones(n)
    w = (ew if ew is not None else
         np.ones(src.shape[0], np.float32)).astype(np.float64)
    cs = np.bincount(comp, weights=wgt, minlength=n_comp)
    cmu = np.zeros((n_comp, d))
    np.add.at(cmu, comp, f * wgt[:, None])
    cmu /= np.maximum(cs, 1e-12)[:, None]
    # vertex adjacency
    nbrs = [dict() for _ in range(n)]
    for u, v, x in zip(src, dst, w):
        if u == v:
            continue
        nbrs[u][v] = nbrs[u].get(v, 0.0) + x
        nbrs[v][u] = nbrs[v].get(u, 0.0) + x
    min_keep = cutoff if cutoff > 0 else 1e-12

    def split_pass():
        nonlocal cs, cmu
        accepted = 0
        for c in range(cs.shape[0]):
            mem = np.where(comp == c)[0]
            if mem.size < 2 or cs[c] < 2 * min_keep:
                continue
            X = f64[mem]
            wm = wgt[mem]
            mu = cmu[c]
            Xc = X - mu
            scat = (Xc * wm[:, None]).T @ Xc
            if scat.diagonal().max() <= 1e-24:
                continue
            v = np.zeros(d)
            v[int(np.argmax(scat.diagonal()))] = 1.0
            for _ in range(8):
                t = scat @ v
                nrm = np.linalg.norm(t)
                if nrm <= 1e-30:
                    break
                v = t / nrm
            side = Xc @ v > 0
            for _ in range(6):
                w1, w0 = wm[side].sum(), wm[~side].sum()
                if w1 <= 0 or w0 <= 0:
                    break
                m1 = (X[side] * wm[side, None]).sum(0) / w1
                m0 = (X[~side] * wm[~side, None]).sum(0) / w0
                new = ((X - m1) ** 2).sum(1) < ((X - m0) ** 2).sum(1)
                if (new == side).all():
                    break
                side = new
            w1, w0 = wm[side].sum(), wm[~side].sum()
            if w1 < min_keep or w0 < min_keep:
                continue
            m1 = (X[side] * wm[side, None]).sum(0) / w1
            m0 = (X[~side] * wm[~side, None]).sum(0) / w0
            fid_old = float((wm[:, None] * Xc ** 2).sum())
            fid_new = float(
                (wm[side, None] * (X[side] - m1) ** 2).sum()
                + (wm[~side, None] * (X[~side] - m0) ** 2).sum())
            side_of = np.zeros(n, bool)
            side_of[mem[side]] = True
            cut_w = 0.0
            for vtx in mem:
                for u, x in nbrs[vtx].items():
                    if comp[u] == c and u > vtx \
                            and side_of[u] != side_of[vtx]:
                        cut_w += x
            if (fid_new - fid_old) + reg * cut_w >= -1e-9:
                continue
            newc = cs.shape[0]
            cs = np.append(cs, w1)
            cs[c] = w0
            cmu = np.vstack([cmu, m1[None]])
            cmu[c] = m0
            comp[mem[side]] = newc
            accepted += 1
        return accepted

    def reassign():
        total = 0
        for _ in range(sweeps):
            moves = 0
            for v in range(n):
                a = comp[v]
                wv = wgt[v]
                if cs[a] - wv < min_keep or not nbrs[v]:
                    continue
                w_same = 0.0
                wnb = {}
                for u, x in nbrs[v].items():
                    c = comp[u]
                    if c == a:
                        w_same += x
                    else:
                        wnb[c] = wnb.get(c, 0.0) + x
                if not wnb:
                    continue
                fv = f64[v]
                da = fv - cmu[a]
                rm = cs[a] * wv / (cs[a] - wv) * float(da @ da)
                best_c, best_dE = -1, -1e-9
                for c, wc in wnb.items():
                    dc = fv - cmu[c]
                    dE = cs[c] * wv / (cs[c] + wv) * float(dc @ dc) \
                        - rm + reg * (w_same - wc)
                    if dE < best_dE:
                        best_c, best_dE = c, dE
                if best_c < 0:
                    continue
                cmu[a] = (cmu[a] * cs[a] - wv * fv) / (cs[a] - wv)
                cmu[best_c] = (cmu[best_c] * cs[best_c] + wv * fv) \
                    / (cs[best_c] + wv)
                cs[a] -= wv
                cs[best_c] += wv
                comp[v] = best_c
                moves += 1
            total += moves
            if moves == 0:
                break
        return total

    for _ in range(3):
        nsplit = split_pass()
        moves = reassign()
        if nsplit == 0 and moves == 0:
            break
    n_comp = cs.shape[0]
    # connectivity split (undersized parts rejoin the heaviest part)
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(src, dst):
        if u != v and comp[u] == comp[v]:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[rv] = ru
    roots = np.array([find(i) for i in range(n)])
    part_w = np.bincount(roots, weights=wgt, minlength=n)
    main_root = np.full(n_comp, -1, dtype=np.int64)
    for i in range(n):
        c = comp[i]
        if main_root[c] < 0 or part_w[roots[i]] > part_w[main_root[c]]:
            main_root[c] = roots[i]
    key = np.where((cutoff > 0) & (part_w[roots] < cutoff),
                   main_root[comp], roots)
    uniq, out = np.unique(key, return_inverse=True)
    return out.astype(np.int64), uniq.shape[0]


def radius_knn(xyz_search, xyz_query=None, r=1.0, k=10,
               exclude_self=None):
    """Fixed-radius KNN; returns (nbr_idx [Nq, k] int32 with -1
    padding, dist [Nq, k] float32 with +inf padding)."""
    xs = np.ascontiguousarray(xyz_search, dtype=np.float32)
    self_search = xyz_query is None
    xq = xs if self_search else np.ascontiguousarray(
        xyz_query, dtype=np.float32)
    if exclude_self is None:
        exclude_self = self_search
    lib = _load()
    nq = xq.shape[0]
    if lib:
        nbr = np.empty((nq, k), dtype=np.int32)
        dist = np.empty((nq, k), dtype=np.float32)
        lib.spt_radius_knn(
            xs.shape[0], _ptr(xs, ctypes.c_float),
            nq, _ptr(xq, ctypes.c_float),
            float(r), int(k), int(bool(exclude_self)),
            _ptr(nbr, ctypes.c_int32), _ptr(dist, ctypes.c_float))
        return nbr, dist
    # scipy fallback
    from scipy.spatial import cKDTree
    tree = cKDTree(xs)
    kk = k + 1 if exclude_self else k
    dist, idx = tree.query(xq, k=kk, distance_upper_bound=r)
    if kk == 1:
        dist, idx = dist[:, None], idx[:, None]
    if exclude_self:
        # drop the self column (first column when querying self)
        mask = idx == np.arange(nq)[:, None]
        # shift left where self was found
        out_i = np.full((nq, k), -1, dtype=np.int32)
        out_d = np.full((nq, k), np.inf, dtype=np.float32)
        for i in range(nq):
            row_i = idx[i][~mask[i]][:k]
            row_d = dist[i][~mask[i]][:k]
            out_i[i, :row_i.shape[0]] = row_i
            out_d[i, :row_d.shape[0]] = row_d
        idx, dist = out_i, out_d
    idx = np.where(idx >= xs.shape[0], -1, idx).astype(np.int32)
    return idx, dist.astype(np.float32)


def anchor_nn(points, order, ptr, edge_index, cycles=3):
    """Per-edge anchor (approximate closest point pair) search, native
    C++/OpenMP (native/subedges.cpp). `points` [N, 3] float64, CSR
    (`order`, `ptr`) over segments, trimmed `edge_index` [2, E].
    Returns [2, E] int64 point ids, or None if the native library
    lacks the kernel."""
    lib = _load()
    if not lib or not hasattr(lib, 'spt_anchor_nn'):
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    order = np.ascontiguousarray(order, dtype=np.int64)
    ptr = np.ascontiguousarray(ptr, dtype=np.int64)
    src = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    e = src.shape[0]
    out_s = np.empty(e, dtype=np.int64)
    out_t = np.empty(e, dtype=np.int64)
    lib.spt_anchor_nn(
        pts.shape[0], _ptr(pts, ctypes.c_double),
        ptr.shape[0] - 1, _ptr(order, ctypes.c_int64),
        _ptr(ptr, ctypes.c_int64), e, _ptr(src, ctypes.c_int64),
        _ptr(dst, ctypes.c_int64), int(cycles),
        _ptr(out_s, ctypes.c_int64), _ptr(out_t, ctypes.c_int64))
    return np.stack([out_s, out_t])


def subedges_pairs(points, order, ptr, edge_index, ratio=0.2,
                   k_min=20, cycles=3, margin=0.2,
                   halfspace_filter=True, bbox_filter=True,
                   target_pc_flip=True, source_pc_sort=False):
    """Native per-edge subedge pipeline (native/subedges.cpp; twin of
    ops/subedges.py:subedges_np). Returns (pairs [2, M] int64 point
    ids, uid [M] int64 edge ids), or None if the kernel is missing."""
    lib = _load()
    if not lib or not hasattr(lib, 'spt_subedges'):
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    order = np.ascontiguousarray(order, dtype=np.int64)
    ptr = np.ascontiguousarray(ptr, dtype=np.int64)
    src = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    e = src.shape[0]
    sizes = ptr[1:] - ptr[:-1]
    ub = np.minimum(sizes[src], sizes[dst])
    out_ptr = np.zeros(e + 1, dtype=np.int64)
    np.cumsum(ub, out=out_ptr[1:])
    cap = int(out_ptr[-1])
    out_s = np.empty(cap, dtype=np.int64)
    out_t = np.empty(cap, dtype=np.int64)
    out_k = np.empty(e, dtype=np.int64)
    lib.spt_subedges(
        pts.shape[0], _ptr(pts, ctypes.c_double),
        ptr.shape[0] - 1, _ptr(order, ctypes.c_int64),
        _ptr(ptr, ctypes.c_int64), e, _ptr(src, ctypes.c_int64),
        _ptr(dst, ctypes.c_int64), float(ratio), int(k_min),
        int(cycles), float(margin), int(bool(halfspace_filter)),
        int(bool(bbox_filter)), int(bool(target_pc_flip)),
        int(bool(source_pc_sort)), _ptr(out_ptr, ctypes.c_int64),
        _ptr(out_s, ctypes.c_int64), _ptr(out_t, ctypes.c_int64),
        _ptr(out_k, ctypes.c_int64))
    # compact the ub-strided per-edge blocks into dense [M] arrays
    uid = np.repeat(np.arange(e, dtype=np.int64), out_k)
    new_ptr = np.zeros(e + 1, dtype=np.int64)
    np.cumsum(out_k, out=new_ptr[1:])
    rel = np.arange(new_ptr[-1], dtype=np.int64) - new_ptr[uid]
    pos = out_ptr[uid] + rel
    return np.stack([out_s[pos], out_t[pos]]), uid


def eigen_features(xyz, nbr_idx, add_self=True):
    """Per-point neighborhood PCA (native C++/OpenMP; None if the
    library is unavailable). `nbr_idx` int32 with -1 invalid slots.

    Returns (w [N,3] float32 ascending, V [N,3,3] float32 with
    V[:, :, j] the eigenvector of w_j, counts [N] int32)."""
    lib = _load()
    if not lib or not hasattr(lib, 'spt_eigen_features'):
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    nbr = np.ascontiguousarray(nbr_idx, dtype=np.int32)
    n, k = nbr.shape
    w = np.empty((n, 3), dtype=np.float32)
    v = np.empty((n, 3, 3), dtype=np.float32)
    cnt = np.empty(n, dtype=np.int32)
    lib.spt_eigen_features(
        n, _ptr(xyz, ctypes.c_float), k, _ptr(nbr, ctypes.c_int32),
        int(bool(add_self)), _ptr(w, ctypes.c_float),
        _ptr(v, ctypes.c_float), _ptr(cnt, ctypes.c_int32))
    return w, v, cnt

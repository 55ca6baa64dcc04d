// Native superedge machinery: per-edge anchor nearest-neighbor search
// and the full subedge pipeline (halfspace + bbox filters, top-k,
// principal-component pairing).
//
// Exact C++/OpenMP twin of superpoint_transformer_tpu/ops/subedges.py
// (scatter_nearest_neighbor_np / subedges_np), which re-implements the
// reference's /root/reference/src/utils/graph.py:99 `subedges` and
// /root/reference/src/utils/scatter.py:128 `scatter_nearest_neighbor`.
// Work is embarrassingly parallel over segment-pair edges; every float
// op follows the numpy twin's order so outputs match bit-for-bit
// (same stable sorts, same double accumulation order, same
// closed-form 3x3 eigenvector with canonical sign).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

using i64 = int64_t;

struct V3 {
    double x, y, z;
};

inline V3 sub(const V3& a, const V3& b) {
    return {a.x - b.x, a.y - b.y, a.z - b.z};
}

inline double dot(const V3& a, const V3& b) {
    // left-to-right like numpy's 3-element sum
    return (a.x * b.x + a.y * b.y) + a.z * b.z;
}

inline V3 cross(const V3& a, const V3& b) {
    return {a.y * b.z - a.z * b.y,
            a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}

inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

inline V3 scale(const V3& a, double s) {
    return {a.x * s, a.y * s, a.z * s};
}

inline V3 load(const double* p, i64 i) {
    return {p[3 * i], p[3 * i + 1], p[3 * i + 2]};
}

// Orthonormal basis per direction vector
// (ops/subedges.py:base_vectors_3d_np).
struct Basis {
    V3 a, b, c;
};

Basis base_vectors_3d(V3 x) {
    V3 a = x;
    double n = norm(a);
    if (n == 0.0) a = {1.0, 0.0, 0.0};
    double na = norm(a);
    a = scale(a, 1.0 / na);
    V3 b = {a.y - a.z, a.z - a.x, a.x - a.y};
    if (norm(b) == 0.0) b = {2.0, 1.0, -1.0};
    double ba = dot(b, a);
    b = {b.x - ba * a.x, b.y - ba * a.y, b.z - ba * a.z};
    b = scale(b, 1.0 / norm(b));
    V3 c = cross(a, b);
    return {a, b, c};
}

// Deterministic largest-eigenvalue eigenvector of a symmetric 3x3
// matrix (ops/subedges.py:largest_eig3_np — same closed form, same
// canonical sign).
V3 largest_eig3(const double cov[3][3]) {
    double c00 = cov[0][0], c11 = cov[1][1], c22 = cov[2][2];
    double c01 = cov[0][1], c02 = cov[0][2], c12 = cov[1][2];
    double p1 = c01 * c01 + c02 * c02 + c12 * c12;
    double q = (c00 + c11 + c22) / 3.0;
    double p2 = (c00 - q) * (c00 - q) + (c11 - q) * (c11 - q)
                + (c22 - q) * (c22 - q) + 2.0 * p1;
    double p = std::sqrt(std::max(p2 / 6.0, 0.0));
    double safe_p = p > 0 ? p : 1.0;
    double b[3][3] = {
        {(c00 - q) / safe_p, c01 / safe_p, c02 / safe_p},
        {c01 / safe_p, (c11 - q) / safe_p, c12 / safe_p},
        {c02 / safe_p, c12 / safe_p, (c22 - q) / safe_p}};
    double detb =
        b[0][0] * (b[1][1] * b[2][2] - b[1][2] * b[1][2])
        - b[0][1] * (b[0][1] * b[2][2] - b[1][2] * b[0][2])
        + b[0][2] * (b[0][1] * b[1][2] - b[1][1] * b[0][2]);
    double r = detb / 2.0;
    r = std::min(1.0, std::max(-1.0, r));
    double lam = q + 2.0 * p * std::cos(std::acos(r) / 3.0);
    V3 r0 = {cov[0][0] - lam, cov[0][1], cov[0][2]};
    V3 r1 = {cov[0][1], cov[1][1] - lam, cov[1][2]};
    V3 r2 = {cov[0][2], cov[1][2], cov[2][2] - lam};
    V3 cr[3] = {cross(r0, r1), cross(r0, r2), cross(r1, r2)};
    int best = 0;
    double bn = dot(cr[0], cr[0]);
    for (int i = 1; i < 3; ++i) {
        double ni = dot(cr[i], cr[i]);
        if (ni > bn) { bn = ni; best = i; }
    }
    V3 v = cr[best];
    double nv = std::sqrt(dot(v, v));
    if (nv <= 1e-30 || p2 <= 0) {
        v = {1.0, 0.0, 0.0};
    } else {
        v = scale(v, 1.0 / nv);
    }
    // canonical sign: largest-|entry| component positive
    double av[3] = {std::fabs(v.x), std::fabs(v.y), std::fabs(v.z)};
    int pick = 0;
    if (av[1] > av[0]) pick = 1;
    if (av[2] > av[pick]) pick = 2;
    double e = pick == 0 ? v.x : (pick == 1 ? v.y : v.z);
    if (e < 0) v = scale(v, -1.0);
    return v;
}

// argmin over one segment's points of squared distance to y; first
// minimal element in CSR order (matches the numpy group-argmin).
i64 seg_argmin(const double* points, const i64* order, i64 lo, i64 hi,
               const V3& y) {
    i64 arg = order[lo];
    V3 d0 = sub(load(points, arg), y);
    double best = dot(d0, d0);
    for (i64 j = lo + 1; j < hi; ++j) {
        i64 pid = order[j];
        V3 d = sub(load(points, pid), y);
        double dd = dot(d, d);
        if (dd < best) { best = dd; arg = pid; }
    }
    return arg;
}

void anchor_pair(const double* points, const i64* order, const i64* ptr,
                 const double* centroid, i64 s, i64 t, i64 cycles,
                 i64* out_s, i64* out_t) {
    V3 s_cand = load(centroid, s);
    i64 s_idx = -1, t_idx = -1;
    for (i64 c = 0; c < cycles; ++c) {
        t_idx = seg_argmin(points, order, ptr[t], ptr[t + 1], s_cand);
        V3 t_cand = load(points, t_idx);
        s_idx = seg_argmin(points, order, ptr[s], ptr[s + 1], t_cand);
        s_cand = load(points, s_idx);
    }
    *out_s = s_idx;
    *out_t = t_idx;
}

// Per-thread scratch for one side of one edge.
struct Side {
    std::vector<i64> idx;       // point ids (CSR order, then filtered)
    std::vector<V3> pts;        // anchor-basis coords
    std::vector<i64> perm;      // sort permutation
    std::vector<i64> tmp_idx;
    std::vector<V3> tmp_pts;

    void load_segment(const double* points, const i64* order, i64 lo,
                      i64 hi, const V3& anchor, const Basis& base) {
        i64 n = hi - lo;
        idx.resize(n);
        pts.resize(n);
        for (i64 j = 0; j < n; ++j) {
            i64 pid = order[lo + j];
            idx[j] = pid;
            V3 rel = sub(load(points, pid), anchor);
            pts[j] = {dot(rel, base.a), dot(rel, base.b),
                      dot(rel, base.c)};
        }
    }

    // keep rows where keep(j); if none kept, keep all
    // (ops/subedges.py:_idx_preserving_mask)
    template <class F>
    void filter(F keep) {
        i64 n = (i64)idx.size(), kept = 0;
        for (i64 j = 0; j < n; ++j) kept += keep(j) ? 1 : 0;
        if (kept == 0 || kept == n) return;
        tmp_idx.clear(); tmp_pts.clear();
        for (i64 j = 0; j < n; ++j) {
            if (keep(j)) {
                tmp_idx.push_back(idx[j]);
                tmp_pts.push_back(pts[j]);
            }
        }
        idx.swap(tmp_idx);
        pts.swap(tmp_pts);
    }

    // stable sort rows by key ascending
    template <class Key>
    void sort_by(Key key) {
        i64 n = (i64)idx.size();
        perm.resize(n);
        for (i64 j = 0; j < n; ++j) perm[j] = j;
        std::stable_sort(perm.begin(), perm.end(),
                         [&](i64 a, i64 b) { return key(a) < key(b); });
        tmp_idx.resize(n); tmp_pts.resize(n);
        for (i64 j = 0; j < n; ++j) {
            tmp_idx[j] = idx[perm[j]];
            tmp_pts[j] = pts[perm[j]];
        }
        idx.swap(tmp_idx);
        pts.swap(tmp_pts);
    }

    void truncate(i64 k) {
        idx.resize(k);
        pts.resize(k);
    }

    // mean then covariance/cnt of pts, row order, double accumulation
    // (matches numpy reduceat/bincount ordering)
    V3 mean() const {
        V3 m = {0, 0, 0};
        for (const V3& p : pts) { m.x += p.x; m.y += p.y; m.z += p.z; }
        double c = std::max<i64>((i64)pts.size(), 1);
        return scale(m, 1.0 / c);
    }

    V3 first_pc() const {
        V3 m = mean();
        double cov[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
        for (const V3& p : pts) {
            double d[3] = {p.x - m.x, p.y - m.y, p.z - m.z};
            for (int a = 0; a < 3; ++a)
                for (int b = a; b < 3; ++b)
                    cov[a][b] += d[a] * d[b];
        }
        double c = std::max<i64>((i64)pts.size(), 1);
        for (int a = 0; a < 3; ++a)
            for (int b = a; b < 3; ++b) {
                cov[a][b] /= c;
                cov[b][a] = cov[a][b];
            }
        return largest_eig3(cov);
    }
};

}  // namespace

extern "C" {

// Approximate closest point pair per segment-pair edge
// (ops/subedges.py:scatter_nearest_neighbor_np). `order`/`ptr` is the
// CSR layout of point ids grouped by segment (ascending id within a
// segment); `centroid` may be null (computed here).
void spt_anchor_nn(i64 n_points, const double* points, i64 n_segments,
                   const i64* order, const i64* ptr, i64 n_edges,
                   const i64* src, const i64* dst, i64 cycles,
                   i64* out_s, i64* out_t) {
    std::vector<double> centroid(3 * n_segments, 0.0);
    // per-segment sums in ascending point-id order == np.add.at order
#pragma omp parallel for schedule(static)
    for (i64 s = 0; s < n_segments; ++s) {
        double cx = 0, cy = 0, cz = 0;
        for (i64 j = ptr[s]; j < ptr[s + 1]; ++j) {
            i64 pid = order[j];
            cx += points[3 * pid];
            cy += points[3 * pid + 1];
            cz += points[3 * pid + 2];
        }
        double cnt = std::max<i64>(ptr[s + 1] - ptr[s], 1);
        centroid[3 * s] = cx / cnt;
        centroid[3 * s + 1] = cy / cnt;
        centroid[3 * s + 2] = cz / cnt;
    }
#pragma omp parallel for schedule(dynamic, 64)
    for (i64 e = 0; e < n_edges; ++e) {
        anchor_pair(points, order, ptr, centroid.data(), src[e],
                    dst[e], cycles, &out_s[e], &out_t[e]);
    }
}

// Full per-edge subedge pipeline (ops/subedges.py:subedges_np).
// `out_ptr[e]` gives the write offset for edge e in out_S/out_T whose
// capacity must be >= min(src segment size, dst segment size);
// `out_k[e]` returns the number of subedges written.
void spt_subedges(i64 n_points, const double* points, i64 n_segments,
                  const i64* order, const i64* ptr, i64 n_edges,
                  const i64* src, const i64* dst, double ratio,
                  i64 k_min, i64 cycles, double margin,
                  int32_t halfspace_filter, int32_t bbox_filter,
                  int32_t target_pc_flip, int32_t source_pc_sort,
                  const i64* out_ptr, i64* out_S, i64* out_T,
                  i64* out_k) {
    std::vector<double> centroid(3 * n_segments, 0.0);
#pragma omp parallel for schedule(static)
    for (i64 s = 0; s < n_segments; ++s) {
        double cx = 0, cy = 0, cz = 0;
        for (i64 j = ptr[s]; j < ptr[s + 1]; ++j) {
            i64 pid = order[j];
            cx += points[3 * pid];
            cy += points[3 * pid + 1];
            cz += points[3 * pid + 2];
        }
        double cnt = std::max<i64>(ptr[s + 1] - ptr[s], 1);
        centroid[3 * s] = cx / cnt;
        centroid[3 * s + 1] = cy / cnt;
        centroid[3 * s + 2] = cz / cnt;
    }

#pragma omp parallel
    {
        Side S, T;
#pragma omp for schedule(dynamic, 16)
        for (i64 e = 0; e < n_edges; ++e) {
            i64 s = src[e], t = dst[e];
            i64 ss = ptr[s + 1] - ptr[s], ts = ptr[t + 1] - ptr[t];
            if (ss <= 0 || ts <= 0) { out_k[e] = 0; continue; }

            i64 sa, ta;
            anchor_pair(points, order, ptr, centroid.data(), s, t,
                        cycles, &sa, &ta);
            V3 s_anchor = load(points, sa);
            V3 t_anchor = load(points, ta);
            Basis base = base_vectors_3d(sub(t_anchor, s_anchor));

            S.load_segment(points, order, ptr[s], ptr[s + 1],
                           s_anchor, base);
            T.load_segment(points, order, ptr[t], ptr[t + 1],
                           t_anchor, base);

            if (halfspace_filter) {
                S.filter([&](i64 j) { return S.pts[j].x <= margin; });
                T.filter([&](i64 j) { return T.pts[j].x >= -margin; });
            }

            if (bbox_filter) {
                auto minmax = [](const Side& X, V3& lo, V3& hi) {
                    lo = {1e300, 1e300, 1e300};
                    hi = {-1e300, -1e300, -1e300};
                    for (const V3& p : X.pts) {
                        lo.y = std::min(lo.y, p.y);
                        lo.z = std::min(lo.z, p.z);
                        hi.y = std::max(hi.y, p.y);
                        hi.z = std::max(hi.z, p.z);
                    }
                };
                V3 s_lo, s_hi, t_lo, t_hi;
                minmax(S, s_lo, s_hi);
                minmax(T, t_lo, t_hi);
                double lo_y = std::min(std::max(s_lo.y, t_lo.y), -margin);
                double lo_z = std::min(std::max(s_lo.z, t_lo.z), -margin);
                double hi_y = std::max(std::min(s_hi.y, t_hi.y), margin);
                double hi_z = std::max(std::min(s_hi.z, t_hi.z), margin);
                auto inbox = [&](const V3& p) {
                    return p.y >= lo_y && p.z >= lo_z && p.y <= hi_y
                           && p.z <= hi_z;
                };
                S.filter([&](i64 j) { return inbox(S.pts[j]); });
                T.filter([&](i64 j) { return inbox(T.pts[j]); });
            }

            // S descending along the anchor axis, T ascending
            S.sort_by([&](i64 j) { return -S.pts[j].x; });
            T.sort_by([&](i64 j) { return T.pts[j].x; });

            i64 s_sz = (i64)S.idx.size(), t_sz = (i64)T.idx.size();
            i64 s_k = std::min(
                std::max((i64)(s_sz * ratio), k_min), s_sz);
            i64 t_k = std::min(
                std::max((i64)(t_sz * ratio), k_min), t_sz);
            i64 st_k = std::min(s_k, t_k);
            out_k[e] = st_k;
            if (st_k <= 0) continue;
            S.truncate(st_k);
            T.truncate(st_k);

            V3 s_v = S.first_pc();
            V3 t_v = T.first_pc();

            if (target_pc_flip && !source_pc_sort) {
                // flip t_v to limit subedge crossings
                // (reference src/utils/graph.py:419)
                i64 arg = 0;
                double best = dot(T.pts[0], t_v);
                for (i64 j = 1; j < st_k; ++j) {
                    double pj = dot(T.pts[j], t_v);
                    if (pj < best) { best = pj; arg = j; }
                }
                V3 t_min_pt = T.pts[arg];
                V3 s_mean = S.mean();
                V3 st_u = sub(t_min_pt, s_mean);
                double nu = std::max(norm(st_u), 1e-12);
                st_u = scale(st_u, 1.0 / nu);
                if (dot(s_v, t_v) <= dot(s_v, st_u))
                    t_v = scale(t_v, -1.0);
            } else if (source_pc_sort) {
                t_v = s_v;
            }

            S.sort_by([&](i64 j) { return dot(S.pts[j], s_v); });
            T.sort_by([&](i64 j) { return dot(T.pts[j], t_v); });

            i64 off = out_ptr[e];
            for (i64 j = 0; j < st_k; ++j) {
                out_S[off + j] = S.idx[j];
                out_T[off + j] = T.idx[j];
            }
        }
    }
}

}  // extern "C"

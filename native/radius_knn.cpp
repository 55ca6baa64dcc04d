// Fixed-radius k-nearest-neighbor search on a uniform voxel hash grid
// (role of the FRNN CUDA library in the reference,
// src/utils/neighbors.py:24-48; fresh CPU design for the host
// preprocessing path — the device path uses XLA sort-based KNN).
//
// Cell size adapts to the point density (targets ~2k points per
// cell) instead of using the search radius: with dense clouds and a
// large radius an r-sized 27-cell scan visits millions of candidates
// per query. The search expands ring by ring (Chebyshev shells) and
// stops when the k-th best distance is closer than the nearest
// unvisited shell — classic best-first grid KNN.
//
// Outputs -1 indices (and +inf distances) for missing neighbors,
// matching the reference's convention.

#include <cstdint>
#include <cmath>
#include <vector>
#include <algorithm>
#include <unordered_map>
#include <limits>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {
struct CellKey {
    int64_t x, y, z;
    bool operator==(const CellKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};
struct CellHash {
    size_t operator()(const CellKey& k) const {
        return (size_t)(k.x * 73856093LL ^ k.y * 19349663LL
                        ^ k.z * 83492791LL);
    }
};

struct Heap {
    // max-heap of (d2, idx) capped at k
    std::vector<std::pair<float, int32_t>> v;
    size_t k;
    explicit Heap(size_t k_) : k(k_) { v.reserve(k_ + 1); }
    float worst() const {
        return v.size() < k ? std::numeric_limits<float>::infinity()
                            : v.front().first;
    }
    void push(float d2, int32_t i) {
        if (v.size() < k) {
            v.emplace_back(d2, i);
            std::push_heap(v.begin(), v.end());
        } else if (d2 < v.front().first) {
            std::pop_heap(v.begin(), v.end());
            v.back() = {d2, i};
            std::push_heap(v.begin(), v.end());
        }
    }
};
}  // namespace

extern "C" void spt_radius_knn(
    int64_t n_search, const float* xyz_search,
    int64_t n_query, const float* xyz_query,
    double r, int64_t k, int64_t exclude_self,
    int32_t* nbr_out /*[n_query*k]*/, float* dist_out /*[n_query*k]*/) {
    const float INF = std::numeric_limits<float>::infinity();
    if (n_search == 0 || k == 0) {
        for (int64_t j = 0; j < n_query * k; ++j) {
            nbr_out[j] = -1;
            dist_out[j] = INF;
        }
        return;
    }

    // ---- adaptive cell size: ~2k points per cell ----------------------
    float lo[3] = {INF, INF, INF}, hi[3] = {-INF, -INF, -INF};
    for (int64_t i = 0; i < n_search; ++i)
        for (int d = 0; d < 3; ++d) {
            const float v = xyz_search[i * 3 + d];
            lo[d] = std::min(lo[d], v);
            hi[d] = std::max(hi[d], v);
        }
    double vol = 1.0;
    for (int d = 0; d < 3; ++d)
        vol *= std::max((double)(hi[d] - lo[d]), 1e-6);
    double cell = std::cbrt(vol * 2.0 * (double)std::max<int64_t>(k, 8)
                            / (double)n_search);
    if (std::isfinite(r) && r > 0)
        cell = std::min(cell, r);           // never exceed the radius
    cell = std::max(cell, 1e-6);
    const double inv = 1.0 / cell;

    std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
    grid.reserve((size_t)(n_search / 8 + 16));
    for (int64_t i = 0; i < n_search; ++i) {
        CellKey key{(int64_t)std::floor(xyz_search[i * 3] * inv),
                    (int64_t)std::floor(xyz_search[i * 3 + 1] * inv),
                    (int64_t)std::floor(xyz_search[i * 3 + 2] * inv)};
        grid[key].push_back((int32_t)i);
    }

    const double r2 = std::isfinite(r) ? r * r : INF;
    const int64_t max_ring = std::isfinite(r)
        ? (int64_t)std::ceil(r * inv) + 1
        : std::numeric_limits<int64_t>::max();

    // populated-cell bounding box: shells are clipped to it, so
    // degenerate data (collinear/planar clouds collapse the adaptive
    // cell) and queries far outside the cloud stay cheap instead of
    // scanning O(ring^2) empty cells per shell
    const int64_t clo[3] = {(int64_t)std::floor(lo[0] * inv),
                            (int64_t)std::floor(lo[1] * inv),
                            (int64_t)std::floor(lo[2] * inv)};
    const int64_t chi[3] = {(int64_t)std::floor(hi[0] * inv),
                            (int64_t)std::floor(hi[1] * inv),
                            (int64_t)std::floor(hi[2] * inv)};

    // queries are independent: parallelize across cores (the role of
    // FRNN's GPU parallelism / cut-pursuit's OpenMP in the reference).
    // OMP_NUM_THREADS=1 in per-cloud worker processes avoids
    // oversubscription (datasets/base.py:_preprocess_worker_init).
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 64)
#endif
    for (int64_t q = 0; q < n_query; ++q) {
        const float qx = xyz_query[q * 3], qy = xyz_query[q * 3 + 1],
                    qz = xyz_query[q * 3 + 2];
        const int64_t c[3] = {(int64_t)std::floor(qx * inv),
                              (int64_t)std::floor(qy * inv),
                              (int64_t)std::floor(qz * inv)};
        Heap heap((size_t)k);

        // box bounds relative to the query cell; no populated cell
        // lies beyond Chebyshev distance `reach`
        int64_t blo[3], bhi[3], reach = 0;
        for (int d = 0; d < 3; ++d) {
            blo[d] = clo[d] - c[d];
            bhi[d] = chi[d] - c[d];
            reach = std::max(reach, (int64_t)std::max(
                std::llabs(blo[d]), std::llabs(bhi[d])));
        }
        const int64_t ring_end = std::min(max_ring, reach);

        for (int64_t ring = 0; ring <= ring_end; ++ring) {
            // stop when the k-th best is closer than the nearest
            // possible point in this shell
            if (ring > 0) {
                const double shell_min = (double)(ring - 1) * cell;
                if (shell_min * shell_min > heap.worst()) break;
                if (shell_min * shell_min > r2) break;
            }
            // iterate the Chebyshev shell |max(dx,dy,dz)| == ring,
            // clipped to the populated box
            const int64_t x0 = std::max(-ring, blo[0]),
                          x1 = std::min(ring, bhi[0]);
            const int64_t y0 = std::max(-ring, blo[1]),
                          y1 = std::min(ring, bhi[1]);
            const int64_t z0 = std::max(-ring, blo[2]),
                          z1 = std::min(ring, bhi[2]);
            if (x0 > x1 || y0 > y1 || z0 > z1) continue;
            auto visit = [&](int64_t dx, int64_t dy, int64_t dz) {
                auto it = grid.find({c[0] + dx, c[1] + dy, c[2] + dz});
                if (it == grid.end()) return;
                for (int32_t i : it->second) {
                    if (exclude_self && (int64_t)i == q)
                        continue;
                    const double ddx = xyz_search[i * 3] - qx;
                    const double ddy = xyz_search[i * 3 + 1] - qy;
                    const double ddz = xyz_search[i * 3 + 2] - qz;
                    const double d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                    if (d2 <= r2)
                        heap.push((float)d2, i);
                }
            };
            for (int64_t dx = x0; dx <= x1; ++dx)
                for (int64_t dy = y0; dy <= y1; ++dy) {
                    if (std::llabs(dx) == ring
                        || std::llabs(dy) == ring) {
                        for (int64_t dz = z0; dz <= z1; ++dz)
                            visit(dx, dy, dz);
                    } else {
                        if (-ring >= z0 && -ring <= z1)
                            visit(dx, dy, -ring);
                        if (ring > 0 && ring >= z0 && ring <= z1)
                            visit(dx, dy, ring);
                    }
                }
        }
        // heap -> ascending output
        std::sort(heap.v.begin(), heap.v.end());
        const int64_t kk = (int64_t)heap.v.size();
        for (int64_t j = 0; j < k; ++j) {
            if (j < kk) {
                nbr_out[q * k + j] = heap.v[j].second;
                dist_out[q * k + j] = std::sqrt(heap.v[j].first);
            } else {
                nbr_out[q * k + j] = -1;
                dist_out[q * k + j] = INF;
            }
        }
    }
}

// Fixed-radius k-nearest-neighbor search on a uniform voxel hash grid
// (role of the FRNN CUDA library in the reference,
// src/utils/neighbors.py:24-48; fresh CPU design for the host
// preprocessing path — the device path uses XLA sort-based KNN).
//
// Points are binned into cells of side `r`; each query scans its 27
// neighboring cells and keeps the k nearest within radius r. Outputs
// -1 indices (and +inf distances) for missing neighbors, matching the
// reference's convention.

#include <cstdint>
#include <cmath>
#include <vector>
#include <algorithm>
#include <unordered_map>
#include <limits>

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
}  // namespace

extern "C" void spt_radius_knn(
    int64_t n_search, const float* xyz_search,
    int64_t n_query, const float* xyz_query,
    double r, int64_t k, int64_t exclude_self,
    int32_t* nbr_out /*[n_query*k]*/, float* dist_out /*[n_query*k]*/) {
    const float INF = std::numeric_limits<float>::infinity();
    std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
    grid.reserve((size_t)n_search);
    const double inv = 1.0 / r;
    for (int64_t i = 0; i < n_search; ++i) {
        CellKey key{(int64_t)std::floor(xyz_search[i * 3] * inv),
                    (int64_t)std::floor(xyz_search[i * 3 + 1] * inv),
                    (int64_t)std::floor(xyz_search[i * 3 + 2] * inv)};
        grid[key].push_back((int32_t)i);
    }
    const double r2 = r * r;
    std::vector<std::pair<float, int32_t>> cand;
    for (int64_t q = 0; q < n_query; ++q) {
        const float qx = xyz_query[q * 3], qy = xyz_query[q * 3 + 1],
                    qz = xyz_query[q * 3 + 2];
        const int64_t cx = (int64_t)std::floor(qx * inv),
                      cy = (int64_t)std::floor(qy * inv),
                      cz = (int64_t)std::floor(qz * inv);
        cand.clear();
        for (int64_t dx = -1; dx <= 1; ++dx)
            for (int64_t dy = -1; dy <= 1; ++dy)
                for (int64_t dz = -1; dz <= 1; ++dz) {
                    auto it = grid.find({cx + dx, cy + dy, cz + dz});
                    if (it == grid.end()) continue;
                    for (int32_t i : it->second) {
                        if (exclude_self && (int64_t)i == q) continue;
                        double ddx = xyz_search[i * 3] - qx;
                        double ddy = xyz_search[i * 3 + 1] - qy;
                        double ddz = xyz_search[i * 3 + 2] - qz;
                        double d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                        if (d2 <= r2)
                            cand.emplace_back((float)d2, i);
                    }
                }
        int64_t kk = std::min<int64_t>(k, (int64_t)cand.size());
        std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
        for (int64_t j = 0; j < k; ++j) {
            if (j < kk) {
                nbr_out[q * k + j] = cand[j].second;
                dist_out[q * k + j] = std::sqrt(cand[j].first);
            } else {
                nbr_out[q * k + j] = -1;
                dist_out[q * k + j] = INF;
            }
        }
    }
}

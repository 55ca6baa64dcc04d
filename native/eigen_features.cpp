// Per-point neighborhood PCA for geometric features (role of pgeof's
// C++ features in the reference, src/utils/geometry.py:129 — fresh
// design: covariance accumulated in two passes straight from the
// neighbor-index table, 3x3 Jacobi eigensolver, OpenMP across points).
//
// Outputs per point: eigenvalues ascending (w[3], covariance
// normalized by the neighbor count, matching numpy.linalg.eigh on the
// python path), eigenvectors as columns (V[c*3+j] = component c of
// eigenvector j), and the valid-neighbor count.

#include <cstdint>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// cyclic Jacobi for a symmetric 3x3; A enters as a full row-major
// matrix and leaves diagonalized; V accumulates the rotations
void jacobi3(double A[9], double V[9]) {
    for (int i = 0; i < 9; ++i) V[i] = 0.0;
    V[0] = V[4] = V[8] = 1.0;
    for (int sweep = 0; sweep < 16; ++sweep) {
        const double off = A[1] * A[1] + A[2] * A[2] + A[5] * A[5];
        if (off < 1e-30) break;
        static const int pairs[3][2] = {{0, 1}, {0, 2}, {1, 2}};
        for (const auto& pq : pairs) {
            const int p = pq[0], q = pq[1];
            const double apq = A[p * 3 + q];
            if (std::fabs(apq) < 1e-300) continue;
            const double app = A[p * 3 + p], aqq = A[q * 3 + q];
            const double theta = 0.5 * (aqq - app) / apq;
            const double t = (theta >= 0 ? 1.0 : -1.0)
                / (std::fabs(theta)
                   + std::sqrt(theta * theta + 1.0));
            const double c = 1.0 / std::sqrt(t * t + 1.0);
            const double s = t * c;
            // A <- J^T A J
            for (int r = 0; r < 3; ++r) {
                const double arp = A[r * 3 + p], arq = A[r * 3 + q];
                A[r * 3 + p] = c * arp - s * arq;
                A[r * 3 + q] = s * arp + c * arq;
            }
            for (int r = 0; r < 3; ++r) {
                const double apr = A[p * 3 + r], aqr = A[q * 3 + r];
                A[p * 3 + r] = c * apr - s * aqr;
                A[q * 3 + r] = s * apr + c * aqr;
            }
            for (int r = 0; r < 3; ++r) {
                const double vrp = V[r * 3 + p], vrq = V[r * 3 + q];
                V[r * 3 + p] = c * vrp - s * vrq;
                V[r * 3 + q] = s * vrp + c * vrq;
            }
        }
    }
}

}  // namespace

extern "C" void spt_eigen_features(
    int64_t n, const float* xyz, int64_t k,
    const int32_t* nbr_idx /* [n*k], -1 = invalid slot */,
    int64_t add_self,
    float* w_out /* [n*3] ascending */,
    float* v_out /* [n*9], v[c*3+j] = comp c of eigvec j */,
    int32_t* cnt_out /* [n] valid neighbors (incl. self) */) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        double mx = 0, my = 0, mz = 0;
        int32_t cnt = 0;
        if (add_self) {
            mx = xyz[i * 3];
            my = xyz[i * 3 + 1];
            mz = xyz[i * 3 + 2];
            cnt = 1;
        }
        const int32_t* row = nbr_idx + i * k;
        for (int64_t j = 0; j < k; ++j) {
            const int32_t t = row[j];
            if (t < 0) continue;
            mx += xyz[t * 3];
            my += xyz[t * 3 + 1];
            mz += xyz[t * 3 + 2];
            ++cnt;
        }
        const double inv = 1.0 / std::max(cnt, 1);
        mx *= inv; my *= inv; mz *= inv;

        double cxx = 0, cxy = 0, cxz = 0, cyy = 0, cyz = 0, czz = 0;
        auto acc = [&](int64_t t) {
            const double dx = xyz[t * 3] - mx;
            const double dy = xyz[t * 3 + 1] - my;
            const double dz = xyz[t * 3 + 2] - mz;
            cxx += dx * dx; cxy += dx * dy; cxz += dx * dz;
            cyy += dy * dy; cyz += dy * dz; czz += dz * dz;
        };
        if (add_self) acc(i);
        for (int64_t j = 0; j < k; ++j)
            if (row[j] >= 0) acc(row[j]);
        double A[9] = {cxx * inv, cxy * inv, cxz * inv,
                       cxy * inv, cyy * inv, cyz * inv,
                       cxz * inv, cyz * inv, czz * inv};
        double V[9];
        jacobi3(A, V);
        double w[3] = {A[0], A[4], A[8]};
        int order[3] = {0, 1, 2};
        std::sort(order, order + 3,
                  [&](int a, int b) { return w[a] < w[b]; });
        for (int j = 0; j < 3; ++j) {
            const int o = order[j];
            w_out[i * 3 + j] = (float)std::max(w[o], 0.0);
            for (int c = 0; c < 3; ++c)
                v_out[i * 9 + c * 3 + j] = (float)V[c * 3 + o];
        }
        cnt_out[i] = cnt;
    }
}

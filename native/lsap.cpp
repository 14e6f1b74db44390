// Linear sum assignment (Hungarian algorithm with potentials, O(n^3)).
//
// Native replacement for the scipy C extension the reference depends on for
// DETR-style bipartite matching (reference: src/myrtle_vision/models/
// matcher.py:9,86 runs scipy.optimize.linear_sum_assignment per image on
// the CPU).  Exposed via a C ABI for ctypes.
//
// Shortest-augmenting-path formulation with dual potentials; requires
// n_rows <= n_cols (the Python wrapper transposes/pads as needed).
//
// Build: g++ -O3 -shared -fPIC -o liblsap.so lsap.cpp

#include <vector>
#include <limits>
#include <cstdint>

extern "C" {

// cost: row-major n_rows x n_cols, n_rows <= n_cols.
// out_col[i] = column assigned to row i.  Returns 0 on success.
int lsap_solve(int n_rows, int n_cols, const double* cost,
               int32_t* out_col) {
    if (n_rows > n_cols) return 1;
    const double INF = std::numeric_limits<double>::infinity();

    // 1-based potentials over rows (u) and columns (v);
    // p[j] = row currently assigned to column j (0 = none).
    std::vector<double> u(n_rows + 1, 0.0), v(n_cols + 1, 0.0);
    std::vector<int> p(n_cols + 1, 0), way(n_cols + 1, 0);

    for (int i = 1; i <= n_rows; ++i) {
        p[0] = i;
        int j0 = 0;
        std::vector<double> minv(n_cols + 1, INF);
        std::vector<char> used(n_cols + 1, 0);
        do {
            used[j0] = 1;
            int i0 = p[j0], j1 = -1;
            double delta = INF;
            for (int j = 1; j <= n_cols; ++j) {
                if (used[j]) continue;
                double cur = cost[(i0 - 1) * n_cols + (j - 1)]
                             - u[i0] - v[j];
                if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
                if (minv[j] < delta) { delta = minv[j]; j1 = j; }
            }
            if (j1 < 0) return 2;  // infeasible (all-inf column costs)
            for (int j = 0; j <= n_cols; ++j) {
                if (used[j]) {
                    if (p[j] > 0) u[p[j]] += delta;
                    v[j] -= delta;
                } else {
                    minv[j] -= delta;
                }
            }
            j0 = j1;
        } while (p[j0] != 0);
        do {
            int j1 = way[j0];
            p[j0] = p[j1];
            j0 = j1;
        } while (j0);
    }

    for (int j = 1; j <= n_cols; ++j) {
        if (p[j] > 0) out_col[p[j] - 1] = j - 1;
    }
    return 0;
}

}  // extern "C"

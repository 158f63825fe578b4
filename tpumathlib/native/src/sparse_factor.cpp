// Sparse numeric factorization kernels for the direct solver
// (tpumathlib.dss ≙ cuDSS FACTORIZATION phase).
//
// - spchol: up-looking sparse Cholesky (CSparse-style: per-row triangular
//   solve over the elimination-tree reach). Input: lower CSR of PAPᵀ.
// - splu: left-looking Gilbert–Peierls LU with threshold partial pivoting.
//
// Outputs use caller-allocated capacity (cap) — the bufferSize contract:
// call symbolic first (ordering.cpp) or pass a generous cap; returns -1 if
// capacity is exceeded.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Production path used by tpumathlib.dss: left-looking column Cholesky with
// row-linked lists (CSparse cs_chol structure, independently implemented).
int64_t spchol_ll(int64_t n, const int64_t* ap, const int64_t* ai, const double* ax,
                  int64_t* lp, int64_t* li, double* lx, int64_t cap) {
    std::vector<std::vector<std::pair<int64_t, double>>> Acols(n);
    for (int64_t i = 0; i < n; i++)
        for (int64_t p = ap[i]; p < ap[i + 1]; p++) {
            int64_t j = ai[p];
            if (j > i) return -2;
            Acols[j].push_back({i, ax[p]});
        }
    // L stored by columns: Lrows[c] = sorted vector of (row, val), diag first.
    std::vector<std::vector<std::pair<int64_t, double>>> L(n);
    // rowlink[r] = list of columns c whose column contains row r (c < current j)
    std::vector<std::vector<int64_t>> rowlink(n);
    std::vector<double> work(n, 0.0);
    std::vector<char> mark(n, 0);
    std::vector<int64_t> patt;
    for (int64_t j = 0; j < n; j++) {
        patt.clear();
        for (auto& [i, v] : Acols[j]) {
            work[i] += v;
            if (!mark[i]) { mark[i] = 1; patt.push_back(i); }
        }
        // columns k that have a nonzero in row j contribute:
        for (int64_t k : rowlink[j]) {
            // find L(j,k): it's in column k's list (binary search; sorted)
            auto& colk = L[k];
            double ljk = 0.0;
            {
                auto it = std::lower_bound(
                    colk.begin(), colk.end(), std::make_pair(j, -1e300));
                if (it != colk.end() && it->first == j) ljk = it->second;
            }
            if (ljk == 0.0) continue;
            for (auto& [r, v] : colk) {
                if (r < j) continue;
                work[r] -= ljk * v;
                if (!mark[r]) { mark[r] = 1; patt.push_back(r); }
            }
        }
        double djj = work[j];
        if (djj <= 0.0) return -3;  // not positive definite
        double ljj = std::sqrt(djj);
        std::sort(patt.begin(), patt.end());
        auto& colj = L[j];
        for (int64_t r : patt) {
            if (r < j) { mark[r] = 0; work[r] = 0.0; continue; }
            double v = (r == j) ? ljj : work[r] / ljj;
            if (v != 0.0) {
                colj.push_back({r, v});
                if (r > j) rowlink[r].push_back(j);
            }
            mark[r] = 0;
            work[r] = 0.0;
        }
    }
    // export as CSR rows (row i: entries L(i, 0..i)) — transpose columns
    std::vector<int64_t> rcount(n, 0);
    for (int64_t c = 0; c < n; c++)
        for (auto& [r, v] : L[c]) rcount[r]++;
    lp[0] = 0;
    for (int64_t i = 0; i < n; i++) lp[i + 1] = lp[i] + rcount[i];
    if (lp[n] > cap) return -1;
    std::vector<int64_t> pos(n);
    for (int64_t i = 0; i < n; i++) pos[i] = lp[i];
    for (int64_t c = 0; c < n; c++)
        for (auto& [r, v] : L[c]) {
            li[pos[r]] = c;
            lx[pos[r]] = v;
            pos[r]++;
        }
    return lp[n];
}

// Left-looking LU with partial pivoting (Gilbert–Peierls, dense work array).
// A: full CSR. Outputs L (unit diag implicit, CSR), U (CSR), row permutation
// prow (prow[k] = original row in position k). Returns 0 or <0.
int64_t splu(int64_t n, const int64_t* ap, const int64_t* ai, const double* ax,
             int64_t* lp, int64_t* li, double* lx,
             int64_t* up, int64_t* ui, double* ux,
             int64_t* prow, int64_t lcap, int64_t ucap, double pivot_tol) {
    // column access of A
    std::vector<std::vector<std::pair<int64_t, double>>> Acols(n);
    for (int64_t i = 0; i < n; i++)
        for (int64_t p = ap[i]; p < ap[i + 1]; p++)
            Acols[ai[p]].push_back({i, ax[p]});
    // L columns (in permuted row space), U columns
    std::vector<std::vector<std::pair<int64_t, double>>> Lcols(n), Ucols(n);
    std::vector<int64_t> pinv(n, -1);  // original row -> permuted position
    std::vector<double> work(n, 0.0);
    std::vector<char> mark(n, 0);
    std::vector<int64_t> patt;

    for (int64_t j = 0; j < n; j++) {
        patt.clear();
        for (auto& [i, v] : Acols[j]) {
            work[i] += v;  // indexed by ORIGINAL row
            if (!mark[i]) { mark[i] = 1; patt.push_back(i); }
        }
        // eliminate with columns k<j in pivot order: x -= L(:,k) * x[row_k]
        for (int64_t k = 0; k < j; k++) {
            int64_t rk = prow[k];
            if (!mark[rk] || work[rk] == 0.0) continue;
            double ukj = work[rk];  // value of U(k, j)
            for (auto& [r, v] : Lcols[k]) {  // r = original rows below pivot
                work[r] -= ukj * v;
                if (!mark[r]) { mark[r] = 1; patt.push_back(r); }
            }
        }
        // pivot: among unpivoted rows, pick max |work|
        double amax = 0.0;
        int64_t piv = -1;
        for (int64_t r : patt)
            if (pinv[r] < 0 && std::fabs(work[r]) > amax) {
                amax = std::fabs(work[r]);
                piv = r;
            }
        if (piv < 0 || amax == 0.0) return -3;  // structurally singular
        // optional threshold pivoting toward the diagonal
        if (pivot_tol < 1.0 && pinv[j] < 0 && mark[j] &&
            std::fabs(work[j]) >= pivot_tol * amax)
            piv = j;
        prow[j] = piv;
        pinv[piv] = j;
        double upiv = work[piv];
        // U column j: pivoted rows (k <= j), L column j: unpivoted rows / pivot
        for (int64_t r : patt) {
            double v = work[r];
            work[r] = 0.0;
            mark[r] = 0;
            if (v == 0.0) continue;
            if (pinv[r] >= 0 && pinv[r] <= j) {
                Ucols[j].push_back({pinv[r], v});
            } else {
                Lcols[j].push_back({r, v / upiv});
            }
        }
        // sort U column by permuted row
        std::sort(Ucols[j].begin(), Ucols[j].end());
    }
    // export U as CSR over permuted rows
    std::vector<int64_t> ucount(n, 0), lcount(n, 0);
    for (int64_t c = 0; c < n; c++) {
        for (auto& [r, v] : Ucols[c]) ucount[r]++;
        for (auto& [r, v] : Lcols[c]) lcount[pinv[r]]++;
    }
    up[0] = 0;
    lp[0] = 0;
    for (int64_t i = 0; i < n; i++) {
        up[i + 1] = up[i] + ucount[i];
        lp[i + 1] = lp[i] + lcount[i] + 1;  // +1 for unit diagonal
    }
    if (up[n] > ucap || lp[n] > lcap) return -1;
    std::vector<int64_t> uposv(n), lposv(n);
    for (int64_t i = 0; i < n; i++) { uposv[i] = up[i]; lposv[i] = lp[i]; }
    // L unit diagonal entries first
    for (int64_t i = 0; i < n; i++) {
        li[lposv[i]] = i;
        lx[lposv[i]] = 1.0;
        lposv[i]++;
    }
    for (int64_t c = 0; c < n; c++) {
        for (auto& [r, v] : Ucols[c]) {
            ui[uposv[r]] = c;
            ux[uposv[r]] = v;
            uposv[r]++;
        }
        for (auto& [r, v] : Lcols[c]) {
            int64_t pr = pinv[r];
            li[lposv[pr]] = c;
            lx[lposv[pr]] = v;
            lposv[pr]++;
        }
    }
    return 0;
}

}  // extern "C"

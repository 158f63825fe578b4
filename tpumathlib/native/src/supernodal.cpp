// Supernodal left-looking sparse Cholesky (tpumathlib.dss FACTORIZATION
// phase, ≙ the supernodal engine inside cuDSS — cuDSS runs a supernodal
// multifrontal factorization on the GPU; this is the host-runtime
// equivalent, with dense panel updates that vectorize under -O3 instead
// of the simplicial per-entry updates in sparse_factor.cpp).
//
// Pipeline: column patterns from the elimination tree (children-merge),
// fundamental supernode detection (parent chain + identical pattern,
// width-capped), dense R×W panels, descendant updates as small GEMMs
// scattered through relative row maps, dense diagonal-block Cholesky +
// triangular panel solve. Output is the same column-compressed L layout
// spchol_ll emits (diag first, rows sorted), so the solve path is shared.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

// dense C (r x c) -= A (r x k) * B(c x k)^T ; row-major lda/ldb/ldc
static void gemm_nt_sub(int64_t r, int64_t c, int64_t k,
                        const double* A, int64_t lda,
                        const double* B, int64_t ldb,
                        double* C, int64_t ldc) {
    for (int64_t i = 0; i < r; i++) {
        const double* ai = A + i * lda;
        double* ci = C + i * ldc;
        for (int64_t j = 0; j < c; j++) {
            const double* bj = B + j * ldb;
            double s = 0.0;
            for (int64_t t = 0; t < k; t++) s += ai[t] * bj[t];
            ci[j] -= s;
        }
    }
}

}  // namespace

extern "C" {

// Lower-CSR SPD input (rows of the lower triangle incl. diagonal) of the
// permuted matrix; outputs column-compressed L (lp, li, lx) with capacity
// cap. Returns nnz(L), -1 if capacity exceeded, -3 if not positive
// definite.
int64_t spchol_super(int64_t n, const int64_t* ap, const int64_t* ai,
                     const double* ax, int64_t* lp, int64_t* li,
                     double* lx, int64_t cap, int64_t max_width) {
    // --- A by columns (lower part) ---
    std::vector<std::vector<std::pair<int64_t, double>>> Acols(n);
    for (int64_t i = 0; i < n; i++)
        for (int64_t p = ap[i]; p < ap[i + 1]; p++) {
            int64_t j = ai[p];
            if (j > i) return -2;
            Acols[j].push_back({i, ax[p]});
        }
    // --- symbolic: column patterns by children merge ---
    std::vector<std::vector<int64_t>> pat(n);
    std::vector<int64_t> parent(n, -1);
    std::vector<std::vector<int64_t>> kids(n);
    {
        std::vector<char> mark(n, 0);
        std::vector<int64_t> touch;
        for (int64_t j = 0; j < n; j++) {
            touch.clear();
            auto add = [&](int64_t r) {
                if (r > j && !mark[r]) { mark[r] = 1; touch.push_back(r); }
            };
            for (auto& [r, v] : Acols[j]) add(r);
            for (int64_t c : kids[j])
                for (int64_t r : pat[c]) add(r);
            std::sort(touch.begin(), touch.end());
            pat[j] = touch;
            for (int64_t r : touch) mark[r] = 0;
            if (!pat[j].empty()) {
                parent[j] = pat[j][0];
                kids[parent[j]].push_back(j);
            }
        }
    }
    // --- relaxed supernode blocking (CHOLMOD-style amalgamation):
    // contiguous column blocks, row set = UNION of member patterns; a
    // column joins while the panel stays width-capped and reasonably
    // dense (structural zeros inside a panel trade flops for GEMM shape)
    std::vector<int64_t> snode_of(n);
    std::vector<int64_t> sn_start, sn_end;
    std::vector<std::vector<int64_t>> rows;       // below-block rows, sorted
    {
        std::vector<char> inset(n, 0);
        std::vector<int64_t> cur;                 // rows >= current block end
        int64_t j0 = 0, cells = 0;
        auto flush = [&](int64_t j1) {
            sn_start.push_back(j0);
            sn_end.push_back(j1);
            std::sort(cur.begin(), cur.end());
            rows.push_back(cur);
            for (int64_t r : cur) inset[r] = 0;
            cur.clear();
            cells = 0;
            j0 = j1;
        };
        for (int64_t j = 0; j < n; j++) {
            // tentative: add column j to the open block [j0, j)
            int64_t w = j - j0;
            int64_t newrows = 0;
            for (int64_t r : pat[j])
                if (!inset[r]) newrows++;
            int64_t rset = (int64_t)cur.size();
            // rows currently in the set that equal j move into the
            // diagonal part — panel height = (rset - (inset[j]?1:0)) + ...
            int64_t height = rset + newrows + (w + 1)
                - (inset[j] ? 1 : 0);
            int64_t ncells = height * (w + 1);
            int64_t nz = cells + (int64_t)pat[j].size() + (w + 1);
            bool ok = (w + 1 <= max_width)
                && (w == 0 || 3 * nz >= 2 * ncells);  // density >= 2/3
            if (!ok) flush(j);
            if (inset[j]) {
                cur.erase(std::find(cur.begin(), cur.end(), j));
                inset[j] = 0;
            }
            for (int64_t r : pat[j])
                if (!inset[r]) { inset[r] = 1; cur.push_back(r); }
            cells += (int64_t)pat[j].size() + (j - j0 + 1);
            snode_of[j] = (int64_t)sn_start.size();
        }
        flush(n);
    }
    int64_t nsn = sn_start.size();
    std::vector<std::vector<double>> panel(nsn);  // row-major R x W
    std::vector<int64_t> rpos(n, -1);             // scratch: row -> panel row
    for (int64_t s = 0; s < nsn; s++) {
        int64_t j0 = sn_start[s], j1 = sn_end[s];
        // full row list: diagonal cols then below-block rows
        std::vector<int64_t> rs;
        for (int64_t j = j0; j < j1; j++) rs.push_back(j);
        for (int64_t r : rows[s]) if (r >= j1) rs.push_back(r);
        rows[s] = rs;
        panel[s].assign(rs.size() * (j1 - j0), 0.0);
    }
    // links[s] = list of (descendant supernode d, first active row offset)
    std::vector<std::vector<std::pair<int64_t, int64_t>>> links(nsn);
    std::vector<double> upd;  // scratch update block
    for (int64_t s = 0; s < nsn; s++) {
        int64_t j0 = sn_start[s], j1 = sn_end[s], w = j1 - j0;
        auto& rs = rows[s];
        int64_t R = rs.size();
        double* P = panel[s].data();
        for (int64_t r = 0; r < R; r++) rpos[rs[r]] = r;
        // scatter A columns
        for (int64_t j = j0; j < j1; j++)
            for (auto& [r, v] : Acols[j])
                P[rpos[r] * w + (j - j0)] += v;
        // descendant updates
        for (auto& [d, off0] : links[s]) {
            auto& rd = rows[d];
            int64_t wd = sn_end[d] - sn_start[d];
            const double* Pd = panel[d].data();
            // rows of d in [j0, j1) -> k-set; rows >= j1 -> continue set
            int64_t off = off0;
            int64_t mid = off;
            while (mid < (int64_t)rd.size() && rd[mid] < j1) mid++;
            int64_t c = mid - off;           // columns of the update
            int64_t r2 = rd.size() - off;    // rows of the update
            if (c <= 0) continue;
            // U (r2 x c) = Ld[off.., :] * Ld[off..mid, :]^T
            upd.assign(r2 * c, 0.0);
            for (int64_t i = 0; i < r2; i++) {
                const double* a_ = Pd + (off + i) * wd;
                for (int64_t j = 0; j < c; j++) {
                    const double* b_ = Pd + (off + j) * wd;
                    double sacc = 0.0;
                    for (int64_t t = 0; t < wd; t++) sacc += a_[t] * b_[t];
                    upd[i * c + j] = sacc;
                }
            }
            // scatter: target col = rd[off+j] - j0; target row = rpos
            for (int64_t i = 0; i < r2; i++) {
                int64_t tr = rpos[rd[off + i]];
                double* prow = P + tr * w;
                const double* ur = upd.data() + i * c;
                for (int64_t j = 0; j < c; j++)
                    prow[rd[off + j] - j0] -= ur[j];
            }
            // pass d on to the supernode of its next uneliminated row
            if (mid < (int64_t)rd.size())
                links[snode_of[rd[mid]]].push_back({d, mid});
        }
        // dense factor: W x W diag block + (R-W) x W panel solve,
        // column by column within the supernode
        for (int64_t j = 0; j < w; j++) {
            double dj = P[j * w + j];
            for (int64_t t = 0; t < j; t++)
                dj -= P[j * w + t] * P[j * w + t];
            if (!(dj > 0.0)) { for (int64_t r = 0; r < R; r++) rpos[rs[r]] = -1; return -3; }
            dj = std::sqrt(dj);
            P[j * w + j] = dj;
            for (int64_t i = j + 1; i < R; i++) {
                double v = P[i * w + j];
                const double* pi_ = P + i * w;
                const double* pj_ = P + j * w;
                double sacc = 0.0;
                for (int64_t t = 0; t < j; t++) sacc += pi_[t] * pj_[t];
                P[i * w + j] = (v - sacc) / dj;
            }
        }
        if (R > w)
            links[snode_of[rs[w]]].push_back({s, w});
        for (int64_t r = 0; r < R; r++) rpos[rs[r]] = -1;
    }
    // --- emit CSR rows of L (row i: entries L(i, 0..i), ascending
    // columns, diag last) — the spchol_ll contract the solve path uses
    std::vector<int64_t> rcount(n, 0);
    for (int64_t s = 0; s < nsn; s++) {
        int64_t j0 = sn_start[s], w = sn_end[s] - j0;
        auto& rs = rows[s];
        for (int64_t i = 0; i < (int64_t)rs.size(); i++)
            rcount[rs[i]] += std::min<int64_t>(i + 1, w);
    }
    lp[0] = 0;
    for (int64_t i = 0; i < n; i++) lp[i + 1] = lp[i] + rcount[i];
    if (lp[n] > cap) return -1;
    std::vector<int64_t> pos(lp, lp + n);
    for (int64_t s = 0; s < nsn; s++) {
        int64_t j0 = sn_start[s], w = sn_end[s] - j0;
        auto& rs = rows[s];
        const double* P = panel[s].data();
        for (int64_t i = 0; i < (int64_t)rs.size(); i++) {
            int64_t r = rs[i];
            int64_t jmax = std::min<int64_t>(i + 1, w);
            for (int64_t j = 0; j < jmax; j++) {
                li[pos[r]] = j0 + j;
                lx[pos[r]] = P[i * w + j];
                pos[r]++;
            }
        }
    }
    return lp[n];
}

}  // extern "C"

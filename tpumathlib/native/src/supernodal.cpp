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
//
// THREADING (≙ cuDSS/test_threading_layer — the pluggable threading
// backend): the descendant-update links are precomputed symbolically, so
// supernodes become tasks whose only dependencies are their CHILDREN in
// the supernodal elimination tree (all contributing descendants lie in
// the child subtrees and are final when the children are). A work queue
// over ready supernodes + per-thread scratch gives lock-free panel reads
// (finished panels are immutable) with one mutex around the queue.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Super {
  int64_t n, nsn;
  std::vector<int64_t> sn_start, sn_end, snode_of;
  std::vector<std::vector<int64_t>> rows;   // diag cols then below rows
  std::vector<std::vector<double>> panel;   // row-major R x W
  // symbolically precomputed: links_all[s] = [(descendant d, row offset)]
  std::vector<std::vector<std::pair<int64_t, int64_t>>> links_all;
  std::vector<int64_t> sparent;
  std::vector<std::vector<std::pair<int64_t, double>>> Acols;
};

int64_t build_symbolic(int64_t n, const int64_t* ap, const int64_t* ai,
                       const double* ax, int64_t max_width, Super& S) {
  S.n = n;
  S.Acols.assign(n, {});
  for (int64_t i = 0; i < n; i++)
    for (int64_t p = ap[i]; p < ap[i + 1]; p++) {
      int64_t j = ai[p];
      if (j > i) return -2;
      S.Acols[j].push_back({i, ax[p]});
    }
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
      for (auto& [r, v] : S.Acols[j]) add(r);
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
  // relaxed supernode blocking (CHOLMOD-style amalgamation)
  S.snode_of.assign(n, 0);
  {
    std::vector<char> inset(n, 0);
    std::vector<int64_t> cur;
    int64_t j0 = 0, cells = 0;
    auto flush = [&](int64_t j1) {
      S.sn_start.push_back(j0);
      S.sn_end.push_back(j1);
      std::sort(cur.begin(), cur.end());
      S.rows.push_back(cur);
      for (int64_t r : cur) inset[r] = 0;
      cur.clear();
      cells = 0;
      j0 = j1;
    };
    for (int64_t j = 0; j < n; j++) {
      int64_t w = j - j0;
      int64_t newrows = 0;
      for (int64_t r : pat[j])
        if (!inset[r]) newrows++;
      int64_t rset = (int64_t)cur.size();
      int64_t height = rset + newrows + (w + 1) - (inset[j] ? 1 : 0);
      int64_t ncells = height * (w + 1);
      int64_t nz = cells + (int64_t)pat[j].size() + (w + 1);
      bool ok = (w + 1 <= max_width) && (w == 0 || 3 * nz >= 2 * ncells);
      if (!ok) flush(j);
      if (inset[j]) {
        cur.erase(std::find(cur.begin(), cur.end(), j));
        inset[j] = 0;
      }
      for (int64_t r : pat[j])
        if (!inset[r]) { inset[r] = 1; cur.push_back(r); }
      cells += (int64_t)pat[j].size() + (j - j0 + 1);
      S.snode_of[j] = (int64_t)S.sn_start.size();
    }
    flush(n);
  }
  S.nsn = (int64_t)S.sn_start.size();
  S.panel.assign(S.nsn, {});
  for (int64_t s = 0; s < S.nsn; s++) {
    int64_t j0 = S.sn_start[s], j1 = S.sn_end[s];
    std::vector<int64_t> rs;
    for (int64_t j = j0; j < j1; j++) rs.push_back(j);
    for (int64_t r : S.rows[s]) if (r >= j1) rs.push_back(r);
    S.rows[s] = rs;
    S.panel[s].assign(rs.size() * (j1 - j0), 0.0);
  }
  // precompute ALL descendant links symbolically: for each supernode d,
  // its sorted below-block rows split into segments per target supernode
  S.links_all.assign(S.nsn, {});
  S.sparent.assign(S.nsn, -1);
  for (int64_t d = 0; d < S.nsn; d++) {
    int64_t w = S.sn_end[d] - S.sn_start[d];
    auto& rd = S.rows[d];
    int64_t R = (int64_t)rd.size();
    if (R <= w) continue;
    S.sparent[d] = S.snode_of[rd[w]];
    int64_t i = w;
    while (i < R) {
      int64_t t = S.snode_of[rd[i]];
      S.links_all[t].push_back({d, i});
      int64_t j1t = S.sn_end[t];
      while (i < R && rd[i] < j1t) i++;
    }
  }
  return 0;
}

// numeric factorization of one supernode (updates precomputed links)
bool factor_one(Super& S, int64_t s, std::vector<int64_t>& rpos,
                std::vector<double>& upd) {
  int64_t j0 = S.sn_start[s], j1 = S.sn_end[s], w = j1 - j0;
  auto& rs = S.rows[s];
  int64_t R = (int64_t)rs.size();
  double* P = S.panel[s].data();
  for (int64_t r = 0; r < R; r++) rpos[rs[r]] = r;
  for (int64_t j = j0; j < j1; j++)
    for (auto& [r, v] : S.Acols[j])
      P[rpos[r] * w + (j - j0)] += v;
  for (auto& [d, off] : S.links_all[s]) {
    auto& rd = S.rows[d];
    int64_t wd = S.sn_end[d] - S.sn_start[d];
    const double* Pd = S.panel[d].data();
    int64_t mid = off;
    while (mid < (int64_t)rd.size() && rd[mid] < j1) mid++;
    int64_t c = mid - off;
    int64_t r2 = (int64_t)rd.size() - off;
    if (c <= 0) continue;
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
    for (int64_t i = 0; i < r2; i++) {
      int64_t tr = rpos[rd[off + i]];
      double* prow = P + tr * w;
      const double* ur = upd.data() + i * c;
      for (int64_t j = 0; j < c; j++)
        prow[rd[off + j] - j0] -= ur[j];
    }
  }
  for (int64_t j = 0; j < w; j++) {
    double dj = P[j * w + j];
    for (int64_t t = 0; t < j; t++) dj -= P[j * w + t] * P[j * w + t];
    if (!(dj > 0.0)) {
      for (int64_t r = 0; r < R; r++) rpos[rs[r]] = -1;
      return false;
    }
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
  for (int64_t r = 0; r < R; r++) rpos[rs[r]] = -1;
  return true;
}

int64_t emit(const Super& S, int64_t* lp, int64_t* li, double* lx,
             int64_t cap) {
  int64_t n = S.n;
  std::vector<int64_t> rcount(n, 0);
  for (int64_t s = 0; s < S.nsn; s++) {
    int64_t j0 = S.sn_start[s], w = S.sn_end[s] - j0;
    auto& rs = S.rows[s];
    for (int64_t i = 0; i < (int64_t)rs.size(); i++)
      rcount[rs[i]] += std::min<int64_t>(i + 1, w);
  }
  lp[0] = 0;
  for (int64_t i = 0; i < n; i++) lp[i + 1] = lp[i] + rcount[i];
  if (lp[n] > cap) return -1;
  std::vector<int64_t> pos(lp, lp + n);
  for (int64_t s = 0; s < S.nsn; s++) {
    int64_t j0 = S.sn_start[s], w = S.sn_end[s] - j0;
    auto& rs = S.rows[s];
    const double* P = S.panel[s].data();
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

}  // namespace

extern "C" {

// Threaded variant: nthreads workers over the supernodal etree task DAG.
int64_t spchol_super_mt(int64_t n, const int64_t* ap, const int64_t* ai,
                        const double* ax, int64_t* lp, int64_t* li,
                        double* lx, int64_t cap, int64_t max_width,
                        int64_t nthreads) {
  Super S;
  int64_t rc = build_symbolic(n, ap, ai, ax, max_width, S);
  if (rc < 0) return rc;
  int64_t nsn = S.nsn;
  std::vector<std::atomic<int64_t>> nchild(nsn);
  for (int64_t s = 0; s < nsn; s++) nchild[s] = 0;
  for (int64_t s = 0; s < nsn; s++)
    if (S.sparent[s] >= 0) nchild[S.sparent[s]]++;

  int nt = (int)std::max<int64_t>(1, std::min<int64_t>(
      nthreads, (int64_t)std::thread::hardware_concurrency()));
  if (nt <= 1 || nsn < 4) {
    std::vector<int64_t> rpos(n, -1);
    std::vector<double> upd;
    for (int64_t s = 0; s < nsn; s++)
      if (!factor_one(S, s, rpos, upd)) return -3;
    return emit(S, lp, li, lx, cap);
  }

  std::mutex mu;
  std::condition_variable cv;
  std::vector<int64_t> ready;
  for (int64_t s = 0; s < nsn; s++)
    if (nchild[s] == 0) ready.push_back(s);
  std::atomic<int64_t> done{0};
  std::atomic<bool> fail{false};

  auto worker = [&]() {
    std::vector<int64_t> rpos(n, -1);
    std::vector<double> upd;
    for (;;) {
      int64_t s = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] {
          return !ready.empty() || done.load() >= nsn || fail.load();
        });
        if (fail.load() || (ready.empty() && done.load() >= nsn)) return;
        s = ready.back();
        ready.pop_back();
      }
      if (!factor_one(S, s, rpos, upd)) {
        fail = true;
        cv.notify_all();
        return;
      }
      int64_t fin = ++done;
      int64_t p = S.sparent[s];
      bool notify = fin >= nsn;
      if (p >= 0 && --nchild[p] == 0) {
        std::lock_guard<std::mutex> lk(mu);
        ready.push_back(p);
        notify = true;
      }
      if (notify) cv.notify_all();
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  if (fail.load()) return -3;
  return emit(S, lp, li, lx, cap);
}

// Lower-CSR SPD input (rows of the lower triangle incl. diagonal) of the
// permuted matrix; outputs column-compressed L (lp, li, lx) with capacity
// cap. Returns nnz(L), -1 if capacity exceeded, -3 if not positive
// definite.
int64_t spchol_super(int64_t n, const int64_t* ap, const int64_t* ai,
                     const double* ax, int64_t* lp, int64_t* li,
                     double* lx, int64_t cap, int64_t max_width) {
  return spchol_super_mt(n, ap, ai, ax, lp, li, lx, cap, max_width, 1);
}

}  // extern "C"

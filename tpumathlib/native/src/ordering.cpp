// Fill-reducing ordering for the sparse direct solver (tpumathlib.dss) —
// the native analysis-phase component (≙ the reordering cuDSS runs inside
// cudssExecute(ANALYSIS); cf. cuDSS reordering-only sample).
//
// Implements classic minimum-degree on the symmetrized pattern (quotient
// graph with supernode absorption omitted — plain MD with lazy degree
// updates; adequate for the sample-scale fixtures; METIS-class nested
// dissection is a later round's work).

#include <cstdint>
#include <vector>
#include <queue>
#include <set>
#include <algorithm>

extern "C" {

// CSR pattern (symmetrized by caller) → permutation perm (new order:
// perm[k] = original index eliminated at step k). Returns 0 on success.
int md_ordering(int64_t n, const int64_t* indptr, const int64_t* indices,
                int64_t* perm) {
    std::vector<std::set<int64_t>> adj(n);
    for (int64_t i = 0; i < n; i++)
        for (int64_t p = indptr[i]; p < indptr[i + 1]; p++) {
            int64_t j = indices[p];
            if (j != i && j >= 0 && j < n) {
                adj[i].insert(j);
                adj[j].insert(i);
            }
        }
    std::vector<char> eliminated(n, 0);
    using Node = std::pair<int64_t, int64_t>;  // (degree, vertex)
    std::priority_queue<Node, std::vector<Node>, std::greater<Node>> pq;
    for (int64_t i = 0; i < n; i++) pq.push({(int64_t)adj[i].size(), i});

    for (int64_t k = 0; k < n; k++) {
        int64_t v = -1;
        while (!pq.empty()) {
            auto [deg, u] = pq.top();
            pq.pop();
            if (!eliminated[u] && deg == (int64_t)adj[u].size()) { v = u; break; }
        }
        if (v < 0) {  // all remaining entries stale: linear scan
            for (int64_t i = 0; i < n; i++)
                if (!eliminated[i]) { v = i; break; }
        }
        perm[k] = v;
        eliminated[v] = 1;
        // form clique among v's neighbors (the fill of eliminating v)
        std::vector<int64_t> nbrs(adj[v].begin(), adj[v].end());
        for (int64_t a : nbrs) {
            adj[a].erase(v);
            for (int64_t b : nbrs)
                if (a != b && !eliminated[b]) adj[a].insert(b);
            pq.push({(int64_t)adj[a].size(), a});
        }
        adj[v].clear();
    }
    return 0;
}

// Nested-dissection ordering (METIS-class structure, BFS bisection):
// recursive two-way split via pseudo-peripheral BFS layering, vertex
// separator = A-side boundary of the cut, separator ordered LAST.
// Small leaves fall back to local minimum degree. Returns 0 on success.
int nd_ordering(int64_t n, const int64_t* indptr, const int64_t* indices,
                int64_t* perm) {
    // symmetrized adjacency
    std::vector<std::vector<int64_t>> adj(n);
    for (int64_t i = 0; i < n; i++)
        for (int64_t p = indptr[i]; p < indptr[i + 1]; p++) {
            int64_t j = indices[p];
            if (j != i && j >= 0 && j < n) {
                adj[i].push_back(j);
                adj[j].push_back(i);
            }
        }
    for (auto& a : adj) {
        std::sort(a.begin(), a.end());
        a.erase(std::unique(a.begin(), a.end()), a.end());
    }
    std::vector<int64_t> out;
    out.reserve(n);
    std::vector<int64_t> level(n, -1);
    std::vector<char> inpart(n, 0);  // scratch: membership of current set

    // local minimum-degree on a small subset (restricted to the subset)
    auto md_local = [&](std::vector<int64_t>& vs) {
        std::vector<std::set<int64_t>> a(vs.size());
        std::vector<int64_t> lid(n, -1);
        for (size_t k = 0; k < vs.size(); k++) lid[vs[k]] = (int64_t)k;
        for (size_t k = 0; k < vs.size(); k++)
            for (int64_t u : adj[vs[k]])
                if (lid[u] >= 0) a[k].insert(lid[u]);
        std::vector<char> done(vs.size(), 0);
        for (size_t step = 0; step < vs.size(); step++) {
            int64_t best = -1, bd = INT64_MAX;
            for (size_t k = 0; k < vs.size(); k++)
                if (!done[k] && (int64_t)a[k].size() < bd) {
                    bd = (int64_t)a[k].size();
                    best = (int64_t)k;
                }
            done[best] = 1;
            out.push_back(vs[best]);
            std::vector<int64_t> nb(a[best].begin(), a[best].end());
            for (int64_t u : nb) {
                a[u].erase(best);
                for (int64_t v : nb)
                    if (u != v && !done[v]) a[u].insert(v);
            }
            a[best].clear();
        }
        for (int64_t v : vs) lid[v] = -1;
    };

    // iterative recursion over vertex subsets
    std::vector<std::vector<int64_t>> work;
    {
        std::vector<int64_t> all(n);
        for (int64_t i = 0; i < n; i++) all[i] = i;
        work.push_back(std::move(all));
    }
    std::vector<std::vector<int64_t>> seps;  // reversed emission order
    while (!work.empty()) {
        std::vector<int64_t> vs = std::move(work.back());
        work.pop_back();
        if ((int64_t)vs.size() <= 48) {
            md_local(vs);
            continue;
        }
        // BFS from a pseudo-peripheral vertex of this subset
        for (int64_t v : vs) inpart[v] = 1;
        auto bfs = [&](int64_t s) {
            for (int64_t v : vs) level[v] = -1;
            std::vector<int64_t> q{s};
            level[s] = 0;
            int64_t last = s;
            for (size_t h = 0; h < q.size(); h++) {
                int64_t u = q[h];
                last = u;
                for (int64_t w : adj[u])
                    if (inpart[w] && level[w] < 0) {
                        level[w] = level[u] + 1;
                        q.push_back(w);
                    }
            }
            return std::make_pair(last, q);
        };
        auto [far1, q1] = bfs(vs[0]);
        auto [far2, q] = bfs(far1);
        // disconnected subset: strip the reached component, requeue rest
        if ((int64_t)q.size() < (int64_t)vs.size()) {
            std::vector<int64_t> rest;
            for (int64_t v : vs)
                if (level[v] < 0) rest.push_back(v);
            for (int64_t v : vs) inpart[v] = 0;
            work.push_back(std::move(q));
            work.push_back(std::move(rest));
            continue;
        }
        // split by BFS level: among levels whose cumulative size lands in
        // the middle half of the set, pick the THINNEST layer (smallest
        // separator) — the classic level-structure refinement
        int64_t maxlev = level[q.back()];
        std::vector<int64_t> lsize(maxlev + 1, 0);
        for (int64_t v : q) lsize[level[v]]++;
        int64_t cut_level = 1, bestsz = INT64_MAX;
        {
            int64_t cum = 0;
            for (int64_t L = 0; L <= maxlev; L++) {
                int64_t before = cum;
                cum += lsize[L];
                if (L == 0 || before < (int64_t)q.size() / 4
                    || before > (3 * (int64_t)q.size()) / 4)
                    continue;
                if (lsize[L] < bestsz) { bestsz = lsize[L]; cut_level = L; }
            }
            if (bestsz == INT64_MAX)
                cut_level = level[q[(int64_t)q.size() / 2]];
            if (cut_level < 1) cut_level = 1;
        }
        std::vector<int64_t> a_side, b_side, sep;
        for (int64_t v : q)
            (level[v] < cut_level ? a_side : b_side).push_back(v);
        // separator: b_side vertices adjacent to a_side
        for (int64_t v : a_side) inpart[v] = 2;  // mark A
        std::vector<int64_t> b_keep;
        for (int64_t v : b_side) {
            bool boundary = false;
            for (int64_t w : adj[v])
                if (inpart[w] == 2) { boundary = true; break; }
            (boundary ? sep : b_keep).push_back(v);
        }
        for (int64_t v : vs) inpart[v] = 0;
        if (a_side.empty() || b_keep.empty()) {
            // degenerate split (e.g. star graphs): fall back to MD-ish
            md_local(vs);
            continue;
        }
        seps.push_back(std::move(sep));
        work.push_back(std::move(a_side));
        work.push_back(std::move(b_keep));
    }
    // separators eliminate last, innermost first
    for (auto it = seps.rbegin(); it != seps.rend(); ++it)
        for (int64_t v : *it) out.push_back(v);
    if ((int64_t)out.size() != n) return -1;
    for (int64_t k = 0; k < n; k++) perm[k] = out[k];
    return 0;
}

// Symbolic Cholesky factorization: given a symmetric pattern (lower CSR of
// PAPᵀ) compute the nonzero count of L per column (for workspace sizing —
// the bufferSize analogue) and the elimination-tree parent array.
int symbolic_cholesky(int64_t n, const int64_t* indptr, const int64_t* indices,
                      int64_t* parent, int64_t* col_nnz) {
    std::vector<int64_t> ancestor(n, -1);
    for (int64_t i = 0; i < n; i++) { parent[i] = -1; col_nnz[i] = 1; }
    for (int64_t j = 0; j < n; j++) {
        for (int64_t p = indptr[j]; p < indptr[j + 1]; p++) {
            int64_t i = indices[p];
            if (i >= j) continue;  // use strict upper of row j = column reach
            int64_t k = i;
            while (k != -1 && k < j) {
                int64_t next = ancestor[k];
                ancestor[k] = j;
                if (next == -1) { parent[k] = j; col_nnz[k]++; }
                k = next;
            }
        }
    }
    return 0;
}

}  // extern "C"

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

// SpGEMM symbolic phase (cuSPARSE spgemm workEstimation parity:
// cuSPARSE/spgemm/spgemm_example.c, cuSPARSE/spgemm_mem/spgemm_example.c).
//
// Expands the flat multiplication plan (a_pos, b_pos) and derives C's
// canonical sorted-CSR pattern plus the product->C scatter map (c_seg).
// Products are generated grouped by A row, so only per-row local sorts are
// needed: each row's (column, local-index) pairs are packed into one u64
// and sorted with std::sort -- O(nmul log rownnz), cache-resident.
// Zero-valued entries (capacity padding) are treated as absent via the
// keep masks so padding can't manufacture fill-in.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Number of scalar products for rows [row_lo, row_hi). O(nnzA + nnzB).
int64_t spgemm_count(int64_t row_lo, int64_t row_hi, int64_t k,
                     const int64_t* a_indptr, const int64_t* a_indices,
                     const uint8_t* a_keep, const int64_t* b_indptr,
                     const uint8_t* b_keep) {
    std::vector<int64_t> brow_nnz(k, 0);
    for (int64_t r = 0; r < k; ++r)
        for (int64_t p = b_indptr[r]; p < b_indptr[r + 1]; ++p)
            if (b_keep[p]) ++brow_nnz[r];
    int64_t nmul = 0;
    for (int64_t p = a_indptr[row_lo]; p < a_indptr[row_hi]; ++p)
        if (a_keep[p]) nmul += brow_nnz[a_indices[p]];
    return nmul;
}

// Fills a_pos/b_pos/c_seg (size nmul from spgemm_count), c_indices
// (capacity nmul) and c_indptr (size row_hi-row_lo+1); returns C nnz.
int64_t spgemm_symbolic(int64_t row_lo, int64_t row_hi, int64_t k,
                        const int64_t* a_indptr, const int64_t* a_indices,
                        const uint8_t* a_keep, const int64_t* b_indptr,
                        const int64_t* b_indices, const uint8_t* b_keep,
                        int64_t* a_pos, int64_t* b_pos, int64_t* c_seg,
                        int64_t* c_indices, int64_t* c_indptr) {
    // kept-B grouping: positions into B.data of nonzero entries, per row
    std::vector<int64_t> kb_indptr(k + 1, 0);
    for (int64_t r = 0; r < k; ++r) {
        int64_t cnt = 0;
        for (int64_t p = b_indptr[r]; p < b_indptr[r + 1]; ++p)
            if (b_keep[p]) ++cnt;
        kb_indptr[r + 1] = kb_indptr[r] + cnt;
    }
    std::vector<int64_t> kb_pos(kb_indptr[k]);
    {
        int64_t w = 0;
        for (int64_t r = 0; r < k; ++r)
            for (int64_t p = b_indptr[r]; p < b_indptr[r + 1]; ++p)
                if (b_keep[p]) kb_pos[w++] = p;
    }
    int64_t nnz = 0, w = 0;
    c_indptr[0] = 0;
    std::vector<uint64_t> packed;  // (col << 20 | local) or wide fallback
    std::vector<std::pair<int64_t, int64_t>> wide;
    for (int64_t i = row_lo; i < row_hi; ++i) {
        const int64_t p0 = w;
        for (int64_t p = a_indptr[i]; p < a_indptr[i + 1]; ++p) {
            if (!a_keep[p]) continue;
            const int64_t br = a_indices[p];
            for (int64_t q = kb_indptr[br]; q < kb_indptr[br + 1]; ++q) {
                a_pos[w] = p;
                b_pos[w] = kb_pos[q];
                ++w;
            }
        }
        const int64_t rn = w - p0;
        if (rn == 0) { c_indptr[i - row_lo + 1] = nnz; continue; }
        // sort row products by B column; local index rides in the low bits
        // when it fits (rn < 2^20 and col < 2^43), else a pair sort
        bool fits = rn < (int64_t(1) << 20);
        if (fits) {
            packed.resize(rn);
            for (int64_t t = 0; t < rn; ++t) {
                uint64_t col = uint64_t(b_indices[b_pos[p0 + t]]);
                if (col >= (uint64_t(1) << 43)) { fits = false; break; }
                packed[t] = (col << 20) | uint64_t(t);
            }
        }
        if (fits) {
            std::sort(packed.begin(), packed.end());
            int64_t prev_col = -1;
            for (int64_t t = 0; t < rn; ++t) {
                int64_t col = int64_t(packed[t] >> 20);
                int64_t local = int64_t(packed[t] & ((1u << 20) - 1));
                if (col != prev_col) { c_indices[nnz++] = col; prev_col = col; }
                c_seg[p0 + local] = nnz - 1;
            }
        } else {
            wide.resize(rn);
            for (int64_t t = 0; t < rn; ++t)
                wide[t] = {b_indices[b_pos[p0 + t]], t};
            std::sort(wide.begin(), wide.end());
            int64_t prev_col = -1;
            for (int64_t t = 0; t < rn; ++t) {
                if (wide[t].first != prev_col) {
                    c_indices[nnz++] = wide[t].first;
                    prev_col = wide[t].first;
                }
                c_seg[p0 + wide[t].second] = nnz - 1;
            }
        }
        c_indptr[i - row_lo + 1] = nnz;
    }
    return nnz;
}

}  // extern "C"

// Incomplete factorizations + sparse triangular solve (C ABI, ctypes).
//
// ≙ the setup phase of cuSPARSE/cg (csric02) and cuSPARSE/bicgstab
// (csrilu02) — cg_example.c:165-184 — and cusparseSpSV's host reference.
// The numeric factorization is host-side sequential C++ (the reference's
// preconditioner setup is likewise a one-time host-driven phase); the
// per-iteration triangular solves on device use the level-scheduled SpSV
// plans (sparse/spsv.py), with csr_trisolve as the host fallback.

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// In-place ILU(0) on CSR (sorted column indices, diagonal present).
// data becomes the combined L\U factor (L unit lower, U upper).
// Returns 0, or -(j+1) on a zero pivot at row j.
long long csr_ilu0(long long n, const long long* indptr,
                   const long long* indices, double* data) {
    std::vector<long long> diag(n, -1);
    std::vector<long long> pos(n, -1);
    for (long long i = 0; i < n; ++i) {
        for (long long p = indptr[i]; p < indptr[i + 1]; ++p) {
            pos[indices[p]] = p;
            if (indices[p] == i) diag[i] = p;
        }
        for (long long p = indptr[i]; p < indptr[i + 1]; ++p) {
            long long j = indices[p];
            if (j >= i) break;
            if (diag[j] < 0 || data[diag[j]] == 0.0) return -(j + 1);
            double lij = data[p] / data[diag[j]];
            data[p] = lij;
            for (long long q = diag[j] + 1; q < indptr[j + 1]; ++q) {
                long long pk = pos[indices[q]];
                if (pk >= 0) data[pk] -= lij * data[q];
            }
        }
        if (diag[i] < 0) return -(i + 1);
        for (long long p = indptr[i]; p < indptr[i + 1]; ++p)
            pos[indices[p]] = -1;
    }
    return 0;
}

// In-place IC(0) on the LOWER-triangular CSR pattern of an SPD matrix
// (sorted columns, diagonal last in each row). data becomes L (A ≈ L Lᵀ).
// Returns 0, or -(i+1) if a pivot is not positive.
long long csr_ic0(long long n, const long long* indptr,
                  const long long* indices, double* data) {
    std::vector<long long> pos(n, -1);
    for (long long i = 0; i < n; ++i) {
        long long row_end = indptr[i + 1];
        for (long long p = indptr[i]; p < row_end; ++p)
            pos[indices[p]] = p;
        for (long long p = indptr[i]; p < row_end; ++p) {
            long long j = indices[p];
            double s = data[p];
            // subtract sum_k<j L[i,k] L[j,k] over row j's pattern
            double ljj = 0.0;
            for (long long q = indptr[j]; q < indptr[j + 1]; ++q) {
                long long k = indices[q];
                if (k == j) { ljj = data[q]; break; }
                long long pk = pos[k];
                if (pk >= 0 && pk < p) s -= data[pk] * data[q];
            }
            if (j == i) {
                if (s <= 0.0) return -(i + 1);
                data[p] = std::sqrt(s);
            } else {
                if (ljj == 0.0) return -(j + 1);
                data[p] = s / ljj;
            }
        }
        for (long long p = indptr[i]; p < row_end; ++p)
            pos[indices[p]] = -1;
    }
    return 0;
}

// Triangular solve T x = b for CSR T (sorted columns), b (n, nrhs)
// row-major, solved in place. lower: forward; else backward.
// unit: skip the diagonal (implicit ones). Returns 0 or -(i+1) on a
// zero diagonal.
long long csr_trisolve(long long n, const long long* indptr,
                       const long long* indices, const double* data,
                       double* b, long long nrhs, int lower, int unit) {
    if (lower) {
        for (long long i = 0; i < n; ++i) {
            double dg = 1.0;
            for (long long p = indptr[i]; p < indptr[i + 1]; ++p) {
                long long j = indices[p];
                if (j < i) {
                    for (long long r = 0; r < nrhs; ++r)
                        b[i * nrhs + r] -= data[p] * b[j * nrhs + r];
                } else if (j == i) {
                    dg = data[p];
                }
            }
            if (!unit) {
                if (dg == 0.0) return -(i + 1);
                for (long long r = 0; r < nrhs; ++r) b[i * nrhs + r] /= dg;
            }
        }
    } else {
        for (long long i = n - 1; i >= 0; --i) {
            double dg = 1.0;
            for (long long p = indptr[i + 1] - 1; p >= indptr[i]; --p) {
                long long j = indices[p];
                if (j > i) {
                    for (long long r = 0; r < nrhs; ++r)
                        b[i * nrhs + r] -= data[p] * b[j * nrhs + r];
                } else if (j == i) {
                    dg = data[p];
                }
            }
            if (!unit) {
                if (dg == 0.0) return -(i + 1);
                for (long long r = 0; r < nrhs; ++r) b[i * nrhs + r] /= dg;
            }
        }
    }
    return 0;
}

}  // extern "C"

// Matrix Market IO — native parser for the fixture files the reference uses
// (cuDSS/simple_matrix_market, cuSOLVERSp2cuDSS/test_real.mtx).
//
// C ABI consumed via ctypes (tpumathlib.native). Two-call protocol:
//   mm_read_header(path, &rows, &cols, &nnz, &symmetric, &pattern, &complexv)
//   mm_read_data(path, row_idx, col_idx, values, values_imag)
// Expansion of symmetric storage is done by the Python caller.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

extern "C" {

static int parse_header(FILE* f, long* rows, long* cols, long* nnz,
                        int* symmetric, int* pattern, int* complexv) {
    char line[1024];
    if (!fgets(line, sizeof line, f)) return -1;
    if (strncmp(line, "%%MatrixMarket", 14) != 0) return -2;
    *symmetric = strstr(line, "symmetric") != nullptr;
    *pattern = strstr(line, "pattern") != nullptr;
    *complexv = strstr(line, "complex") != nullptr;
    if (strstr(line, "coordinate") == nullptr) return -3;  // dense array unsupported
    // skip comments
    for (;;) {
        long pos = ftell(f);
        if (!fgets(line, sizeof line, f)) return -4;
        if (line[0] == '%') continue;
        if (sscanf(line, "%ld %ld %ld", rows, cols, nnz) != 3) {
            fseek(f, pos, SEEK_SET);
            return -5;
        }
        return 0;
    }
}

int mm_read_header(const char* path, long* rows, long* cols, long* nnz,
                   int* symmetric, int* pattern, int* complexv) {
    FILE* f = fopen(path, "r");
    if (!f) return -10;
    int rc = parse_header(f, rows, cols, nnz, symmetric, pattern, complexv);
    fclose(f);
    return rc;
}

int mm_read_data(const char* path, int64_t* row, int64_t* col,
                 double* val, double* val_im) {
    long rows, cols, nnz;
    int symmetric, pattern, complexv;
    FILE* f = fopen(path, "r");
    if (!f) return -10;
    int rc = parse_header(f, &rows, &cols, &nnz, &symmetric, &pattern, &complexv);
    if (rc != 0) { fclose(f); return rc; }
    for (long i = 0; i < nnz; i++) {
        long r, c;
        double v = 1.0, vi = 0.0;
        int got;
        if (pattern) {
            got = fscanf(f, "%ld %ld", &r, &c);
            if (got != 2) { fclose(f); return -6; }
        } else if (complexv) {
            got = fscanf(f, "%ld %ld %lf %lf", &r, &c, &v, &vi);
            if (got != 4) { fclose(f); return -6; }
        } else {
            got = fscanf(f, "%ld %ld %lf", &r, &c, &v);
            if (got != 3) { fclose(f); return -6; }
        }
        row[i] = r - 1;  // 1-based → 0-based
        col[i] = c - 1;
        val[i] = v;
        if (val_im) val_im[i] = vi;
    }
    fclose(f);
    return 0;
}

int mm_write(const char* path, long rows, long cols, long nnz,
             const int64_t* row, const int64_t* col, const double* val) {
    FILE* f = fopen(path, "w");
    if (!f) return -10;
    fprintf(f, "%%%%MatrixMarket matrix coordinate real general\n");
    fprintf(f, "%ld %ld %ld\n", rows, cols, nnz);
    for (long i = 0; i < nnz; i++)
        fprintf(f, "%lld %lld %.17g\n", (long long)(row[i] + 1),
                (long long)(col[i] + 1), val[i]);
    fclose(f);
    return 0;
}

}  // extern "C"

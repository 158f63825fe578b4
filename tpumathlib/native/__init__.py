"""Native (C++) runtime components, loaded via ctypes.

≙ the reference's C++ host-side machinery: matrix-market IO (cuDSS
fixtures), fill-reducing ordering + symbolic factorization (the cuDSS
ANALYSIS phase), and the LZ4 block codec + CRC32 (nvCOMP host side).

The shared library builds on first import with g++ -O2 and is cached next
to the sources; rebuilds happen when any source is newer than the cached
.so (no packaging machinery — mirrors the reference's per-sample Makefiles).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_SO_PATH = os.path.join(os.path.dirname(__file__), "_tpumathlib_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    srcs = [os.path.join(_SRC_DIR, f) for f in sorted(os.listdir(_SRC_DIR))
            if f.endswith(".cpp")]
    if os.path.exists(_SO_PATH) and all(
        os.path.getmtime(_SO_PATH) >= os.path.getmtime(s) for s in srcs
    ):
        return
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC",
           "-std=c++17", "-o", _SO_PATH] + srcs
    subprocess.run(cmd, check=True, capture_output=True)


def lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            _build()
            _lib = ctypes.CDLL(_SO_PATH)
            _declare(_lib)
        return _lib


def _declare(l):
    c = ctypes
    l.mm_read_header.argtypes = [c.c_char_p] + [c.POINTER(c.c_long)] * 3 + [c.POINTER(c.c_int)] * 3
    l.mm_read_header.restype = c.c_int
    l.mm_read_data.argtypes = [c.c_char_p] + [np.ctypeslib.ndpointer(np.int64)] * 2 + [
        np.ctypeslib.ndpointer(np.float64)] * 2
    l.mm_read_data.restype = c.c_int
    l.mm_write.argtypes = [c.c_char_p, c.c_long, c.c_long, c.c_long,
                           np.ctypeslib.ndpointer(np.int64),
                           np.ctypeslib.ndpointer(np.int64),
                           np.ctypeslib.ndpointer(np.float64)]
    l.mm_write.restype = c.c_int
    l.md_ordering.argtypes = [c.c_int64] + [np.ctypeslib.ndpointer(np.int64)] * 3
    l.md_ordering.restype = c.c_int
    l.symbolic_cholesky.argtypes = [c.c_int64] + [np.ctypeslib.ndpointer(np.int64)] * 4
    l.symbolic_cholesky.restype = c.c_int
    l.lz4_compress.argtypes = [np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                               np.ctypeslib.ndpointer(np.uint8), c.c_int64]
    l.lz4_compress.restype = c.c_int64
    l.lz4_decompress.argtypes = [np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                 np.ctypeslib.ndpointer(np.uint8), c.c_int64]
    l.lz4_decompress.restype = c.c_int64
    l.crc32_ieee.argtypes = [np.ctypeslib.ndpointer(np.uint8), c.c_int64, c.c_uint32]
    l.crc32_ieee.restype = c.c_uint32
    l.rans_compress.argtypes = [np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                c.c_int]
    l.rans_compress.restype = c.c_int64
    l.rans_decompress.argtypes = [np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                  np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                  c.c_int]
    l.rans_decompress.restype = c.c_int64
    l.gdef_compress.argtypes = [np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                np.ctypeslib.ndpointer(np.uint8), c.c_int64]
    l.gdef_compress.restype = c.c_int64
    l.gdef_decompress.argtypes = [np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                  np.ctypeslib.ndpointer(np.uint8), c.c_int64]
    l.gdef_decompress.restype = c.c_int64
    l.spchol_ll.argtypes = [c.c_int64,
                            np.ctypeslib.ndpointer(np.int64),
                            np.ctypeslib.ndpointer(np.int64),
                            np.ctypeslib.ndpointer(np.float64),
                            np.ctypeslib.ndpointer(np.int64),
                            np.ctypeslib.ndpointer(np.int64),
                            np.ctypeslib.ndpointer(np.float64), c.c_int64]
    l.spchol_ll.restype = c.c_int64
    l.splu.argtypes = [c.c_int64,
                       np.ctypeslib.ndpointer(np.int64),
                       np.ctypeslib.ndpointer(np.int64),
                       np.ctypeslib.ndpointer(np.float64),
                       np.ctypeslib.ndpointer(np.int64),
                       np.ctypeslib.ndpointer(np.int64),
                       np.ctypeslib.ndpointer(np.float64),
                       np.ctypeslib.ndpointer(np.int64),
                       np.ctypeslib.ndpointer(np.int64),
                       np.ctypeslib.ndpointer(np.float64),
                       np.ctypeslib.ndpointer(np.int64),
                       c.c_int64, c.c_int64, c.c_double]
    l.splu.restype = c.c_int64
    l.csr_ilu0.argtypes = [c.c_int64,
                           np.ctypeslib.ndpointer(np.int64),
                           np.ctypeslib.ndpointer(np.int64),
                           np.ctypeslib.ndpointer(np.float64)]
    l.csr_ilu0.restype = c.c_int64
    l.csr_ic0.argtypes = l.csr_ilu0.argtypes
    l.csr_ic0.restype = c.c_int64
    l.csr_trisolve.argtypes = [c.c_int64,
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.float64),
                               np.ctypeslib.ndpointer(np.float64),
                               c.c_int64, c.c_int, c.c_int]
    l.csr_trisolve.restype = c.c_int64
    l.spchol_super.argtypes = [c.c_int64,
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.float64),
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.float64),
                               c.c_int64, c.c_int64]
    l.spchol_super.restype = c.c_int64
    l.spchol_super_mt.argtypes = l.spchol_super.argtypes + [c.c_int64]
    l.spchol_super_mt.restype = c.c_int64
    l.nd_ordering.argtypes = [c.c_int64] + [np.ctypeslib.ndpointer(np.int64)] * 3
    l.nd_ordering.restype = c.c_int
    l.spgemm_count.argtypes = [c.c_int64, c.c_int64, c.c_int64,
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.uint8),
                               np.ctypeslib.ndpointer(np.int64),
                               np.ctypeslib.ndpointer(np.uint8)]
    l.spgemm_count.restype = c.c_int64
    l.spgemm_symbolic.argtypes = [c.c_int64, c.c_int64, c.c_int64,
                                  np.ctypeslib.ndpointer(np.int64),
                                  np.ctypeslib.ndpointer(np.int64),
                                  np.ctypeslib.ndpointer(np.uint8),
                                  np.ctypeslib.ndpointer(np.int64),
                                  np.ctypeslib.ndpointer(np.int64),
                                  np.ctypeslib.ndpointer(np.uint8)] + [
        np.ctypeslib.ndpointer(np.int64)] * 5
    l.spgemm_symbolic.restype = c.c_int64
    l.jpeg_symbol_freq.argtypes = [np.ctypeslib.ndpointer(np.int32),
                                   np.ctypeslib.ndpointer(np.uint8),
                                   np.ctypeslib.ndpointer(np.uint8),
                                   c.c_int64,
                                   np.ctypeslib.ndpointer(np.int64),
                                   np.ctypeslib.ndpointer(np.int64)]
    l.jpeg_symbol_freq.restype = None
    l.jpeg_scan_encode.argtypes = [np.ctypeslib.ndpointer(np.int32),
                                   np.ctypeslib.ndpointer(np.uint8),
                                   np.ctypeslib.ndpointer(np.uint8),
                                   c.c_int64,
                                   np.ctypeslib.ndpointer(np.uint32),
                                   np.ctypeslib.ndpointer(np.uint32),
                                   np.ctypeslib.ndpointer(np.uint8),
                                   c.c_int64]
    l.jpeg_scan_encode.restype = c.c_int64
    l.jpeg_scan_decode.argtypes = [np.ctypeslib.ndpointer(np.uint8),
                                   c.c_int64, c.c_int64, c.c_int64,
                                   np.ctypeslib.ndpointer(np.uint8),
                                   np.ctypeslib.ndpointer(np.uint8),
                                   np.ctypeslib.ndpointer(np.uint8),
                                   c.c_int64,
                                   np.ctypeslib.ndpointer(np.int32),
                                   np.ctypeslib.ndpointer(np.int32),
                                   np.ctypeslib.ndpointer(np.int32),
                                   np.ctypeslib.ndpointer(np.uint8),
                                   np.ctypeslib.ndpointer(np.int32)]
    l.jpeg_scan_decode.restype = c.c_int64
    l.jpeg_scan_symbols.argtypes = [np.ctypeslib.ndpointer(np.int32),
                                    np.ctypeslib.ndpointer(np.uint8),
                                    np.ctypeslib.ndpointer(np.uint8),
                                    c.c_int64,
                                    np.ctypeslib.ndpointer(np.int64),
                                    np.ctypeslib.ndpointer(np.int64),
                                    np.ctypeslib.ndpointer(np.uint32),
                                    c.c_int64]
    l.jpeg_scan_symbols.restype = c.c_int64
    l.jpeg_emit_symbols.argtypes = [np.ctypeslib.ndpointer(np.uint32),
                                    c.c_int64,
                                    np.ctypeslib.ndpointer(np.uint32),
                                    np.ctypeslib.ndpointer(np.uint32),
                                    np.ctypeslib.ndpointer(np.uint8),
                                    c.c_int64]
    l.jpeg_emit_symbols.restype = c.c_int64
    l.jpeg_idct_plane.argtypes = [np.ctypeslib.ndpointer(np.int32),
                                  np.ctypeslib.ndpointer(np.float32),
                                  c.c_int64, c.c_int64,
                                  np.ctypeslib.ndpointer(np.float32)]
    l.jpeg_idct_plane.restype = c.c_int
    l.jpeg_color_out.argtypes = [np.ctypeslib.ndpointer(np.float32),
                                 np.ctypeslib.ndpointer(np.float32),
                                 np.ctypeslib.ndpointer(np.float32),
                                 np.ctypeslib.ndpointer(np.int64),
                                 c.c_int, c.c_int64, c.c_int64, c.c_int,
                                 np.ctypeslib.ndpointer(np.uint8)]
    l.jpeg_color_out.restype = c.c_int
    l.jpeg_rgb_ycc_pool.argtypes = [np.ctypeslib.ndpointer(np.uint8),
                                    c.c_int64, c.c_int64, c.c_int64,
                                    c.c_int64,
                                    np.ctypeslib.ndpointer(np.float32),
                                    np.ctypeslib.ndpointer(np.float32),
                                    np.ctypeslib.ndpointer(np.float32)]
    l.jpeg_rgb_ycc_pool.restype = c.c_int
    l.jpeg_fdct_plane.argtypes = [np.ctypeslib.ndpointer(np.float32),
                                  np.ctypeslib.ndpointer(np.float32),
                                  c.c_int64, c.c_int64,
                                  np.ctypeslib.ndpointer(np.int32)]
    l.jpeg_fdct_plane.restype = c.c_int
    l.ebcot_decode_cb.argtypes = [np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                  c.c_int, c.c_int, c.c_int, c.c_int, c.c_int,
                                  np.ctypeslib.ndpointer(np.int32)]
    l.ebcot_decode_cb.restype = c.c_int
    l.ebcot_encode_cb.argtypes = [np.ctypeslib.ndpointer(np.int32),
                                  c.c_int, c.c_int, c.c_int,
                                  np.ctypeslib.ndpointer(np.uint8), c.c_int64,
                                  c.POINTER(c.c_int), c.POINTER(c.c_int),
                                  np.ctypeslib.ndpointer(np.int64), c.c_int]
    l.ebcot_encode_cb.restype = c.c_int64


# ---------------- Python wrappers ----------------

def mm_read(path: str):
    """Read a Matrix Market file → (rows, cols, coo_row, coo_col, values).
    Symmetric files are expanded to full storage."""
    c = ctypes
    l = lib()
    rows = c.c_long()
    cols = c.c_long()
    nnz = c.c_long()
    sym = c.c_int()
    pat = c.c_int()
    cpx = c.c_int()
    rc = l.mm_read_header(path.encode(), c.byref(rows), c.byref(cols),
                          c.byref(nnz), c.byref(sym), c.byref(pat), c.byref(cpx))
    if rc != 0:
        raise IOError(f"mm_read_header({path}) rc={rc}")
    n = nnz.value
    row = np.zeros(n, np.int64)
    col = np.zeros(n, np.int64)
    val = np.zeros(n, np.float64)
    vim = np.zeros(n, np.float64)
    rc = l.mm_read_data(path.encode(), row, col, val, vim)
    if rc != 0:
        raise IOError(f"mm_read_data({path}) rc={rc}")
    if cpx.value:
        val = val + 1j * vim
    if sym.value:
        off = row != col
        row, col, val = (np.concatenate([row, col[off]]),
                         np.concatenate([col, row[off]]),
                         np.concatenate([val, val[off]]))
    return rows.value, cols.value, row, col, val


def mm_write(path: str, rows: int, cols: int, row, col, val):
    rc = lib().mm_write(path.encode(), rows, cols, len(val),
                        np.ascontiguousarray(row, np.int64),
                        np.ascontiguousarray(col, np.int64),
                        np.ascontiguousarray(val, np.float64))
    if rc != 0:
        raise IOError(f"mm_write rc={rc}")


def nd_ordering(indptr, indices) -> np.ndarray:
    """Nested-dissection fill-reducing ordering (BFS bisection + local MD
    leaves — the METIS-class analysis ordering; native/src/ordering.cpp).
    Returns perm with perm[k] = original index eliminated at step k."""
    n = len(indptr) - 1
    perm = np.zeros(n, np.int64)
    rc = lib().nd_ordering(n, np.ascontiguousarray(indptr, np.int64),
                           np.ascontiguousarray(indices, np.int64), perm)
    if rc != 0:
        raise RuntimeError(f"nd_ordering rc={rc}")
    return perm


def md_ordering(indptr, indices) -> np.ndarray:
    """Minimum-degree fill-reducing ordering of a symmetric CSR pattern."""
    n = len(indptr) - 1
    perm = np.zeros(n, np.int64)
    rc = lib().md_ordering(n, np.ascontiguousarray(indptr, np.int64),
                           np.ascontiguousarray(indices, np.int64), perm)
    if rc != 0:
        raise RuntimeError(f"md_ordering rc={rc}")
    return perm


def symbolic_cholesky(indptr, indices):
    """(parent etree, per-column L nnz) of a symmetric CSR pattern."""
    n = len(indptr) - 1
    parent = np.zeros(n, np.int64)
    col_nnz = np.zeros(n, np.int64)
    rc = lib().symbolic_cholesky(n, np.ascontiguousarray(indptr, np.int64),
                                 np.ascontiguousarray(indices, np.int64),
                                 parent, col_nnz)
    if rc != 0:
        raise RuntimeError(f"symbolic_cholesky rc={rc}")
    return parent, col_nnz


def lz4_compress(data: bytes | np.ndarray) -> bytes:
    src = np.frombuffer(bytes(data), np.uint8) if not isinstance(data, np.ndarray) \
        else np.ascontiguousarray(data.view(np.uint8).ravel())
    cap = len(src) + len(src) // 128 + 64
    dst = np.zeros(cap, np.uint8)
    n = lib().lz4_compress(src, len(src), dst, cap)
    if n < 0:
        raise RuntimeError("lz4_compress: incompressible beyond capacity")
    return dst[:n].tobytes()


def lz4_decompress(data: bytes, out_size: int) -> bytes:
    src = np.frombuffer(data, np.uint8)
    dst = np.zeros(out_size, np.uint8)
    used = lib().lz4_decompress(src, len(src), dst, out_size)
    if used < 0:
        raise RuntimeError(f"lz4_decompress rc={used}")
    return dst.tobytes()


def rans_compress(data: bytes | np.ndarray, threads: int = 0) -> bytes:
    """Multithreaded interleaved rANS (native/src/rans.cpp) — the host
    ANS engine (≙ nvCOMP ANS codec). threads=0 → hardware count."""
    src = np.frombuffer(bytes(data), np.uint8) if not isinstance(data, np.ndarray) \
        else np.ascontiguousarray(data.view(np.uint8).ravel())
    if threads <= 0:
        threads = os.cpu_count() or 1
    cap = 16 + 512 + len(src) + (len(src) // (1 << 16) + 2) * 64 + 1024
    dst = np.zeros(cap, np.uint8)
    n = lib().rans_compress(src, len(src), dst, cap, threads)
    if n < 0:
        raise RuntimeError("rans_compress: capacity exceeded")
    return dst[:n].tobytes()


def rans_decompress(data: bytes, out_size: int, threads: int = 0) -> bytes:
    src = np.frombuffer(data, np.uint8)
    if threads <= 0:
        threads = os.cpu_count() or 1
    dst = np.zeros(max(out_size, 1), np.uint8)
    n = lib().rans_decompress(src, len(src), dst, out_size, threads)
    if n < 0:
        raise RuntimeError("rans_decompress: malformed stream")
    return dst[:n].tobytes()


def crc32(data: bytes, seed: int = 0) -> int:
    src = np.frombuffer(bytes(data), np.uint8)
    return int(lib().crc32_ieee(src, len(src), seed))


def spchol(indptr, indices, data, cap: int | None = None):
    """Sparse Cholesky of a lower-CSR SPD matrix → L as (indptr, indices,
    data) CSR. Raises on non-SPD (rc=-3) — the d_info analogue."""
    n = len(indptr) - 1
    cap = cap or max(4 * len(data) + 16 * n, 64)
    for _ in range(8):
        lp = np.zeros(n + 1, np.int64)
        li = np.zeros(cap, np.int64)
        lx = np.zeros(cap, np.float64)
        rc = lib().spchol_ll(n, np.ascontiguousarray(indptr, np.int64),
                             np.ascontiguousarray(indices, np.int64),
                             np.ascontiguousarray(data, np.float64),
                             lp, li, lx, cap)
        if rc == -1:
            cap *= 4
            continue
        if rc < 0:
            raise RuntimeError(f"spchol rc={rc} (matrix not positive definite?)")
        return lp, li[:rc], lx[:rc]
    raise RuntimeError("spchol: capacity growth failed")


def spchol_supernodal(indptr, indices, data, cap: int | None = None,
                      max_width: int = 32, threads: int = 1):
    """Supernodal sparse Cholesky (native/src/supernodal.cpp): same
    lower-CSR contract and output layout as spchol, dense-panel GEMM
    updates inside (≙ cuDSS's supernodal factorization engine).
    ``threads`` > 1 fans supernode tasks over the supernodal elimination
    tree on a worker pool (≙ the cuDSS threading layer)."""
    n = len(indptr) - 1
    cap = cap or max(4 * len(data) + 16 * n, 64)
    for _ in range(8):
        lp = np.zeros(n + 1, np.int64)
        li = np.zeros(cap, np.int64)
        lx = np.zeros(cap, np.float64)
        rc = lib().spchol_super_mt(n, np.ascontiguousarray(indptr, np.int64),
                                   np.ascontiguousarray(indices, np.int64),
                                   np.ascontiguousarray(data, np.float64),
                                   lp, li, lx, cap, max_width,
                                   max(1, int(threads)))
        if rc == -1:
            cap *= 4
            continue
        if rc < 0:
            raise RuntimeError(
                f"spchol_super rc={rc} (matrix not positive definite?)")
        return lp, li[:rc], lx[:rc]
    raise RuntimeError("spchol_super: capacity growth failed")


def splu(indptr, indices, data, pivot_tol: float = 0.1, cap: int | None = None):
    """Sparse LU with threshold partial pivoting → (L csr triple, U csr
    triple, prow) with P A = L U, prow[k] = original row at position k."""
    n = len(indptr) - 1
    cap = cap or max(8 * len(data) + 16 * n, 64)
    for _ in range(8):
        lp = np.zeros(n + 1, np.int64)
        li = np.zeros(cap, np.int64)
        lx = np.zeros(cap, np.float64)
        up = np.zeros(n + 1, np.int64)
        ui = np.zeros(cap, np.int64)
        ux = np.zeros(cap, np.float64)
        prow = np.zeros(n, np.int64)
        rc = lib().splu(n, np.ascontiguousarray(indptr, np.int64),
                        np.ascontiguousarray(indices, np.int64),
                        np.ascontiguousarray(data, np.float64),
                        lp, li, lx, up, ui, ux, prow, cap, cap, pivot_tol)
        if rc == -1:
            cap *= 4
            continue
        if rc < 0:
            raise RuntimeError(f"splu rc={rc}")
        return ((lp, li[:lp[n]], lx[:lp[n]]), (up, ui[:up[n]], ux[:up[n]]), prow)
    raise RuntimeError("splu: capacity growth failed")


def csr_ilu0(indptr, indices, data):
    """In-place ILU(0) (≙ cusparseXcsrilu02): combined L\\U values with A's
    pattern. Requires sorted columns + present diagonal; returns new data."""
    n = len(indptr) - 1
    d = np.ascontiguousarray(data, np.float64).copy()
    rc = lib().csr_ilu0(n, np.ascontiguousarray(indptr, np.int64),
                        np.ascontiguousarray(indices, np.int64), d)
    if rc < 0:
        raise RuntimeError(f"csr_ilu0: zero pivot at row {-rc - 1}")
    return d


def csr_ic0(indptr, indices, data):
    """In-place IC(0) (≙ cusparseXcsric02) on a LOWER-triangular CSR
    (diagonal last per row); returns L values (A ≈ L Lᵀ)."""
    n = len(indptr) - 1
    d = np.ascontiguousarray(data, np.float64).copy()
    rc = lib().csr_ic0(n, np.ascontiguousarray(indptr, np.int64),
                       np.ascontiguousarray(indices, np.int64), d)
    if rc < 0:
        raise RuntimeError(f"csr_ic0: non-positive pivot at row {-rc - 1}")
    return d


def csr_trisolve(indptr, indices, data, b, lower: bool = True,
                 unit: bool = False):
    """Host sparse triangular solve (≙ cusparseSpSV host reference):
    T x = b, b (n,) or (n, nrhs)."""
    n = len(indptr) - 1
    bb = np.ascontiguousarray(b, np.float64).copy()
    nrhs = 1 if bb.ndim == 1 else bb.shape[1]
    rc = lib().csr_trisolve(n, np.ascontiguousarray(indptr, np.int64),
                            np.ascontiguousarray(indices, np.int64),
                            np.ascontiguousarray(data, np.float64),
                            bb.reshape(n, -1), nrhs, int(lower), int(unit))
    if rc < 0:
        raise RuntimeError(f"csr_trisolve: zero diagonal at row {-rc - 1}")
    return bb

"""cuBLAS Level-2: the full matrix-vector surface.

Parity: the 23 Level-2 samples (dir cuBLAS/Level-2/): gemv, gbmv, ger(u/c),
hbmv, hemv, her, her2, hpmv, hpr, hpr2, sbmv, spmv, spr, spr2, symv, syr,
syr2, tbmv, tbsv, tpmv, tpsv, trmv, trsv.

Storage conventions (row-major throughout):
- dense A: (m, n)
- banded (gbmv/sbmv/hbmv/tb*): LAPACK band storage, shape (kl+ku+1, n) with
  row ku+i-j holding A[i,j] — ``band_to_dense`` documents the exact map.
- packed (sp*/hp*/tp*): length n(n+1)/2 vector, column-packed upper or lower.

Symmetric/Hermitian/triangular ops only *reference* the indicated triangle —
we reconstruct the implied full matrix explicitly (``sym_full``/``herm_full``/
``tri_full``), which is the TPU-correct move: one cheap VPU select feeding a
dense MXU/VPU op beats scattered triangular reads.

These ops are HBM-bandwidth-bound at any size; jnp expressions compile to
single fused XLA loops, so there is no Pallas value-add here.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from tpumathlib.core.errors import check


# ---------- storage conversions ----------

def band_to_dense(ab, n: int, kl: int, ku: int):
    """Expand LAPACK band storage (kl+ku+1, n) to dense (n_rows, n).

    ab[ku + i - j, j] = A[i, j] for max(0, j-ku) <= i <= min(m-1, j+kl).
    Here we produce the square (n, n) band (gbmv passes m via slicing).
    """
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    band_row = ku + rows - cols
    valid = (band_row >= 0) & (band_row < kl + ku + 1)
    idx = jnp.clip(band_row, 0, kl + ku)
    dense = jnp.where(valid, ab[idx, cols], 0)
    return dense


def dense_to_band(a, kl: int, ku: int):
    m, n = a.shape
    rows = jnp.arange(kl + ku + 1)[:, None]
    cols = jnp.arange(n)[None, :]
    src_row = rows - ku + cols
    valid = (src_row >= 0) & (src_row < m)
    return jnp.where(valid, a[jnp.clip(src_row, 0, m - 1), cols], 0)


def packed_to_dense(ap, n: int, uplo: str = "L"):
    """Expand packed triangular storage to a dense triangle.

    Column-packed (the BLAS ``*p*`` convention): for 'L', ap holds columns of
    the lower triangle stacked; for 'U', columns of the upper triangle.
    """
    check(ap.shape[-1] == n * (n + 1) // 2, f"packed length {ap.shape} != n(n+1)/2 for n={n}")
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    if uplo.upper() == "L":
        # element (i,j), i>=j at offset j*n - j(j-1)/2 + (i-j)
        off = cols * n - (cols * (cols - 1)) // 2 + (rows - cols)
        mask = rows >= cols
    else:
        # element (i,j), i<=j at offset j(j+1)/2 + i
        off = (cols * (cols + 1)) // 2 + rows
        mask = rows <= cols
    return jnp.where(mask, ap[jnp.clip(off, 0, ap.shape[-1] - 1)], 0)


def dense_to_packed(a, uplo: str = "L"):
    """Inverse of ``packed_to_dense`` (column-packed BLAS convention)."""
    n = a.shape[-1]
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    if uplo.upper() == "L":
        off = cols * n - (cols * (cols - 1)) // 2 + (rows - cols)
        mask = rows >= cols
    else:
        off = (cols * (cols + 1)) // 2 + rows
        mask = rows <= cols
    out = jnp.zeros(n * (n + 1) // 2, a.dtype)
    # masked-off entries scatter-add 0 at offset 0 — harmless
    return out.at[jnp.where(mask, off, 0).ravel()].add(
        jnp.where(mask, a, jnp.zeros_like(a)).ravel()
    )


def sym_full(a, uplo: str = "L"):
    """Full symmetric matrix from the referenced triangle."""
    if uplo.upper() == "L":
        t = jnp.tril(a)
        return t + jnp.tril(a, -1).T
    t = jnp.triu(a)
    return t + jnp.triu(a, 1).T


def herm_full(a, uplo: str = "L"):
    """Full Hermitian matrix from the referenced triangle (diag imag dropped)."""
    if uplo.upper() == "L":
        t = jnp.tril(a, -1)
    else:
        t = jnp.triu(a, 1).conj().T  # make t strictly lower
        a = a.conj().T
    d = jnp.diag(jnp.real(jnp.diag(a)).astype(a.dtype))
    return t + d + t.conj().T


def tri_full(a, uplo: str = "L", diag: str = "N"):
    """Referenced triangle of a triangular matrix; unit diagonal if diag='U'."""
    t = jnp.tril(a) if uplo.upper() == "L" else jnp.triu(a)
    if diag.upper() == "U":
        n = a.shape[-1]
        t = t - jnp.diag(jnp.diag(t)) + jnp.eye(n, dtype=a.dtype)
    return t


def _op(a, trans: str):
    trans = trans.upper()
    if trans == "N":
        return a
    if trans == "T":
        return a.T
    if trans == "C":
        return a.conj().T
    raise ValueError(f"bad trans {trans}")


# ---------- general ----------

def gemv(alpha, a, x, beta=0.0, y=None, trans: str = "N"):
    """y := alpha*op(A)x + beta*y (cublas<t>gemv)."""
    r = alpha * (_op(a, trans) @ x)
    return r if y is None else r + beta * y


def gbmv(alpha, ab, x, beta=0.0, y=None, *, m: int, n: int, kl: int, ku: int,
         trans: str = "N"):
    """Banded gemv (cublas<t>gbmv); ab in band storage (kl+ku+1, n)."""
    a = band_to_dense(ab, max(m, n), kl, ku)[:m, :n]
    return gemv(alpha, a, x, beta, y, trans)


def ger(alpha, x, y, a, conj: bool = False):
    """A := alpha*x*y^T + A (geru) or x*y^H + A (gerc)."""
    yv = jnp.conj(y) if conj else y
    return a + alpha * jnp.outer(x, yv)


def geru(alpha, x, y, a):
    return ger(alpha, x, y, a, conj=False)


def gerc(alpha, x, y, a):
    return ger(alpha, x, y, a, conj=True)


# ---------- symmetric / hermitian ----------

def symv(alpha, a, x, beta=0.0, y=None, uplo: str = "L"):
    r = alpha * (sym_full(a, uplo) @ x)
    return r if y is None else r + beta * y


def sbmv(alpha, ab, x, beta=0.0, y=None, *, n: int, k: int, uplo: str = "L"):
    """Symmetric banded MV; ab is (k+1, n) holding the referenced triangle's
    bands (upper: row k-j+i? — we use the LAPACK 'U': ab[k+i-j,j]=A[i,j])."""
    if uplo.upper() == "U":
        tri = band_to_dense(ab, n, 0, k)
    else:
        tri = band_to_dense(ab, n, k, 0)
    return symv(alpha, tri, x, beta, y, uplo)


def spmv(alpha, ap, x, beta=0.0, y=None, *, n: int, uplo: str = "L"):
    return symv(alpha, packed_to_dense(ap, n, uplo), x, beta, y, uplo)


def syr(alpha, x, a, uplo: str = "L"):
    """A := alpha*x*x^T + A (triangle update; returns full storage with
    only the referenced triangle updated)."""
    upd = alpha * jnp.outer(x, x)
    mask = jnp.tril(jnp.ones_like(a, dtype=bool)) if uplo.upper() == "L" else jnp.triu(jnp.ones_like(a, dtype=bool))
    return jnp.where(mask, a + upd, a)


def syr2(alpha, x, y, a, uplo: str = "L"):
    upd = alpha * (jnp.outer(x, y) + jnp.outer(y, x))
    mask = jnp.tril(jnp.ones_like(a, dtype=bool)) if uplo.upper() == "L" else jnp.triu(jnp.ones_like(a, dtype=bool))
    return jnp.where(mask, a + upd, a)


def spr(alpha, x, ap, *, n: int, uplo: str = "L"):
    a = packed_to_dense(ap, n, uplo)
    return dense_to_packed(syr(alpha, x, a, uplo), uplo)


def spr2(alpha, x, y, ap, *, n: int, uplo: str = "L"):
    a = packed_to_dense(ap, n, uplo)
    return dense_to_packed(syr2(alpha, x, y, a, uplo), uplo)


def hemv(alpha, a, x, beta=0.0, y=None, uplo: str = "L"):
    r = alpha * (herm_full(a, uplo) @ x)
    return r if y is None else r + beta * y


def hbmv(alpha, ab, x, beta=0.0, y=None, *, n: int, k: int, uplo: str = "L"):
    if uplo.upper() == "U":
        tri = band_to_dense(ab, n, 0, k)
    else:
        tri = band_to_dense(ab, n, k, 0)
    return hemv(alpha, tri, x, beta, y, uplo)


def hpmv(alpha, ap, x, beta=0.0, y=None, *, n: int, uplo: str = "L"):
    return hemv(alpha, packed_to_dense(ap, n, uplo), x, beta, y, uplo)


def her(alpha, x, a, uplo: str = "L"):
    """A := alpha*x*x^H + A (alpha real)."""
    upd = alpha * jnp.outer(x, jnp.conj(x))
    mask = jnp.tril(jnp.ones(a.shape, bool)) if uplo.upper() == "L" else jnp.triu(jnp.ones(a.shape, bool))
    return jnp.where(mask, a + upd, a)


def her2(alpha, x, y, a, uplo: str = "L"):
    upd = alpha * jnp.outer(x, jnp.conj(y)) + jnp.conj(alpha) * jnp.outer(y, jnp.conj(x))
    mask = jnp.tril(jnp.ones(a.shape, bool)) if uplo.upper() == "L" else jnp.triu(jnp.ones(a.shape, bool))
    return jnp.where(mask, a + upd, a)


def hpr(alpha, x, ap, *, n: int, uplo: str = "L"):
    return dense_to_packed(her(alpha, x, packed_to_dense(ap, n, uplo), uplo), uplo)


def hpr2(alpha, x, y, ap, *, n: int, uplo: str = "L"):
    return dense_to_packed(her2(alpha, x, y, packed_to_dense(ap, n, uplo), uplo), uplo)


# ---------- triangular ----------

def trmv(a, x, uplo: str = "L", trans: str = "N", diag: str = "N"):
    """x := op(A)x, A triangular."""
    return _op(tri_full(a, uplo, diag), trans) @ x


def trsv(a, b, uplo: str = "L", trans: str = "N", diag: str = "N"):
    """Solve op(A)x = b, A triangular."""
    t = tri_full(a, uplo, diag)
    lower = uplo.upper() == "L"
    tr = 0 if trans.upper() == "N" else (1 if trans.upper() == "T" else 2)
    return solve_triangular(t, b, lower=lower, trans=tr)


def tbmv(ab, x, *, n: int, k: int, uplo: str = "L", trans: str = "N", diag: str = "N"):
    tri = band_to_dense(ab, n, k, 0) if uplo.upper() == "L" else band_to_dense(ab, n, 0, k)
    return trmv(tri, x, uplo, trans, diag)


def tbsv(ab, b, *, n: int, k: int, uplo: str = "L", trans: str = "N", diag: str = "N"):
    tri = band_to_dense(ab, n, k, 0) if uplo.upper() == "L" else band_to_dense(ab, n, 0, k)
    return trsv(tri, b, uplo, trans, diag)


def tpmv(ap, x, *, n: int, uplo: str = "L", trans: str = "N", diag: str = "N"):
    return trmv(packed_to_dense(ap, n, uplo), x, uplo, trans, diag)


def tpsv(ap, b, *, n: int, uplo: str = "L", trans: str = "N", diag: str = "N"):
    return trsv(packed_to_dense(ap, n, uplo), b, uplo, trans, diag)

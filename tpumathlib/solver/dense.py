"""Dense factorizations and eigen/SVD drivers — the cuSOLVER 64-bit X-API.

Parity map (SURVEY.md §2.5; e.g. Xpotrf/cusolver_Xpotrf_example.cu:80-107,
Xgetrf/cusolver_Xgetrf_example.cu:134-185):

  cusolverDnXpotrf/potrs      → xpotrf / xpotrs
  cusolverDnXgetrf (+no-pivot)→ xgetrf(pivot=True/False) / xgetrs
  cusolverDnXgeqrf + orgqr/ormqr → xgeqrf / xorgqr / xormqr
  cusolverDnXtrtri            → xtrtri
  cusolverDnXsyevd/syevdx     → xsyevd / xsyevdx (index & value ranges)
  cusolverDnXsygvd            → xsygvd (A x = λ B x via Cholesky reduction)
  cusolverDnXgesvd            → xgesvd
  cusolverDnXgesvdp (polar)   → xgesvdp (QDWH polar + syevd — the same
                                decomposition cuSOLVERMp's mp_polar/mp_gesvd
                                chain uses)
  cusolverDnXgesvdr (randomized) → xgesvdr(rank, p oversampling, niters)
  cusolverDnXgeev             → xgeev (general eig; host LAPACK via
                                pure_callback — no MXU formulation exists,
                                same reason cuSOLVER runs it hybrid)
  cusolverDnpotrfBatched      → potrf_batched

Every driver returns ``info`` mirroring the reference's d_info device
diagnostic (0 = success; >0 = leading minor / convergence index).

TPU notes: cholesky/qr/eigh/svd lower to XLA's blocked factorizations, which
are MXU panel+update pipelines — the same blocked right-looking structure the
reference's samples exercise, here compiler-provided.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import check


def _finite_info(x, diag_only: bool = False) -> jnp.ndarray:
    """info=0 when result is finite, else 1-based index of first bad
    row/diag (≙ d_info from the factorizations)."""
    if diag_only:
        d = jnp.diagonal(x, axis1=-2, axis2=-1)
        bad = ~jnp.isfinite(d)
    else:
        bad = ~jnp.isfinite(x).all(axis=-1)
    any_bad = bad.any(axis=-1)
    first = jnp.argmax(bad, axis=-1) + 1
    return jnp.where(any_bad, first, 0).astype(jnp.int32)


# ---------------- Cholesky ----------------

@functools.partial(jax.jit, static_argnames=("uplo",))
def xpotrf(a, uplo: str = "L"):
    """Cholesky: A = L Lᴴ (uplo=L) or Uᴴ U. Returns (factor, info)."""
    if uplo.upper() == "U":
        l = jnp.linalg.cholesky(jnp.swapaxes(a, -1, -2).conj())
        f = jnp.swapaxes(l, -1, -2).conj()
    else:
        f = jnp.linalg.cholesky(a)
    return f, _finite_info(f, diag_only=True)


@functools.partial(jax.jit, static_argnames=("uplo",))
def xpotrs(factor, b, uplo: str = "L"):
    """Solve A X = B from the Cholesky factor."""
    from jax.scipy.linalg import solve_triangular

    if uplo.upper() == "L":
        y = solve_triangular(factor, b, lower=True)
        return solve_triangular(jnp.swapaxes(factor, -1, -2).conj(), y, lower=False)
    y = solve_triangular(jnp.swapaxes(factor, -1, -2).conj(), b, lower=True)
    return solve_triangular(factor, y, lower=False)


def potrf_batched(a, uplo: str = "L"):
    """≙ cusolverDnpotrfBatched — leading batch dims."""
    return xpotrf(a, uplo)


# ---------------- LU ----------------

@functools.partial(jax.jit, static_argnames=("pivot",))
def xgetrf(a, pivot: bool = True):
    """LU factorization. Returns (lu, piv, info); piv are row-pivot indices
    (LAPACK ipiv-style 0-based permutation applied: P A = L U). With
    pivot=False (CUSOLVER_ALG_* no-pivot path) runs unpivoted elimination.
    """
    if pivot:
        lu, piv = jax.scipy.linalg.lu_factor(a)
        return lu, piv, _finite_info(lu, diag_only=True)
    n = a.shape[-1]

    # unpivoted right-looking elimination under lax.scan (static shapes)
    def body(carry, k):
        m = carry
        col = m[:, k]
        pivval = m[k, k]
        l = jnp.where(jnp.arange(n) > k, col / pivval, 0.0)
        row = jnp.where(jnp.arange(n) > k, m[k, :], 0.0)
        m = m - jnp.outer(l, row)
        m = m.at[:, k].set(jnp.where(jnp.arange(n) > k, l, col))
        return m, None

    if a.ndim == 2:
        lu, _ = jax.lax.scan(body, a, jnp.arange(n))
        piv = jnp.broadcast_to(jnp.arange(n), a.shape[:-2] + (n,))
        return lu, piv, _finite_info(lu, diag_only=True)
    flat = a.reshape((-1,) + a.shape[-2:])
    lu = jax.vmap(lambda m: jax.lax.scan(body, m, jnp.arange(n))[0])(flat)
    lu = lu.reshape(a.shape)
    piv = jnp.broadcast_to(jnp.arange(n), a.shape[:-2] + (n,))
    return lu, piv, _finite_info(lu, diag_only=True)


@jax.jit
def xgetrs(lu, piv, b):
    """Solve A X = B from xgetrf output (pivoted path)."""
    return jax.scipy.linalg.lu_solve((lu, piv), b)


# ---------------- QR ----------------

@jax.jit
def xgeqrf(a):
    """QR: returns (q, r, info) — the X-API's householder storage is
    materialized as (Q, R) (TPU keeps Q explicit; ormqr applies it)."""
    q, r = jnp.linalg.qr(a, mode="reduced")
    return q, r, _finite_info(r, diag_only=True)


def xorgqr(q, r=None):
    """≙ cusolverDnXorgqr: materialize Q (already explicit here)."""
    return q


@functools.partial(jax.jit, static_argnames=("side", "trans"))
def xormqr(q, c, side: str = "L", trans: str = "N"):
    """Apply Q (or Qᴴ) to C (≙ cusolverDnXormqr)."""
    qt = q
    if trans.upper() in ("T", "C"):
        qt = jnp.swapaxes(q, -1, -2).conj()
    return qt @ c if side.upper() == "L" else c @ qt


# ---------------- triangular inverse ----------------

@functools.partial(jax.jit, static_argnames=("uplo", "diag"))
def xtrtri(a, uplo: str = "L", diag: str = "N"):
    from jax.scipy.linalg import solve_triangular

    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    inv = solve_triangular(a, eye, lower=uplo.upper() == "L",
                           unit_diagonal=diag.upper() == "U")
    return inv, _finite_info(inv)


# ---------------- symmetric eigen ----------------

@functools.partial(jax.jit, static_argnames=("uplo", "vectors"))
def xsyevd(a, uplo: str = "L", vectors: bool = True):
    """Symmetric/Hermitian eigendecomposition (values ascending).

    Returns (w, v, info); v=None when vectors=False (jobz=N)."""
    from tpumathlib.blas.level2 import herm_full, sym_full

    full = (herm_full if jnp.issubdtype(a.dtype, jnp.complexfloating) else sym_full)
    if a.ndim == 2:
        af = full(a, uplo)
    else:
        af = jax.vmap(lambda m: full(m, uplo))(a.reshape((-1,) + a.shape[-2:])
                                               ).reshape(a.shape)
    if vectors:
        w, v = jnp.linalg.eigh(af)
        return w, v, _finite_info(w[..., None])
    w = jnp.linalg.eigvalsh(af)
    return w, None, _finite_info(w[..., None])


def xsyevdx(a, uplo: str = "L", range_: str = "A",
            il: int = 0, iu: int | None = None,
            vl: float = -np.inf, vu: float = np.inf):
    """≙ cusolverDnXsyevdx: eigenvalue subset by index range (range_='I',
    0-based [il, iu]) or value interval (range_='V', (vl, vu]).

    Returns (w, v, n_found, info). For 'V', w/v are padded to n with NaN/0
    beyond n_found (static shapes — the TPU contract)."""
    w, v, info = xsyevd(a, uplo, vectors=True)
    if range_.upper() == "A":
        return w, v, w.shape[-1], info
    if range_.upper() == "I":
        iu = iu if iu is not None else w.shape[-1] - 1
        return w[..., il:iu + 1], v[..., :, il:iu + 1], iu - il + 1, info
    mask = (w > vl) & (w <= vu)
    n_found = jnp.sum(mask, axis=-1)
    order = jnp.argsort(~mask, axis=-1, stable=True)  # found ones first
    w_sel = jnp.where(mask, w, jnp.nan)
    w_sorted = jnp.take_along_axis(w_sel, order, axis=-1)
    v_sorted = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    v_sorted = jnp.where(jnp.isnan(w_sorted)[..., None, :], 0.0, v_sorted)
    return w_sorted, v_sorted, n_found, info


@functools.partial(jax.jit, static_argnames=("uplo", "itype"))
def xsygvd(a, b, uplo: str = "L", itype: int = 1):
    """Generalized symmetric-definite eigenproblem via Cholesky reduction
    (≙ cusolverDnXsygvd / sygvd sample). itype=1: A x = λ B x."""
    check(itype == 1, "itype 2/3 not implemented")
    from jax.scipy.linalg import solve_triangular

    l, info_b = xpotrf(b, uplo="L")
    # C = L⁻¹ A L⁻ᴴ
    la = solve_triangular(l, a, lower=True)
    c = solve_triangular(l, jnp.swapaxes(la, -1, -2).conj(), lower=True)
    c = (c + jnp.swapaxes(c, -1, -2).conj()) / 2
    w, y, info = xsyevd(c, uplo="L")
    # x = L⁻ᴴ y
    x = solve_triangular(jnp.swapaxes(l, -1, -2).conj(), y, lower=False)
    return w, x, info + info_b


# ---------------- SVD ----------------

@functools.partial(jax.jit, static_argnames=("full_matrices", "vectors"))
def xgesvd(a, full_matrices: bool = False, vectors: bool = True):
    """SVD (≙ cusolverDnXgesvd). Returns (u, s, vh, info)."""
    if vectors:
        u, s, vh = jnp.linalg.svd(a, full_matrices=full_matrices)
        return u, s, vh, _finite_info(s[..., None])
    s = jnp.linalg.svd(a, compute_uv=False)
    return None, s, None, _finite_info(s[..., None])


@jax.jit
def xgesvdp(a):
    """SVD via polar decomposition (≙ cusolverDnXgesvdp; the QDWH+eig path
    of cuSOLVERMp mp_polar.c / mp_gesvd.c): A = W P (polar), P = V Σ Vᴴ →
    U = W V. Returns (u, s, vh, err_sigma)."""
    w_polar, p = _polar_qdwh(a)
    s, v, _ = xsyevd(p, uplo="L")
    # ascending → descending
    s = s[..., ::-1]
    v = v[..., :, ::-1]
    u = w_polar @ v
    err = jnp.abs(jnp.minimum(s[..., -1], 0.0))  # negative tail = rank issues
    return u, s, jnp.swapaxes(v, -1, -2).conj(), err


def _polar_qdwh(a, iters: int = 30):
    """QDWH-dynamics polar decomposition via Newton–Schulz-stabilized
    iteration (scaled Newton): W ← ½(W + W⁻ᴴ) in QR-free Halley form.

    Uses jax.scipy QDWH when available; falls back to Halley iteration."""
    try:
        from jax.scipy.linalg import polar

        w, p = polar(a, side="right")
        return w, p
    except Exception:
        x = a / jnp.linalg.norm(a)
        for _ in range(iters):
            x = 1.5 * x - 0.5 * x @ (jnp.swapaxes(x, -1, -2).conj() @ x)
        p = jnp.swapaxes(x, -1, -2).conj() @ a
        p = (p + jnp.swapaxes(p, -1, -2).conj()) / 2
        return x, p


@functools.partial(jax.jit, static_argnames=("rank", "p", "niters"))
def xgesvdr(a, rank: int, p: int = 8, niters: int = 2, key=None):
    """Randomized SVD (≙ cusolverDnXgesvdr with rank/oversampling-p/
    power-iteration params, Xgesvdr/cusolver_Xgesvdr_example.cu:50-52).

    Returns (u, s, vh) with ``rank`` components."""
    m, n = a.shape[-2], a.shape[-1]
    l = min(rank + p, n)
    if key is None:
        key = jax.random.key(0)
    omega = jax.random.normal(key, a.shape[:-2] + (n, l), jnp.float32).astype(a.dtype)
    y = a @ omega
    for _ in range(niters):  # power iterations with QR stabilization
        y, _ = jnp.linalg.qr(y)
        y = a @ (jnp.swapaxes(a, -1, -2).conj() @ y)
    q, _ = jnp.linalg.qr(y)
    b = jnp.swapaxes(q, -1, -2).conj() @ a
    ub, s, vh = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[..., :, :rank], s[..., :rank], vh[..., :rank, :]


# ---------------- general (non-symmetric) eigen ----------------

def xgeev(a, device: bool = True):
    """General eigendecomposition (≙ cusolverDnXgeev).

    device=True (default): eigenvalues come from the on-device dgehrd +
    Francis-dhseqr pipeline (solver/geev.py — batched Householder
    Hessenberg + double-shift QR with LAPACK exceptional shifts);
    eigenvectors are recovered from the device Schur form by a host
    quasi-triangular backsolve (the cheap dtrevc tail — O(n³) triangular
    work on an already-reduced matrix). device=False keeps the legacy
    full-host LAPACK pure_callback."""
    a = jnp.asarray(a)
    n = a.shape[-1]
    cdtype = jnp.complex128 if a.dtype == jnp.float64 else jnp.complex64

    if device:
        from tpumathlib.solver.geev import xgeev_device

        wr, wi, t, q, dinfo = xgeev_device(a)

        def host_trevc(wr_, wi_, t_, q_, info_):
            wr_, wi_, t_, q_ = map(np.asarray, (wr_, wi_, t_, q_))
            info_ = np.asarray(info_)
            w = (wr_ + 1j * wi_).astype(cdtype)
            batch = t_.shape[:-2]
            v = np.zeros(t_.shape, complex)
            tiny = np.finfo(t_.dtype).tiny * 1e4 + 1e-300

            def solve2(blk, rhs):
                det = blk[0, 0] * blk[1, 1] - blk[0, 1] * blk[1, 0]
                if abs(det) < tiny:
                    return np.linalg.lstsq(blk, rhs, rcond=None)[0]
                return np.array([blk[1, 1] * rhs[0] - blk[0, 1] * rhs[1],
                                 blk[0, 0] * rhs[1]
                                 - blk[1, 0] * rhs[0]]) / det

            for b in np.ndindex(*batch):
                if info_[b] > 0:
                    # QR iteration did not converge for this element
                    # (dhseqr info>0): the Schur form is unusable, but
                    # A = Q H Qᵀ still holds exactly (orthogonal
                    # similarity), so rebuild A and run host LAPACK —
                    # wrong-silent results are never returned (ADVICE r3)
                    ab = q_[b] @ t_[b] @ q_[b].T
                    wb, vb = np.linalg.eig(ab)
                    w[b] = wb.astype(cdtype)
                    v[b] = vb
                    continue
                tb = t_[b]
                # LAPACK-style bounded small denominator: eps·‖T‖ keeps
                # the defective-case growth finite (no 1/tiny overflow)
                smin = (np.finfo(t_.dtype).eps
                        * max(np.abs(tb).max(), 1.0) + tiny)
                sub = np.concatenate([[0.0], np.diagonal(tb, -1)])
                for j in range(n):
                    lam = w[b + (j,)]
                    y = np.zeros(n, complex)
                    # the defining block: null vector of (blk − λI)
                    if sub[j] != 0.0:
                        bs = j - 1                  # second row of a block
                    elif j + 1 < n and sub[j + 1] != 0.0:
                        bs = j                      # first row of a block
                    else:
                        bs = j
                    if bs < j or (j + 1 < n and sub[j + 1] != 0.0):
                        je = bs + 1
                        blk = tb[bs:je + 1, bs:je + 1] - lam * np.eye(2)
                        if abs(blk[0, 1]) > tiny:
                            y[bs], y[je] = blk[0, 1], -blk[0, 0]
                        elif abs(blk[1, 0]) > tiny:
                            y[bs], y[je] = -blk[1, 1], blk[1, 0]
                        else:
                            y[j] = 1.0
                    else:
                        y[j] = 1.0
                    je = max(j, bs + 1) if sub[j] != 0.0 or (
                        j + 1 < n and sub[j + 1] != 0.0) else j
                    i = bs - 1
                    while i >= 0:
                        if i > 0 and sub[i] != 0.0:
                            # rows (i-1, i) form a 2×2 block
                            r = np.array([
                                -(tb[i - 1, i + 1:je + 1]
                                  @ y[i + 1:je + 1]),
                                -(tb[i, i + 1:je + 1] @ y[i + 1:je + 1])])
                            blk = tb[i - 1:i + 1, i - 1:i + 1] \
                                - lam * np.eye(2)
                            y[i - 1], y[i] = solve2(blk, r)
                            i -= 2
                        else:
                            rhs = -(tb[i, i + 1:je + 1] @ y[i + 1:je + 1])
                            dd = tb[i, i] - lam
                            y[i] = rhs / (dd if abs(dd) > smin
                                          else smin)
                            i -= 1
                    v[b + (slice(None), j)] = y
                vb = q_[b] @ v[b]
                nrm = np.linalg.norm(vb, axis=0)
                v[b] = vb / np.where(nrm == 0, 1.0, nrm)
            return w, v.astype(cdtype)

        w_shape = jax.ShapeDtypeStruct(a.shape[:-2] + (n,), cdtype)
        v_shape = jax.ShapeDtypeStruct(a.shape, cdtype)
        return jax.pure_callback(host_trevc, (w_shape, v_shape),
                                 wr, wi, t, q, dinfo,
                                 vmap_method="sequential")

    def host_eig(m):
        w, v = np.linalg.eig(np.asarray(m))
        return w.astype(cdtype), v.astype(cdtype)

    w_shape = jax.ShapeDtypeStruct(a.shape[:-2] + (n,), cdtype)
    v_shape = jax.ShapeDtypeStruct(a.shape, cdtype)
    return jax.pure_callback(host_eig, (w_shape, v_shape), a, vmap_method="sequential")

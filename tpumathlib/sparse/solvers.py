"""Preconditioned iterative solvers: CG (IC0) and BiCGStab (ILU0).

Parity: cuSPARSE/cg (cg_example.c:165-184 — SpMV + two SpSV per iteration)
and cuSPARSE/bicgstab. The reference drives the iteration from the host,
reading back residuals; here the whole solver is ONE jitted lax.while_loop —
SpMV, the two triangular solves, and the scalar recurrences all stay on
device (SURVEY.md §3.6: "better than the reference's host-driven loop").

IC0/ILU0 numeric factorization is native C++ (native/src/ilu.cpp):
incomplete factorizations are inherently sequential row eliminations with
data-dependent sparsity — the analysis-phase/host-hybrid policy (same
reason cuDSS offers hybrid host execute). The factors then live on device
for the solve loops.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.sparse.containers import CSR
from tpumathlib.sparse.convert import dense_to_csr
from tpumathlib.sparse.ops import spmv
from tpumathlib.sparse.spsv import spsv_plan


def _row_ids_np(indptr: np.ndarray) -> np.ndarray:
    return np.repeat(np.arange(len(indptr) - 1),
                     np.diff(indptr.astype(np.int64)))


def _csr_from_coo(m, n, rows, cols, vals) -> CSR:
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(m + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    return CSR(jnp.asarray(indptr), jnp.asarray(cols.astype(np.int64)),
               jnp.asarray(vals), (m, n))


def ilu0(a: CSR) -> tuple[CSR, CSR]:
    """Incomplete LU with zero fill (≙ cusparseXcsrilu02). Returns (L unit-
    diag, U) as CSR with A's split pattern.

    Numeric factorization runs in native C++ (native/src/ilu.cpp — the
    row eliminations are inherently sequential; 1e5-row/700k-nnz systems
    factor in ~70 ms vs minutes for an interpreted loop)."""
    from tpumathlib import native

    m = a.shape[0]
    indptr = np.asarray(a.indptr, np.int64)
    indices = np.asarray(a.indices, np.int64)
    lu = native.csr_ilu0(indptr, indices, np.asarray(a.data, np.float64))
    rows = _row_ids_np(indptr)
    lo = indices < rows
    up = ~lo
    lrows = np.concatenate([rows[lo], np.arange(m)])
    lcols = np.concatenate([indices[lo], np.arange(m)])
    lvals = np.concatenate([lu[lo], np.ones(m)])
    lmat = _csr_from_coo(m, m, lrows, lcols, lvals)
    umat = _csr_from_coo(m, m, rows[up], indices[up], lu[up])
    return lmat, umat


def ic0(a: CSR) -> CSR:
    """Incomplete Cholesky, zero fill (≙ cusparseXcsric02). Returns L with
    A's lower pattern (A ≈ L Lᵀ). Numeric phase in native C++."""
    from tpumathlib import native

    m = a.shape[0]
    indptr = np.asarray(a.indptr, np.int64)
    indices = np.asarray(a.indices, np.int64)
    data = np.asarray(a.data, np.float64)
    rows = _row_ids_np(indptr)
    keep = indices <= rows
    lindptr = np.zeros(m + 1, np.int64)
    np.add.at(lindptr, rows[keep] + 1, 1)
    lindptr = np.cumsum(lindptr)
    lindices = indices[keep]
    lx = native.csr_ic0(lindptr, lindices, data[keep])
    return CSR(jnp.asarray(lindptr), jnp.asarray(lindices),
               jnp.asarray(lx), (m, m))


def _make_precond(l: CSR | None, u: CSR | None):
    """M⁻¹ r via the triangular plans (two SpSV per application)."""
    if l is None:
        return lambda r: r
    lplan = spsv_plan(l, lower=True, unit_diag=False)
    if u is None:  # IC0: M = L Lᵀ; solve L y = r, Lᵀ z = y
        # build Lᵀ as CSR once (host)
        from tpumathlib.sparse.convert import csr_to_dense, dense_to_csr as d2c

        lt = d2c(np.asarray(csr_to_dense(l)).T)
        ltplan = spsv_plan(lt, lower=False, unit_diag=False)
        return lambda r: ltplan.solve(lplan.solve(r))
    uplan = spsv_plan(u, lower=False, unit_diag=False)
    lplan_unit = spsv_plan(l, lower=True, unit_diag=True)
    return lambda r: uplan.solve(lplan_unit.solve(r))


def cg(a: CSR, b, x0=None, tol: float = 1e-8, max_iters: int = 1000,
       precond: str | None = "ic0"):
    """Preconditioned conjugate gradient (≙ cuSPARSE/cg with IC0).

    Returns (x, n_iters, final_residual_norm). precond: "ic0" | None."""
    minv = _make_precond(ic0(a) if precond == "ic0" else None, None)
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)

    @jax.jit
    def run(b, x0):
        r0 = b - spmv(a, x0)
        z0 = minv(r0)
        state = (x0, r0, z0, z0, jnp.vdot(r0, z0), jnp.int32(0))

        def cond(s):
            x, r, z, p, rz, it = s
            return jnp.logical_and(jnp.linalg.norm(r) > tol * bnorm, it < max_iters)

        def body(s):
            x, r, z, p, rz, it = s
            ap = spmv(a, p)
            alpha = rz / jnp.vdot(p, ap)
            x = x + alpha * p
            r = r - alpha * ap
            z = minv(r)
            rz_new = jnp.vdot(r, z)
            beta = rz_new / rz
            p = z + beta * p
            return (x, r, z, p, rz_new, it + 1)

        x, r, _, _, _, iters = jax.lax.while_loop(cond, body, state)
        return x, iters, jnp.linalg.norm(r)

    return run(b, x0)


def bicgstab(a: CSR, b, x0=None, tol: float = 1e-8, max_iters: int = 1000,
             precond: str | None = "ilu0"):
    """Preconditioned BiCGStab (≙ cuSPARSE/bicgstab with ILU0).

    Returns (x, n_iters, final_residual_norm)."""
    if precond == "ilu0":
        l, u = ilu0(a)
        minv = _make_precond(l, u)
    else:
        minv = lambda r: r
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)

    @jax.jit
    def run(b, x0):
        r0 = b - spmv(a, x0)
        rhat = r0
        state = (x0, r0, r0, jnp.vdot(rhat, r0), jnp.int32(0))

        def cond(s):
            x, r, p, rho, it = s
            return jnp.logical_and(jnp.linalg.norm(r) > tol * bnorm, it < max_iters)

        def body(s):
            x, r, p, rho, it = s
            phat = minv(p)
            v = spmv(a, phat)
            alpha = rho / jnp.vdot(rhat, v)
            s_vec = r - alpha * v
            shat = minv(s_vec)
            t = spmv(a, shat)
            omega = jnp.vdot(t, s_vec) / jnp.vdot(t, t)
            x = x + alpha * phat + omega * shat
            r = s_vec - omega * t
            rho_new = jnp.vdot(rhat, r)
            beta = (rho_new / rho) * (alpha / omega)
            p = r + beta * (p - omega * v)
            return (x, r, p, rho_new, it + 1)

        x, r, _, _, iters = jax.lax.while_loop(cond, body, state)
        return x, iters, jnp.linalg.norm(r)

    return run(b, x0)

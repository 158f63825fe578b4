"""Preconditioned iterative solvers: CG (IC0) and BiCGStab (ILU0).

Parity: cuSPARSE/cg (cg_example.c:165-184 — SpMV + two SpSV per iteration)
and cuSPARSE/bicgstab. The reference drives the iteration from the host,
reading back residuals; here the whole solver is ONE jitted lax.while_loop —
SpMV, the two triangular solves, and the scalar recurrences all stay on
device (SURVEY.md §3.6: "better than the reference's host-driven loop").

IC0/ILU0 numeric factorization is host-side (numpy): incomplete
factorizations are inherently sequential row eliminations with data-dependent
sparsity — the analysis-phase/host-hybrid policy (same reason cuDSS offers
hybrid host execute). The factors then live on device for the solve loops.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.sparse.containers import CSR
from tpumathlib.sparse.convert import dense_to_csr
from tpumathlib.sparse.ops import spmv
from tpumathlib.sparse.spsv import spsv_plan


def ilu0(a: CSR) -> tuple[CSR, CSR]:
    """Incomplete LU with zero fill (≙ cusparseXcsrilu02). Returns (L unit-
    diag, U) as CSR with A's split pattern."""
    m = a.shape[0]
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    dense_pat = {}
    vals = {}
    for i in range(m):
        for p in range(indptr[i], indptr[i + 1]):
            v = float(np.asarray(a.data)[p])
            if v != 0.0 or indices[p] == i:
                vals[(i, int(indices[p]))] = v
    for i in range(m):
        row_cols = sorted(j for (r, j) in vals if r == i)
        for j in [c for c in row_cols if c < i]:
            piv = vals.get((j, j), 0.0)
            lij = vals[(i, j)] / piv
            vals[(i, j)] = lij
            for k in [c for (r, c) in vals if r == j and c > j]:
                if (i, k) in vals:
                    vals[(i, k)] -= lij * vals[(j, k)]
    ldense = np.zeros(a.shape)
    udense = np.zeros(a.shape)
    for (i, j), v in vals.items():
        if j < i:
            ldense[i, j] = v
        else:
            udense[i, j] = v
    np.fill_diagonal(ldense, 1.0)
    return dense_to_csr(ldense), dense_to_csr(udense)


def ic0(a: CSR) -> CSR:
    """Incomplete Cholesky, zero fill (≙ cusparseXcsric02). Returns L with
    A's lower pattern (A ≈ L Lᵀ)."""
    m = a.shape[0]
    an = np.zeros(a.shape)
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    data = np.asarray(a.data)
    for i in range(m):
        for p in range(indptr[i], indptr[i + 1]):
            an[i, indices[p]] = data[p]
    pattern = (an != 0)
    l = np.zeros_like(an)
    for i in range(m):
        for j in range(i + 1):
            if not pattern[i, j]:
                continue
            s = an[i, j] - l[i, :j] @ l[j, :j]
            if i == j:
                l[i, j] = np.sqrt(max(s, 1e-300))
            else:
                l[i, j] = s / l[j, j]
    return dense_to_csr(l)


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

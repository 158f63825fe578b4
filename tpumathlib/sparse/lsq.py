"""Sparse least squares and shift-invert eigen solvers.

- csrqr_batched ≙ cuSOLVER/csrqr (cusolverSpXcsrqrAnalysisBatched +
  csrqrsvBatched): batched sparse min‖Ax−b‖. Solved via the corrected
  semi-normal equations: R from the (sparse) normal-equations Cholesky,
  x = R⁻¹R⁻ᵀ Aᵀb + one refinement step — QR-grade accuracy without forming
  Q, reusing the native spchol analysis across the batch (same pattern).
- csreigvsi ≙ cuSOLVERSp2cuDSS's shift-invert eigenpair sample
  (cusolverSpScsreigvsi): inverse iteration with (A − μ₀I)⁻¹ via the dss
  direct solver.
"""

from __future__ import annotations

import numpy as np

from tpumathlib.sparse.containers import CSR


def csrqr_batched(a: CSR, bs, tol: float = 0.0) -> np.ndarray:
    """Solve min‖A x − b‖ for each RHS in ``bs`` (batch, m) → (batch, n).

    A is one pattern shared across the batch (the cuSOLVER batched-QR
    contract); values are shared too in this API (per-batch values variant:
    call per matrix)."""
    import scipy.sparse as sp

    from tpumathlib import native

    m, n = a.shape
    amat = sp.csr_matrix(
        (np.asarray(a.data, np.float64), np.asarray(a.indices),
         np.asarray(a.indptr)), shape=a.shape)
    ata = (amat.T @ amat).tocsr()
    ata = sp.tril(ata).tocsr()
    lp, li, lx = native.spchol(ata.indptr.astype(np.int64),
                               ata.indices.astype(np.int64), ata.data)
    lmat = sp.csr_matrix((lx, li, lp), shape=(n, n))

    from scipy.sparse.linalg import spsolve_triangular

    def solve_normal(rhs):
        y = spsolve_triangular(lmat, rhs, lower=True)
        return spsolve_triangular(lmat.T.tocsr(), y, lower=False)

    bs = np.atleast_2d(np.asarray(bs, np.float64))
    out = []
    for b in bs:
        x = solve_normal(amat.T @ b)
        # one step of semi-normal refinement
        r = b - amat @ x
        x = x + solve_normal(amat.T @ r)
        out.append(x)
    return np.stack(out)


def csreigvsi(a: CSR, mu0: float, x0=None, tol: float = 1e-10,
              max_iters: int = 100):
    """Shift-invert inverse iteration: eigenpair of A nearest μ₀
    (≙ cusolverSpDcsreigvsi). Returns (mu, x, iters)."""
    from tpumathlib.dss import Config, MatrixType, Solver

    import scipy.sparse as sp

    n = a.shape[0]
    amat = sp.csr_matrix(
        (np.asarray(a.data, np.float64), np.asarray(a.indices),
         np.asarray(a.indptr)), shape=a.shape)
    shifted = (amat - mu0 * sp.eye(n)).tocsr()
    from tpumathlib.sparse.containers import CSR as _CSR
    import jax.numpy as jnp

    scsr = _CSR(jnp.asarray(shifted.indptr.astype(np.int64)),
                jnp.asarray(shifted.indices.astype(np.int64)),
                jnp.asarray(shifted.data), (n, n))
    solver = Solver(scsr, Config(matrix_type=MatrixType.GENERAL))
    solver.factorize()

    x = np.asarray(x0, np.float64) if x0 is not None else np.ones(n)
    x /= np.linalg.norm(x)
    mu = mu0
    for it in range(max_iters):
        y = solver.solve(x)
        y /= np.linalg.norm(y)
        mu_new = float(y @ (amat @ y))
        # converge on the eigenpair residual, not just the Rayleigh quotient
        # (the vector converges only linearly)
        res = np.linalg.norm(amat @ y - mu_new * y)
        if res < tol * max(abs(mu_new), 1.0):
            return mu_new, y, it + 1
        mu, x = mu_new, y
    return mu, x, max_iters

"""Sparse least squares and shift-invert eigen solvers.

- csrqr_batched ≙ cuSOLVER/csrqr (cusolverSpXcsrqrAnalysisBatched +
  csrqrsvBatched): batched sparse min‖Ax−b‖. Solved via the corrected
  semi-normal equations: R from the (sparse) normal-equations Cholesky,
  x = R⁻¹R⁻ᵀ Aᵀb + one refinement step — QR-grade accuracy without forming
  Q. The AᵀA product runs through the library's own two-phase SpGEMM, the
  Cholesky and triangular solves through the native C++ layer (no scipy in
  the product path; scipy remains a test oracle only).
- csreigvsi ≙ cuSOLVERSp2cuDSS's shift-invert eigenpair sample
  (cusolverSpScsreigvsi): inverse iteration with (A − μ₀I)⁻¹ via the dss
  direct solver.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpumathlib.sparse.containers import CSR


def _np_triple(a: CSR):
    return (np.asarray(a.indptr, np.int64), np.asarray(a.indices, np.int64),
            np.asarray(a.data, np.float64))


def _spmv_np(indptr, indices, data, x):
    """Host CSR SpMV (supports (n,) or (n, k) x)."""
    rows = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
    prod = data[:, None] * np.atleast_2d(x.T).T[indices] \
        if x.ndim > 1 else data * x[indices]
    y = np.zeros((len(indptr) - 1,) + x.shape[1:], np.float64)
    np.add.at(y, rows, prod)
    return y


def _transpose_np(m, n, indptr, indices, data):
    """Host CSR transpose via counting sort → (indptr, indices, data)."""
    rows = np.repeat(np.arange(m), np.diff(indptr))
    order = np.lexsort((rows, indices))
    tp = np.zeros(n + 1, np.int64)
    np.add.at(tp, indices + 1, 1)
    return np.cumsum(tp), rows[order].astype(np.int64), data[order]


def csrqr_batched(a: CSR, bs, tol: float = 0.0) -> np.ndarray:
    """Solve min‖A x − b‖ for each RHS in ``bs`` (batch, m) → (batch, n).

    A is one pattern shared across the batch (the cuSOLVER batched-QR
    contract); values are shared too in this API (per-batch values variant:
    call per matrix)."""
    from tpumathlib import native
    from tpumathlib.sparse.spgemm import spgemm

    m, n = a.shape
    ip, ii, dx = _np_triple(a)
    tp, ti, tx = _transpose_np(m, n, ip, ii, dx)
    at = CSR(jnp.asarray(tp), jnp.asarray(ti), jnp.asarray(tx), (n, m))
    ata = spgemm(at, CSR(jnp.asarray(ip), jnp.asarray(ii), jnp.asarray(dx),
                         (m, n)))
    # lower triangle of AᵀA for the native Cholesky
    gp, gi, gx = _np_triple(ata)
    rows = np.repeat(np.arange(n), np.diff(gp))
    keep = gi <= rows
    lp = np.zeros(n + 1, np.int64)
    np.add.at(lp, rows[keep] + 1, 1)
    lp = np.cumsum(lp)
    li, lx = gi[keep], gx[keep]
    cp, ci, cx = native.spchol(lp, li, lx)
    up, ui, ux = _transpose_np(n, n, cp, ci, cx)

    def solve_normal(rhs):
        y = native.csr_trisolve(cp, ci, cx, rhs, lower=True)
        return native.csr_trisolve(up, ui, ux, y, lower=False)

    bs = np.atleast_2d(np.asarray(bs, np.float64))
    out = []
    for b in bs:
        x = solve_normal(_spmv_np(tp, ti, tx, b))
        # one step of semi-normal refinement
        r = b - _spmv_np(ip, ii, dx, x)
        x = x + solve_normal(_spmv_np(tp, ti, tx, r))
        out.append(x)
    return np.stack(out)


def _shift_diag_np(a: CSR, shift: float):
    """A + shift·I as a host CSR triple (merges with existing diagonal,
    inserts missing diagonal entries)."""
    n = a.shape[0]
    ip, ii, dx = _np_triple(a)
    rows = np.repeat(np.arange(n), np.diff(ip))
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([ii, np.arange(n)])
    vals = np.concatenate([dx, np.full(n, shift)])
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    # merge duplicates (existing diagonal + inserted shift)
    new = np.ones(len(rows), bool)
    new[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    grp = np.cumsum(new) - 1
    mvals = np.zeros(grp[-1] + 1, np.float64)
    np.add.at(mvals, grp, vals)
    mrows, mcols = rows[new], cols[new]
    op = np.zeros(n + 1, np.int64)
    np.add.at(op, mrows + 1, 1)
    return np.cumsum(op), mcols.astype(np.int64), mvals


def csreigvsi(a: CSR, mu0: float, x0=None, tol: float = 1e-10,
              max_iters: int = 100):
    """Shift-invert inverse iteration: eigenpair of A nearest μ₀
    (≙ cusolverSpDcsreigvsi). Returns (mu, x, iters)."""
    from tpumathlib.dss import Config, MatrixType, Solver

    n = a.shape[0]
    ip, ii, dx = _np_triple(a)
    sp_, si_, sx_ = _shift_diag_np(a, -mu0)
    scsr = CSR(jnp.asarray(sp_), jnp.asarray(si_), jnp.asarray(sx_), (n, n))
    solver = Solver(scsr, Config(matrix_type=MatrixType.GENERAL))
    solver.factorize()

    x = np.asarray(x0, np.float64) if x0 is not None else np.ones(n)
    x /= np.linalg.norm(x)
    mu = mu0
    for it in range(max_iters):
        y = solver.solve(x)
        y /= np.linalg.norm(y)
        ay = _spmv_np(ip, ii, dx, y)
        mu_new = float(y @ ay)
        # converge on the eigenpair residual, not just the Rayleigh quotient
        # (the vector converges only linearly)
        res = np.linalg.norm(ay - mu_new * y)
        if res < tol * max(abs(mu_new), 1.0):
            return mu_new, y, it + 1
        mu, x = mu_new, y
    return mu, x, max_iters


def csreigs(a_re: CSR, a_im: CSR, left_bottom: complex, right_upper: complex,
            nh: int = 24, nv: int = 24) -> int:
    """Count the eigenvalues of complex A = A_re + i·A_im inside the open
    rectangle (left_bottom, right_upper) of the complex plane
    (≙ cusolverSpDcsreigs migrated to cuDSS —
    /root/reference/cuSOLVERSp2cuDSS/csreigs2cuDSS_dcomplex.cpp:92-298).

    Same contour-integration scheme as the reference: place 2(nh+nv)
    trapezoid quadrature points on the box boundary; at each point z solve
    (A − zI) X = I with the complex sparse direct solver (real block
    embedding, dss.ComplexSolver) and take the trace of the inverse; then
    num_eigs = round( Im[ ∮ tr((zI−A)⁻¹) dz ] / 2π ) — the argument
    principle applied to det(zI − A)."""
    from tpumathlib.dss import ComplexSolver

    n = a_re.shape[0]
    a1, b1 = float(np.real(left_bottom)), float(np.imag(left_bottom))
    a2, b2 = float(np.real(right_upper)), float(np.imag(right_upper))
    # quadrature points counterclockwise around the box, corner to corner
    zs = np.concatenate([
        a1 + (a2 - a1) * np.arange(nh) / nh + 1j * b1,
        a2 + 1j * (b1 + (b2 - b1) * np.arange(nv) / nv),
        a2 - (a2 - a1) * np.arange(nh) / nh + 1j * b2,
        a1 + 1j * (b2 - (b2 - b1) * np.arange(nv) / nv),
    ])
    # Fix the sparsity pattern ONCE (diagonals inserted into both planes
    # with a zero shift), so every quadrature point is a VALUE update +
    # numeric refactorization on the retained symbolic analysis — the
    # cuSolverRf-style reuse the repo's Solver supports (perm/etree kept
    # when only self.a's values change).
    sp_, si_, sx0 = _shift_diag_np(a_re, 0.0)
    tp_, ti_, tx0 = _shift_diag_np(a_im, 0.0)
    rdiag = np.array([np.nonzero(si_[sp_[i]:sp_[i + 1]] == i)[0][0] + sp_[i]
                      for i in range(n)])
    idiag = np.array([np.nonzero(ti_[tp_[i]:tp_[i + 1]] == i)[0][0] + tp_[i]
                      for i in range(n)])
    s = ComplexSolver(
        CSR(jnp.asarray(sp_), jnp.asarray(si_), jnp.asarray(sx0), (n, n)),
        CSR(jnp.asarray(tp_), jnp.asarray(ti_), jnp.asarray(tx0), (n, n)))
    # the real block embedding K = [[Ar, -Ai], [Ai, Ar]] was assembled by
    # coo_to_csr; recover its value permutation once with probe ids
    # (1..nr for the real plane, nr+1.. for the imaginary plane)
    nr = len(sx0)
    probe = ComplexSolver(
        CSR(jnp.asarray(sp_), jnp.asarray(si_),
            jnp.asarray(np.arange(1, nr + 1, dtype=np.float64)), (n, n)),
        CSR(jnp.asarray(tp_), jnp.asarray(ti_),
            jnp.asarray(np.arange(nr + 1, nr + len(tx0) + 1,
                                  dtype=np.float64)), (n, n)))
    eye = np.eye(n)
    vals = np.empty(len(zs), np.complex128)
    kdata = np.asarray(probe.solver.a.data)

    def embed_vals(vr, vi):
        # kdata holds signed probe ids: |id|≤nr → vr slot, else vi slot
        ids = np.rint(np.abs(kdata)).astype(np.int64)
        sign = np.sign(kdata)
        out = np.where(ids <= nr, vr[np.minimum(ids, nr) - 1],
                       vi[np.maximum(ids - nr, 1) - 1])
        return out * sign

    for k, z in enumerate(zs):
        vr = sx0.copy()
        vr[rdiag] -= z.real
        vi = tx0.copy()
        vi[idiag] -= z.imag
        s.solver.a = CSR(s.solver.a.indptr, s.solver.a.indices,
                         jnp.asarray(embed_vals(vr, vi)),
                         s.solver.a.shape)
        s.factorize()                          # numeric phase only
        x = s.solve(eye)                       # columns of (A − zI)^{-1}
        vals[k] = -np.trace(x)                 # tr((zI − A)^{-1})
    # closed trapezoid rule around the contour
    zn = np.roll(zs, -1)
    vn = np.roll(vals, -1)
    integral = np.sum(0.5 * (vals + vn) * (zn - zs))
    return int(np.round(integral.imag / (2.0 * np.pi)))

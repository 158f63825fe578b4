"""cuSOLVERMp tier oracles: distributed-vs-single-device comparisons on the
8-device virtual mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
from jax.sharding import NamedSharding, PartitionSpec as P

from tpumathlib.core import assert_allclose
from tpumathlib.mp import Grid
from tpumathlib.mp.solver import (
    mp_gels,
    mp_geqrf,
    mp_gesvdj,
    mp_getrf,
    mp_getrs,
    mp_polar,
    mp_potrf,
    mp_potrs,
    mp_syevd,
)

N = 64  # divisible by 8 ranks


@pytest.fixture(scope="module")
def grid():
    return Grid.create(jax.devices())


def _put(grid, arr, spec):
    return jax.device_put(jnp.asarray(arr), NamedSharding(grid.mesh, spec))


@pytest.fixture
def spd(rng):
    a = rng.normal(size=(N, N))
    return (a @ a.T / N + 3 * np.eye(N)).astype(np.float32)


def test_mp_potrf_potrs(grid, spd, rng):
    a = _put(grid, spd, P(None, "x"))
    l = mp_potrf(a, grid)
    assert l.sharding.spec == P(None, "x")
    ln = np.asarray(l)
    assert_allclose(ln @ ln.T, spd, rtol=1e-4, msg="mp_potrf")
    assert np.allclose(np.triu(ln, 1), 0)
    b = rng.normal(size=N).astype(np.float32)
    x = mp_potrs(jnp.asarray(ln), jnp.asarray(b))
    assert_allclose(spd @ np.asarray(x), b, rtol=1e-3, msg="mp_potrs")


def test_mp_potrf_fp32_emulation(grid, spd):
    """math_mode="bf16x9" (≙ mp_potrf_potrs_fp32emulation.c:187
    CUSOLVER_FP32_EMULATED_BF16X9_MATH): the emulated trailing update
    reproduces the factorization at fp32-grade accuracy."""
    a = _put(grid, spd, P(None, "x"))
    ln = np.asarray(mp_potrf(a, grid, math_mode="bf16x9"))
    assert_allclose(ln @ ln.T, spd, rtol=1e-4, msg="mp_potrf bf16x9")


def test_mp_newton_schulz(grid, rng):
    """Distributed Newton–Schulz orthogonalization (≙
    cusolverMpNewtonSchulz, mp_newton_schulz.cpp:372): converges to the
    polar factor of a tall matrix; the sample's Muon coefficient table
    yields an orthonormal result in 5 iterations."""
    from tpumathlib.mp.solver import mp_newton_schulz

    m, n = N, 24
    a = rng.normal(size=(m, n)).astype(np.float32)
    # classic cubic needs the spectrum in (0, sqrt(3)); X0 = A/||A||_F
    # guarantees that. Run enough iterations to converge.
    x = np.asarray(mp_newton_schulz(_put(grid, a, P("x", None)), grid,
                                    iters=24,
                                    coeffs=[1.5, -0.5, 0.0] * 24))
    u, _, vt = np.linalg.svd(a, full_matrices=False)
    assert_allclose(x.T @ x, np.eye(n), atol=5e-3, msg="NS orthonormal")
    assert_allclose(x, u @ vt, atol=5e-3, msg="NS polar factor")
    # the sample's tuned quintic table (mp_newton_schulz.cpp:307):
    # approximate orthogonality in 5 iterations
    muon = [4.0848, -6.8946, 2.9270, 3.9505, -6.3029, 2.6377,
            3.7418, -5.5913, 2.3037, 2.8769, -3.1427, 1.2046,
            2.8366, -3.0525, 1.2012]
    x5 = np.asarray(mp_newton_schulz(_put(grid, a, P("x", None)), grid,
                                     iters=5, coeffs=muon))
    off = np.abs(x5.T @ x5 - np.eye(n)).max()
    assert off < 0.05, off                 # Muon-grade, not exact-polar
    # emulated math mode runs and stays close
    xe = np.asarray(mp_newton_schulz(_put(grid, a, P("x", None)), grid,
                                     iters=5, coeffs=muon,
                                     math_mode="bf16x9"))
    assert np.abs(xe - x5).max() < 5e-3


def test_mp_getrf_getrs(grid, rng):
    a = (rng.normal(size=(N, N)) + N * np.eye(N)).astype(np.float32)
    lu = mp_getrf(_put(grid, a, P(None, "x")), grid)
    lun = np.asarray(lu)
    l = np.tril(lun, -1) + np.eye(N)
    u = np.triu(lun)
    assert_allclose(l @ u, a, rtol=1e-4, msg="mp_getrf")
    b = rng.normal(size=N).astype(np.float32)
    x = mp_getrs(lu, jnp.asarray(b))
    assert_allclose(a @ np.asarray(x), b, rtol=1e-3, msg="mp_getrs")


def test_mp_getrf_pivoted_hard(grid, rng):
    """Pivoted distributed LU on a NON-diagonally-dominant matrix with a
    tiny leading pivot — the case no-pivot LU cannot handle
    (≙ cuSOLVERMp default pivoting, mp_getrf_getrs.c:486)."""
    from tpumathlib.mp.solver import mp_getrf_pivoted, mp_getrs_pivoted

    a = rng.normal(size=(N, N)).astype(np.float32)
    a[0, 0] = 1e-9  # poisoned leading pivot
    lu, ipiv = mp_getrf_pivoted(_put(grid, a, P(None, "x")), grid)
    lun = np.asarray(lu)
    ipn = np.asarray(ipiv)
    l = np.tril(lun, -1) + np.eye(N)
    u = np.triu(lun)
    # multipliers bounded by 1: the pivoting guarantee
    assert np.abs(l).max() <= 1.0 + 1e-5
    pa = a.copy()
    for j in range(N):
        pa[[j, ipn[j]]] = pa[[ipn[j], j]]
    assert_allclose(l @ u, pa, rtol=2e-3, atol=2e-4, msg="mp_getrf_pivoted")
    # distributed-vs-single oracle: scipy pivoted LU solves same system
    x_true = rng.normal(size=(N, 2)).astype(np.float32)
    b = a @ x_true
    x = mp_getrs_pivoted(jnp.asarray(lun), jnp.asarray(ipn), jnp.asarray(b))
    assert_allclose(np.asarray(x), x_true, rtol=5e-2, atol=5e-2,
                    msg="mp_getrs_pivoted")


def test_mp_sytrd_stedc_ormtr(grid, rng):
    """Distributed eigensolver chain vs single-device eigh
    (≙ mp_sytrd_stedc_ormtr.c)."""
    from tpumathlib.mp.solver import mp_sytrd, mp_sytrd_stedc_ormtr

    a0 = rng.normal(size=(N, N)).astype(np.float32)
    a0 = (a0 + a0.T) / 2
    a = _put(grid, a0, P("x", None))
    d, e, q = mp_sytrd(a, grid)
    qn = np.asarray(q)
    # Q orthogonal and Qᵀ A Q tridiagonal
    assert_allclose(qn.T @ qn, np.eye(N), rtol=1e-3, atol=1e-3,
                    msg="mp_sytrd Q orthogonality")
    t = qn.T @ a0 @ qn
    assert np.abs(np.tril(t, -2)).max() < 1e-3
    assert_allclose(np.diag(t), np.asarray(d), rtol=1e-2, atol=1e-3,
                    msg="mp_sytrd d")
    w, v = mp_sytrd_stedc_ormtr(a, grid)
    w_ref = np.linalg.eigvalsh(a0)
    assert_allclose(np.sort(np.asarray(w)), w_ref, rtol=1e-3, atol=1e-3,
                    msg="mp chain eigenvalues")
    vn = np.asarray(v)
    # eigenvector residual: ||A v - w v||
    res = a0 @ vn - vn * np.asarray(w)[None, :]
    assert np.abs(res).max() < 5e-2, np.abs(res).max()


def test_mp_geqrf_gels(grid, rng):
    m = 128
    a = rng.normal(size=(m, 16)).astype(np.float32)
    q, r = mp_geqrf(_put(grid, a, P("x", None)), grid)
    qn, rn = np.asarray(q), np.asarray(r)
    assert_allclose(qn @ rn, a, rtol=1e-4, msg="TSQR")
    assert_allclose(qn.T @ qn, np.eye(16), rtol=1e-4, msg="TSQR orthogonality")
    xtrue = rng.normal(size=16).astype(np.float32)
    b = a @ xtrue + 0.01 * rng.normal(size=m).astype(np.float32)
    x = mp_gels(_put(grid, a, P("x", None)), _put(grid, b, P("x")), grid)
    xref = np.linalg.lstsq(a, b, rcond=None)[0]
    assert_allclose(x, xref, rtol=1e-3, msg="mp_gels")


def test_mp_gesvdj(grid, rng):
    m, n = 96, 16
    a = rng.normal(size=(m, n)).astype(np.float32)
    u, s, v = mp_gesvdj(_put(grid, a, P("x", None)), grid)
    sv = scipy.linalg.svdvals(a)
    assert_allclose(s, sv, rtol=1e-4, msg="mp_gesvdj values")
    assert_allclose(np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(v).T,
                    a, rtol=1e-3, msg="mp_gesvdj recon")


def test_mp_syevd(grid, rng):
    a0 = rng.normal(size=(N, N)).astype(np.float32)
    a = (a0 + a0.T) / 2
    w, v = mp_syevd(_put(grid, a, P("x", None)), grid, sweeps=16)
    ww = scipy.linalg.eigvalsh(a.astype(np.float64))
    assert_allclose(w, ww, rtol=1e-3, msg="mp_syevd values")
    assert_allclose(a @ np.asarray(v), np.asarray(v) * np.asarray(w),
                    rtol=1e-2, msg="mp_syevd vectors")


def test_mp_polar(grid, rng):
    a = rng.normal(size=(32, 16)).astype(np.float32)
    w, p = mp_polar(_put(grid, a, P("x", None)), grid)
    wn, pn = np.asarray(w), np.asarray(p)
    assert_allclose(wn @ pn, a, rtol=1e-3, msg="polar recon")
    assert_allclose(wn.T @ wn, np.eye(16), rtol=1e-3, msg="polar orthogonality")
    # P symmetric positive semidefinite
    assert_allclose(pn, pn.T, rtol=1e-4)
    assert scipy.linalg.eigvalsh(pn.astype(np.float64)).min() > -1e-3


def test_mp_ormqr(grid, rng):
    """Apply the TSQR Q both ways (≙ cusolverMpOrmqr)."""
    from tpumathlib.mp.solver import mp_ormqr

    m, k = 128, 16
    a = rng.normal(size=(m, k)).astype(np.float32)
    q, r = mp_geqrf(_put(grid, a, P("x", None)), grid)
    c = rng.normal(size=(k, 5)).astype(np.float32)
    qc = mp_ormqr(q, jnp.asarray(c), grid)
    assert_allclose(np.asarray(qc), np.asarray(q) @ c, rtol=1e-4)
    # Qᵀ(QC) = C
    back = mp_ormqr(q, qc, grid, trans=True)
    assert_allclose(np.asarray(back), c, rtol=1e-3, atol=1e-4)


def test_mp_sygst_sygvd(grid, rng):
    """Distributed generalized eigensolver chain vs scipy.linalg.eigh
    (≙ cusolverMpSygst + Sygvd)."""
    from tpumathlib.mp.solver import mp_sygst, mp_sygvd

    a0 = rng.normal(size=(N, N)).astype(np.float64)
    a0 = (a0 + a0.T) / 2
    g = rng.normal(size=(N, N))
    b0 = (g @ g.T / N + 2 * np.eye(N)).astype(np.float64)
    w, x = mp_sygvd(_put(grid, a0, P("x", None)),
                    _put(grid, b0, P("x", None)), grid)
    w_ref = scipy.linalg.eigh(a0, b0, eigvals_only=True)
    assert_allclose(np.sort(np.asarray(w)), w_ref, rtol=1e-3, atol=1e-3,
                    msg="mp_sygvd eigenvalues")
    # generalized eigenvector residual: A x = λ B x
    xn = np.asarray(x)
    res = a0 @ xn - b0 @ xn * np.asarray(w)[None, :]
    assert np.abs(res).max() < 5e-2, np.abs(res).max()

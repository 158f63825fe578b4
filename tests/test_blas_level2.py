"""cuBLAS Level-2 parity oracles — all 23 ops, vs explicit NumPy references.

Band/packed storage maps are validated against loop-built references (the
storage convention itself is part of the API surface under test).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.blas import level2
from tpumathlib.core import assert_allclose

N = 12


@pytest.fixture
def mats(rng):
    a = rng.normal(size=(N, N))
    x = rng.normal(size=N)
    y = rng.normal(size=N)
    return a, x, y


def np_band(a, kl, ku):
    m, n = a.shape
    ab = np.zeros((kl + ku + 1, n))
    for j in range(n):
        for i in range(max(0, j - ku), min(m, j + kl + 1)):
            ab[ku + i - j, j] = a[i, j]
    return ab


def np_packed(a, uplo):
    n = a.shape[0]
    out = []
    if uplo == "L":
        for j in range(n):
            for i in range(j, n):
                out.append(a[i, j])
    else:
        for j in range(n):
            for i in range(j + 1):
                out.append(a[i, j])
    return np.asarray(out)


def test_band_roundtrip(mats):
    a, _, _ = mats
    kl, ku = 2, 3
    banded = np.triu(np.tril(a, kl), -ku).T  # band of a.T? build directly:
    ab_ref = np_band(a, kl, ku)
    got = level2.dense_to_band(jnp.asarray(a), kl, ku)
    assert_allclose(got, ab_ref, rtol=1e-14)
    back = level2.band_to_dense(jnp.asarray(ab_ref), N, kl, ku)
    want = np.tril(np.triu(a, -kl), ku)
    assert_allclose(back, want, rtol=1e-14)


def test_packed_roundtrip(mats):
    a, _, _ = mats
    for uplo in "LU":
        ap_ref = np_packed(a, uplo)
        tri = np.tril(a) if uplo == "L" else np.triu(a)
        got = level2.dense_to_packed(jnp.asarray(tri), uplo)
        assert_allclose(got, ap_ref, rtol=1e-14)
        assert_allclose(level2.packed_to_dense(jnp.asarray(ap_ref), N, uplo), tri, rtol=1e-14)


@pytest.mark.parametrize("trans", ["N", "T"])
def test_gemv(mats, trans):
    a, x, y = mats
    got = level2.gemv(1.5, jnp.asarray(a), jnp.asarray(x), -0.5, jnp.asarray(y), trans)
    op = a if trans == "N" else a.T
    assert_allclose(got, 1.5 * op @ x - 0.5 * y, rtol=1e-12)


def test_gbmv(mats):
    a, x, y = mats
    kl, ku = 2, 3
    ab = np_band(a, kl, ku)
    band = np.tril(np.triu(a, -kl), ku)
    got = level2.gbmv(2.0, jnp.asarray(ab), jnp.asarray(x), 1.0, jnp.asarray(y),
                      m=N, n=N, kl=kl, ku=ku)
    assert_allclose(got, 2.0 * band @ x + y, rtol=1e-12)


def test_ger(mats):
    a, x, y = mats
    got = level2.ger(0.5, jnp.asarray(x), jnp.asarray(y), jnp.asarray(a))
    assert_allclose(got, a + 0.5 * np.outer(x, y), rtol=1e-12)


def test_gerc(rng):
    x = rng.normal(size=5) + 1j * rng.normal(size=5)
    y = rng.normal(size=5) + 1j * rng.normal(size=5)
    a = rng.normal(size=(5, 5)) + 1j * rng.normal(size=(5, 5))
    got = level2.gerc(1.0, jnp.asarray(x), jnp.asarray(y), jnp.asarray(a))
    assert_allclose(got, a + np.outer(x, y.conj()), rtol=1e-12)


@pytest.mark.parametrize("uplo", ["L", "U"])
def test_symv_spmv_sbmv(mats, uplo):
    a, x, y = mats
    sym = (a + a.T) / 2
    tri = np.tril(sym) if uplo == "L" else np.triu(sym)
    got = level2.symv(1.0, jnp.asarray(tri), jnp.asarray(x), 0.0, None, uplo)
    assert_allclose(got, sym @ x, rtol=1e-12)
    ap = np_packed(sym, uplo)
    got = level2.spmv(1.0, jnp.asarray(ap), jnp.asarray(x), 0.0, None, n=N, uplo=uplo)
    assert_allclose(got, sym @ x, rtol=1e-12)
    # banded symmetric: bandwidth k
    k = 2
    symb = np.tril(np.triu(sym, -k), k)
    ab = np_band(symb, k, 0) if uplo == "L" else np_band(symb, 0, k)
    got = level2.sbmv(1.0, jnp.asarray(ab), jnp.asarray(x), 0.0, None, n=N, k=k, uplo=uplo)
    assert_allclose(got, symb @ x, rtol=1e-12)


@pytest.mark.parametrize("uplo", ["L", "U"])
def test_syr_syr2_spr(mats, uplo):
    a, x, y = mats
    got = level2.syr(1.5, jnp.asarray(x), jnp.asarray(a), uplo)
    upd = a + 1.5 * np.outer(x, x)
    mask = np.tril(np.ones((N, N), bool)) if uplo == "L" else np.triu(np.ones((N, N), bool))
    assert_allclose(got, np.where(mask, upd, a), rtol=1e-12)
    got2 = level2.syr2(0.5, jnp.asarray(x), jnp.asarray(y), jnp.asarray(a), uplo)
    upd2 = a + 0.5 * (np.outer(x, y) + np.outer(y, x))
    assert_allclose(got2, np.where(mask, upd2, a), rtol=1e-12)
    sym = (a + a.T) / 2
    ap = np_packed(sym, uplo)
    gotp = level2.spr(2.0, jnp.asarray(x), jnp.asarray(ap), n=N, uplo=uplo)
    assert_allclose(gotp, np_packed(sym + 2.0 * np.outer(x, x), uplo), rtol=1e-12)


@pytest.mark.parametrize("uplo", ["L", "U"])
def test_hemv_her_her2_hp(rng, uplo):
    n = 8
    a = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    herm = (a + a.conj().T) / 2
    x = rng.normal(size=n) + 1j * rng.normal(size=n)
    y = rng.normal(size=n) + 1j * rng.normal(size=n)
    tri = np.tril(herm) if uplo == "L" else np.triu(herm)
    got = level2.hemv(1.0, jnp.asarray(tri), jnp.asarray(x), 0.0, None, uplo)
    assert_allclose(got, herm @ x, rtol=1e-12)
    mask = np.tril(np.ones((n, n), bool)) if uplo == "L" else np.triu(np.ones((n, n), bool))
    goth = level2.her(0.5, jnp.asarray(x), jnp.asarray(tri), uplo)
    assert_allclose(goth, np.where(mask, tri + 0.5 * np.outer(x, x.conj()), tri), rtol=1e-12)
    alpha = 0.3 + 0.4j
    goth2 = level2.her2(alpha, jnp.asarray(x), jnp.asarray(y), jnp.asarray(tri), uplo)
    upd = alpha * np.outer(x, y.conj()) + np.conj(alpha) * np.outer(y, x.conj())
    assert_allclose(goth2, np.where(mask, tri + upd, tri), rtol=1e-12)
    ap = np_packed(herm, uplo)
    gotp = level2.hpmv(1.0, jnp.asarray(ap), jnp.asarray(x), 0.0, None, n=n, uplo=uplo)
    assert_allclose(gotp, herm @ x, rtol=1e-12)
    gpr = level2.hpr(1.0, jnp.asarray(x), jnp.asarray(ap), n=n, uplo=uplo)
    assert_allclose(gpr, np_packed(herm + np.outer(x, x.conj()), uplo), rtol=1e-12)
    gpr2 = level2.hpr2(alpha, jnp.asarray(x), jnp.asarray(y), jnp.asarray(ap), n=n, uplo=uplo)
    assert_allclose(gpr2, np_packed(herm + upd, uplo), rtol=1e-12)


@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("trans", ["N", "T"])
@pytest.mark.parametrize("diag", ["N", "U"])
def test_trmv_trsv(mats, uplo, trans, diag):
    a, x, _ = mats
    a = a + 5 * np.eye(N)
    tri = np.tril(a) if uplo == "L" else np.triu(a)
    if diag == "U":
        tri = tri - np.diag(np.diag(tri)) + np.eye(N)
    op = tri if trans == "N" else tri.T
    got = level2.trmv(jnp.asarray(np.tril(a) if uplo == "L" else np.triu(a)),
                      jnp.asarray(x), uplo, trans, diag)
    assert_allclose(got, op @ x, rtol=1e-12)
    b = op @ x
    sol = level2.trsv(jnp.asarray(np.tril(a) if uplo == "L" else np.triu(a)),
                      jnp.asarray(b), uplo, trans, diag)
    assert_allclose(sol, x, rtol=1e-10)


@pytest.mark.parametrize("uplo", ["L", "U"])
def test_tb_tp(mats, uplo):
    a, x, _ = mats
    a = a + 5 * np.eye(N)
    k = 3
    tri = np.tril(np.triu(a, -k)) if uplo == "L" else np.triu(np.tril(a, k))
    ab = np_band(tri, k, 0) if uplo == "L" else np_band(tri, 0, k)
    got = level2.tbmv(jnp.asarray(ab), jnp.asarray(x), n=N, k=k, uplo=uplo)
    assert_allclose(got, tri @ x, rtol=1e-12)
    b = tri @ x
    sol = level2.tbsv(jnp.asarray(ab), jnp.asarray(b), n=N, k=k, uplo=uplo)
    assert_allclose(sol, x, rtol=1e-9)
    full_tri = np.tril(a) if uplo == "L" else np.triu(a)
    ap = np_packed(full_tri, uplo)
    got = level2.tpmv(jnp.asarray(ap), jnp.asarray(x), n=N, uplo=uplo)
    assert_allclose(got, full_tri @ x, rtol=1e-12)
    b2 = full_tri @ x
    sol2 = level2.tpsv(jnp.asarray(ap), jnp.asarray(b2), n=N, uplo=uplo)
    assert_allclose(sol2, x, rtol=1e-9)

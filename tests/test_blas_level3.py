"""cuBLAS Level-3 parity oracles — all 16 ops vs NumPy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.blas import level3
from tpumathlib.core import assert_allclose

M, N, K = 24, 20, 16


@pytest.fixture
def abc(rng):
    return (rng.normal(size=(M, K)), rng.normal(size=(K, N)), rng.normal(size=(M, N)))


@pytest.mark.parametrize("transa,transb", [("N", "N"), ("T", "N"), ("N", "T"), ("T", "T")])
def test_gemm_trans(abc, transa, transb, rng):
    a, b, c = abc
    at = a if transa == "N" else rng.normal(size=(K, M))
    bt = b if transb == "N" else rng.normal(size=(N, K))
    got = level3.gemm(1.2, jnp.asarray(at, jnp.float32), jnp.asarray(bt, jnp.float32),
                      0.7, jnp.asarray(c, jnp.float32), transa, transb)
    opa = at if transa == "N" else at.T
    opb = bt if transb == "N" else bt.T
    assert_allclose(got, 1.2 * opa @ opb + 0.7 * c, rtol=1e-4)


def test_gemm_conj(rng):
    a = rng.normal(size=(K, M)) + 1j * rng.normal(size=(K, M))
    b = rng.normal(size=(K, N)) + 1j * rng.normal(size=(K, N))
    got = level3.gemm(1.0, jnp.asarray(a), jnp.asarray(b), transa="C")
    assert_allclose(got, a.conj().T @ b, rtol=1e-10)


def test_gemm3m(rng):
    a = (rng.normal(size=(M, K)) + 1j * rng.normal(size=(M, K))).astype(np.complex64)
    b = (rng.normal(size=(K, N)) + 1j * rng.normal(size=(K, N))).astype(np.complex64)
    got = level3.gemm3m(1.0, jnp.asarray(a), jnp.asarray(b))
    assert_allclose(got, a.astype(np.complex128) @ b.astype(np.complex128), rtol=1e-4)


def test_gemm_batched_and_strided(rng):
    a = rng.normal(size=(4, M, K)).astype(np.float32)
    b = rng.normal(size=(4, K, N)).astype(np.float32)
    want = np.einsum("bij,bjk->bik", a.astype(np.float64), b.astype(np.float64))
    got = level3.gemm_strided_batched(1.0, jnp.asarray(a), jnp.asarray(b))
    assert_allclose(got, want, rtol=1e-4)
    got2 = level3.gemm_batched(1.0, list(jnp.asarray(a)), list(jnp.asarray(b)),
                               0.0, None)
    assert_allclose(got2, want, rtol=1e-4)


def test_gemm_grouped(rng):
    shapes = [(8, 6, 4), (16, 12, 10)]
    as_ = [jnp.asarray(rng.normal(size=(m, k)), jnp.float32) for m, _, k in shapes]
    bs = [jnp.asarray(rng.normal(size=(k, n)), jnp.float32) for _, n, k in shapes]
    outs = level3.gemm_grouped_batched([1.0, 2.0], as_, bs)
    for i, (o, a, b) in enumerate(zip(outs, as_, bs)):
        assert_allclose(o, (i + 1.0) * np.asarray(a) @ np.asarray(b), rtol=1e-4)


@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_symm_hemm(rng, side, uplo):
    n = 10
    a = rng.normal(size=(n, n))
    sym = (a + a.T) / 2
    tri = np.tril(sym) if uplo == "L" else np.triu(sym)
    b = rng.normal(size=(n, n))
    got = level3.symm(1.0, jnp.asarray(tri), jnp.asarray(b), side=side, uplo=uplo)
    want = sym @ b if side == "L" else b @ sym
    assert_allclose(got, want, rtol=1e-12)
    az = a + 1j * rng.normal(size=(n, n))
    herm = (az + az.conj().T) / 2
    trih = np.tril(herm) if uplo == "L" else np.triu(herm)
    bz = b + 1j * rng.normal(size=(n, n))
    goth = level3.hemm(1.0, jnp.asarray(trih), jnp.asarray(bz), side=side, uplo=uplo)
    wanth = herm @ bz if side == "L" else bz @ herm
    assert_allclose(goth, wanth, rtol=1e-12)


@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("trans", ["N", "T"])
def test_syrk_family(rng, uplo, trans):
    n, k = 10, 6
    a = rng.normal(size=(n, k) if trans == "N" else (k, n))
    b = rng.normal(size=(n, k) if trans == "N" else (k, n))
    c = rng.normal(size=(n, n))
    mask = np.tril(np.ones((n, n), bool)) if uplo == "L" else np.triu(np.ones((n, n), bool))
    aa = a if trans == "N" else a.T
    bb = b if trans == "N" else b.T
    got = level3.syrk(1.5, jnp.asarray(a), 0.5, jnp.asarray(c), uplo, trans)
    assert_allclose(got, np.where(mask, 1.5 * aa @ aa.T + 0.5 * c, c), rtol=1e-12)
    got = level3.syr2k(1.5, jnp.asarray(a), jnp.asarray(b), 0.5, jnp.asarray(c), uplo, trans)
    assert_allclose(got, np.where(mask, 1.5 * (aa @ bb.T + bb @ aa.T) + 0.5 * c, c), rtol=1e-12)
    got = level3.syrkx(1.5, jnp.asarray(a), jnp.asarray(b), 0.5, jnp.asarray(c), uplo, trans)
    assert_allclose(got, np.where(mask, 1.5 * aa @ bb.T + 0.5 * c, c), rtol=1e-12)


@pytest.mark.parametrize("uplo", ["L", "U"])
def test_herk_family(rng, uplo):
    n, k = 8, 5
    a = rng.normal(size=(n, k)) + 1j * rng.normal(size=(n, k))
    b = rng.normal(size=(n, k)) + 1j * rng.normal(size=(n, k))
    c0 = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    c = (c0 + c0.conj().T) / 2
    mask = np.tril(np.ones((n, n), bool)) if uplo == "L" else np.triu(np.ones((n, n), bool))
    got = level3.herk(1.5, jnp.asarray(a), 0.5, jnp.asarray(c), uplo)
    assert_allclose(got, np.where(mask, 1.5 * a @ a.conj().T + 0.5 * c, c), rtol=1e-12)
    alpha = 0.3 + 0.7j
    got = level3.her2k(alpha, jnp.asarray(a), jnp.asarray(b), 0.5, jnp.asarray(c), uplo)
    upd = alpha * a @ b.conj().T + np.conj(alpha) * b @ a.conj().T
    assert_allclose(got, np.where(mask, upd + 0.5 * c, c), rtol=1e-12)
    got = level3.herkx(alpha, jnp.asarray(a), jnp.asarray(b), 0.5, jnp.asarray(c), uplo)
    assert_allclose(got, np.where(mask, alpha * a @ b.conj().T + 0.5 * c, c), rtol=1e-12)


@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("transa", ["N", "T"])
def test_trmm_trsm(rng, side, uplo, transa):
    n = 10
    a = rng.normal(size=(n, n)) + 5 * np.eye(n)
    tri = np.tril(a) if uplo == "L" else np.triu(a)
    b = rng.normal(size=(n, n))
    op = tri if transa == "N" else tri.T
    got = level3.trmm(2.0, jnp.asarray(tri), jnp.asarray(b), side, uplo, transa)
    want = 2.0 * (op @ b if side == "L" else b @ op)
    assert_allclose(got, want, rtol=1e-12)
    x = level3.trsm(2.0, jnp.asarray(tri), jnp.asarray(want / 2.0), side, uplo, transa)
    # trsm solves op(A) X = alpha*B → residual check op(A) X == alpha*B = want
    if side == "L":
        assert_allclose(op @ np.asarray(x), want, rtol=1e-10)
    else:
        assert_allclose(np.asarray(x) @ op, want, rtol=1e-10)


def test_trsm_batched(rng):
    n = 8
    a = rng.normal(size=(3, n, n)) + 5 * np.eye(n)
    tril = np.tril(a)
    b = rng.normal(size=(3, n, n))
    x = level3.trsm_batched(1.0, jnp.asarray(tril), jnp.asarray(b))
    assert_allclose(np.einsum("bij,bjk->bik", tril, np.asarray(x)), b, rtol=1e-10)

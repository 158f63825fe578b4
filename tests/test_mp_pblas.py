"""Distributed-vs-single-device oracles for the PBLAS op breadth
(≙ cuBLASMp README.md:9-31 ops; verify pattern of cuBLASMp/matmul.h:303-577:
gather the distributed result and compare against a single-device
reference at dtype rtol)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumathlib.mp.grid import Grid
from tpumathlib.mp.pblas import (
    mp_geadd,
    mp_symm,
    mp_syr2k,
    mp_syrk,
    mp_syrkx,
    mp_tradd,
    mp_trmm,
    mp_trsm,
)


@pytest.fixture(scope="module")
def grid():
    return Grid.create(jax.devices())


@pytest.fixture
def rng():
    return np.random.default_rng(7)


M, K, N = 64, 40, 24  # M divisible by 8 ranks


def _tri_np(a, uplo, unit=False):
    t = np.tril(a) if uplo == "lower" else np.triu(a)
    if unit:
        np.fill_diagonal(t, 1.0)
    return t


@pytest.mark.parametrize("uplo", ["lower", "upper"])
def test_mp_syrk_syr2k_syrkx(grid, rng, uplo):
    a = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(M, M)), jnp.float32)
    an, bn, cn = (np.asarray(v) for v in (a, b, c))
    tri = np.tril if uplo == "lower" else np.triu

    got = np.asarray(mp_syrk(a, c, grid, alpha=2.0, beta=0.5, uplo=uplo))
    ref = np.where(tri(np.ones((M, M))) > 0, 2.0 * an @ an.T + 0.5 * cn, cn)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    got = np.asarray(mp_syr2k(a, b, c, grid, alpha=1.5, beta=0.5, uplo=uplo))
    ref = np.where(tri(np.ones((M, M))) > 0,
                   1.5 * (an @ bn.T + bn @ an.T) + 0.5 * cn, cn)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    got = np.asarray(mp_syrkx(a, b, c, grid, alpha=1.5, beta=0.5, uplo=uplo))
    ref = np.where(tri(np.ones((M, M))) > 0, 1.5 * an @ bn.T + 0.5 * cn, cn)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("uplo", ["lower", "upper"])
def test_mp_symm(grid, rng, uplo):
    a = jnp.asarray(rng.normal(size=(M, M)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
    an, bn, cn = (np.asarray(v) for v in (a, b, c))
    t = _tri_np(an, uplo)
    sym = t + t.T - np.diag(np.diag(t))
    got = np.asarray(mp_symm(a, b, c, grid, alpha=2.0, beta=-1.0, uplo=uplo))
    np.testing.assert_allclose(got, 2.0 * sym @ bn - cn, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("uplo,trans,unit", [
    ("lower", False, False), ("upper", False, True), ("lower", True, False)])
def test_mp_trmm(grid, rng, uplo, trans, unit):
    a = jnp.asarray(rng.normal(size=(M, M)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
    an, bn = np.asarray(a), np.asarray(b)
    t = _tri_np(an, uplo, unit)
    op = t.T if trans else t
    got = np.asarray(mp_trmm(a, b, grid, alpha=1.5, uplo=uplo, trans=trans,
                             unit=unit))
    np.testing.assert_allclose(got, 1.5 * op @ bn, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("uplo,unit", [("lower", False), ("upper", False),
                                       ("lower", True)])
def test_mp_trsm(grid, rng, uplo, unit):
    a = rng.normal(size=(M, M)).astype(np.float32)
    a = a + M * np.eye(M, dtype=np.float32) * np.sign(np.diag(a) + 0.1)
    b = rng.normal(size=(M, N)).astype(np.float32)
    t = _tri_np(a, uplo, unit)
    got = np.asarray(mp_trsm(jnp.asarray(a), jnp.asarray(b), grid,
                             alpha=2.0, uplo=uplo, unit=unit))
    ref = np.linalg.solve(t, 2.0 * b)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("trans", [False, True])
def test_mp_geadd_tradd(grid, rng, trans):
    a = jnp.asarray(rng.normal(size=(M, M)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(M, M)), jnp.float32)
    an, cn = np.asarray(a), np.asarray(c)
    op = an.T if trans else an
    got = np.asarray(mp_geadd(a, c, grid, alpha=2.0, beta=0.5, trans=trans))
    np.testing.assert_allclose(got, 2.0 * op + 0.5 * cn, rtol=1e-6)

    got = np.asarray(mp_tradd(a, c, grid, alpha=2.0, beta=0.5, trans=trans,
                              uplo="upper"))
    ref = np.where(np.triu(np.ones((M, M))) > 0, 2.0 * op + 0.5 * cn, cn)
    np.testing.assert_allclose(got, ref, rtol=1e-6)

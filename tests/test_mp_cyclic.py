"""2D block-cyclic (nprow x npcol, b x b) execution — distributed-vs-local
oracles on the 4x2 virtual mesh at shapes where EVERY rank holds multiple
blocks per dimension (the regime the round-4 1D tier never exercised).

≙ cuSOLVERMp/mp_getrf_getrs.c:346-349 (2D device grid + block-cyclic
descriptors), cuBLASMp/helpers.h:1384 (numroc local extents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumathlib.mp.grid import Grid
from tpumathlib.mp.cyclic import (
    BlockCyclic, getrf_2d, potrf_2d, summa_gemm, syevd_2d, syrk_2d,
)


@pytest.fixture(scope="module")
def grid2d():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return Grid.create(devs[:8], nprow=4, npcol=2)


def _desc(grid2d, n=128, b=16):
    # 4x2 grid, nbt = 8 blocks/dim -> lbr=2, lbc=4: multiple blocks/rank
    return BlockCyclic(grid2d, n=n, b=b)


def test_scatter_gather_roundtrip(grid2d, rng):
    desc = _desc(grid2d)
    a = rng.normal(size=(desc.n, desc.n))
    a6 = desc.scatter(jnp.asarray(a))
    # local shard really is (1, 1, lbr, lbc, b, b)
    shard = a6.addressable_shards[0].data
    assert shard.shape == (1, 1, desc.lbr, desc.lbc, desc.b, desc.b)
    back = np.asarray(desc.gather(a6))
    np.testing.assert_allclose(back, a, rtol=0, atol=0)
    # spot-check the cyclic index map: global block (3, 5) lives on rank
    # (3 % 4, 5 % 2) at local slot (3 // 4, 5 // 2)
    blk = np.asarray(a6)[3 % 4, 5 % 2, 3 // 4, 5 // 2]
    np.testing.assert_array_equal(
        blk, a[3 * desc.b:4 * desc.b, 5 * desc.b:6 * desc.b])


def test_summa_gemm(grid2d, rng):
    desc = _desc(grid2d)
    a = rng.normal(size=(desc.n, desc.n))
    b = rng.normal(size=(desc.n, desc.n))
    c6 = summa_gemm(desc.scatter(jnp.asarray(a)),
                    desc.scatter(jnp.asarray(b)), desc, alpha=1.5)
    np.testing.assert_allclose(np.asarray(desc.gather(c6)), 1.5 * a @ b,
                               rtol=1e-10, atol=1e-8)
    ct6 = summa_gemm(desc.scatter(jnp.asarray(a)),
                     desc.scatter(jnp.asarray(b)), desc, transpose_b=True)
    np.testing.assert_allclose(np.asarray(desc.gather(ct6)), a @ b.T,
                               rtol=1e-10, atol=1e-8)


def test_syrk_2d(grid2d, rng):
    desc = _desc(grid2d)
    a = rng.normal(size=(desc.n, desc.n))
    c = rng.normal(size=(desc.n, desc.n))
    out = np.asarray(desc.gather(syrk_2d(
        desc.scatter(jnp.asarray(a)), desc.scatter(jnp.asarray(c)), desc,
        alpha=2.0, beta=0.5)))
    want = np.tril(2.0 * a @ a.T + 0.5 * c) + np.triu(c, 1)
    np.testing.assert_allclose(out, want, rtol=1e-10, atol=1e-8)


def test_potrf_2d(grid2d, rng):
    desc = _desc(grid2d)
    g = rng.normal(size=(desc.n, desc.n))
    a = g @ g.T + desc.n * np.eye(desc.n)
    l6 = potrf_2d(desc.scatter(jnp.asarray(a)), desc)
    l = np.asarray(desc.gather(l6))
    ref = np.linalg.cholesky(a)
    assert np.abs(np.triu(l, 1)).max() == 0.0
    np.testing.assert_allclose(l, ref, rtol=0,
                               atol=1e-8 * np.abs(ref).max())


@pytest.mark.parametrize("pivot", [False, True])
def test_getrf_2d(grid2d, rng, pivot):
    desc = _desc(grid2d)
    a = rng.normal(size=(desc.n, desc.n))
    if not pivot:
        a = a + desc.n * np.eye(desc.n)   # diagonally dominant
    lu6, perm = getrf_2d(desc.scatter(jnp.asarray(a)), desc, pivot=pivot)
    lu = np.asarray(desc.gather(lu6))
    perm = np.asarray(perm)
    l = np.tril(lu, -1) + np.eye(desc.n)
    u = np.triu(lu)
    np.testing.assert_allclose(l @ u, a[perm], rtol=0,
                               atol=1e-9 * np.abs(a).max() * desc.n)
    if pivot:
        # partial pivoting controls growth: |L| <= 1
        assert np.abs(l).max() <= 1.0 + 1e-12
    else:
        np.testing.assert_array_equal(perm, np.arange(desc.n))


def test_syevd_2d(grid2d, rng):
    desc = _desc(grid2d, n=64, b=8)
    g = rng.normal(size=(desc.n, desc.n))
    a = (g + g.T) / 2
    w, v6 = syevd_2d(desc.scatter(jnp.asarray(a)), desc, sweeps=16)
    v = np.asarray(desc.gather(v6))
    wr = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.sort(np.asarray(w)), wr, atol=1e-6)
    res = a @ v - v * np.asarray(w)[None, :]
    assert np.abs(res).max() < 1e-5

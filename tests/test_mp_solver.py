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

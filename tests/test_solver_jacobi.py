"""Jacobi eigen/SVD oracles (≙ gesvdj/syevj/sygvj samples with tolerance,
max-sweeps and residual query)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from tpumathlib.core import assert_allclose
from tpumathlib.solver import gesvdj, gesvdj_batched, syevj, sygvj
from tpumathlib.solver.jacobi import _round_robin, gesvda_strided_batched


def test_round_robin_schedule():
    for n in (4, 6, 8, 10):
        sched = _round_robin(n)
        pairs = {tuple(sorted(p)) for r in sched for p in r}
        assert len(pairs) == n * (n - 1) // 2  # every pair exactly once
        for r in sched:  # disjoint within a round
            flat = [i for p in r for i in p]
            assert len(set(flat)) == len(flat)


@pytest.mark.parametrize("n", [8, 13, 16])
def test_syevj(rng, n):
    a0 = rng.normal(size=(n, n))
    a = (a0 + a0.T) / 2
    w, v, res, sweeps = syevj(jnp.asarray(a), tol=1e-12, max_sweeps=30)
    ww = scipy.linalg.eigvalsh(a)
    assert_allclose(w, ww, rtol=1e-9)
    assert_allclose(a @ np.asarray(v), np.asarray(v) * np.asarray(w), rtol=1e-8)
    assert int(sweeps) <= 30 and float(res) >= 0


def test_syevj_batched(rng):
    a0 = rng.normal(size=(4, 10, 10))
    a = (a0 + np.swapaxes(a0, -1, -2)) / 2
    w, v, res, sweeps = syevj(jnp.asarray(a), tol=1e-12, max_sweeps=30)
    for i in range(4):
        assert_allclose(w[i], scipy.linalg.eigvalsh(a[i]), rtol=1e-8)


def test_sygvj(rng):
    n = 10
    a0 = rng.normal(size=(n, n))
    a = (a0 + a0.T) / 2
    b0 = rng.normal(size=(n, n))
    b = b0 @ b0.T / n + 2 * np.eye(n)
    w, x, res, sweeps = sygvj(jnp.asarray(a), jnp.asarray(b), tol=1e-12, max_sweeps=30)
    assert_allclose(w, scipy.linalg.eigvalsh(a, b), rtol=1e-8)


@pytest.mark.parametrize("shape", [(16, 16), (24, 10), (15, 9)])
def test_gesvdj(rng, shape):
    a = rng.normal(size=shape)
    u, s, v, res, sweeps = gesvdj(jnp.asarray(a), tol=1e-12, max_sweeps=30)
    assert_allclose(s, scipy.linalg.svdvals(a), rtol=1e-9)
    assert_allclose(np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(v).T, a, rtol=1e-8)
    # orthogonality
    assert_allclose(np.asarray(v).T @ np.asarray(v), np.eye(shape[1]), rtol=1e-8)


def test_gesvdj_batched(rng):
    a = rng.normal(size=(3, 12, 8))
    u, s, v, res, sweeps = gesvdj_batched(jnp.asarray(a), tol=1e-12)
    for i in range(3):
        assert_allclose(s[i], scipy.linalg.svdvals(a[i]), rtol=1e-8)


def test_gesvda_truncated(rng):
    a = rng.normal(size=(2, 16, 12))
    u, s, v, _, _ = gesvda_strided_batched(jnp.asarray(a), rank=4, tol=1e-12)
    assert s.shape == (2, 4)
    for i in range(2):
        assert_allclose(s[i], scipy.linalg.svdvals(a[i])[:4], rtol=1e-8)


def test_max_sweeps_cap(rng):
    """The solver must respect max_sweeps (≙ SetMaxSweeps) and report the
    count (≙ GetSweeps)."""
    a0 = rng.normal(size=(16, 16))
    a = (a0 + a0.T) / 2
    w, v, res, sweeps = syevj(jnp.asarray(a), tol=0.0, max_sweeps=2)
    assert int(sweeps) == 2

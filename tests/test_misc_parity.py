"""Planar-complex Lt matmul, mp_laset, benchmarks-module smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpumathlib.blas.lt import matmul_planar
from tpumathlib.core import assert_allclose
from tpumathlib.mp import Grid
from tpumathlib.mp.solver import mp_laset


def test_matmul_planar(rng):
    a = rng.normal(size=(16, 24)) + 1j * rng.normal(size=(16, 24))
    b = rng.normal(size=(24, 12)) + 1j * rng.normal(size=(24, 12))
    for use_3m in (True, False):
        dr, di = matmul_planar(jnp.asarray(a.real, jnp.float32),
                               jnp.asarray(a.imag, jnp.float32),
                               jnp.asarray(b.real, jnp.float32),
                               jnp.asarray(b.imag, jnp.float32),
                               alpha=2.0, use_3m=use_3m)
        want = 2.0 * a @ b
        assert_allclose(np.asarray(dr) + 1j * np.asarray(di), want, rtol=1e-4)


def test_mp_laset():
    grid = Grid.create(jax.devices())
    m = mp_laset((16, 16), grid, alpha=0.5, beta=3.0)
    mn = np.asarray(m)
    assert np.allclose(np.diag(mn), 3.0)
    assert np.allclose(mn[0, 1], 0.5)
    lo = np.asarray(mp_laset((16, 16), grid, alpha=1.0, beta=2.0, uplo="L"))
    assert np.allclose(np.triu(lo, 1), 0.0)
    assert np.allclose(np.diag(lo), 2.0)


def test_benchmarks_smoke():
    """The harness runs end-to-end on small problems (CPU)."""
    from tpumathlib import benchmarks

    g = benchmarks.bench_gemm(128, 128, 128, "float32")
    assert g["tflops"] > 0
    f = benchmarks.bench_fft(16, 256)
    assert f["gflops"] > 0
    s = benchmarks.bench_spmv(1000, 8)
    assert s["gbps"] > 0
    c = benchmarks.bench_compression("lz4", size=1 << 16)
    assert c["ratio"] > 1.0

"""cuBLAS Extensions + Emulation oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.blas import emulation, ext
from tpumathlib.core import assert_allclose


def test_gemm_ex_mixed(rng):
    a = rng.normal(size=(32, 48)).astype(np.float32)
    b = rng.normal(size=(48, 24)).astype(np.float32)
    ah = jnp.asarray(a, jnp.bfloat16)
    bh = jnp.asarray(b, jnp.bfloat16)
    d = ext.gemm_ex(1.0, ah, bh, compute_dtype=jnp.float32, out_dtype=jnp.float32)
    assert d.dtype == jnp.float32
    assert_allclose(d, np.asarray(ah, np.float64) @ np.asarray(bh, np.float64), rtol=1e-4)


def test_geam_dgmm(rng):
    a = rng.normal(size=(6, 8))
    b = rng.normal(size=(8, 6))
    got = ext.geam(2.0, jnp.asarray(a), -1.0, jnp.asarray(b), "N", "T")
    assert_allclose(got, 2 * a - b.T, rtol=1e-12)
    x = rng.normal(size=8)
    assert_allclose(ext.dgmm(jnp.asarray(a), jnp.asarray(x), "R"), a * x[None, :], rtol=1e-12)
    y = rng.normal(size=6)
    assert_allclose(ext.dgmm(jnp.asarray(a), jnp.asarray(y), "L"), a * y[:, None], rtol=1e-12)


def test_tpttr_trttp(rng):
    a = np.tril(rng.normal(size=(7, 7)))
    ap = ext.trttp(jnp.asarray(a), "L")
    back = ext.tpttr(ap, 7, "L")
    assert_allclose(back, a, rtol=1e-12)


def test_ex_vector_ops(rng):
    x = jnp.asarray(rng.normal(size=32), jnp.bfloat16)
    y = jnp.asarray(rng.normal(size=32), jnp.bfloat16)
    got = ext.axpy_ex(2.0, x, y)
    assert got.dtype == jnp.bfloat16
    want = 2.0 * np.asarray(x, np.float32) + np.asarray(y, np.float32)
    assert_allclose(got, want, rtol=1e-2)
    d = ext.dot_ex(x, y)
    assert_allclose(d, np.asarray(x, np.float64) @ np.asarray(y, np.float64), rtol=1e-2)


def test_cherk3m(rng):
    n, k = 8, 6
    a = (rng.normal(size=(n, k)) + 1j * rng.normal(size=(n, k))).astype(np.complex64)
    got = ext.cherk3m_ex(1.0, jnp.asarray(a), uplo="L")
    want = a.astype(np.complex128) @ a.conj().T.astype(np.complex128)
    mask = np.tril(np.ones((n, n), bool))
    assert_allclose(got, np.where(mask, want, 0), rtol=1e-3)


# ---------------- emulation ----------------

@pytest.mark.parametrize("scheme,rtol", [("bf16x3", 3e-5), ("bf16x9", 2e-7)])
def test_sgemm_emulated(rng, scheme, rtol):
    """bf16x9 must reach fp32-class accuracy; bf16x3 is looser
    (≙ Emulation/bf16x9_sgemm claims)."""
    m, n, k = 64, 64, 96
    a = rng.normal(size=(m, k)).astype(np.float32)
    b = rng.normal(size=(k, n)).astype(np.float32)
    got = emulation.sgemm_emulated(jnp.asarray(a), jnp.asarray(b), scheme)
    want = a.astype(np.float64) @ b.astype(np.float64)
    err = np.abs(np.asarray(got, np.float64) - want).max() / np.abs(want).max()
    assert err < rtol, err


@pytest.mark.parametrize("control", ["fixed", "dynamic"])
def test_dgemm_emulated(rng, control):
    """Ozaki int8 dgemm vs NumPy f64 (≙ Emulation/dgemm_{fixed,dynamic})."""
    m, n, k = 32, 32, 48
    a = rng.normal(size=(m, k)) * np.exp(rng.normal(size=(m, k)))
    b = rng.normal(size=(k, n))
    got = emulation.dgemm_emulated(jnp.asarray(a), jnp.asarray(b),
                                   num_slices=9, mantissa_control=control)
    want = a @ b
    err = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
    assert err < 1e-13, err


def test_zgemm_emulated(rng):
    m, n, k = 16, 16, 24
    a = rng.normal(size=(m, k)) + 1j * rng.normal(size=(m, k))
    b = rng.normal(size=(k, n)) + 1j * rng.normal(size=(k, n))
    got = emulation.zgemm_emulated(jnp.asarray(a), jnp.asarray(b), num_slices=9)
    err = np.abs(np.asarray(got) - a @ b).max() / np.abs(a @ b).max()
    assert err < 1e-13, err


def test_split_bf16_exact():
    x = jnp.asarray(np.random.default_rng(0).normal(size=256), jnp.float32)
    words = emulation.split_bf16(x, 3)
    recon = sum(w.astype(jnp.float64) for w in words)
    # 3 bf16 words carry ≥24 mantissa bits → exact fp32 reconstruction
    np.testing.assert_array_equal(np.asarray(recon, np.float32), np.asarray(x))

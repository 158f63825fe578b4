"""cuBLAS Level-1 parity oracles (≙ the 13 Level-1 samples; tier-2/3
verification per SURVEY.md §4: host-reference comparison)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.blas import level1
from tpumathlib.core import assert_allclose


@pytest.fixture
def xy(rng):
    x = jnp.asarray(rng.normal(size=32), jnp.float32)
    y = jnp.asarray(rng.normal(size=32), jnp.float32)
    return x, y


def test_amax_amin_real(xy):
    x, _ = xy
    assert int(level1.amax(x)) == int(np.argmax(np.abs(np.asarray(x))))
    assert int(level1.amin(x)) == int(np.argmin(np.abs(np.asarray(x))))


def test_amax_complex(rng):
    z = jnp.asarray(rng.normal(size=16) + 1j * rng.normal(size=16), jnp.complex64)
    zn = np.asarray(z)
    # BLAS convention: |Re| + |Im|
    assert int(level1.amax(z)) == int(np.argmax(np.abs(zn.real) + np.abs(zn.imag)))


def test_asum_axpy_dot_nrm2_scal(xy):
    x, y = xy
    xn, yn = np.asarray(x), np.asarray(y)
    assert_allclose(level1.asum(x), np.sum(np.abs(xn)), rtol=1e-5)
    assert_allclose(level1.axpy(2.0, x, y), 2 * xn + yn, rtol=1e-6)
    assert_allclose(level1.dot(x, y), xn @ yn, rtol=1e-5)
    assert_allclose(level1.nrm2(x), np.linalg.norm(xn), rtol=1e-6)
    assert_allclose(level1.scal(-1.5, x), -1.5 * xn, rtol=1e-6)


def test_dotc(rng):
    z = jnp.asarray(rng.normal(size=8) + 1j * rng.normal(size=8), jnp.complex64)
    w = jnp.asarray(rng.normal(size=8) + 1j * rng.normal(size=8), jnp.complex64)
    assert_allclose(level1.dotc(z, w), np.vdot(np.asarray(z), np.asarray(w)), rtol=1e-5)


def test_rot_rotg():
    r, z, c, s = level1.rotg(3.0, 4.0)
    assert np.isclose(r, 5.0) and np.isclose(c, 0.6) and np.isclose(s, 0.8)
    # netlib z convention: |a|<=|b| here → z = 1/c
    assert np.isclose(z, 1.0 / c)
    # |a|>|b| → z = s, so the rotation reconstructs from z alone
    r2, z2, c2, s2 = level1.rotg(4.0, 3.0)
    assert np.isclose(z2, s2)
    x = jnp.asarray([3.0])
    y = jnp.asarray([4.0])
    xr, yr = level1.rot(x, y, c, s)
    assert_allclose(xr, [5.0], rtol=1e-6)
    assert_allclose(yr, [0.0], rtol=1e-6, atol=1e-6)


def test_rotm_rotmg():
    # rotmg zeroes the second component of (sqrt(d1)x1, sqrt(d2)y1)
    d1, d2, x1, y1 = 2.0, 3.0, 1.5, 0.7
    d1n, d2n, x1n, param = level1.rotmg(d1, d2, x1, y1)
    xr, yr = level1.rotm(jnp.asarray([x1]), jnp.asarray([y1]), param)
    # applying H to (x1, y1) must zero y
    assert abs(float(yr[0])) < 1e-12
    # invariant: d1*x1^2 + d2*y1^2 preserved
    lhs = d1 * x1**2 + d2 * y1**2
    rhs = d1n * float(xr[0]) ** 2 + d2n * float(yr[0]) ** 2
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_swap_copy(xy):
    x, y = xy
    a, b = level1.swap(x, y)
    assert_allclose(a, np.asarray(y), rtol=0)
    assert_allclose(level1.copy(x), np.asarray(x), rtol=0)

"""MXU FFT engine oracles (fft.kernels) + planar plan interface.

Tolerance: complex64 rel-L2 < 1e-4 (JAX_FFT bar); the engine lands ~1e-7.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.core import rel_l2
from tpumathlib.fft import Direction, FftType, plan_many
from tpumathlib.fft.kernels import mxu_fft, mxu_fftn, mxu_irfft, mxu_rfft


@pytest.mark.parametrize("n", [16, 128, 360, 1024, 4096])
def test_mxu_fft_sizes(rng, n):
    x = (rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n))).astype(np.complex64)
    y = mxu_fft(jnp.asarray(x))
    assert rel_l2(y, np.fft.fft(x, axis=-1)) < 1e-5
    z = mxu_fft(y, inverse=True)
    assert rel_l2(z, n * x) < 1e-5


def test_mxu_fftn(rng):
    x = (rng.normal(size=(4, 16, 32)) + 1j * rng.normal(size=(4, 16, 32))).astype(np.complex64)
    y = mxu_fftn(jnp.asarray(x), axes=(1, 2))
    assert rel_l2(y, np.fft.fftn(x, axes=(1, 2))) < 1e-5


def test_mxu_rfft_irfft(rng):
    n = 256
    x = rng.normal(size=(4, n)).astype(np.float32)
    y = mxu_rfft(jnp.asarray(x))
    assert y.shape == (4, n // 2 + 1)
    assert rel_l2(y, np.fft.rfft(x, axis=-1)) < 1e-5
    z = mxu_irfft(y, n)
    assert rel_l2(z, n * x) < 1e-5


def test_planar_plan_interface(rng):
    """The planar (re, im) path — the TPU production interface where the
    backend has no complex dtype (≙ LtPlanarComplex layouts)."""
    n = 512
    x = (rng.normal(size=(8, n)) + 1j * rng.normal(size=(8, n))).astype(np.complex64)
    plan = plan_many((n,), FftType.C2C)
    yr, yi = plan((jnp.asarray(x.real), jnp.asarray(x.imag)))
    w = np.fft.fft(x, axis=-1)
    assert rel_l2(np.asarray(yr) + 1j * np.asarray(yi), w) < 1e-5
    zr, zi = plan((yr, yi), Direction.INVERSE)
    assert rel_l2(np.asarray(zr) + 1j * np.asarray(zi), n * x) < 1e-5


def test_planar_plan_with_callback(rng):
    n = 128
    x = (rng.normal(size=(n,)) + 1j * rng.normal(size=(n,))).astype(np.complex64)
    win = jnp.where(jnp.arange(n) < 8, 1.0, 0.0).astype(jnp.float32)
    plan = plan_many((n,), FftType.C2C, pre=lambda ri: (ri[0] * win, ri[1] * win))
    yr, yi = plan((jnp.asarray(x.real), jnp.asarray(x.imag)))
    w = np.fft.fft(x * np.asarray(win))
    assert rel_l2(np.asarray(yr) + 1j * np.asarray(yi), w) < 1e-5


def test_pallas_fused_fft(rng):
    """The fused Pallas four-step tile kernel (interpret mode on CPU; the
    compiled path is the TPU production kernel)."""
    from tpumathlib.fft.kernels import pallas_fft

    x = (rng.normal(size=(12, 4096)) + 1j * rng.normal(size=(12, 4096))).astype(np.complex64)
    yr, yi = pallas_fft(jnp.asarray(x.real), jnp.asarray(x.imag), tile=4)
    w = np.fft.fft(x, axis=-1)
    assert rel_l2(np.asarray(yr) + 1j * np.asarray(yi), w) < 1e-4
    zr, zi = pallas_fft(yr, yi, inverse=True, tile=4)
    assert rel_l2(np.asarray(zr) + 1j * np.asarray(zi), 4096 * x) < 1e-4


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_dif_butterfly_fft(rng, n):
    """Roll-based radix-2 DIF Pallas kernel (pure VPU butterflies) — the
    memory-bound FFT engine. Natural and INPLACE_SHUFFLED output modes."""
    from tpumathlib.fft.stockham import dif_fft, shuffle_perm

    x = (rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n))).astype(np.complex64)
    yr, yi = dif_fft(jnp.asarray(x.real), jnp.asarray(x.imag), tile=4)
    w = np.fft.fft(x, axis=-1)
    assert rel_l2(np.asarray(yr) + 1j * np.asarray(yi), w) < 1e-5
    # HIGHEST-precision mode (6-pass MXU instead of bf16x2 3M)
    er, ei = dif_fft(jnp.asarray(x.real), jnp.asarray(x.imag), tile=4,
                     exact=True)
    assert rel_l2(np.asarray(er) + 1j * np.asarray(ei), w) < 1e-6
    # unnormalized inverse roundtrip
    zr, zi = dif_fft(yr, yi, inverse=True, tile=4)
    assert rel_l2(np.asarray(zr) + 1j * np.asarray(zi), n * x) < 1e-5
    # shuffled mode: natural == raw[shuffle_perm] (≙ cufftXt
    # INPLACE_SHUFFLED: a consistent permuted order, gather-free output)
    sr, si = dif_fft(jnp.asarray(x.real), jnp.asarray(x.imag), tile=4,
                     reorder=False)
    perm = shuffle_perm(n)
    np.testing.assert_allclose(np.asarray(sr)[:, perm], np.asarray(yr),
                               rtol=1e-5, atol=1e-3)
    # bf16-plane fast mode: HALF the HBM stream bytes, documented ~4e-3
    # rel-L2 contract (input/output quantization; butterflies stay f32)
    hr, hi = dif_fft(jnp.asarray(x.real), jnp.asarray(x.imag), tile=4,
                     halfplanes=True)
    assert hr.dtype == jnp.bfloat16
    assert rel_l2(np.asarray(hr, np.float64)
                  + 1j * np.asarray(hi, np.float64), w) < 8e-3

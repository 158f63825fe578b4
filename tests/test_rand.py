"""cuRAND tier oracles.

Verification mirrors the reference: bitwise for philox (device-vs-host ≙
Random123 known-answer tests), statistical for the rest
(curand_*_example.cpp print-and-compare flow)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from tpumathlib.rand import (
    Mrg32k3aGenerator,
    Mt19937Generator,
    PhiloxGenerator,
    SobolGenerator,
    ThreefryGenerator,
    XorwowGenerator,
    philox4x32_10,
)


def test_philox_known_answer():
    """Random123 KAT vectors for philox4x32-10."""
    ctr = jnp.zeros((1, 4), jnp.uint32)
    key = jnp.zeros((1, 2), jnp.uint32)
    out = np.asarray(philox4x32_10(ctr, key))[0]
    assert [hex(int(v)) for v in out] == [
        "0x6627e8d5", "0xe169c58d", "0xbc57ac4c", "0x9b00dbd8"]
    ctr = jnp.full((1, 4), 0xFFFFFFFF, jnp.uint32)
    key = jnp.full((1, 2), 0xFFFFFFFF, jnp.uint32)
    out = np.asarray(philox4x32_10(ctr, key))[0]
    assert [hex(int(v)) for v in out] == [
        "0x408f276d", "0x41c83b0e", "0xa20bc7c6", "0x6d5451fd"]


def test_philox_offset_determinism():
    """≙ curandSetGeneratorOffset: offset k then n draws == draws [k, k+n)."""
    g1 = PhiloxGenerator(seed=42)
    full = np.asarray(g1.random_bits(64))
    g2 = PhiloxGenerator(seed=42).set_offset(13)
    part = np.asarray(g2.random_bits(20))
    np.testing.assert_array_equal(part, full[13:33])


@pytest.mark.parametrize("gen_cls", [PhiloxGenerator, ThreefryGenerator,
                                     XorwowGenerator, Mt19937Generator])
def test_uniform_statistics(gen_cls):
    g = gen_cls(seed=7)
    u = np.asarray(g.uniform(20000))
    assert 0.0 < u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.02
    assert abs(u.var() - 1 / 12) < 0.005
    # Kolmogorov-Smirnov against U(0,1)
    stat, pval = scipy.stats.kstest(u[:5000], "uniform")
    assert pval > 1e-4, (stat, pval)


def test_mrg32k3a_uniform():
    g = Mrg32k3aGenerator(seed=12345)
    u = np.asarray(g.uniform(5000))
    assert abs(u.mean() - 0.5) < 0.03
    stat, pval = scipy.stats.kstest(u, "uniform")
    assert pval > 1e-4


def test_normal_lognormal_poisson():
    g = PhiloxGenerator(seed=3)
    z = np.asarray(g.normal(20000, mean=1.0, stddev=2.0))
    assert abs(z.mean() - 1.0) < 0.1 and abs(z.std() - 2.0) < 0.1
    ln = np.asarray(PhiloxGenerator(5).lognormal(20000, 0.0, 0.5))
    assert abs(np.log(ln).mean()) < 0.05
    lam = 8.0
    p = np.asarray(PhiloxGenerator(9).poisson(8000, lam))
    assert abs(p.mean() - lam) < 0.3
    assert abs(p.var() - lam) < 1.0
    big = np.asarray(PhiloxGenerator(11).poisson(8000, 200.0))
    assert abs(big.mean() - 200.0) < 2.0


def test_sobol_low_discrepancy():
    g = SobolGenerator(dimensions=2)
    u = np.asarray(g.uniform(1024))
    assert u.shape == (1024, 2)
    # first points of the (unscrambled) Sobol sequence in dim 0: 0.5, 0.25/0.75...
    assert abs(u[0, 0] - 0.5) < 1e-6
    # discrepancy beats random: mean much tighter than 1/sqrt(n)
    assert abs(u[:, 0].mean() - 0.5) < 2e-3
    assert abs(u[:, 1].mean() - 0.5) < 2e-3
    # stratification: each of 16 bins of dim0 gets 1024/16 = 64 points
    counts = np.histogram(u[:, 0], bins=16, range=(0, 1))[0]
    assert np.all(counts == 64)


def test_sobol_scrambled():
    g = SobolGenerator(dimensions=2, scrambled=True, seed=99)
    u = np.asarray(g.uniform(512))
    g0 = SobolGenerator(dimensions=2)
    u0 = np.asarray(g0.uniform(512))
    assert not np.allclose(u, u0)  # scrambling changes the points
    assert abs(u[:, 0].mean() - 0.5) < 0.05  # still uniform
    n = np.asarray(SobolGenerator(dimensions=1).normal(2048))
    assert abs(n.mean()) < 0.02 and abs(n.std() - 1) < 0.05


def test_sobol_offset():
    g = SobolGenerator(dimensions=3)
    full = np.asarray(g.random_bits(32))
    g2 = SobolGenerator(dimensions=3).set_offset(10)
    part = np.asarray(g2.random_bits(10))
    np.testing.assert_array_equal(part, full[10:20])


def test_mt19937_device_bit_exact():
    """Device-side MT19937 (vectorized twist) ≡ NumPy's RandomState —
    the cuRAND device-vs-host bitwise comparison for this family."""
    from tpumathlib.rand import Mt19937Generator

    g = Mt19937Generator(seed=1234)
    ours = np.asarray(g.random_bits(1500))
    ref = np.random.RandomState(1234).randint(
        0, 2**32, size=1500, dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(ours, ref)
    # offset = exact skip-ahead
    g2 = Mt19937Generator(seed=1234).set_offset(700)
    np.testing.assert_array_equal(np.asarray(g2.random_bits(100)),
                                  ref[700:800])


def test_mtgp32_streams():
    """MTGP32-style per-block independent device streams: statistics + the
    streams actually differ."""
    from tpumathlib.rand import Mtgp32Generator

    g = Mtgp32Generator(seed=7, nstreams=8)
    u = np.asarray(g.uniform(20000))
    assert abs(u.mean() - 0.5) < 0.02
    import scipy.stats

    assert scipy.stats.kstest(u[:5000], "uniform").pvalue > 1e-4
    bits = np.asarray(Mtgp32Generator(seed=7, nstreams=8).random_bits(624 * 8))
    blocks = bits.reshape(8, 624)
    assert len({tuple(b[:16]) for b in blocks}) == 8  # distinct streams


def test_sobol_directions_match_joekuo():
    """Embedded Joe-Kuo table reproduces SciPy's (same public
    new-joe-kuo-6.21201 data cuRAND ships) for dims well past the old
    6-polynomial fallback."""
    from scipy.stats import qmc

    from tpumathlib.rand.sobol import _direction_numbers

    dim = 50
    ours = _direction_numbers(dim, 32)
    eng = qmc.Sobol(d=dim, scramble=False, bits=32)
    pts = (eng.random(64) * 2.0**32).astype(np.uint64)
    gen = SobolGenerator(dimensions=dim)
    gen.set_offset(-1)  # scipy's sequence starts at index 0 (the origin)
    mine = np.asarray(gen.random_bits(64)).astype(np.uint64)
    np.testing.assert_array_equal(mine[1:], pts[1:])
    assert ours.shape == (dim, 32)


def test_sobol64():
    """CURAND_RNG_QUASI_SOBOL64 (≙ cuRAND/Host/sobol64): 64-bit words,
    van der Corput in dim 0, matches SciPy's 64-bit Sobol sequence."""
    from scipy.stats import qmc

    dim = 12
    gen = SobolGenerator(dimensions=dim, bits=64)
    gen.set_offset(-1)
    w = gen.random_bits64(33)
    # dim 0 point n is bit-reversed n scaled to 64 bits
    assert w[1, 0] == 1 << 63                    # n=1 -> 0.5
    assert w[2, 0] == (1 << 63) | (1 << 62)      # gray(2)=3 -> 0.75
    eng = qmc.Sobol(d=dim, scramble=False, bits=64)
    pts = (eng.random(33) * 2.0**64).astype(np.uint64)
    np.testing.assert_array_equal(w[1:], pts[1:])
    # device planar spelling agrees with host words
    gen2 = SobolGenerator(dimensions=dim, bits=64)
    hi, lo = gen2.random_bits(8)
    w2 = gen2.set_offset(0).random_bits64(8)
    np.testing.assert_array_equal(np.asarray(hi, np.uint64), w2 >> 32)
    np.testing.assert_array_equal(np.asarray(lo, np.uint64),
                                  w2 & np.uint64(0xFFFFFFFF))
    u = np.asarray(gen2.uniform(256))
    assert u.shape == (256, dim) and (u >= 0).all() and (u < 1).all()


def test_sobol64_scrambled():
    """Scrambled sobol64: digital shift preserves low discrepancy and
    differs from the unscrambled stream."""
    g = SobolGenerator(dimensions=4, scrambled=True, seed=5, bits=64)
    p = SobolGenerator(dimensions=4, bits=64)
    a = g.random_bits64(128)
    b = p.random_bits64(128)
    assert (a != b).any()
    u = np.asarray(g.set_offset(0).uniform(512))
    assert abs(u.mean() - 0.5) < 0.02

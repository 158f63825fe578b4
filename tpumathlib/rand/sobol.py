"""Sobol quasi-random generator, 32- and 64-bit (+ scrambled variants).

Parity: CURAND_RNG_QUASI_SOBOL32 / SCRAMBLED_SOBOL32
(/root/reference/cuRAND/Host/sobol32, scrambled_sobol32) and
CURAND_RNG_QUASI_SOBOL64 / SCRAMBLED_SOBOL64
(/root/reference/cuRAND/Host/sobol64, scrambled_sobol64), with dimension
count and offset (skip-ahead) semantics.

Direction numbers come from the Joe–Kuo new-joe-kuo-6.21201 table — the
same public table cuRAND ships — embedded in the package
(``rand/_joekuo.npz``: primitive polynomials + initial m values for 21201
dimensions). Generation on device uses the Gray-code XOR recurrence
vectorized over dimensions; 64-bit words are planar (hi, lo) uint32 pairs
(this backend has no 64-bit integer dtype). Scrambling = random digital
shift (XOR of a per-dimension random word — Owen-style digital shift,
matching cuRAND's scrambled-direction-vector approach in effect).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import check

_MAX_DIM = 21201


@functools.lru_cache(maxsize=1)
def _joekuo_table():
    path = os.path.join(os.path.dirname(__file__), "_joekuo.npz")
    z = np.load(path)
    return z["poly"].astype(np.int64), z["vinit"].astype(np.int64)


def _direction_numbers(dim: int, bits: int = 32) -> np.ndarray:
    """(dim, bits) uint64 direction numbers v_k scaled to ``bits`` bits."""
    check(1 <= dim <= _MAX_DIM, f"sobol supports 1..{_MAX_DIM} dimensions")
    poly, vinit = _joekuo_table()
    top = bits - 1
    vs = np.zeros((dim, bits), np.uint64)
    # dimension 0: van der Corput (v_k = 2^(bits-1-k))
    vs[0] = np.uint64(1) << np.arange(top, -1, -1, dtype=np.uint64)
    for d in range(1, dim):
        p = int(poly[d])
        s = p.bit_length() - 1
        m = vinit[d, :s]
        v = [int(m[k]) << (top - k) for k in range(min(s, bits))]
        for k in range(s, bits):
            new = v[k - s] ^ (v[k - s] >> s)
            for j in range(1, s):
                if (p >> (s - j)) & 1:
                    new ^= v[k - j]
            v.append(new)
        vs[d] = np.asarray(v[:bits], np.uint64)
    return vs


def _sobol_words(v: np.ndarray, offset: int, count: int, bits: int) -> np.ndarray:
    """Host Gray-code recurrence: (count, dim) uint64 raw Sobol words."""
    idx = (np.arange(1, count + 1, dtype=np.int64) + offset).astype(np.uint64)
    gray = idx ^ (idx >> np.uint64(1))
    kbits = ((gray[:, None] >> np.arange(bits, dtype=np.uint64)[None, :])
             & np.uint64(1))                      # (count, bits)
    # XOR-accumulate contributions of each set Gray bit
    out = np.zeros((count, v.shape[0]), np.uint64)
    for k in range(bits):
        sel = kbits[:, k:k + 1].astype(bool)
        out ^= np.where(sel, v[None, :, k], np.uint64(0))
    return out


class SobolGenerator:
    """≙ curandCreateGenerator(CURAND_RNG_QUASI_SOBOL32/64) +
    SetQuasiRandomGeneratorDimensions + SetGeneratorOffset.

    ``bits=64`` selects the sobol64 family; ``random_bits`` then returns a
    planar (hi, lo) uint32 pair on device (``random_bits64`` gives host
    uint64 words directly).
    """

    def __init__(self, dimensions: int = 1, scrambled: bool = False,
                 seed: int = 0, bits: int = 32):
        check(bits in (32, 64), "sobol bits must be 32 or 64")
        self.dim = int(dimensions)
        self.bits = bits
        self.offset = 0
        self.scrambled = scrambled
        vnp = _direction_numbers(self.dim, bits)
        self._vnp = vnp
        if bits == 32:
            self._v = jnp.asarray(vnp.astype(np.uint32))  # (dim, 32)
        if scrambled:
            rs = np.random.RandomState(seed or 1)
            hi = rs.randint(0, 2**32, size=self.dim, dtype=np.uint64)
            lo = rs.randint(0, 2**32, size=self.dim, dtype=np.uint64)
            self._shift_np = (hi << np.uint64(32) | lo if bits == 64
                              else lo)
        else:
            self._shift_np = np.zeros(self.dim, np.uint64)
        self._shift = jnp.asarray((self._shift_np & np.uint64(0xFFFFFFFF))
                                  .astype(np.uint32))
        self._shift_hi = jnp.asarray((self._shift_np >> np.uint64(32))
                                     .astype(np.uint32))

    def set_offset(self, offset: int):
        self.offset = int(offset)
        return self

    def random_bits64(self, count: int) -> np.ndarray:
        """(count, dim) host uint64 Sobol words (64-bit family only)."""
        check(self.bits == 64, "random_bits64 requires bits=64")
        w = _sobol_words(self._vnp, self.offset, count, 64)
        self.offset += count
        return w ^ self._shift_np[None, :]

    def random_bits(self, count: int):
        """32-bit family: (count, dim) uint32 device array.
        64-bit family: planar (hi, lo) uint32 device pair."""
        if self.bits == 64:
            w = self.random_bits64(count)
            return (jnp.asarray((w >> np.uint64(32)).astype(np.uint32)),
                    jnp.asarray((w & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
        idx = (np.arange(1, count + 1, dtype=np.int64)
               + self.offset).astype(np.uint64)
        self.offset += count
        # x_n = XOR of v_k where bit k set in gray(n)
        gray = idx ^ (idx >> np.uint64(1))
        bits = ((gray[:, None] >> np.arange(32, dtype=np.uint64)[None, :]) &
                np.uint64(1)).astype(np.uint32)  # (count, 32)
        bm = jnp.asarray(bits)
        # XOR-accumulate: sum over k of bit_k * v[d, k] under XOR
        contrib = bm[:, None, :] * self._v[None, :, :]  # (count, dim, 32)
        x = jax.lax.reduce(
            contrib.astype(jnp.uint32), jnp.uint32(0),
            jax.lax.bitwise_xor, (2,),
        )
        return x ^ self._shift[None, :]

    def uniform(self, count: int, dtype=jnp.float32):
        from tpumathlib.rand.distributions import bits_to_uniform

        if self.bits == 64:
            # f32 holds 24 mantissa bits — the top 32-bit word carries all
            # the precision the output dtype can represent
            hi, _ = self.random_bits(count)
            return bits_to_uniform(hi, dtype)
        return bits_to_uniform(self.random_bits(count), dtype)

    def normal(self, count: int, mean=0.0, stddev=1.0):
        """Inverse-CDF mapping (quasi-random sequences must not use
        Box–Muller pairing — dimension structure matters)."""
        u = self.uniform(count, jnp.float64)
        z = jax.scipy.stats.norm.ppf(jnp.clip(u, 1e-12, 1 - 1e-12))
        return (mean + stddev * z).astype(jnp.float32)

    def lognormal(self, count: int, mean=0.0, stddev=1.0):
        return jnp.exp(self.normal(count, mean, stddev))

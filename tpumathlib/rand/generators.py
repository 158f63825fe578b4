"""PRNG generator families with cuRAND seed/offset semantics.

Every generator exposes:
  gen = Family(seed)            ≙ curandCreateGenerator + SetPseudoRandomGeneratorSeed
  gen.set_offset(n)             ≙ curandSetGeneratorOffset (skip-ahead)
  gen.random_bits(count)        → uint32 array (advances the offset)
  gen.uniform/normal/lognormal/poisson(count, ...) — distribution wrappers

Counter-based families (philox/threefry) skip ahead in O(1); recurrence
families (xorwow/mrg32k3a) advance with lax.scan.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.rand import distributions as dist


# ---------------- Philox4x32-10 (exact, Random123-compatible) ----------------

_PHILOX_M0 = np.uint32(0xD2511F53)
_PHILOX_M1 = np.uint32(0xCD9E8D57)
_PHILOX_W0 = np.uint32(0x9E3779B9)
_PHILOX_W1 = np.uint32(0xBB67AE85)


def _mulhilo(a, b):
    prod = a.astype(jnp.uint64) * b.astype(jnp.uint64)
    return (prod >> 32).astype(jnp.uint32), prod.astype(jnp.uint32)


@jax.jit
def philox4x32_10(ctr, key):
    """One Philox4x32-10 block: ctr (..., 4) uint32, key (..., 2) uint32 →
    (..., 4) uint32. Bitwise-exact vs the Random123 reference."""
    c0, c1, c2, c3 = [ctr[..., i] for i in range(4)]
    k0, k1 = key[..., 0], key[..., 1]

    def round_fn(i, state):
        c0, c1, c2, c3, k0, k1 = state
        hi0, lo0 = _mulhilo(jnp.asarray(_PHILOX_M0, jnp.uint32), c0)
        hi1, lo1 = _mulhilo(jnp.asarray(_PHILOX_M1, jnp.uint32), c2)
        n0 = hi1 ^ c1 ^ k0
        n1 = lo1
        n2 = hi0 ^ c3 ^ k1
        n3 = lo0
        return (n0, n1, n2, n3,
                k0 + jnp.asarray(_PHILOX_W0, jnp.uint32),
                k1 + jnp.asarray(_PHILOX_W1, jnp.uint32))

    state = (c0, c1, c2, c3, k0, k1)
    state = jax.lax.fori_loop(0, 10, round_fn, state)
    return jnp.stack(state[:4], axis=-1)


class _GeneratorBase:
    def __init__(self, seed: int = 0):
        self.seed = int(seed)
        self.offset = 0

    def set_offset(self, offset: int):
        """≙ curandSetGeneratorOffset."""
        self.offset = int(offset)
        return self

    # distribution wrappers (≙ curandGenerateUniform/Normal/...)
    def uniform(self, count: int, dtype=jnp.float32):
        return dist.bits_to_uniform(self.random_bits(count), dtype)

    def normal(self, count: int, mean=0.0, stddev=1.0):
        return dist.bits_to_normal(self.random_bits(2 * count), mean, stddev)[:count]

    def lognormal(self, count: int, mean=0.0, stddev=1.0):
        return dist.bits_to_lognormal(self.random_bits(2 * count), mean, stddev)[:count]

    def poisson(self, count: int, lam: float):
        return dist.bits_to_poisson(self.random_bits(4 * count).reshape(count, 4), lam)


class PhiloxGenerator(_GeneratorBase):
    """≙ CURAND_RNG_PSEUDO_PHILOX4_32_10. The offset counts 32-bit outputs;
    each counter block yields 4."""

    def random_bits(self, count: int):
        start = self.offset
        self.offset += count
        first_blk = start // 4
        nblk = -(-(start % 4 + count) // 4)
        blks = (first_blk + np.arange(nblk)).astype(np.uint64)
        ctr = jnp.stack([
            jnp.asarray(blks & np.uint64(0xFFFFFFFF), jnp.uint32),
            jnp.asarray(blks >> np.uint64(32), jnp.uint32),
            jnp.zeros(nblk, jnp.uint32),
            jnp.zeros(nblk, jnp.uint32),
        ], axis=-1)
        key = jnp.broadcast_to(
            jnp.asarray([self.seed & 0xFFFFFFFF, (self.seed >> 32) & 0xFFFFFFFF],
                        jnp.uint32), (nblk, 2))
        out = philox4x32_10(ctr, key).reshape(-1)
        return jax.lax.dynamic_slice(out, (start % 4,), (count,))


class ThreefryGenerator(_GeneratorBase):
    """≙ CURAND_RNG_PSEUDO_THREEFRY-class: JAX's native counter-based PRNG
    with offset semantics via fold_in of the block index."""

    def random_bits(self, count: int):
        start = self.offset
        self.offset += count
        key = jax.random.key(self.seed)
        blk = 1 << 16
        first = start // blk
        last = (start + count - 1) // blk
        outs = []
        for b in range(first, last + 1):
            sub = jax.random.fold_in(key, b)
            outs.append(jax.random.bits(sub, (blk,), jnp.uint32))
        cat = jnp.concatenate(outs)
        return cat[start - first * blk: start - first * blk + count]


class XorwowGenerator(_GeneratorBase):
    """≙ CURAND_RNG_PSEUDO_XORWOW — exact xorwow recurrence under lax.scan."""

    def _init_state(self):
        # cuRAND-style seeding: splitmix-ish fill from the seed
        st = []
        x = int(self.seed if self.seed else 1)
        for _ in range(5):
            x = ((x ^ (x >> 12)) * 25214903917 + 11) & 0xFFFFFFFFFFFFFFFF
            st.append(np.uint32(x & 0xFFFFFFFF))
        return jnp.asarray(st, jnp.uint32), jnp.uint32(6615241 + self.seed % 1000)

    def random_bits(self, count: int):
        (state, d) = self._init_state()
        total = self.offset + count

        def step(carry, _):
            st, d = carry
            t = st[0] ^ (st[0] >> 2)
            new = st[4] ^ (st[4] << 4) ^ t ^ (t << 1)
            st = jnp.concatenate([st[1:], new[None]])
            d = d + jnp.uint32(362437)
            return (st, d), new + d

        (_, _), outs = jax.lax.scan(step, (state, d), None, length=total)
        self.offset = total
        return outs[self.offset - count:]


class Mrg32k3aGenerator(_GeneratorBase):
    """≙ CURAND_RNG_PSEUDO_MRG32K3A — L'Ecuyer's combined MRG, exact
    recurrence (float64 state arithmetic like the reference)."""

    M1 = 4294967087.0
    M2 = 4294944443.0

    def random_bits(self, count: int):
        u = self._uniform_raw(self.offset + count)[self.offset:]
        self.offset += count
        # map (0,1) doubles to uint32 (the bit-source view)
        return (u * 4294967296.0).astype(jnp.uint32)

    def uniform(self, count: int, dtype=jnp.float32):
        u = self._uniform_raw(self.offset + count)[self.offset:]
        self.offset += count
        return u.astype(dtype)

    def _uniform_raw(self, total: int):
        seed = float(self.seed % 4294967087 or 12345)
        s1 = jnp.asarray([seed, seed, seed], jnp.float64)
        s2 = jnp.asarray([seed, seed, seed], jnp.float64)

        def step(carry, _):
            s1, s2 = carry
            p1 = jnp.mod(1403580.0 * s1[1] - 810728.0 * s1[0], self.M1)
            p2 = jnp.mod(527612.0 * s2[2] - 1370589.0 * s2[0], self.M2)
            s1 = jnp.asarray([s1[1], s1[2], p1])
            s2 = jnp.asarray([s2[1], s2[2], p2])
            z = jnp.mod(p1 - p2, self.M1)
            u = jnp.where(z > 0, z, self.M1) / (self.M1 + 1.0)
            return (s1, s2), u

        (_, _), us = jax.lax.scan(step, (s1, s2), None, length=total)
        return us


class Mt19937Generator(_GeneratorBase):
    """≙ CURAND_RNG_PSEUDO_MT19937 / MTGP32 — host-side Mersenne Twister
    (the reference's host-generator comparison path; NumPy's MT19937 is the
    same algorithm)."""

    def random_bits(self, count: int):
        rs = np.random.RandomState(self.seed % (2**32))
        all_bits = rs.randint(0, 2**32, size=self.offset + count, dtype=np.uint64)
        out = jnp.asarray(all_bits[self.offset:].astype(np.uint32))
        self.offset += count
        return out

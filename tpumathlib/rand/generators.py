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

import functools

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
    """Full 32×32→64 multiply as a (hi, lo) uint32 pair via 16-bit partial
    products — exact regardless of jax_enable_x64 (uint64 is unavailable
    under the default config, where astype(uint64) silently truncates)."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    mask = jnp.uint32(0xFFFF)
    lo = a * b  # low word: exact mod 2^32
    a_lo, a_hi = a & mask, a >> 16
    b_lo, b_hi = b & mask, b >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    carry = ((ll >> 16) + (lh & mask) + (hl & mask)) >> 16
    hi = hh + (lh >> 16) + (hl >> 16) + carry  # exact: true hi < 2^32
    return hi, lo


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


def _mod_fold(hi, lo, c, m):
    """(hi·2³² + lo) mod m for m = 2³² − c, in pure uint32 arithmetic.

    Valid whenever hi·c < 2³⁶ (true for both MRG32k3a moduli: the multiplier
    constants are < 2²¹ so hi < 2²¹ and c < 2¹⁵). Exactness here is why the
    generator needs no float64/uint64 — it runs bit-exact under the default
    JAX config."""
    c = jnp.uint32(c)
    m = jnp.uint32(m)
    h2, l2 = _mulhilo(hi, c)          # hi·2³² ≡ hi·c = h2·2³² + l2 (mod m)
    t = lo + l2                       # may wrap: +2³² ≡ +c
    t2 = t + h2 * c + jnp.where(t < lo, c, jnp.uint32(0))
    t3 = t2 + jnp.where(t2 < t, c, jnp.uint32(0))
    return jnp.where(t3 >= m, t3 - m, t3)


def _submod(x, y, m):
    m = jnp.uint32(m)
    return jnp.where(x >= y, x - y, x + (m - y))


class Mrg32k3aGenerator(_GeneratorBase):
    """≙ CURAND_RNG_PSEUDO_MRG32K3A — L'Ecuyer's combined MRG, exact integer
    recurrence in uint32 (no float64/uint64 state, so it cannot silently
    degrade when jax_enable_x64 is off)."""

    M1 = 4294967087  # 2^32 - 209
    M2 = 4294944443  # 2^32 - 22853
    _C1 = 209
    _C2 = 22853

    def random_bits(self, count: int):
        """Bit-source view: the raw combined output z ∈ [1, m1] (the top 209
        uint32 values never occur — negligible for the bit view)."""
        z = self._raw(self.offset + count)[self.offset:]
        self.offset += count
        return z

    def uniform(self, count: int, dtype=jnp.float32):
        z = self._raw(self.offset + count)[self.offset:]
        self.offset += count
        return (z.astype(jnp.float32) * jnp.float32(1.0 / (self.M1 + 1.0))).astype(dtype)

    def _raw(self, total: int):
        seed1 = np.uint32(self.seed % self.M1 or 12345)
        seed2 = np.uint32(self.seed % self.M2 or 12345)
        s1 = jnp.full((3,), seed1, jnp.uint32)
        s2 = jnp.full((3,), seed2, jnp.uint32)
        m1, m2 = self.M1, self.M2
        c1, c2 = self._C1, self._C2

        def step(carry, _):
            s1, s2 = carry
            t11 = _mod_fold(*_mulhilo(jnp.uint32(1403580), s1[1]), c1, m1)
            t10 = _mod_fold(*_mulhilo(jnp.uint32(810728), s1[0]), c1, m1)
            p1 = _submod(t11, t10, m1)
            t22 = _mod_fold(*_mulhilo(jnp.uint32(527612), s2[2]), c2, m2)
            t20 = _mod_fold(*_mulhilo(jnp.uint32(1370589), s2[0]), c2, m2)
            p2 = _submod(t22, t20, m2)
            s1 = jnp.stack([s1[1], s1[2], p1])
            s2 = jnp.stack([s2[1], s2[2], p2])
            z = _submod(p1, p2, m1)  # p2 < m2 < m1
            z = jnp.where(z > 0, z, jnp.uint32(m1))
            return (s1, s2), z

        (_, _), zs = jax.lax.scan(step, (s1, s2), None, length=total)
        return zs


def _mt_init_by_array(key_arr: np.ndarray) -> np.ndarray:
    """MT19937 init_by_array seeding (what numpy RandomState uses for a
    scalar seed) — host-side, O(624)."""
    mt = np.zeros(624, np.uint64)
    mt[0] = 19650218
    for i in range(1, 624):
        mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) & 0xFFFFFFFF
    i, j = 1, 0
    for _ in range(max(624, len(key_arr))):
        mt[i] = ((mt[i] ^ ((mt[i - 1] ^ (mt[i - 1] >> 30)) * 1664525))
                 + int(key_arr[j]) + j) & 0xFFFFFFFF
        i += 1
        j += 1
        if i >= 624:
            mt[0] = mt[623]
            i = 1
        if j >= len(key_arr):
            j = 0
    for _ in range(623):
        mt[i] = ((mt[i] ^ ((mt[i - 1] ^ (mt[i - 1] >> 30)) * 1566083941))
                 - i) & 0xFFFFFFFF
        i += 1
        if i >= 624:
            mt[0] = mt[623]
            i = 1
    mt[0] = 0x80000000
    return mt.astype(np.uint32)


@functools.partial(jax.jit, static_argnames=("nblocks",))
def _mt19937_blocks(state, nblocks: int):
    """Device-side MT19937: ``nblocks`` twists of the 624-word state, each
    yielding 624 tempered uint32 outputs. The in-place twist is vectorized
    as three passes (each pass only reads results of the previous one) +
    the i=623 wrap fix-up."""
    matrix_a = jnp.uint32(0x9908B0DF)
    upper = jnp.uint32(0x80000000)
    lower = jnp.uint32(0x7FFFFFFF)

    def twist(mt, _):
        # pass 1: i in [0, 227): src = old mt[i+397]
        y1 = (mt[0:227] & upper) | (mt[1:228] & lower)
        mag1 = jnp.where((y1 & 1).astype(bool), matrix_a, jnp.uint32(0))
        p1 = mt[397:624] ^ (y1 >> 1) ^ mag1
        # pass 2: i in [227, 454): src = new[i-227] ∈ p1
        y2 = (mt[227:454] & upper) | (mt[228:455] & lower)
        mag2 = jnp.where((y2 & 1).astype(bool), matrix_a, jnp.uint32(0))
        p2v = p1[0:227] ^ (y2 >> 1) ^ mag2
        # pass 3: i in [454, 623): src = new[i-227] ∈ [227, 396) = p2v
        y3 = (mt[454:623] & upper) | (mt[455:624] & lower)
        mag3 = jnp.where((y3 & 1).astype(bool), matrix_a, jnp.uint32(0))
        p3v = p2v[0:169] ^ (y3 >> 1) ^ mag3
        # i = 623 wrap: y from old mt[623], NEW mt[0] = p1[0]
        y4 = (mt[623] & upper) | (p1[0] & lower)
        mag4 = jnp.where((y4 & 1).astype(bool), matrix_a, jnp.uint32(0))
        p4v = p2v[169] ^ (y4 >> 1) ^ mag4  # new[623-227=396] ∈ p2v
        new = jnp.concatenate([p1, p2v, p3v, p4v[None]])
        # tempering
        y = new
        y = y ^ (y >> 11)
        y = y ^ ((y << 7) & jnp.uint32(0x9D2C5680))
        y = y ^ ((y << 15) & jnp.uint32(0xEFC60000))
        y = y ^ (y >> 18)
        return new, y

    _, outs = jax.lax.scan(twist, state, None, length=nblocks)
    return outs.reshape(-1)


def _mt_init_genrand(seed: int) -> np.ndarray:
    """Classic MT19937 scalar seeding (what numpy RandomState uses for a
    plain int seed)."""
    mt = np.zeros(624, np.uint64)
    mt[0] = seed & 0xFFFFFFFF
    for i in range(1, 624):
        mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) & 0xFFFFFFFF
    return mt.astype(np.uint32)


class Mt19937Generator(_GeneratorBase):
    """≙ CURAND_RNG_PSEUDO_MT19937 — device-side Mersenne Twister
    (vectorized 3-pass twist under lax.scan), bit-exact vs numpy's
    RandomState (same init_genrand scalar seeding)."""

    def random_bits(self, count: int):
        state = jnp.asarray(_mt_init_genrand(self.seed % (2 ** 32)))
        total = self.offset + count
        nblocks = -(-total // 624)
        out = _mt19937_blocks(state, nblocks)
        bits = out[self.offset:total]
        self.offset = total
        return bits


class Mtgp32Generator(_GeneratorBase):
    """≙ CURAND_RNG_PSEUDO_MTGP32 — the GPU Mersenne variant's defining
    trait is many INDEPENDENT per-block MT streams generated in parallel;
    the TPU-native rendition runs ``nstreams`` device MT19937 streams
    (distinct init_by_array keys [seed, stream]) with block-interleaved
    output, all under one vectorized scan."""

    def __init__(self, seed: int = 0, nstreams: int = 64):
        super().__init__(seed)
        self.nstreams = nstreams

    def random_bits(self, count: int):
        total = self.offset + count
        per = -(-total // (624 * self.nstreams))
        states = np.stack([
            _mt_init_by_array(np.array([self.seed % (2 ** 32), s], np.uint64))
            for s in range(self.nstreams)])  # per-stream init_by_array keys
        outs = jax.vmap(lambda st: _mt19937_blocks(st, per))(
            jnp.asarray(states))
        # block-interleave: stream-major blocks of 624 (MTGP's per-block
        # output layout)
        blk = outs.reshape(self.nstreams, per, 624).transpose(1, 0, 2)
        flat = blk.reshape(-1)
        bits = flat[self.offset:total]
        self.offset = total
        return bits

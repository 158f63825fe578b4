"""Poseidon2 permutation + sponge hash over the BabyBear field.

≙ cuPQC's Poseidon2 samples (ZK-proof hashing). Field p = 15·2²⁷ + 1
(BabyBear), width 16, x⁷ S-box, the Poseidon2 structure of external
rounds (full S-box + M4-block MDS with block sums) around internal rounds
(single S-box + diagonal-plus-sum matrix).

All field arithmetic is uint32 Montgomery (the backend has no uint64):
montmul composes two 32×32→64 multiplies from 16-bit partial products —
pure VPU work, batched over states. Round constants are derived
deterministically from SHAKE256 of a domain tag (documented here — this is
a self-contained instantiation, not byte-compatible with any specific
external circuit's constant set)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.rand.generators import _mulhilo

P = 2013265921          # BabyBear: 15 * 2^27 + 1
WIDTH = 16
ROUNDS_F = 8            # external (full) rounds, half before + half after
ROUNDS_P = 13           # internal (partial) rounds
# Montgomery: R = 2^32; PINV = -p^{-1} mod 2^32; R2 = R^2 mod p
_PINV = (-pow(P, -1, 1 << 32)) % (1 << 32)
_R2 = (1 << 64) % P
_RMOD = (1 << 32) % P

# internal-round diagonal (Poseidon2 convention: M_I = I·diag + 1s matrix);
# small distinct constants keep the matrix invertible over BabyBear
_DIAG = np.array([P - 2] + [2 ** i for i in range(1, WIDTH)], np.uint64) % P


@functools.lru_cache(maxsize=1)
def _round_constants() -> np.ndarray:
    from tpumathlib.pqc.keccak import shake256

    need = (ROUNDS_F + ROUNDS_P) * WIDTH
    out = np.zeros(need, np.uint32)
    j = 0
    ctr = 0
    while j < need:
        stream = np.frombuffer(
            shake256(b"tpumathlib-poseidon2-babybear16-%d" % ctr,
                     4 * 2 * (need - j)), np.uint32)
        for v in stream:
            if v < P and j < need:
                out[j] = v
                j += 1
        ctr += 1
    return out.reshape(ROUNDS_F + ROUNDS_P, WIDTH)


def _montmul(a, b):
    """Montgomery product: a·b·R⁻¹ mod p for a, b < p (uint32)."""
    hi, lo = _mulhilo(a, b)
    m = lo * jnp.uint32(_PINV)
    mh, ml = _mulhilo(m, jnp.uint32(P))
    # (ab + mp) / 2^32: low halves cancel mod 2^32; carry iff lo != 0
    res = hi + mh + (lo != 0).astype(jnp.uint32)
    return jnp.where(res >= P, res - jnp.uint32(P), res)


def _to_mont(x):
    return _montmul(x.astype(jnp.uint32), jnp.uint32(_R2))


def _from_mont(x):
    return _montmul(x, jnp.uint32(1))


def _addmod(a, b):
    s = a + b
    return jnp.where(s >= P, s - jnp.uint32(P), s)


def _sbox(x):
    x2 = _montmul(x, x)
    x4 = _montmul(x2, x2)
    x6 = _montmul(x4, x2)
    return _montmul(x6, x)


def _mul_small(x, c: int):
    """c·x mod p for small integer c via addmod doubling."""
    out = jnp.zeros_like(x)
    d = x
    while c:
        if c & 1:
            out = _addmod(out, d)
        d = _addmod(d, d)
        c >>= 1
    return out


def _external_mds(s):
    """Poseidon2 external matrix: per-4-lane M4 = [[5,7,1,3],[4,6,1,1],
    [1,3,5,7],[1,1,4,6]] then add the column sums of all blocks."""
    b = s.reshape(s.shape[0], WIDTH // 4, 4)
    x0, x1, x2, x3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    y0 = _addmod(_addmod(_mul_small(x0, 5), _mul_small(x1, 7)),
                 _addmod(x2, _mul_small(x3, 3)))
    y1 = _addmod(_addmod(_mul_small(x0, 4), _mul_small(x1, 6)),
                 _addmod(x2, x3))
    y2 = _addmod(_addmod(x0, _mul_small(x1, 3)),
                 _addmod(_mul_small(x2, 5), _mul_small(x3, 7)))
    y3 = _addmod(_addmod(x0, x1),
                 _addmod(_mul_small(x2, 4), _mul_small(x3, 6)))
    y = jnp.stack([y0, y1, y2, y3], -1)
    sums = y[:, 0]
    for g in range(1, WIDTH // 4):
        sums = _addmod(sums, y[:, g])
    return _addmod(y, sums[:, None, :]).reshape(s.shape[0], WIDTH)


def _internal_mds(s, diag_mont):
    tot = s[:, 0]
    for i in range(1, WIDTH):
        tot = _addmod(tot, s[:, i])
    return _addmod(_montmul(s, diag_mont[None, :]), tot[:, None])


def poseidon2_permute(states):
    """The Poseidon2 permutation on (batch, 16) uint32 field elements."""
    rc = _round_constants()  # host-side (SHAKE derivation), cached
    return _permute_jit(jnp.asarray(states), jnp.asarray(rc))


@jax.jit
def _permute_jit(states, rc):
    rc_m = _to_mont(rc)
    diag_m = _to_mont(jnp.asarray(_DIAG.astype(np.uint32)))
    s = _to_mont(states.astype(jnp.uint32))
    s = _external_mds(s)
    half = ROUNDS_F // 2
    r = 0
    for _ in range(half):
        s = _sbox(_addmod(s, rc_m[r][None, :]))
        s = _external_mds(s)
        r += 1
    for _ in range(ROUNDS_P):
        s0 = _sbox(_addmod(s[:, 0], rc_m[r, 0]))
        s = s.at[:, 0].set(s0)
        s = _internal_mds(s, diag_m)
        r += 1
    for _ in range(half):
        s = _sbox(_addmod(s, rc_m[r][None, :]))
        s = _external_mds(s)
        r += 1
    return _from_mont(s)


def poseidon2_hash(inputs) -> np.ndarray:
    """Sponge hash: (batch, n) field elements → (batch, 8) digest
    (rate 8, capacity 8)."""
    x = np.atleast_2d(np.asarray(inputs, np.uint32)) % P
    batch, n = x.shape
    rate = 8
    pad = (-n) % rate
    if pad:
        x = np.concatenate([x, np.zeros((batch, pad), np.uint32)], 1)
    state = jnp.zeros((batch, WIDTH), jnp.uint32)
    for blk in range(x.shape[1] // rate):
        chunk = jnp.asarray(x[:, blk * rate:(blk + 1) * rate])
        state = state.at[:, :rate].set(
            _addmod(state[:, :rate], chunk))
        state = poseidon2_permute(state)
    return np.asarray(state[:, :rate])

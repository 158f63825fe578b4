"""Keccak-f[1600] + SHA3/SHAKE — vectorized over message batches.

≙ cuPQC SHA3 (cuPQC/example_sha3.cu-class samples). 64-bit lanes are
planar (hi, lo) uint32 pairs (this backend has no uint64), every step of
θ/ρ/π/χ/ι is elementwise/VPU work, and the permutation is batched over
messages — the cuPQC model of one hash per thread-block becomes one hash
per batch row.

Oracles: hashlib's sha3_256/sha3_512/shake_128/shake_256 (tests)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_RHO = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]


# static index tables (lane index = x + 5y)
_ROT_AMT = np.zeros(25, np.int32)
for _x in range(5):
    for _y in range(5):
        _ROT_AMT[_x + 5 * _y] = _RHO[_x][_y]
_PI_SRC = np.zeros(25, np.int32)  # b[dst] = a[src]
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
_CHI_1 = np.array([(x + 1) % 5 + 5 * y for y in range(5) for x in range(5)],
                  np.int32)
_CHI_2 = np.array([(x + 2) % 5 + 5 * y for y in range(5) for x in range(5)],
                  np.int32)
_XCOL = np.array([i % 5 for i in range(25)], np.int32)
_RC_HI = np.array([c >> 32 for c in _RC], np.uint32)
_RC_LO = np.array([c & 0xFFFFFFFF for c in _RC], np.uint32)


def _rot64_vec(hi, lo, r):
    """Per-lane 64-bit rotate: r (25,) int32, hi/lo (batch, 25)."""
    swap = (r // 32) % 2 == 1
    re = r % 32
    hs = jnp.where(swap, lo, hi)
    ls = jnp.where(swap, hi, lo)
    sh = re.astype(jnp.uint32)
    inv = jnp.uint32(32) - sh
    nh = jnp.where(re == 0, hs, (hs << sh) | (ls >> inv))
    nl = jnp.where(re == 0, ls, (ls << sh) | (hs >> inv))
    return nh, nl


@jax.jit
def keccak_f(hi, lo):
    """Keccak-f[1600] on a batch: hi/lo (batch, 25) uint32 (lane x + 5y).
    Fully vectorized — per-lane rotations as array shifts, π/χ as static
    gathers, 24 rounds under lax.fori_loop."""
    rot = jnp.asarray(_ROT_AMT)[None, :]
    pi_src = jnp.asarray(_PI_SRC)
    chi1 = jnp.asarray(_CHI_1)
    chi2 = jnp.asarray(_CHI_2)
    xcol = jnp.asarray(_XCOL)
    rc_hi = jnp.asarray(_RC_HI)
    rc_lo = jnp.asarray(_RC_LO)

    def rnd(i, state):
        h, l = state
        # θ: column parities (batch, 5)
        h5 = h.reshape(-1, 5, 5)  # [y, x]
        l5 = l.reshape(-1, 5, 5)
        ch = h5[:, 0] ^ h5[:, 1] ^ h5[:, 2] ^ h5[:, 3] ^ h5[:, 4]
        cl = l5[:, 0] ^ l5[:, 1] ^ l5[:, 2] ^ l5[:, 3] ^ l5[:, 4]
        ch_r1 = (jnp.roll(ch, -1, axis=1) << 1) | (jnp.roll(cl, -1, axis=1) >> 31)
        cl_r1 = (jnp.roll(cl, -1, axis=1) << 1) | (jnp.roll(ch, -1, axis=1) >> 31)
        dh = jnp.roll(ch, 1, axis=1) ^ ch_r1
        dl = jnp.roll(cl, 1, axis=1) ^ cl_r1
        h = h ^ dh[:, xcol]
        l = l ^ dl[:, xcol]
        # ρ + π
        bh, bl = _rot64_vec(h, l, rot)
        bh = bh[:, pi_src]
        bl = bl[:, pi_src]
        # χ
        h = bh ^ (~bh[:, chi1] & bh[:, chi2])
        l = bl ^ (~bl[:, chi1] & bl[:, chi2])
        # ι
        h = h.at[:, 0].set(h[:, 0] ^ rc_hi[i])
        l = l.at[:, 0].set(l[:, 0] ^ rc_lo[i])
        return h, l

    return jax.lax.fori_loop(0, 24, rnd, (hi, lo))


def _absorb_squeeze(msgs: list[bytes], rate: int, dsbyte: int,
                    outlen: int) -> list[bytes]:
    """Sponge over a batch of EQUAL-LENGTH messages (vectorized) — unequal
    lengths are grouped by length."""
    groups: dict[int, list[int]] = {}
    for idx, m in enumerate(msgs):
        groups.setdefault(len(m), []).append(idx)
    results: list[bytes] = [b""] * len(msgs)
    for ln, idxs in groups.items():
        batch = len(idxs)
        nblocks = ln // rate + 1
        padded = np.zeros((batch, nblocks * rate), np.uint8)
        for bi, mi in enumerate(idxs):
            m = msgs[mi]
            padded[bi, :ln] = np.frombuffer(m, np.uint8)
        padded[:, ln] ^= dsbyte
        padded[:, nblocks * rate - 1] ^= 0x80
        hi = jnp.zeros((batch, 25), jnp.uint32)
        lo = jnp.zeros((batch, 25), jnp.uint32)
        words = padded.reshape(batch, nblocks, rate // 8, 8)
        lanes_lo = (words[..., 0].astype(np.uint32)
                    | words[..., 1].astype(np.uint32) << 8
                    | words[..., 2].astype(np.uint32) << 16
                    | words[..., 3].astype(np.uint32) << 24)
        lanes_hi = (words[..., 4].astype(np.uint32)
                    | words[..., 5].astype(np.uint32) << 8
                    | words[..., 6].astype(np.uint32) << 16
                    | words[..., 7].astype(np.uint32) << 24)
        nl = rate // 8
        for b in range(nblocks):
            hi = hi.at[:, :nl].set(hi[:, :nl] ^ jnp.asarray(lanes_hi[:, b]))
            lo = lo.at[:, :nl].set(lo[:, :nl] ^ jnp.asarray(lanes_lo[:, b]))
            hi, lo = keccak_f(hi, lo)
        # squeeze
        out = np.zeros((batch, 0), np.uint8)
        while out.shape[1] < outlen:
            hi_np = np.asarray(hi).astype(np.uint64)
            lo_np = np.asarray(lo).astype(np.uint64)
            lanes = (hi_np[:, :nl] << 32) | lo_np[:, :nl]
            chunk = lanes.astype("<u8").view(np.uint8).reshape(batch, -1)
            out = np.concatenate([out, chunk], axis=1)
            if out.shape[1] < outlen:
                hi, lo = keccak_f(hi, lo)
        for bi, mi in enumerate(idxs):
            results[mi] = out[bi, :outlen].tobytes()
    return results


def _as_list(msgs):
    single = isinstance(msgs, (bytes, bytearray))
    return ([bytes(msgs)] if single else [bytes(m) for m in msgs]), single


def sha3_256(msgs):
    """SHA3-256 of a message or batch (≙ cuPQC SHA3)."""
    ms, single = _as_list(msgs)
    out = _absorb_squeeze(ms, 136, 0x06, 32)
    return out[0] if single else out


def sha3_512(msgs):
    ms, single = _as_list(msgs)
    out = _absorb_squeeze(ms, 72, 0x06, 64)
    return out[0] if single else out


def shake128(msgs, outlen: int):
    ms, single = _as_list(msgs)
    out = _absorb_squeeze(ms, 168, 0x1F, outlen)
    return out[0] if single else out


def shake256(msgs, outlen: int):
    ms, single = _as_list(msgs)
    out = _absorb_squeeze(ms, 136, 0x1F, outlen)
    return out[0] if single else out

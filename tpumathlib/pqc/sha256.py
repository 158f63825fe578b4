"""Batched SHA-256 in vectorized jnp uint32 ops.

Each lane of the batch is one independent message — the VPU processes the
whole batch per round, which is the TPU shape of cuPQC's block-parallel
hashing (example_sha2). Bitwise-verified against hashlib in tests.

Messages are padded host-side (variable length is host work); the 64-round
compression runs on device under jit.
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], np.uint32)

_H0 = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], np.uint32)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


@jax.jit
def _compress_blocks(blocks, state):
    """blocks: (batch, nblk, 16) uint32 big-endian words; state (batch, 8).

    Rounds run under lax.fori_loop (compact graph; the unrolled 64-round
    form compiles pathologically slowly)."""
    ktab = jnp.asarray(_K)

    def per_block(state, w0):
        batch = w0.shape[0]
        w = jnp.concatenate([w0, jnp.zeros((batch, 48), jnp.uint32)], axis=1)

        def sched(t, w):
            w15 = w[:, t - 15]
            w2 = w[:, t - 2]
            s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> jnp.uint32(3))
            s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> jnp.uint32(10))
            return w.at[:, t].set(w[:, t - 16] + s0 + w[:, t - 7] + s1)

        w = jax.lax.fori_loop(16, 64, sched, w)

        def round_fn(t, st):
            a, b, c, d, e, f, g, h = [st[:, i] for i in range(8)]
            s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + s1 + ch + ktab[t] + w[:, t]
            s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = s0 + maj
            return jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g], axis=1)

        st = jax.lax.fori_loop(0, 64, round_fn, state)
        return state + st, None

    nblk = blocks.shape[1]
    state, _ = jax.lax.scan(
        lambda s, i: per_block(s, blocks[:, i]), state, jnp.arange(nblk))
    return state


def _pad(msgs: list[bytes]) -> np.ndarray:
    """SHA-256 padding to a common block count (batch requirement:
    equal-length messages per call, like cuPQC's batch API)."""
    n = len(msgs[0])
    assert all(len(m) == n for m in msgs), "batched sha256 needs equal lengths"
    total = n + 9
    nblk = (total + 63) // 64
    out = np.zeros((len(msgs), nblk * 64), np.uint8)
    for i, m in enumerate(msgs):
        out[i, :n] = np.frombuffer(m, np.uint8)
        out[i, n] = 0x80
        out[i, -8:] = np.frombuffer(struct.pack(">Q", n * 8), np.uint8)
    return out.reshape(len(msgs), nblk, 64)


def sha256(msgs: "bytes | list[bytes]") -> list[bytes]:
    """Batched SHA-256; returns 32-byte digests."""
    single = isinstance(msgs, (bytes, bytearray))
    if single:
        msgs = [bytes(msgs)]
    raw = _pad([bytes(m) for m in msgs])
    # big-endian words
    words = raw.reshape(raw.shape[0], raw.shape[1], 16, 4)
    w = (words[..., 0].astype(np.uint32) << 24 | words[..., 1].astype(np.uint32) << 16
         | words[..., 2].astype(np.uint32) << 8 | words[..., 3].astype(np.uint32))
    state = jnp.broadcast_to(jnp.asarray(_H0), (len(msgs), 8)).astype(jnp.uint32)
    out = np.asarray(_compress_blocks(jnp.asarray(w), state))
    digests = [b"".join(struct.pack(">I", int(x)) for x in row) for row in out]
    return digests[0] if single else digests


def merkle_root(leaves: list[bytes]) -> bytes:
    """Binary Merkle tree root over sha256 (≙ cuPQC example_merkle); odd
    levels duplicate the last node. Each level is ONE batched device hash."""
    level = sha256([bytes(l) for l in leaves])
    if isinstance(level, bytes):
        level = [level]
    while len(level) > 1:
        if len(level) % 2:
            level.append(level[-1])
        pairs = [level[i] + level[i + 1] for i in range(0, len(level), 2)]
        nxt = sha256(pairs)
        level = nxt if isinstance(nxt, list) else [nxt]
    return level[0]

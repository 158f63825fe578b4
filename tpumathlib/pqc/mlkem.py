"""ML-KEM (FIPS 203, Kyber) — full KeyGen / Encaps / Decaps.

≙ cuPQC example_ml_kem.cu. The polynomial arithmetic (NTT, basemul,
matrix-vector products in the NTT domain) runs on device through
pqc/ntt.py; the hash plumbing (G/H/J/PRF/XOF) through the vectorized
Keccak of pqc/keccak.py; byte encode/compress are NumPy host marshaling
(the cuPQC samples likewise treat them as host-side packing).

Parameter sets: ML-KEM-512/768/1024. Without NIST KAT files in the image,
correctness is pinned by (a) FIPS 203 object sizes (ek/dk/ct/ss), (b)
encaps/decaps round-trip agreement, (c) the implicit-rejection path on
tampered ciphertexts, (d) K-PKE decrypt∘encrypt = identity, and (e)
pinned in-repo known-answer fixtures (tests/fixtures/pqc_kat.json) that
freeze the exact byte encodings at all three levels so any drift in the
NTT convention, samplers, or codecs fails loudly. Caveat: the pinned
vectors were generated from this implementation — they guarantee
stability, not interop with external FIPS 203 stacks (no external
vectors exist in the zero-egress image)."""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from tpumathlib.pqc.keccak import sha3_256, sha3_512, shake128, shake256
from tpumathlib.pqc.ntt import kyber_basemul, kyber_intt, kyber_ntt

N = 256
Q = 3329


@dataclasses.dataclass(frozen=True)
class MlKemParams:
    k: int
    eta1: int
    eta2: int
    du: int
    dv: int


PARAMS = {
    512: MlKemParams(2, 3, 2, 10, 4),
    768: MlKemParams(3, 2, 2, 10, 4),
    1024: MlKemParams(4, 2, 2, 11, 5),
}


# ---------------- byte codecs (FIPS 203 §4.2.1) ----------------

def byte_encode(d: int, f: np.ndarray) -> bytes:
    """(..., 256) ints in [0, 2^d) → packed little-endian d-bit stream."""
    f = np.asarray(f, np.uint32).reshape(-1, N)
    bits = ((f[..., None] >> np.arange(d)) & 1).astype(np.uint8)
    bits = bits.reshape(f.shape[0], N * d)
    return np.packbits(bits, axis=-1, bitorder="little").tobytes()


def byte_decode(d: int, b: bytes, count: int = 1) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(b, np.uint8), bitorder="little")
    bits = bits.reshape(count, N, d).astype(np.uint32)
    return (bits << np.arange(d)).sum(-1).astype(np.int32)


def compress(d: int, x: np.ndarray) -> np.ndarray:
    return ((((np.asarray(x, np.int64) << d) + Q // 2) // Q) % (1 << d)
            ).astype(np.int32)


def decompress(d: int, y: np.ndarray) -> np.ndarray:
    return (((np.asarray(y, np.int64) * Q) + (1 << (d - 1))) >> d
            ).astype(np.int32)


# ---------------- samplers (FIPS 203 §4.2.2) ----------------

def sample_ntt(stream: bytes) -> np.ndarray:
    """SampleNTT: rejection-sample 256 mod-q coefficients from an XOF
    stream (3 bytes → two 12-bit candidates)."""
    out = np.zeros(N, np.int32)
    j = 0
    i = 0
    while j < N:
        b0, b1, b2 = stream[i], stream[i + 1], stream[i + 2]
        i += 3
        d1 = b0 + 256 * (b1 % 16)
        d2 = b1 // 16 + 16 * b2
        if d1 < Q:
            out[j] = d1
            j += 1
        if d2 < Q and j < N:
            out[j] = d2
            j += 1
    return out


def sample_cbd(eta: int, stream: bytes) -> np.ndarray:
    """SamplePolyCBD: centered binomial from 64·eta bytes."""
    bits = np.unpackbits(np.frombuffer(stream[:64 * eta], np.uint8),
                         bitorder="little").reshape(N, 2 * eta)
    x = bits[:, :eta].sum(1).astype(np.int32)
    y = bits[:, eta:].sum(1).astype(np.int32)
    return (x - y) % Q


def _xof(rho: bytes, i: int, j: int, nbytes: int = 840) -> bytes:
    return shake128(rho + bytes([i, j]), nbytes)


def _prf(eta: int, s: bytes, b: int) -> bytes:
    return shake256(s + bytes([b]), 64 * eta)


# ---------------- K-PKE ----------------

def _expand_a(rho: bytes, k: int) -> np.ndarray:
    a = np.zeros((k, k, N), np.int32)
    for i in range(k):
        for j in range(k):
            a[i, j] = sample_ntt(_xof(rho, j, i))  # A[i][j] from (j, i)
    return a


def _matvec_ntt(a_hat, v_hat, transpose=False):
    """Σ_j Â[i,j]∘v̂[j] (or Âᵀ) in the NTT domain — device basemuls."""
    k = a_hat.shape[0]
    rows = []
    for i in range(k):
        acc = jnp.zeros(N, jnp.int32)
        for j in range(k):
            entry = a_hat[j, i] if transpose else a_hat[i, j]
            acc = (acc + kyber_basemul(jnp.asarray(entry), v_hat[j])) % Q
        rows.append(acc)
    return jnp.stack(rows)


def _kpke_keygen(d: bytes, p: MlKemParams):
    g = sha3_512(d + bytes([p.k]))
    rho, sigma = g[:32], g[32:]
    a_hat = _expand_a(rho, p.k)
    s = np.stack([sample_cbd(p.eta1, _prf(p.eta1, sigma, n))
                  for n in range(p.k)])
    e = np.stack([sample_cbd(p.eta1, _prf(p.eta1, sigma, p.k + n))
                  for n in range(p.k)])
    s_hat = kyber_ntt(jnp.asarray(s))
    e_hat = kyber_ntt(jnp.asarray(e))
    t_hat = (_matvec_ntt(a_hat, s_hat) + e_hat) % Q
    ek = byte_encode(12, np.asarray(t_hat)) + rho
    dk = byte_encode(12, np.asarray(s_hat))
    return ek, dk


def _kpke_encrypt(ek: bytes, m: bytes, r: bytes, p: MlKemParams) -> bytes:
    t_hat = byte_decode(12, ek[:384 * p.k], p.k) % Q
    rho = ek[384 * p.k:]
    a_hat = _expand_a(rho, p.k)
    y = np.stack([sample_cbd(p.eta1, _prf(p.eta1, r, n))
                  for n in range(p.k)])
    e1 = np.stack([sample_cbd(p.eta2, _prf(p.eta2, r, p.k + n))
                   for n in range(p.k)])
    e2 = sample_cbd(p.eta2, _prf(p.eta2, r, 2 * p.k))
    y_hat = kyber_ntt(jnp.asarray(y))
    u = (kyber_intt(_matvec_ntt(a_hat, y_hat, transpose=True))
         + jnp.asarray(e1)) % Q
    mu = decompress(1, byte_decode(1, m)[0] & 1)
    th = jnp.asarray(t_hat)
    acc = jnp.zeros(N, jnp.int32)
    for j in range(p.k):
        acc = (acc + kyber_basemul(th[j], y_hat[j])) % Q
    v = (kyber_intt(acc) + jnp.asarray(e2) + jnp.asarray(mu)) % Q
    c1 = byte_encode(p.du, compress(p.du, np.asarray(u)))
    c2 = byte_encode(p.dv, compress(p.dv, np.asarray(v)))
    return c1 + c2


def _kpke_decrypt(dk: bytes, c: bytes, p: MlKemParams) -> bytes:
    nu = 32 * p.du * p.k
    u = decompress(p.du, byte_decode(p.du, c[:nu], p.k))
    v = decompress(p.dv, byte_decode(p.dv, c[nu:], 1))[0]
    s_hat = jnp.asarray(byte_decode(12, dk, p.k) % Q)
    u_hat = kyber_ntt(jnp.asarray(u % Q))
    acc = jnp.zeros(N, jnp.int32)
    for j in range(p.k):
        acc = (acc + kyber_basemul(s_hat[j], u_hat[j])) % Q
    w = (jnp.asarray(v % Q) - kyber_intt(acc)) % Q
    return byte_encode(1, compress(1, np.asarray(w)))


# ---------------- ML-KEM (FIPS 203 §7) ----------------

def keygen(seed: bytes, level: int = 768):
    """ML-KEM.KeyGen from a 64-byte seed (d||z). Returns (ek, dk)."""
    assert len(seed) == 64
    p = PARAMS[level]
    d, z = seed[:32], seed[32:]
    ek, dk_pke = _kpke_keygen(d, p)
    dk = dk_pke + ek + sha3_256(ek) + z
    return ek, dk


def encaps(ek: bytes, m: bytes, level: int = 768):
    """ML-KEM.Encaps with explicit 32-byte randomness m.
    Returns (shared_secret K, ciphertext c)."""
    assert len(m) == 32
    p = PARAMS[level]
    g = sha3_512(m + sha3_256(ek))
    key, r = g[:32], g[32:]
    c = _kpke_encrypt(ek, m, r, p)
    return key, c


def decaps(dk: bytes, c: bytes, level: int = 768) -> bytes:
    """ML-KEM.Decaps: recover the shared secret (implicit rejection on a
    tampered ciphertext — returns J(z||c) instead of failing)."""
    p = PARAMS[level]
    n_pke = 384 * p.k
    dk_pke = dk[:n_pke]
    ek = dk[n_pke:n_pke + 384 * p.k + 32]
    h = dk[n_pke + 384 * p.k + 32:n_pke + 384 * p.k + 64]
    z = dk[n_pke + 384 * p.k + 64:]
    m2 = _kpke_decrypt(dk_pke, c, p)
    g = sha3_512(m2 + h)
    key2, r2 = g[:32], g[32:]
    kbar = shake256(z + c, 32)
    c2 = _kpke_encrypt(ek, m2, r2, p)
    return key2 if c2 == c else kbar


def sizes(level: int = 768) -> dict:
    """FIPS 203 object sizes (the table-8 check)."""
    p = PARAMS[level]
    return {
        "ek": 384 * p.k + 32,
        "dk": 768 * p.k + 96,
        "ct": 32 * (p.du * p.k + p.dv),
        "ss": 32,
    }

"""ML-DSA (FIPS 204, Dilithium) — KeyGen / Sign / Verify, ML-DSA-44.

≙ cuPQC example_ml_dsa. Polynomial arithmetic runs on device: the NTT
over Z_q[x]/(x²⁵⁶+1), q = 2²³ − 2¹³ + 1, in uint32 Montgomery form
(products via 16-bit partial-product mulhilo — no uint64 on this
backend); hashing through the vectorized Keccak (pqc/keccak.py); byte
codecs and the rejection loops are host marshaling (as in the cuPQC
samples, where the host drives the abort-and-retry signing loop).

Without NIST KAT files in the image, correctness is pinned by (a) FIPS
204 object sizes (pk/sk/sig for ML-DSA-44: 1312/2560/2420), (b)
sign→verify round-trip, (c) rejection of tampered messages/signatures,
(d) the NTT agreeing with schoolbook negacyclic convolution, and (e)
pinned in-repo known-answer fixtures (tests/fixtures/pqc_kat.json)
freezing keygen/sign byte encodings (stability, not external interop —
no FIPS vectors exist in the zero-egress image)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpumathlib.pqc.keccak import shake128, shake256

N = 256
Q = 8380417               # 2^23 - 2^13 + 1
_ZETA = 1753              # 512th root of unity mod q
_PINV = (-pow(Q, -1, 1 << 32)) % (1 << 32)   # Montgomery, R = 2^32
_R2 = (1 << 64) % Q

# ML-DSA-44 parameters
K, L = 4, 4
ETA = 2
TAU = 39
GAMMA1 = 1 << 17
GAMMA2 = (Q - 1) // 88
BETA = TAU * ETA
OMEGA = 80
D = 13


def _bitrev8(x: int) -> int:
    return int(f"{x:08b}"[::-1], 2)


_ZETAS = np.array([pow(_ZETA, _bitrev8(i), Q) for i in range(256)], np.uint32)


def _mulhilo(a, b):
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    mask = jnp.uint32(0xFFFF)
    lo = a * b
    a_lo, a_hi = a & mask, a >> 16
    b_lo, b_hi = b & mask, b >> 16
    carry = (((a_lo * b_lo) >> 16) + ((a_lo * b_hi) & mask)
             + ((a_hi * b_lo) & mask)) >> 16
    hi = a_hi * b_hi + ((a_lo * b_hi) >> 16) + ((a_hi * b_lo) >> 16) + carry
    return hi, lo


def _montmul(a, b):
    hi, lo = _mulhilo(a, b)
    m = lo * jnp.uint32(_PINV)
    mh, _ = _mulhilo(m, jnp.uint32(Q))
    res = hi + mh + (lo != 0).astype(jnp.uint32)
    return jnp.where(res >= Q, res - jnp.uint32(Q), res)


def _to_mont(x):
    return _montmul(x.astype(jnp.uint32), jnp.uint32(_R2))


def _from_mont(x):
    return _montmul(x, jnp.uint32(1))


@jax.jit
def ntt(a):
    """Forward NTT of (..., 256) uint32 mod q (device)."""
    x = _to_mont(jnp.asarray(a, jnp.uint32) % Q)
    zm = _to_mont(jnp.asarray(_ZETAS))
    k = 1
    length = 128
    while length >= 1:
        ngroups = N // (2 * length)
        z = zm[k:k + ngroups]
        k += ngroups
        v = x.reshape(x.shape[:-1] + (ngroups, 2, length))
        lo = v[..., 0, :]
        hi = v[..., 1, :]
        t = _montmul(jnp.broadcast_to(z[..., :, None], hi.shape), hi)
        add = lo + t
        add = jnp.where(add >= Q, add - jnp.uint32(Q), add)
        sub = jnp.where(lo >= t, lo - t, lo + (jnp.uint32(Q) - t))
        x = jnp.stack([add, sub], axis=-2).reshape(x.shape)
        length //= 2
    return _from_mont(x)


@jax.jit
def intt(a):
    """Inverse NTT (scaled by 256⁻¹)."""
    x = _to_mont(jnp.asarray(a, jnp.uint32) % Q)
    zm = _to_mont(jnp.asarray(_ZETAS))
    length = 1
    k = 255
    while length <= 128:
        ngroups = N // (2 * length)
        z = zm[k - ngroups + 1:k + 1][::-1]
        k -= ngroups
        v = x.reshape(x.shape[:-1] + (ngroups, 2, length))
        lo = v[..., 0, :]
        hi = v[..., 1, :]
        add = lo + hi
        add = jnp.where(add >= Q, add - jnp.uint32(Q), add)
        # reversed-order forward zetas satisfy z_rev = -z_inv (zeta^128=-1),
        # so the inverse butterfly multiplies (hi - lo)
        dif = jnp.where(hi >= lo, hi - lo, hi + (jnp.uint32(Q) - lo))
        hi2 = _montmul(jnp.broadcast_to(z[..., :, None], dif.shape), dif)
        x = jnp.stack([add, hi2], axis=-2).reshape(x.shape)
        length *= 2
    ninv = _to_mont(jnp.uint32(pow(N, -1, Q)))
    return _from_mont(_montmul(x, ninv))


def poly_mul(a, b):
    """Negacyclic product mod (x²⁵⁶+1, q): NTT → pointwise Montgomery →
    inverse NTT (all device)."""
    fa = ntt(a)
    fb = ntt(b)
    prod = _from_mont(_montmul(_to_mont(fa), _to_mont(fb)))
    return intt(prod)


# ---------------- samplers (host marshaling over Keccak) ----------------

def _expand_a(rho: bytes) -> np.ndarray:
    a = np.zeros((K, L, N), np.uint32)
    for i in range(K):
        for j in range(L):
            stream = shake128(rho + bytes([j, i]), 1024)
            out, si = [], 0
            while len(out) < N:
                b0, b1, b2 = stream[si], stream[si + 1], stream[si + 2]
                si += 3
                d = b0 | (b1 << 8) | ((b2 & 0x7F) << 16)
                if d < Q:
                    out.append(d)
            a[i, j] = out
    return a


def _expand_s(rho_p: bytes, count: int, base: int) -> np.ndarray:
    """η=2 bounded coefficients via rejection on half-bytes."""
    s = np.zeros((count, N), np.int64)
    for r in range(count):
        stream = shake256(rho_p + bytes([base + r, 0]), 272)
        out, si = [], 0
        while len(out) < N:
            b = stream[si]
            si += 1
            for z in (b & 15, b >> 4):
                if z < 15 and len(out) < N:
                    out.append(2 - (z % 5))
    # fixed draw budget keeps this deterministic; 272 bytes never exhaust
        s[r] = out
    return s


def _expand_mask(rho_pp: bytes, kappa: int) -> np.ndarray:
    """y coefficients in (−γ1, γ1]: 18-bit fields from SHAKE256."""
    y = np.zeros((L, N), np.int64)
    for r in range(L):
        stream = shake256(rho_pp + bytes([(kappa + r) & 0xFF,
                                          (kappa + r) >> 8]), N * 18 // 8)
        bits = np.unpackbits(np.frombuffer(stream, np.uint8),
                             bitorder="little")[:N * 18].reshape(N, 18)
        v = (bits.astype(np.int64) << np.arange(18)).sum(1)
        y[r] = GAMMA1 - v
    return y


def _sample_in_ball(seed: bytes) -> np.ndarray:
    stream = shake256(seed, 32 + TAU * 4)
    signs = int.from_bytes(stream[:8], "little")
    c = np.zeros(N, np.int64)
    si = 8
    for i in range(N - TAU, N):
        while True:
            j = stream[si]
            si += 1
            if j <= i:
                break
        c[i] = c[j]
        c[j] = 1 - 2 * (signs & 1)
        signs >>= 1
    return c


# ---------------- rounding (FIPS 204 §7.4) ----------------

def _power2round(t):
    t = np.asarray(t, np.int64) % Q
    t0 = ((t + (1 << (D - 1)) - 1) % (1 << D)) - ((1 << (D - 1)) - 1)
    return (t - t0) >> D, t0


def _decompose(r):
    r = np.asarray(r, np.int64) % Q
    r0 = r % (2 * GAMMA2)
    r0 = np.where(r0 > GAMMA2, r0 - 2 * GAMMA2, r0)
    r1 = (r - r0) // (2 * GAMMA2)
    hit = (r - r0) == (Q - 1)
    r1 = np.where(hit, 0, r1)
    r0 = np.where(hit, r0 - 1, r0)
    return r1, r0


def _high(r):
    return _decompose(r)[0]


def _low(r):
    return _decompose(r)[1]


def _make_hint(z, r):
    return (_high(r) != _high((r + z) % Q)).astype(np.int64)


def _use_hint(h, r):
    m = (Q - 1) // (2 * GAMMA2)
    r1, r0 = _decompose(r)
    up = np.where(r0 > 0, (r1 + 1) % m, (r1 - 1) % m)
    return np.where(h.astype(bool), up, r1)


def _inf_norm(x):
    x = np.asarray(x, np.int64) % Q
    return int(np.minimum(x, Q - x).max())


# ---------------- byte codecs ----------------

def _pack_bits(vals: np.ndarray, width: int) -> bytes:
    bits = ((vals.reshape(-1, 1).astype(np.uint64)
             >> np.arange(width, dtype=np.uint64)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _unpack_bits(b: bytes, width: int, count: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(b, np.uint8),
                         bitorder="little")[:count * width]
    return (bits.reshape(count, width).astype(np.int64)
            << np.arange(width)).sum(1)


def _matvec(a_hat, v):
    """A·v with A in the NTT domain and v in coefficient form (device)."""
    v_hat = ntt(jnp.asarray(np.asarray(v) % Q))
    rows = []
    for i in range(K):
        acc = jnp.zeros(N, jnp.uint32)
        for j in range(L):
            p = _from_mont(_montmul(_to_mont(jnp.asarray(a_hat[i, j])),
                                    _to_mont(v_hat[j])))
            acc = (acc + p) % Q
        rows.append(intt(acc))
    return np.asarray(jnp.stack(rows), np.int64)


def keygen(xi: bytes):
    """ML-DSA-44.KeyGen from a 32-byte seed. Returns (pk, sk-state)."""
    assert len(xi) == 32
    g = shake256(xi + bytes([K, L]), 128)
    rho, rho_p, kk = g[:32], g[32:96], g[96:128]
    a_hat = np.stack([np.stack([np.asarray(ntt(jnp.asarray(r)), np.uint32)
                                for r in row]) for row in
                      _expand_a(rho).astype(np.int64) % Q])
    s1 = _expand_s(rho_p, L, 0)
    s2 = _expand_s(rho_p, K, L)
    t = (_matvec(a_hat, s1) + s2) % Q
    t1, t0 = _power2round(t)
    pk = rho + b"".join(_pack_bits(t1[i], 10) for i in range(K))
    tr = shake256(pk, 64)
    sk = {"rho": rho, "K": kk, "tr": tr, "s1": s1, "s2": s2, "t0": t0,
          "a_hat": a_hat}
    return pk, sk


def sk_bytes_len() -> int:
    """FIPS 204 table 2 secret-key size for ML-DSA-44."""
    eta_bits = 3
    return 32 + 32 + 64 + eta_bits * 32 * (K + L) + D * 32 * K


def sign(sk: dict, msg: bytes, max_iters: int = 1000) -> bytes:
    """Deterministic ML-DSA-44 signature (the FIPS 204 abort loop)."""
    mu = shake256(sk["tr"] + msg, 64)
    rho_pp = shake256(sk["K"] + mu, 64)
    a_hat = sk["a_hat"]
    s1, s2, t0 = sk["s1"], sk["s2"], sk["t0"]
    kappa = 0
    for _ in range(max_iters):
        y = _expand_mask(rho_pp, kappa)
        kappa += L
        w = _matvec(a_hat, y)
        w1 = _high(w)
        c_tilde = shake256(mu + b"".join(_pack_bits(w1[i], 6)
                                         for i in range(K)), 32)
        c = _sample_in_ball(c_tilde)
        cj = jnp.asarray(c % Q)
        cs1 = np.stack([np.asarray(poly_mul(cj, jnp.asarray(s1[j] % Q)),
                                   np.int64) for j in range(L)])
        z = (y + cs1) % Q
        if _inf_norm(z) >= GAMMA1 - BETA:
            continue
        cs2 = np.stack([np.asarray(poly_mul(cj, jnp.asarray(s2[i] % Q)),
                                   np.int64) for i in range(K)])
        r0 = _low((w - cs2) % Q)
        if np.abs(r0).max() >= GAMMA2 - BETA:
            continue
        ct0 = np.stack([np.asarray(poly_mul(cj, jnp.asarray(t0[i] % Q)),
                                   np.int64) for i in range(K)])
        if _inf_norm(ct0) >= GAMMA2:
            continue
        h = _make_hint((-ct0) % Q, (w - cs2 + ct0) % Q)
        if h.sum() > OMEGA:
            continue
        # z packed with 20-bit fields of gamma1 - z (centered)
        zc = np.where(z > Q // 2, z - Q, z)
        zpk = b"".join(_pack_bits((GAMMA1 - zc[j]).astype(np.uint64), 18)
                       for j in range(L))
        # hint encoding (FIPS 204 §7.2): positions + per-poly counts
        hpk = bytearray(OMEGA + K)
        idx = 0
        for i in range(K):
            for j in np.nonzero(h[i])[0]:
                hpk[idx] = j
                idx += 1
            hpk[OMEGA + i] = idx
        return c_tilde + zpk + bytes(hpk)
    raise RuntimeError("signing loop exhausted")


def verify(pk: bytes, msg: bytes, sig: bytes) -> bool:
    rho = pk[:32]
    t1 = np.stack([_unpack_bits(pk[32 + 320 * i:32 + 320 * (i + 1)], 10, N)
                   for i in range(K)])
    c_tilde = sig[:32]
    zlen = 18 * N // 8
    z = np.stack([GAMMA1 - _unpack_bits(
        sig[32 + zlen * j:32 + zlen * (j + 1)], 18, N) for j in range(L)])
    if _inf_norm(z % Q) >= GAMMA1 - BETA:
        return False
    hbytes = sig[32 + zlen * L:]
    h = np.zeros((K, N), np.int64)
    idx = 0
    for i in range(K):
        upto = hbytes[OMEGA + i]
        if upto < idx or upto > OMEGA:
            return False
        prev = -1
        for p in range(idx, upto):
            # FIPS 204 HintBitUnpack (Alg 21): positions within one
            # polynomial must be strictly increasing — reject otherwise
            # (canonical encodings only; anything else is malleable)
            if hbytes[p] <= prev:
                return False
            prev = hbytes[p]
            h[i, hbytes[p]] = 1
        idx = upto
    # Alg 21 step 9: all padding bytes after the final hint must be zero
    if any(hbytes[p] != 0 for p in range(idx, OMEGA)):
        return False
    a_hat = np.stack([np.stack([np.asarray(ntt(jnp.asarray(r)), np.uint32)
                                for r in row]) for row in
                      _expand_a(rho).astype(np.int64) % Q])
    mu = shake256(shake256(pk, 64) + msg, 64)
    c = _sample_in_ball(c_tilde)
    az = _matvec(a_hat, z % Q)
    cj = jnp.asarray(c % Q)
    ct1 = np.stack([np.asarray(poly_mul(cj, jnp.asarray(
        (t1[i] << D) % Q)), np.int64) for i in range(K)])
    w1 = _use_hint(h, (az - ct1) % Q)
    check = shake256(mu + b"".join(_pack_bits(w1[i], 6) for i in range(K)),
                     32)
    return check == c_tilde


def sizes() -> dict:
    """FIPS 204 ML-DSA-44 object sizes (pk, sig)."""
    return {"pk": 32 + 10 * 32 * K,
            "sig": 32 + 18 * 32 * L + OMEGA + K}

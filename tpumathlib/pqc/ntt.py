"""ML-KEM (Kyber) number-theoretic transform over Z_3329[x]/(x^256+1).

The core arithmetic primitive of cuPQC's example_ml_kem: the 7-layer
incomplete negacyclic NTT (FIPS 203 algorithm), vectorized as reshape
butterflies on int32 lanes — every layer is one VPU pass, and the transform
batches over polynomials (the matrix A of Kyber is k×k polynomials).

Verified against a schoolbook negacyclic polynomial multiply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Q = 3329
N = 256
_ZETA = 17  # primitive 256th root of unity mod Q


def _bitrev7(x: int) -> int:
    return int(f"{x:07b}"[::-1], 2)


@functools.lru_cache(maxsize=1)
def _zetas() -> np.ndarray:
    return np.array([pow(_ZETA, _bitrev7(i), Q) for i in range(128)], np.int32)


def _mod(x):
    return jnp.mod(x, Q)


@jax.jit
def kyber_ntt(a):
    """Forward NTT of (..., 256) int32 coefficients (FIPS 203 NTT)."""
    zetas = _zetas()
    a = jnp.asarray(a, jnp.int32)
    k = 1
    length = 128
    while length >= 2:
        ngroups = N // (2 * length)
        z = jnp.asarray(zetas[k:k + ngroups], jnp.int32)  # one zeta per group
        k += ngroups
        v = a.reshape(a.shape[:-1] + (ngroups, 2, length))
        lo = v[..., 0, :]
        hi = v[..., 1, :]
        t = _mod(z[..., :, None] * hi)
        v = jnp.stack([_mod(lo + t), _mod(lo - t)], axis=-2)
        a = v.reshape(a.shape)
        length //= 2
    return a


@jax.jit
def kyber_intt(a):
    """Inverse NTT (scaled by 128⁻¹ = 3303 mod q)."""
    zetas = _zetas()
    a = jnp.asarray(a, jnp.int32)
    length = 2
    k = 127
    while length <= 128:
        ngroups = N // (2 * length)
        z = jnp.asarray(zetas[k - ngroups + 1:k + 1][::-1].copy(), jnp.int32)
        k -= ngroups
        v = a.reshape(a.shape[:-1] + (ngroups, 2, length))
        lo = v[..., 0, :]
        hi = v[..., 1, :]
        t = lo
        lo = _mod(t + hi)
        hi = _mod(z[..., :, None] * _mod(hi - t))
        v = jnp.stack([lo, hi], axis=-2)
        a = v.reshape(a.shape)
        length *= 2
    return _mod(a * 3303)


@jax.jit
def kyber_basemul(fa, fb):
    """Pointwise product in the NTT domain: 128 degree-1 multiplications
    modulo (x² − γ_i), γ_i = ζ^{2·bitrev7(i)+1} (FIPS 203 MultiplyNTTs).

    All products stay below 3329² < 2³¹, so int32 lanes suffice (mod between
    the two multiplies)."""
    g = jnp.asarray(
        np.array([pow(_ZETA, 2 * _bitrev7(i) + 1, Q) for i in range(128)],
                 np.int32))
    a = fa.reshape(fa.shape[:-1] + (128, 2)).astype(jnp.int32)
    b = fb.reshape(fb.shape[:-1] + (128, 2)).astype(jnp.int32)
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    c0 = _mod(_mod(a0 * b0) + _mod(_mod(a1 * b1) * g))
    c1 = _mod(_mod(a0 * b1) + _mod(a1 * b0))
    return jnp.stack([c0, c1], axis=-1).reshape(fa.shape).astype(jnp.int32)


def kyber_polymul(a, b):
    """Negacyclic polynomial product a·b mod (x^256+1, q) via NTT →
    basemul → inverse NTT."""
    return kyber_intt(kyber_basemul(kyber_ntt(a), kyber_ntt(b)))

"""Tridiagonal / pentadiagonal batched solvers.

Parity: cusparse<t>gtsv2 (tridiagonal) and gpsvInterleavedBatch
(pentadiagonal, the cuSPARSE sample dir gpsvInterleavedBatch).

TPU formulation: Thomas-algorithm forward/backward sweeps under lax.scan
(sequential in n, parallel over the batch — interleaved batch is just the
leading batch dim here; no interleaving needed since XLA vectorizes the
batch dimension onto the VPU lanes).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


@jax.jit
def gtsv(dl, d, du, b):
    """Tridiagonal solve (≙ gtsv2): dl/d/du (..., n) bands, b (..., n).
    dl[...,0] and du[...,n-1] are ignored."""
    def solve_one(dl, d, du, b):
        n = d.shape[0]

        def fwd(carry, t):
            cp_prev, dp_prev = carry
            dli, di, dui, bi = t
            denom = di - dli * cp_prev
            cp = dui / denom
            dp = (bi - dli * dp_prev) / denom
            return (cp, dp), (cp, dp)

        (_, _), (cps, dps) = jax.lax.scan(
            fwd, (jnp.zeros((), d.dtype), jnp.zeros((), d.dtype)),
            (dl, d, du, b),
        )

        def bwd(x_next, t):
            cp, dp = t
            x = dp - cp * x_next
            return x, x

        _, xs = jax.lax.scan(bwd, jnp.zeros((), d.dtype), (cps, dps), reverse=True)
        return xs

    if d.ndim == 1:
        return solve_one(dl, d, du, b)
    flat = [v.reshape((-1, d.shape[-1])) for v in (dl, d, du, b)]
    out = jax.vmap(solve_one)(*flat)
    return out.reshape(d.shape)


@jax.jit
def gpsv_interleaved_batch(ds, dl, d, du, dw, b):
    """Pentadiagonal solve (≙ cusparse<t>gpsvInterleavedBatch): bands
    ds (2nd sub), dl (sub), d, du (super), dw (2nd super), each (..., n).

    Unpivoted banded Gaussian elimination under lax.scan — valid for the
    diagonally-dominant systems the reference sample targets."""
    def solve_one(ds, dl, d, du, dw, b):
        n = d.shape[0]

        # Forward elimination maintaining two active rows:
        # row i-1: (0, l1, m1, u1, w1), row i-2 fully reduced.
        def fwd(carry, i):
            # carry rows: (d1, u1, w1, b1) for row i-1; (d2, u2, w2, b2) row i-2
            (d1, u1, w1, b1), (d2, u2, w2, b2) = carry
            # eliminate ds[i] using row i-2, then dl' using row i-1
            f2 = jnp.where(d2 != 0, ds[i] / jnp.where(d2 != 0, d2, 1.0), 0.0)
            l = dl[i] - f2 * u2
            dd = d[i] - f2 * w2
            bb = b[i] - f2 * b2
            f1 = jnp.where(d1 != 0, l / jnp.where(d1 != 0, d1, 1.0), 0.0)
            dd = dd - f1 * u1
            uu = du[i] - f1 * w1
            bb = bb - f1 * b1
            new_carry = ((dd, uu, dw[i], bb), (d1, u1, w1, b1))
            return new_carry, (dd, uu, dw[i], bb)

        zero = jnp.zeros((), d.dtype)
        one = jnp.ones((), d.dtype)
        init = ((one, zero, zero, zero), (one, zero, zero, zero))
        # prime with rows -1/-2 as identity (no effect since ds/dl of row 0 unused)
        _, rows = jax.lax.scan(fwd, init, jnp.arange(n))
        dd, uu, ww, bb = rows

        # Back substitution: x[i] = (bb[i] - uu[i]·x[i+1] - ww[i]·x[i+2])/dd[i]
        def bwd(carry, t):
            x1, x2 = carry  # x[i+1], x[i+2]
            ddi, uui, wwi, bbi = t
            x = (bbi - uui * x1 - wwi * x2) / ddi
            return (x, x1), x

        _, xs = jax.lax.scan(bwd, (zero, zero), (dd, uu, ww, bb), reverse=True)
        return xs

    if d.ndim == 1:
        return solve_one(ds, dl, d, du, dw, b)
    flat = [v.reshape((-1, d.shape[-1])) for v in (ds, dl, d, du, dw, b)]
    out = jax.vmap(solve_one)(*flat)
    return out.reshape(d.shape)

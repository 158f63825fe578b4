"""Device-side general (non-symmetric) eigensolver.

≙ cusolverDnXgeev (cuSOLVER/Xgeev/cusolver_Xgeev_example.cu:1): the
LAPACK dgeev pipeline — Hessenberg reduction (dgehrd), Francis
double-shift QR with deflation (dhseqr), eigenvalues from the real Schur
form — implemented as jitted JAX on device. Everything is fixed-shape:
Householder steps are fori_loops over masked rank-1/rank-2 updates
(batched MXU outer products), the bulge chase uses dynamic slices with
identity-masked reflectors outside the active window, and deflation
tracks the window bounds as traced integers.

Complex pairs come out of 2×2 Schur blocks via the quadratic formula —
planar (re, im) outputs, following the suite's no-complex-dtype
convention. Eigenvectors (the dtrevc tail) are a host-side
quasi-triangular backsolve on the device-computed Schur form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _householder_apply(a, v, beta):
    """A ← (I − βvvᵀ) A (I − βvvᵀ) for batched square A; v (..., n)."""
    va = jnp.einsum("...i,...ij->...j", v, a)
    a = a - beta[..., None, None] * v[..., :, None] * va[..., None, :]
    av = jnp.einsum("...ij,...j->...i", a, v)
    return a - beta[..., None, None] * av[..., :, None] * v[..., None, :]


def hessenberg(a):
    """Batched Hessenberg reduction: returns (H, Q) with QᵀAQ = H,
    H zero below the first subdiagonal (≙ dgehrd + dorghr)."""
    a = jnp.asarray(a)
    n = a.shape[-1]
    idx = jnp.arange(n)

    def body(k, carry):
        h, q = carry
        x = jnp.where(idx > k, h[..., :, k], 0.0)
        nrm = jnp.sqrt(jnp.sum(x * x, axis=-1))
        x1 = jnp.sum(jnp.where(idx == k + 1, x, 0.0), axis=-1)
        alpha = -jnp.sign(jnp.where(x1 == 0, 1.0, x1)) * nrm
        v = x - alpha[..., None] * (idx == k + 1)
        vv = jnp.sum(v * v, axis=-1)
        beta = jnp.where(vv > 0, 2.0 / jnp.where(vv > 0, vv, 1.0), 0.0)
        h = _householder_apply(h, v, beta)
        # accumulate Q ← Q(I − βvvᵀ)
        qv = jnp.einsum("...ij,...j->...i", q, v)
        q = q - beta[..., None, None] * qv[..., :, None] * v[..., None, :]
        return h, q

    q0 = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    h, q = jax.lax.fori_loop(0, max(n - 2, 0), body, (a, q0))
    # clean numerical noise below the subdiagonal
    mask = idx[:, None] > idx[None, :] + 1
    h = jnp.where(mask, 0.0, h)
    return h, q


def _active_bounds(sub, n, eps_like):
    """(l, m): m = end of the trailing un-converged window (index of its
    last row), l = its start (first row after the nearest zero subdiag)."""
    zero = sub == 0.0
    # m: scan from the bottom — drop converged 1×1s and 2×2s
    def cond(c):
        m, done = c
        return (~done) & (m >= 1)

    def body(c):
        m, _ = c
        drop1 = zero[m - 1]
        # a 2×2 block bounded above by a zero subdiag — or sitting at the
        # very top (m == 1) — is a converged Schur block either way: the
        # eigenvalue extraction handles real and complex 2×2s alike
        drop2 = (~drop1) & ((m == 1) | ((m >= 2) & zero[m - 2]))
        m2 = jnp.where(drop1, m - 1, jnp.where(drop2, m - 2, m))
        return m2, ~(drop1 | drop2)

    m, _ = jax.lax.while_loop(cond, body,
                              (jnp.int32(n - 1), jnp.bool_(False)))
    # l: largest i ≤ m-1 with sub[i-1] == 0 (or 0)
    i = jnp.arange(n - 1)
    cand = jnp.where((i + 1 <= m - 1) & zero, i + 1, 0)
    l = jnp.max(jnp.concatenate([cand, jnp.zeros(1, cand.dtype)]))
    return l.astype(jnp.int32), m


def _hseqr_single(h, q, max_sweeps):
    """Francis double-shift QR on ONE Hessenberg matrix (vmapped by the
    caller). Returns (T quasi-triangular, Q accumulated)."""
    n = h.shape[-1]
    eps = jnp.asarray(np.finfo(h.dtype).eps, h.dtype)

    def zero_small(h):
        d = jnp.abs(jnp.diagonal(h))
        sub = jnp.diagonal(h, -1)
        thresh = eps * (d[:-1] + d[1:] + eps)
        keep = jnp.abs(sub) > thresh
        sub2 = jnp.where(keep, sub, 0.0)
        i = jnp.arange(n)
        m_ = jnp.zeros((n, n), h.dtype).at[
            (i[1:], i[:-1])].set(sub2 - sub)
        return h + m_

    def sweep(state):
        h, q, it, m_prev, since = state
        h = zero_small(h)
        sub = jnp.diagonal(h, -1)
        l, m = _active_bounds(sub, n, eps)
        since = jnp.where(m == m_prev, since + 1, jnp.int32(0))

        def run(h, q):
            # trailing 2×2 of the window
            a11 = h[m - 1, m - 1]
            a12 = h[m - 1, m]
            a21 = h[m, m - 1]
            a22 = h[m, m]
            s = a11 + a22
            t = a11 * a22 - a12 * a21
            # LAPACK dlahqr exceptional shift every 10 stagnant sweeps:
            # sm = |h(m,m-1)| + |h(m-1,m-2)|, synthetic 2×2
            # [(0.75·sm + h_mm, -0.4375·sm), (sm, 0.75·sm + h_mm)] —
            # breaks the symmetric-spectrum stagnation (circulants etc.)
            exc = (since % 10 == 9)
            sm = jnp.abs(a21) + jnp.abs(
                jnp.where(m >= 2, h[jnp.maximum(m - 1, 1),
                                    jnp.maximum(m - 2, 0)], 0.0))
            h11x = 0.75 * sm + a22
            s = jnp.where(exc, 2.0 * h11x, s)
            t = jnp.where(exc, h11x * h11x + 0.4375 * sm * sm, t)
            h00 = h[l, l]
            h10 = h[l + 1, l]
            x0 = h00 * h00 + h[l, l + 1] * h10 - s * h00 + t
            y0 = h10 * (h00 + h[l + 1, l + 1] - s)
            z0 = jnp.where(l + 2 <= m, h[l + 2, l + 1] * h10, 0.0)

            def chase(k, carry):
                h, q, x, y, z = carry
                active = (k >= l) & (k <= m - 1)
                last = k == m - 1
                # Householder annihilating (y, z) into x: 3-vector, or
                # 2-vector on the final step
                vx, vy, vz = x, y, jnp.where(last, 0.0, z)
                nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
                alpha = -jnp.sign(jnp.where(vx == 0, 1.0, vx)) * nrm
                v0 = vx - alpha
                vv = v0 * v0 + vy * vy + vz * vz
                beta = jnp.where((vv > 0) & active,
                                 2.0 / jnp.where(vv > 0, vv, 1.0), 0.0)
                i = jnp.arange(n)
                v = (v0 * (i == k) + vy * (i == k + 1)
                     + vz * (i == k + 2)).astype(h.dtype)
                # rows/cols update (rank-1 both sides) + Q accumulation
                vh = v @ h
                h = h - beta * v[:, None] * vh[None, :]
                hv = h @ v
                h = h - beta * hv[:, None] * v[None, :]
                qv = q @ v
                q = q - beta * qv[:, None] * v[None, :]
                # next bulge column (k+1): rows k+1..k+3 of column k
                x1 = h[jnp.minimum(k + 1, n - 1), k]
                y1 = h[jnp.minimum(k + 2, n - 1), k]
                z1 = jnp.where(k + 3 <= m,
                               h[jnp.minimum(k + 3, n - 1), k], 0.0)
                return (h, q, jnp.where(active, x1, x),
                        jnp.where(active, y1, y),
                        jnp.where(active, z1, z))

            h, q, _, _, _ = jax.lax.fori_loop(
                0, n - 1, chase, (h, q, x0, y0, z0))
            return h, q

        h, q = jax.lax.cond(m >= 1, run, lambda h, q: (h, q), h, q)
        return h, q, it + 1, m, since

    def cont(state):
        h, _, it, _, _ = state
        sub = jnp.diagonal(zero_small(h), -1)
        _, m = _active_bounds(sub, n, eps)
        return (m >= 1) & (it < max_sweeps)

    h, q, _, _, _ = jax.lax.while_loop(
        cont, sweep, (h, q, jnp.int32(0), jnp.int32(-2), jnp.int32(0)))
    h = zero_small(h)
    # LAPACK dhseqr info contract: info > 0 ⇔ the QR iteration exhausted
    # max_sweeps with an active (un-deflated) window left — callers must
    # not silently trust the Schur form then (ADVICE r3 #1)
    _, m_left = _active_bounds(jnp.diagonal(h, -1), n, eps)
    info = jnp.where(m_left >= 1, m_left + 1, 0).astype(jnp.int32)
    return h, q, info


def _eigvals_from_schur(t):
    """Planar eigenvalues (wr, wi) of a real quasi-triangular T: 1×1
    blocks are real; 2×2 blocks [(a b)(c d)] give (a+d)/2 ± √disc/2."""
    n = t.shape[-1]
    d = jnp.diagonal(t, axis1=-2, axis2=-1)
    sub = jnp.diagonal(t, -1, axis1=-2, axis2=-1)
    pad = jnp.zeros(t.shape[:-2] + (1,), t.dtype)
    below = jnp.concatenate([sub, pad], -1)      # sub[i] couples i,i+1
    above = jnp.concatenate([pad, sub], -1)      # sub[i-1] couples i-1,i
    start2 = below != 0.0                        # i starts a 2×2 block
    in2 = above != 0.0                           # i is the second row
    a = d
    dd = jnp.roll(d, -1, axis=-1)
    b = jnp.concatenate([jnp.diagonal(t, 1, axis1=-2, axis2=-1), pad], -1)
    c = below
    half = 0.5 * (a + dd)
    disc = 0.25 * (a - dd) ** 2 + b * c
    sq = jnp.sqrt(jnp.abs(disc))
    wr_blk_p = jnp.where(disc >= 0, half + sq, half)
    wr_blk_m = jnp.where(disc >= 0, half - sq, half)
    wi_blk = jnp.where(disc >= 0, 0.0, sq)
    wr = jnp.where(start2, wr_blk_p, d)
    wi = jnp.where(start2, wi_blk, 0.0)
    wr = jnp.where(in2, jnp.roll(wr_blk_m, 1, -1), wr)
    wi = jnp.where(in2, -jnp.roll(wi_blk, 1, -1), wi)
    return wr, wi


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def xgeev_device(a, max_sweeps: int | None = None):
    """Batched device eigenvalues + real Schur form of general square
    matrices: returns (wr, wi, t, q, info) with A = Q T Qᵀ (Q orthogonal, T
    quasi-triangular) — the dgehrd + dhseqr pipeline on the MXU/VPU.
    info (int32, per batch element) follows LAPACK dhseqr: 0 = converged,
    > 0 = QR iteration did not fully deflate within max_sweeps."""
    a = jnp.asarray(a)
    n = a.shape[-1]
    sweeps = max_sweeps if max_sweeps is not None else 40 * n
    h, q = hessenberg(a)
    batch = a.shape[:-2]
    hf = h.reshape((-1, n, n))
    qf = q.reshape((-1, n, n))
    tf, qf, inf = jax.vmap(
        lambda hh, qq: _hseqr_single(hh, qq, sweeps))(hf, qf)
    t = tf.reshape(batch + (n, n))
    q = qf.reshape(batch + (n, n))
    info = inf.reshape(batch)
    wr, wi = _eigvals_from_schur(t)
    return wr, wi, t, q, info

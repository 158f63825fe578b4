"""Jacobi eigen/SVD solvers with round-robin parallel ordering — every
rotation round is an MXU matmul.

Parity: cuSOLVER gesvdj/syevj/sygvj (+Batched) with tolerance / max-sweeps
parameters and residual query (gesvdj/cusolver_gesvdj_example.cu:66-96,
189-191 — cusolverDnXgesvdjSetTolerance/MaxSweeps/GetResidual/GetSweeps).

TPU formulation: a sweep is n-1 rounds of the round-robin tournament
schedule; each round rotates ⌊n/2⌋ disjoint column pairs. Because the pairs
are disjoint, the ⌊n/2⌋ rotations form one orthogonal matrix J (identity +
2×2 blocks scattered at the pair positions), so
  one-sided (Hestenes/gesvdj):  A ← A·J,  V ← V·J        (2 matmuls)
  two-sided (syevj):            A ← Jᵀ·A·J, V ← V·J       (3 matmuls)
— all MXU work, batched by vmap. This is the "embarrassingly parallel
sweeps, natural batched form" design SURVEY.md §2.5 calls for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import check


@functools.lru_cache(maxsize=32)
def _round_robin(n: int) -> np.ndarray:
    """Tournament schedule: (n-1) rounds × (n/2) disjoint pairs covering all
    C(n,2) pairs (n padded to even)."""
    m = n + (n % 2)
    players = list(range(m))
    rounds = []
    for _ in range(m - 1):
        pairs = [(players[i], players[m - 1 - i]) for i in range(m // 2)]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    out = np.array(rounds)  # (m-1, m/2, 2)
    return out


def _rotation_matrix(n, p, q, c, s, dtype):
    """Orthogonal J: identity with [c s; -s c] blocks at the (p,q) pairs.
    p, q, c, s are (k,) arrays of disjoint pairs."""
    j = jnp.eye(n, dtype=dtype)
    j = j.at[p, p].set(c)
    j = j.at[q, q].set(c)
    j = j.at[p, q].set(s)
    j = j.at[q, p].set(-s)
    return j


def _sym_schur(app, aqq, apq, eps):
    """2×2 symmetric Schur rotation zeroing apq."""
    safe = jnp.abs(apq) > eps
    tau = (aqq - app) / (2.0 * jnp.where(safe, apq, 1.0))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return jnp.where(safe, c, 1.0), jnp.where(safe, s, 0.0)


def _syevj_single(a, tol, max_sweeps):
    n = a.shape[-1]
    m = n + (n % 2)
    if m != n:
        # zero-pad: the pad row/col stays exactly zero (rotations touching it
        # see apq=0 → identity), so it decouples with eigenvalue 0
        a = jnp.pad(a, ((0, m - n), (0, m - n)))
    sched = jnp.asarray(_round_robin(n))  # (m-1, m/2, 2) over m indices
    norm = jnp.linalg.norm(a)
    eps = jnp.asarray(1e-30, a.dtype)

    def off(mat):
        return jnp.sqrt(jnp.maximum(jnp.sum(mat * mat) - jnp.sum(jnp.diag(mat) ** 2), 0.0))

    def round_body(r, carry):
        mat, v = carry
        p = sched[r, :, 0]
        q = sched[r, :, 1]
        c, s = _sym_schur(mat[p, p], mat[q, q], mat[p, q], eps)
        j = _rotation_matrix(m, p, q, c, s, mat.dtype)
        mat = j.T @ mat @ j
        v = v @ j
        return mat, v

    def sweep_body(state):
        mat, v, sweep, res = state
        mat, v = jax.lax.fori_loop(0, sched.shape[0], round_body, (mat, v))
        return mat, v, sweep + 1, off(mat)

    def cond(state):
        _, _, sweep, res = state
        return jnp.logical_and(sweep < max_sweeps, res > tol * norm)

    v0 = jnp.eye(m, dtype=a.dtype)
    mat, v, sweeps, res = jax.lax.while_loop(
        cond, sweep_body, (a, v0, jnp.int32(0), off(a) + tol * norm + 1.0)
    )
    w = jnp.diag(mat)[:n]
    v = v[:n, :n] if m != n else v
    order = jnp.argsort(w)
    return w[order], v[:, order], res, sweeps


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def syevj(a, tol: float = 1e-7, max_sweeps: int = 20):
    """Jacobi symmetric eigensolver. Returns (w, v, residual, sweeps) —
    residual/sweeps ≙ cusolverDnXsyevjGetResidual/GetSweeps."""
    a = (a + jnp.swapaxes(a, -1, -2)) / 2
    if a.ndim == 2:
        return _syevj_single(a, tol, max_sweeps)
    flat = a.reshape((-1,) + a.shape[-2:])
    w, v, res, sweeps = jax.vmap(lambda m: _syevj_single(m, tol, max_sweeps))(flat)
    bs = a.shape[:-2]
    return (w.reshape(bs + w.shape[-1:]), v.reshape(bs + v.shape[-2:]),
            res.reshape(bs), sweeps.reshape(bs))


def syevj_batched(a, tol: float = 1e-7, max_sweeps: int = 20):
    """≙ cusolverDnSsyevjBatched."""
    return syevj(a, tol, max_sweeps)


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def sygvj(a, b, tol: float = 1e-7, max_sweeps: int = 20):
    """Generalized Jacobi eigensolver (≙ sygvj): Cholesky reduction + syevj."""
    from jax.scipy.linalg import solve_triangular

    l = jnp.linalg.cholesky(b)
    la = solve_triangular(l, a, lower=True)
    c = solve_triangular(l, jnp.swapaxes(la, -1, -2), lower=True)
    w, y, res, sweeps = syevj(c, tol, max_sweeps)
    x = solve_triangular(jnp.swapaxes(l, -1, -2), y, lower=False)
    return w, x, res, sweeps


def _gesvdj_single(a, tol, max_sweeps):
    """One-sided (Hestenes) Jacobi SVD: orthogonalize columns of A by
    right-rotations; S = column norms, U = normalized columns, V = product
    of rotations."""
    mrows, n0 = a.shape
    check(mrows >= n0, "gesvdj expects m >= n (tall); pass aᵀ and swap u/v")
    n = n0 + (n0 % 2)
    if n != n0:
        # zero column decouples (gamma=0 → identity rotation), σ=0 at the end
        a = jnp.pad(a, ((0, 0), (0, 1)))
    sched = jnp.asarray(_round_robin(n0))
    norm = jnp.linalg.norm(a)
    eps = jnp.asarray(1e-30, a.dtype)

    def round_body(r, carry):
        mat, v = carry
        p = sched[r, :, 0]
        q = sched[r, :, 1]
        ap = mat[:, p]
        aq = mat[:, q]
        alpha = jnp.sum(ap * ap, axis=0)
        beta = jnp.sum(aq * aq, axis=0)
        gamma = jnp.sum(ap * aq, axis=0)
        # rotation zeroing the (p,q) Gram entry
        c, s = _sym_schur(alpha, beta, gamma, eps)
        j = _rotation_matrix(n, p, q, c, s, mat.dtype)
        return mat @ j, v @ j

    def offdiag(mat):
        g = mat.T @ mat
        return jnp.sqrt(jnp.maximum(jnp.sum(g * g) - jnp.sum(jnp.diag(g) ** 2), 0.0))

    def sweep_body(state):
        mat, v, sweep, _ = state
        mat, v = jax.lax.fori_loop(0, sched.shape[0], round_body, (mat, v))
        return mat, v, sweep + 1, offdiag(mat)

    def cond(state):
        _, _, sweep, res = state
        return jnp.logical_and(sweep < max_sweeps, res > (tol * norm) ** 2)

    v0 = jnp.eye(n, dtype=a.dtype)
    mat, v, sweeps, res = jax.lax.while_loop(
        cond, sweep_body, (a, v0, jnp.int32(0), jnp.asarray(jnp.inf, a.dtype))
    )
    mat = mat[:, :n0]
    v = v[:n0, :n0]
    s = jnp.linalg.norm(mat, axis=0)
    order = jnp.argsort(-s)
    s = s[order]
    u = mat[:, order] / jnp.maximum(s, 1e-30)[None, :]
    v = v[:, order]
    return u, s, v, jnp.sqrt(res), sweeps


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def gesvdj(a, tol: float = 1e-7, max_sweeps: int = 20):
    """One-sided Jacobi SVD (≙ cusolverDnXgesvdj). Returns
    (u, s, v, residual, sweeps); A = U diag(S) Vᵀ."""
    if a.ndim == 2:
        return _gesvdj_single(a, tol, max_sweeps)
    flat = a.reshape((-1,) + a.shape[-2:])
    u, s, v, res, sweeps = jax.vmap(lambda m: _gesvdj_single(m, tol, max_sweeps))(flat)
    bs = a.shape[:-2]
    return (u.reshape(bs + u.shape[-2:]), s.reshape(bs + s.shape[-1:]),
            v.reshape(bs + v.shape[-2:]), res.reshape(bs), sweeps.reshape(bs))


def gesvdj_batched(a, tol: float = 1e-7, max_sweeps: int = 20):
    """≙ cusolverDnSgesvdjBatched."""
    return gesvdj(a, tol, max_sweeps)


def gesvda_strided_batched(a, rank: int | None = None, tol: float = 1e-7,
                           max_sweeps: int = 20):
    """≙ cusolverDnXgesvdaStridedBatched (approximate batched SVD): same
    engine, optionally truncated to ``rank``."""
    u, s, v, res, sweeps = gesvdj(a, tol, max_sweeps)
    if rank is not None:
        u, s, v = u[..., :, :rank], s[..., :rank], v[..., :, :rank]
    return u, s, v, res, sweeps

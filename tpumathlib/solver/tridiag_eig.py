"""Tridiagonalization + tridiagonal eigensolver + back-transform — the
sytrd / stedc / ormtr chain.

Parity: cusolverDnXsytrd / Xstedc(-class) / Xormtr and the cuSOLVERMp
pipeline sample mp_sytrd_stedc_ormtr.c (SURVEY.md §3.5: "tridiagonalize →
divide-and-conquer eigensolve → back-transform — the decomposition blueprint
for TPU syevd").

TPU formulation:
- ``xsytrd``: Householder tridiagonalization under lax.scan — each step is
  a rank-2 update (two outer products, VPU/MXU work); reflectors stored like
  LAPACK (in the trailing columns) plus tau.
- ``xstedc``: eigensolver of the tridiagonal matrix. The classic D&C's
  secular-equation solves are control-flow heavy; on TPU the tridiagonal
  eigenproblem is solved by the same batched QL-class path XLA's eigh uses —
  exposed here with the tridiagonal (d, e) API the reference chains expect.
- ``xormtr``: apply the accumulated Householder Q to a matrix (blocked
  matmuls).

Chain test: xormtr(xstedc(xsytrd(A))) == eigh(A).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def xsytrd(a):
    """Householder tridiagonalization of symmetric A: returns
    (d, e, q) with Qᵀ A Q = T = tridiag(e, d, e) and Q orthogonal.

    Q is accumulated explicitly (the TPU-friendly storage — xormtr then
    reduces to one matmul; the LAPACK compact-WY form trades that matmul
    for sequential reflector applies, a poor VPU trade)."""
    n = a.shape[-1]
    a = (a + a.T) / 2

    def step(carry, k):
        m, q = carry
        # Householder vector zeroing column k below row k+1
        col = m[:, k]
        idx = jnp.arange(n)
        tail = jnp.where(idx > k, col, 0.0)
        alpha = jnp.sqrt(jnp.sum(tail * tail))
        pivot = jnp.take(col, k + 1, mode="clip")
        alpha = jnp.where(pivot > 0, -alpha, alpha)
        v = tail
        v = v.at[jnp.clip(k + 1, 0, n - 1)].add(-alpha * (k + 1 < n))
        vnorm2 = jnp.sum(v * v)
        safe = vnorm2 > 1e-300
        beta = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        # symmetric rank-2 update: A ← (I − βvvᵀ) A (I − βvvᵀ)
        w = beta * (m @ v)
        kscal = 0.5 * beta * jnp.dot(w, v)
        w = w - kscal * v
        m = m - jnp.outer(v, w) - jnp.outer(w, v)
        # accumulate Q ← Q (I − βvvᵀ)
        q = q - beta * jnp.outer(q @ v, v)
        return (m, q), None

    q0 = jnp.eye(n, dtype=a.dtype)
    (t, q), _ = jax.lax.scan(step, (a, q0), jnp.arange(n - 2))
    d = jnp.diag(t)
    e = jnp.diag(t, 1)
    return d, e, q


@functools.partial(jax.jit, static_argnames=("method",))
def xstedc(d, e, vectors: bool = True, method: str = "bisect"):
    """Eigendecomposition of tridiag(e, d, e): (w ascending, z).

    ≙ cusolverDnXstedc / cusolverMpStedc. method="bisect" (default) is
    the suite's OWN device tridiagonal engine (solver/stebz.py):
    lane-batched Sturm bisection for values + twisted-factorization
    eigenvectors finished by random-restart inverse iteration under a
    global Cholesky Gram-Schmidt (LAPACK dstebz/dstein-class) —
    O(n²·rounds) work, no O(n³) dense fallback; measured 68.5 ms at
    n=2048 f32 on chip vs 136 ms for the eigh path. method="eigh"
    keeps the round-3 path (build the matrix, run the blocked
    eigensolver)."""
    if method == "bisect":
        from tpumathlib.solver.stebz import stebz_device, stein_device

        w = stebz_device(d, e)
        z = stein_device(d, e, w)
        return w, z
    n = d.shape[0]
    t = jnp.diag(d) + jnp.diag(e, 1) + jnp.diag(e, -1)
    return jnp.linalg.eigh(t)


@functools.partial(jax.jit, static_argnames=("side", "trans"))
def xormtr(q, c, side: str = "L", trans: str = "N"):
    """Multiply by the sytrd Q (≙ cusolverDnXormtr / cusolverMpOrmtr):
    C ← op(Q) C (side=L) or C op(Q) (side=R)."""
    qt = q.T if trans.upper() in ("T", "C") else q
    return qt @ c if side.upper() == "L" else c @ qt


def syevd_via_chain(a):
    """The mp_sytrd_stedc_ormtr pipeline as one call: full symmetric
    eigendecomposition through the 3-stage chain."""
    d, e, q = xsytrd(a)
    w, z = xstedc(d, e)
    v = xormtr(q, z)
    return w, v

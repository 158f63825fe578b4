"""Distributed dense factorizations (≙ cuSOLVERMp, SURVEY.md §2.5).

Parity map:
  cusolverMpPotrf/Potrs      → mp_potrf / mp_potrs  (right-looking block
                               Cholesky over a 1D block-column distribution;
                               panel broadcast = masked psum ≙ ncclBcast,
                               trailing update local MXU)
  cusolverMpGetrf/Getrs      → mp_getrf / mp_getrs  (no-pivot block LU —
                               the reference also ships pivot-off paths;
                               valid for diagonally-dominant/SPD systems)
  cusolverMpGeqrf / Gels     → mp_geqrf / mp_gels   (TSQR: local QR +
                               replicated combine — communication-optimal
                               tall-skinny QR)
  cusolverMpSyevd            → mp_syevd  (distributed one-sided Jacobi:
                               rows sharded, pair statistics by psum,
                               rotation matrix replicated, A·J local MXU
                               matmul per round)
  mp_gesvd / mp_polar        → distributed SVD / polar from the same Jacobi
                               engine (≙ the reference's polar-based gesvd
                               chain, mp_polar.c / mp_gesvd.c)

All functions take/return GLOBAL jax arrays sharded over ``grid``; tests
gather results and compare against the single-device solver tier (the
distributed-vs-local oracle of cuBLASMp/matmul.h:303+).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpumathlib.core.errors import check
from tpumathlib.solver.jacobi import _rotation_matrix, _round_robin, _sym_schur


def _nparts(grid, axis):
    axis = axis or grid.axes[0]
    return axis, grid.mesh.shape[axis]


def mp_potrf(a, grid, axis: str | None = None):
    """Distributed lower Cholesky of SPD A (n×n, n divisible by P).

    A arrives column-block sharded P(None, axis); returns L in the same
    layout."""
    axis, nparts = _nparts(grid, axis)
    n = a.shape[-1]
    check(n % nparts == 0, "n must divide the grid")
    nb = n // nparts

    def local(a_loc):  # (n, nb): this rank's block column
        r = jax.lax.axis_index(axis)
        for k in range(nparts):
            # owner's panel: chol of diagonal block + triangular solve below
            lkk = jnp.linalg.cholesky(a_loc[k * nb:(k + 1) * nb])
            lbelow = jax.scipy.linalg.solve_triangular(
                lkk, a_loc[(k + 1) * nb:].T, lower=True).T
            panel_own = jnp.zeros_like(a_loc)
            panel_own = panel_own.at[k * nb:(k + 1) * nb].set(jnp.tril(lkk))
            panel_own = panel_own.at[(k + 1) * nb:].set(lbelow)
            # broadcast from owner (masked psum ≙ ncclBcast)
            panel = jax.lax.psum(
                jnp.where(r == k, panel_own, jnp.zeros_like(panel_own)), axis)
            # trailing update for ranks j > k: A_j -= panel · panel_jᵀ
            own_rows = jax.lax.dynamic_slice(panel, (r * nb, jnp.zeros((), r.dtype)), (nb, nb))
            upd = panel @ own_rows.T
            a_loc = jnp.where(r > k, a_loc - upd, a_loc)
            a_loc = jnp.where(r == k, panel, a_loc)
        return a_loc

    return jax.jit(jax.shard_map(local, mesh=grid.mesh,
                                 in_specs=P(None, axis), out_specs=P(None, axis)))(a)


def mp_potrs(l, b, grid=None, axis: str | None = None):
    """Solve A X = B from mp_potrf's L. The triangular solves are O(n²) —
    negligible next to the factorization — and run replicated
    (≙ cusolverMpPotrs NRHS=1 note, mp_getrf_getrs.c:231)."""
    from jax.scipy.linalg import solve_triangular

    y = solve_triangular(l, b, lower=True)
    return solve_triangular(jnp.swapaxes(l, -1, -2), y, lower=False)


def _lu_nopiv_block(a):
    """Unpivoted LU of a small block via scan; returns (L unit, U)."""
    n = a.shape[-1]

    def body(m, k):
        col = m[:, k]
        piv = m[k, k]
        l = jnp.where(jnp.arange(n) > k, col / piv, 0.0)
        row = jnp.where(jnp.arange(n) > k, m[k, :], 0.0)
        m = m - jnp.outer(l, row)
        m = m.at[:, k].set(jnp.where(jnp.arange(n) > k, l, col))
        return m, None

    lu, _ = jax.lax.scan(body, a, jnp.arange(n))
    l = jnp.tril(lu, -1) + jnp.eye(n, dtype=a.dtype)
    u = jnp.triu(lu)
    return l, u


def mp_getrf(a, grid, axis: str | None = None):
    """Distributed no-pivot block LU: A = L U (L unit-diag, combined LU
    storage like LAPACK). Column-block sharded P(None, axis)."""
    axis, nparts = _nparts(grid, axis)
    n = a.shape[-1]
    check(n % nparts == 0, "n must divide the grid")
    nb = n // nparts

    def local(a_loc):
        r = jax.lax.axis_index(axis)
        for k in range(nparts):
            akk = a_loc[k * nb:(k + 1) * nb]
            lkk, ukk = _lu_nopiv_block(akk)
            # L panel below the diagonal: A_below · U_kk⁻¹
            lbelow = jax.scipy.linalg.solve_triangular(
                ukk.T, a_loc[(k + 1) * nb:].T, lower=True).T
            lpanel_own = jnp.zeros_like(a_loc)
            lpanel_own = lpanel_own.at[k * nb:(k + 1) * nb].set(lkk)
            lpanel_own = lpanel_own.at[(k + 1) * nb:].set(lbelow)
            lpanel = jax.lax.psum(
                jnp.where(r == k, lpanel_own, jnp.zeros_like(lpanel_own)), axis)
            # each rank j>k: U_kj = L_kk⁻¹ A_kj (local), then trailing update
            lkk_bc = lpanel[k * nb:(k + 1) * nb]
            ukj = jax.scipy.linalg.solve_triangular(
                lkk_bc, a_loc[k * nb:(k + 1) * nb], lower=True, unit_diagonal=True)
            upd = lpanel.at[: (k + 1) * nb].set(0.0) @ ukj
            new_aj = (a_loc - upd).at[k * nb:(k + 1) * nb].set(ukj)
            a_loc = jnp.where(r > k, new_aj, a_loc)
            # owner: combined LU in the diagonal block, L below, keep U above
            own = a_loc.at[k * nb:(k + 1) * nb].set(ukk + jnp.tril(lkk, -1))
            own = own.at[(k + 1) * nb:].set(lpanel[(k + 1) * nb:])
            a_loc = jnp.where(r == k, own, a_loc)
        return a_loc

    return jax.jit(jax.shard_map(local, mesh=grid.mesh,
                                 in_specs=P(None, axis), out_specs=P(None, axis)))(a)


def mp_getrs(lu, b, grid=None, axis: str | None = None):
    """Solve from mp_getrf output (combined LU storage)."""
    from jax.scipy.linalg import solve_triangular

    y = solve_triangular(lu, b, lower=True, unit_diagonal=True)
    return solve_triangular(lu, y, lower=False)


# ---------------- TSQR ----------------

def mp_geqrf(a, grid, axis: str | None = None):
    """Distributed tall-skinny QR (TSQR): rows sharded P(axis, None) →
    (Q rows-sharded, R replicated). Local QR per rank, all-gather of the
    small R stack, replicated combine, local Q fix-up
    (≙ cusolverMpGeqrf for m ≫ n)."""
    axis, nparts = _nparts(grid, axis)
    m, n = a.shape

    def local(a_loc):
        q1, r1 = jnp.linalg.qr(a_loc, mode="reduced")
        rank = jax.lax.axis_index(axis)
        # gather the small R stack as a provably-replicated value: scatter
        # each rank's R into its slot and psum (≙ ncclAllGather)
        rs = jnp.zeros((nparts * n, n), a_loc.dtype)
        rs = jax.lax.dynamic_update_slice(rs, r1, (rank * n, jnp.zeros((), rank.dtype)))
        rs = jax.lax.psum(rs, axis)
        q2, r = jnp.linalg.qr(rs, mode="reduced")
        q2_blk = jax.lax.dynamic_slice(q2, (rank * n, jnp.zeros((), rank.dtype)), (n, n))
        return q1 @ q2_blk, r

    return jax.jit(jax.shard_map(
        local, mesh=grid.mesh, in_specs=P(axis, None),
        out_specs=(P(axis, None), P(None, None)),
    ))(a)


def mp_gels(a, b, grid, axis: str | None = None):
    """Least squares min‖Ax−b‖ via TSQR (≙ cusolverMpGels)."""
    axis, _ = _nparts(grid, axis)
    q, r = mp_geqrf(a, grid, axis)
    n = a.shape[1]

    def local(q_loc, b_loc):
        return jax.lax.psum(q_loc.T @ b_loc, axis)

    qtb = jax.jit(jax.shard_map(
        local, mesh=grid.mesh, in_specs=(P(axis, None), P(axis)),
        out_specs=P(None),
    ))(q, b)
    return jax.scipy.linalg.solve_triangular(r[:n, :n], qtb[:n], lower=False)


# ---------------- distributed Jacobi SVD / eig / polar ----------------

def mp_gesvdj(a, grid, axis: str | None = None, sweeps: int = 12):
    """Distributed one-sided Jacobi SVD: A (m×n, n even) rows sharded.

    Communication per round: one psum of 3·(n/2) pair statistics; the
    rotation J is replicated and A·J / V·J are local MXU matmuls.
    Returns (U rows-sharded, s replicated, V replicated)."""
    axis, nparts = _nparts(grid, axis)
    m, n = a.shape
    check(n % 2 == 0, "mp_gesvdj: even n (pad one column)")
    sched_j = jnp.asarray(_round_robin(n))
    nrounds = sched_j.shape[0]

    def local(a_loc):
        v0 = jnp.eye(n, dtype=a_loc.dtype)

        def sweep(s, carry):
            def rnd(ri, c2):
                a_l, v_l = c2
                p = sched_j[ri, :, 0]
                q = sched_j[ri, :, 1]
                ap = a_l[:, p]
                aq = a_l[:, q]
                stats = jnp.stack([
                    jnp.sum(ap * ap, axis=0),
                    jnp.sum(aq * aq, axis=0),
                    jnp.sum(ap * aq, axis=0),
                ])
                stats = jax.lax.psum(stats, axis)
                c, sn = _sym_schur(stats[0], stats[1], stats[2],
                                   jnp.asarray(1e-30, a_l.dtype))
                j = _rotation_matrix(n, p, q, c, sn, a_l.dtype)
                return a_l @ j, v_l @ j

            return jax.lax.fori_loop(0, nrounds, rnd, carry)

        a_l, v_l = jax.lax.fori_loop(0, sweeps, sweep, (a_loc, v0))
        s = jnp.sqrt(jax.lax.psum(jnp.sum(a_l * a_l, axis=0), axis))
        order = jnp.argsort(-s)
        s = s[order]
        u = a_l[:, order] / jnp.maximum(s, 1e-30)[None, :]
        return u, s, v_l[:, order]

    return jax.jit(jax.shard_map(
        local, mesh=grid.mesh, in_specs=P(axis, None),
        out_specs=(P(axis, None), P(None), P(None, None)),
    ))(a)


def mp_syevd(a, grid, axis: str | None = None, sweeps: int = 12):
    """Distributed symmetric eigendecomposition via the Jacobi engine:
    for A = QΛQᵀ, one-sided Jacobi gives V = Q (up to order/sign) and
    λ_j = v_jᵀ A v_j. Returns (w ascending, V replicated).
    (≙ cusolverMpSyevd; sytrd+stedc+ormtr chain is the round-2 path.)"""
    axis, _ = _nparts(grid, axis)
    u, s, v = mp_gesvdj(a, grid, axis, sweeps)

    def local(a_loc, v_rep):
        return a_loc @ v_rep  # (rows_loc, n)

    av = jax.jit(jax.shard_map(
        local, mesh=grid.mesh, in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None),
    ))(a, v)
    lam = jnp.sum(v * av, axis=0)  # v_jᵀ (A v_j); XLA shards the reduction
    order = jnp.argsort(lam)
    return lam[order], v[:, order]


def mp_polar(a, grid, axis: str | None = None, sweeps: int = 12):
    """Distributed polar decomposition A = W P (≙ mp_polar.c): W = UVᵀ
    (rows-sharded), P = VΣVᵀ (replicated)."""
    axis, _ = _nparts(grid, axis)
    u, s, v = mp_gesvdj(a, grid, axis, sweeps)

    def local(u_loc, vt):
        return u_loc @ vt

    w = jax.jit(jax.shard_map(
        local, mesh=grid.mesh, in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None),
    ))(u, v.T)
    p = (v * s[None, :]) @ v.T
    return w, p


def mp_gesvd(a, grid, axis: str | None = None, sweeps: int = 12):
    """≙ cusolverMpGesvd (polar-based in the reference; direct distributed
    Jacobi here). Returns (U rows-sharded, s, V replicated)."""
    return mp_gesvdj(a, grid, axis, sweeps)


def mp_laset(shape, grid, alpha=0.0, beta=1.0, uplo: str = "A",
             axis: str | None = None, dtype=jnp.float32):
    """≙ cusolverMpLaset: initialize a distributed matrix with off-diagonal
    alpha and diagonal beta ('A' full / 'L' lower / 'U' upper). Built
    sharded — no single-device materialization."""
    axis, nparts = _nparts(grid, axis)
    m, n = shape

    def local():
        r = jax.lax.axis_index(axis)
        nb = n // nparts
        rows = jnp.arange(m)[:, None]
        cols = r * nb + jnp.arange(nb)[None, :]
        full = jnp.where(rows == cols, beta, alpha).astype(dtype)
        if uplo.upper() == "L":
            full = jnp.where(rows >= cols, full, 0.0).astype(dtype)
        elif uplo.upper() == "U":
            full = jnp.where(rows <= cols, full, 0.0).astype(dtype)
        return full

    return jax.jit(jax.shard_map(local, mesh=grid.mesh, in_specs=(),
                                 out_specs=P(None, axis)))()

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
  cusolverMpSygst/Sygvd      → mp_sygst / mp_sygvd (Cholesky reduction to
                               standard form through distributed trsm +
                               the sytrd/stedc/ormtr chain)
  cusolverMpOrmqr            → mp_ormqr  (apply the TSQR Q, both sides)
  cusolverMpSyevd            → mp_syevd  (distributed one-sided Jacobi:
                               rows sharded, pair statistics by psum,
                               rotation matrix replicated, A·J local MXU
                               matmul per round)
  mp_gesvd / mp_polar        → distributed SVD / polar from the same Jacobi
                               engine (≙ the reference's polar-based gesvd
                               chain, mp_polar.c / mp_gesvd.c)
  cusolverMpNewtonSchulz     → mp_newton_schulz (Muon-style odd-polynomial
                               orthogonalization; per-iteration coefficient
                               table ≙ mp_newton_schulz.cpp:304-310)
  CUSOLVER_FP32_EMULATED_BF16X9_MATH → math_mode="bf16x9" on mp_potrf /
                               mp_newton_schulz (≙ mp_potrf_potrs_fp32emulation.c)

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


def mp_potrf(a, grid, axis: str | None = None, math_mode: str = "default"):
    """Distributed lower Cholesky of SPD A (n×n, n divisible by P).

    A arrives column-block sharded P(None, axis); returns L in the same
    layout. ``math_mode="bf16x9"`` routes the trailing-update GEMM through
    the bf16×9 emulated-fp32 engine (≙ mp_potrf_potrs_fp32emulation.c:187's
    cusolverMpSetMathMode(CUSOLVER_FP32_EMULATED_BF16X9_MATH) — the update
    is where virtually all the FLOPs are)."""
    check(math_mode in ("default", "bf16x9"), f"math_mode {math_mode!r}")
    axis, nparts = _nparts(grid, axis)
    n = a.shape[-1]
    check(n % nparts == 0, "n must divide the grid")
    nb = n // nparts
    if math_mode == "bf16x9":
        from tpumathlib.blas.emulation import sgemm_emulated

        mm = lambda x, y: sgemm_emulated(x, y, scheme="bf16x9")
    else:
        mm = jnp.matmul

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
            upd = mm(panel, own_rows.T)
            a_loc = jnp.where(r > k, a_loc - upd, a_loc)
            a_loc = jnp.where(r == k, panel, a_loc)
        return a_loc

    return jax.jit(jax.shard_map(local, mesh=grid.mesh,
                                 in_specs=P(None, axis), out_specs=P(None, axis)))(a)


def mp_newton_schulz(a, grid, coeffs=None, iters: int = 5,
                     axis: str | None = None, math_mode: str = "default"):
    """Distributed Newton–Schulz orthogonalization — the polar/"msign"
    factor of a rectangular A by odd-polynomial iterations
    X ← a·X + b·(XXᵀ)X + c·(XXᵀ)²X  (≙ cusolverMpNewtonSchulz,
    mp_newton_schulz.cpp:261-388, including its Muon-tuned per-iteration
    coefficient table at :304-310).

    A arrives row-block sharded P(axis, None) (m×n, m divisible by P,
    m ≥ n); X₀ = A/‖A‖_F. Each iteration is two sharded GEMMs: the n×n
    Gram G = XᵀX is a local (m_loc, n)ᵀ(m_loc, n) MXU product + one psum,
    then the polynomial update is row-local. ``coeffs`` is a flat
    [a₀ b₀ c₀ a₁ b₁ c₁ …] table (one triple per iteration, the sample's
    h_coeffs layout); default = the classic cubic (1.5, −0.5, 0) which
    converges to the exact polar factor. ``math_mode="bf16x9"`` as in
    mp_potrf."""
    check(math_mode in ("default", "bf16x9"), f"math_mode {math_mode!r}")
    axis, nparts = _nparts(grid, axis)
    m, n = a.shape
    check(m % nparts == 0, "m must divide the grid")
    if coeffs is None:
        coeffs = [1.5, -0.5, 0.0] * iters
    coeffs = [float(c) for c in coeffs]
    check(len(coeffs) >= 3 * iters, "need 3 coefficients per iteration")
    if math_mode == "bf16x9":
        from tpumathlib.blas.emulation import sgemm_emulated

        mm = lambda x, y: sgemm_emulated(x, y, scheme="bf16x9")
    else:
        mm = jnp.matmul

    def local(x_loc):  # (m/P, n)
        nrm2 = jax.lax.psum(jnp.sum(x_loc * x_loc), axis)
        x_loc = x_loc / jnp.sqrt(nrm2)
        for it in range(iters):
            ca, cb, cc = coeffs[3 * it:3 * it + 3]
            g = jax.lax.psum(mm(x_loc.T, x_loc), axis)      # XᵀX (n, n)
            # odd polynomial in X: a X + b X G + c X G²  (XXᵀ-form folded
            # through the Gram matrix — identical by associativity)
            upd = ca * x_loc + cb * mm(x_loc, g)
            if cc != 0.0:
                upd = upd + cc * mm(mm(x_loc, g), g)
            x_loc = upd
        return x_loc

    return jax.jit(jax.shard_map(local, mesh=grid.mesh,
                                 in_specs=P(axis, None),
                                 out_specs=P(axis, None)))(a)


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


# ---------------- pivoted distributed LU ----------------

def _lu_piv_panel(p):
    """Partial-pivoted LU of a tall panel (mp × nb): returns the packed
    L\\U panel and the row-swap sequence (LAPACK ipiv, 0-based, panel-
    relative). Pure-JAX scan — runs per rank inside shard_map."""
    mp_, nb = p.shape
    rows = jnp.arange(mp_)

    def body(carry, t):
        m, piv = carry
        col = jnp.take(m, t, axis=1)
        cand = jnp.where(rows >= t, jnp.abs(col), -1.0)
        pidx = jnp.argmax(cand).astype(piv.dtype)
        piv = piv.at[t].set(pidx)
        rowt = m[t]
        rowp = m[pidx]
        m = m.at[t].set(rowp).at[pidx].set(rowt)
        col = jnp.take(m, t, axis=1)
        diag = col[t]
        l = jnp.where(rows > t, col / diag, 0.0)
        urow = jnp.where(jnp.arange(nb) > t, m[t], 0.0)
        m = m - jnp.outer(l, urow)
        m = jnp.where((rows > t)[:, None] & (jnp.arange(nb) == t)[None, :],
                      l[:, None], m)
        return (m, piv), None

    piv0 = jnp.zeros((nb,), jnp.int32)
    (lu, piv), _ = jax.lax.scan(body, (p, piv0), jnp.arange(nb))
    return lu, piv


def mp_getrf_pivoted(a, grid, axis: str | None = None):
    """Distributed blocked LU WITH partial pivoting (the cuSOLVERMp
    default — mp_getrf_getrs.c:486): column-block sharded P(None, axis).

    Per block step: the owning rank factors its tall panel with row
    pivoting, the pivot sequence is broadcast (one psum ≙ ncclBcast) and —
    because the distribution is by COLUMNS — every rank applies the row
    swaps locally with no further communication; the L panel broadcast and
    MXU trailing update follow as in the no-pivot path.

    Returns (LU, ipiv): combined LAPACK L\\U storage sharded like A, and
    the global row-swap sequence ipiv (replicated) with ipiv[j] = row
    swapped with j at step j (0-based)."""
    axis, nparts = _nparts(grid, axis)
    n = a.shape[-1]
    check(n % nparts == 0, "n must divide the grid")
    nb = n // nparts

    def local(a_loc):
        r = jax.lax.axis_index(axis)
        ipiv = jnp.zeros((1, n), jnp.int32)
        for k in range(nparts):
            off = k * nb
            panel_lu, piv_rel = _lu_piv_panel(a_loc[off:, :])
            piv_glob = piv_rel.astype(jnp.int32) + jnp.int32(off)
            piv_glob = jax.lax.psum(
                jnp.where(r == k, piv_glob, jnp.zeros_like(piv_glob)), axis)
            ipiv = ipiv.at[0, off:off + nb].set(piv_glob)
            # owner already swapped inside the panel; other ranks apply the
            # same swap sequence to their local columns (rows are local!)
            a_k = a_loc.at[off:].set(panel_lu)

            def swap_body(t, x):
                t = t.astype(jnp.int32)
                p = piv_glob[t]
                rowt = x[jnp.int32(off) + t]
                rowp = x[p]
                x = jax.lax.dynamic_update_slice(
                    x, rowp[None], (jnp.int32(off) + t, jnp.int32(0)))
                return jax.lax.dynamic_update_slice(
                    x, rowt[None], (p, jnp.int32(0)))

            a_other = jax.lax.fori_loop(0, nb, swap_body, a_loc)
            a_loc = jnp.where(r == k, a_k, a_other)
            # broadcast the factored column block of the owner
            cblk = jax.lax.psum(
                jnp.where(r == k, a_loc, jnp.zeros_like(a_loc)), axis)
            lkk = (jnp.tril(cblk[off:off + nb], -1)
                   + jnp.eye(nb, dtype=a_loc.dtype))
            lbelow = cblk[off + nb:]
            # ranks j > k: U_kj = L_kk⁻¹ A_kj, trailing -= L_below U_kj
            ukj = jax.scipy.linalg.solve_triangular(
                lkk, a_loc[off:off + nb], lower=True, unit_diagonal=True)
            new = a_loc.at[off:off + nb].set(ukj)
            new = new.at[off + nb:].add(
                -jnp.matmul(lbelow, ukj, preferred_element_type=jnp.float32
                            ).astype(a_loc.dtype))
            a_loc = jnp.where(r > k, new, a_loc)
        return a_loc, ipiv

    lu, ipiv = jax.jit(jax.shard_map(
        local, mesh=grid.mesh,
        in_specs=P(None, axis),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=False))(a)
    # every rank computed the same full ipiv; take the first shard row
    return lu, ipiv.reshape(-1)[:n]


def mp_getrs_pivoted(lu, ipiv, b, grid=None, axis: str | None = None):
    """Solve from mp_getrf_pivoted output: apply the row-swap sequence to
    B, then the two triangular solves (≙ cusolverMpGetrs with pivoting)."""
    from jax.scipy.linalg import solve_triangular

    n = b.shape[0]
    b = b if b.ndim == 2 else b[:, None]

    def swap_body(t, x):
        t = t.astype(jnp.int32)
        p = ipiv[t].astype(jnp.int32)
        rowt = x[t]
        rowp = x[p]
        x = jax.lax.dynamic_update_slice(x, rowp[None], (t, jnp.int32(0)))
        return jax.lax.dynamic_update_slice(x, rowt[None],
                                            (p, jnp.int32(0)))

    pb = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), swap_body,
                           b.astype(lu.dtype))
    y = solve_triangular(lu, pb, lower=True, unit_diagonal=True)
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


# ---------------- distributed sytrd / stedc / ormtr chain ----------------

def mp_sytrd(a, grid, axis: str | None = None):
    """Distributed Householder tridiagonalization (≙ cusolverMpSytrd, the
    first stage of mp_sytrd_stedc_ormtr.c): A row-sharded P(axis, None).

    Per step the Householder vector is assembled from one all-gathered
    column, w = A·v needs NO communication (row-sharded A gives each rank
    its rows of w), and one all-gather replicates w for the local rank-2
    update — 2 vector all-gathers per step, all O(n²) updates local MXU/VPU
    work. Q is accumulated row-sharded with zero communication.

    Returns (d, e, q): diagonals replicated, Q row-sharded like A."""
    axis, nparts = _nparts(grid, axis)
    n = a.shape[-1]
    check(n % nparts == 0, "n must divide the grid")
    mloc = n // nparts

    def local(a_blk):
        r = jax.lax.axis_index(axis)
        rows_g = (r * mloc + jnp.arange(mloc)).astype(jnp.int32)
        idx = jnp.arange(n)
        q_blk = (rows_g[:, None] == idx[None, :]).astype(a_blk.dtype)

        def step(carry, k):
            m_blk, q_blk = carry
            colk = jax.lax.all_gather(
                jnp.take(m_blk, k, axis=1), axis, tiled=True)  # (n,)
            tail = jnp.where(idx > k, colk, 0.0)
            alpha = jnp.sqrt(jnp.sum(tail * tail))
            pivot = jnp.take(colk, k + 1, mode="clip")
            alpha = jnp.where(pivot > 0, -alpha, alpha)
            v = tail.at[jnp.clip(k + 1, 0, n - 1)].add(-alpha * (k + 1 < n))
            vnorm2 = jnp.sum(v * v)
            safe = vnorm2 > 1e-30
            beta = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
            w_mine = beta * (m_blk @ v)                      # my rows of w
            w = jax.lax.all_gather(w_mine, axis, tiled=True)  # (n,)
            kscal = 0.5 * beta * jnp.dot(w, v)
            w = w - kscal * v
            v_mine = jnp.take(v, rows_g)
            m_blk = (m_blk - jnp.outer(v_mine, w)
                     - jnp.outer(jnp.take(w, rows_g), v))
            q_blk = q_blk - beta * jnp.outer(q_blk @ v, v)
            return (m_blk, q_blk), None

        (t_blk, q_blk), _ = jax.lax.scan(step, (a_blk, q_blk),
                                         jnp.arange(n - 2))
        # replicated tridiagonal: gather my diagonal pieces
        t_full = jax.lax.all_gather(t_blk, axis, axis=0, tiled=True)
        d = jnp.diagonal(t_full)
        e = jnp.diagonal(t_full, 1)
        return q_blk, jnp.broadcast_to(d[None], (1, n)), \
            jnp.broadcast_to(e[None], (1, n - 1))

    q, d, e = jax.jit(jax.shard_map(
        local, mesh=grid.mesh, in_specs=P(axis, None),
        out_specs=(P(axis, None), P(axis, None), P(axis, None))))(a)
    return d.reshape(-1)[:n], e.reshape(-1)[:n - 1], q


def mp_stedc(d, e, grid=None, axis: str | None = None):
    """Tridiagonal eigensolver stage (≙ cusolverMpStedc): the (d, e) data
    is O(n) and replicated, so every rank runs the same QL-class solve —
    the O(n³) stages around it (mp_sytrd, mp_ormtr) carry the distribution."""
    from tpumathlib.solver.tridiag_eig import xstedc

    return xstedc(d, e)


def mp_ormtr(q, c, grid, axis: str | None = None):
    """Back-transform stage (≙ cusolverMpOrmtr): V = Q·C with Q row-sharded
    and C replicated — one local MXU matmul per rank, no communication."""
    axis, _ = _nparts(grid, axis)

    def local(q_blk, c_rep):
        return jnp.matmul(q_blk, c_rep, preferred_element_type=jnp.float32
                          ).astype(q_blk.dtype)

    return jax.jit(jax.shard_map(
        local, mesh=grid.mesh, in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None)))(q, c)


def mp_sytrd_stedc_ormtr(a, grid, axis: str | None = None):
    """The full distributed eigendecomposition pipeline of
    mp_sytrd_stedc_ormtr.c: tridiagonalize → tridiagonal eigensolve →
    back-transform. Returns (w ascending, V row-sharded)."""
    d, e, q = mp_sytrd(a, grid, axis)
    w, z = mp_stedc(d, e, grid, axis)
    v = mp_ormtr(q, z, grid, axis)
    return w, v


def mp_ormqr(q, c, grid, axis: str | None = None, trans: bool = False):
    """Apply the TSQR Q (from mp_geqrf, rows-sharded) to a matrix
    (≙ cusolverMpOrmqr): Q·C with C replicated → rows-sharded, or
    Qᵀ·C with C rows-sharded → replicated (one psum)."""
    axis, _ = _nparts(grid, axis)

    if trans:
        def local_t(q_blk, c_blk):
            part = jnp.matmul(jnp.swapaxes(q_blk, -1, -2), c_blk,
                              preferred_element_type=jnp.float32)
            return jax.lax.psum(part, axis).astype(q_blk.dtype)

        return jax.jit(jax.shard_map(
            local_t, mesh=grid.mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(None, None)))(q, c)

    def local(q_blk, c_rep):
        return jnp.matmul(q_blk, c_rep,
                          preferred_element_type=jnp.float32
                          ).astype(q_blk.dtype)

    return jax.jit(jax.shard_map(
        local, mesh=grid.mesh, in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None)))(q, c)


def mp_sygst(a, l, grid, axis: str | None = None):
    """Reduce the generalized symmetric-definite problem to standard form
    (≙ cusolverMpSygst, itype=1): C = L⁻¹ A L⁻ᵀ with L from mp_potrf.

    A, C row-sharded P(axis, None); L column-block sharded P(None, axis)
    as mp_potrf returns it. Both triangular solves run through the
    distributed mp_trsm block-substitution."""
    from tpumathlib.mp.pblas import mp_trsm
    from tpumathlib.mp.matmul import gemr2d
    from jax.sharding import NamedSharding

    axis, _ = _nparts(grid, axis)
    l_rows = gemr2d(l, NamedSharding(grid.mesh, P(axis, None)))
    # Y = L⁻¹ A (rows-sharded solve), then C = (L⁻¹ Yᵀ)ᵀ = L⁻¹ A L⁻ᵀ
    y = mp_trsm(l_rows, a, grid, uplo="lower", axis=axis)
    yt = gemr2d(jnp.swapaxes(y, -1, -2),
                NamedSharding(grid.mesh, P(axis, None)))
    c = mp_trsm(l_rows, yt, grid, uplo="lower", axis=axis)
    return gemr2d(jnp.swapaxes(c, -1, -2),
                  NamedSharding(grid.mesh, P(axis, None)))


def mp_sygvd(a, b, grid, axis: str | None = None):
    """Distributed generalized symmetric-definite eigensolver
    (≙ cusolverMpSygvd, itype=1: A x = λ B x): mp_potrf(B) → mp_sygst →
    the distributed sytrd/stedc/ormtr chain → back-transform
    x = L⁻ᵀ y through mp_trsm. Returns (w ascending, X rows-sharded)."""
    from tpumathlib.mp.matmul import gemr2d
    from tpumathlib.mp.pblas import mp_trsm
    from jax.sharding import NamedSharding

    axis, _ = _nparts(grid, axis)
    bcol = gemr2d(b, NamedSharding(grid.mesh, P(None, axis)))
    lfac = mp_potrf(bcol, grid, axis)
    c = mp_sygst(a, lfac, grid, axis)
    c = (c + jnp.swapaxes(c, -1, -2)) / 2
    w, y = mp_sytrd_stedc_ormtr(c, grid, axis)
    # X = L⁻ᵀ Y: solve Lᵀ X = Y — an upper-triangular distributed solve
    l_rows = gemr2d(lfac, NamedSharding(grid.mesh, P(axis, None)))
    lt_rows = gemr2d(jnp.swapaxes(
        gemr2d(lfac, NamedSharding(grid.mesh, P(None, None))), -1, -2),
        NamedSharding(grid.mesh, P(axis, None)))
    x = mp_trsm(lt_rows, y, grid, uplo="upper", axis=axis)
    return w, x

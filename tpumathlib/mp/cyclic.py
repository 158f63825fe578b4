"""TRUE 2D block-cyclic (nprow x npcol, b x b) distributed execution.

≙ the ScaLAPACK-grid-native layer of cuSOLVERMp / cuBLASMp:
  cusolverMpCreateDeviceGrid(nprow, npcol) + block-cyclic descriptors
  (cuSOLVERMp/mp_getrf_getrs.c:346-349, cuBLASMp/helpers.h:1384 numroc).

Layout. A global (n, n) matrix with square b x b blocks over a p x q grid
is stored as the 6D tensor

    A6[i, j, t, s, :, :] = global block (I, J),  I = t*p + i, J = s*q + j

sharded NamedSharding(P('x', 'y')) on the first two axes — each rank owns
(lbr, lbc) = (nbr/p, nbc/q) blocks, the ScaLAPACK local storage, and the
cyclic wrap lives in the INDEX MAP rather than a custom partitioner (the
TPU-first equivalence documented in mp/grid.py). ``scatter``/``gather``
convert between the logical dense matrix and this layout with pure
reshape/transpose (no per-block copies), and ``gemr2d_12`` redistributes
between the 1D block layouts the round-4 tier uses and this 2D layout via
a sharding constraint — XLA inserts the all-to-all (the cublasMpGemr2d
resharding collective).

Algorithms (all shard_map SPMD, one trace for every rank):
  summa_gemm   — SUMMA: per-K-block row/col broadcasts (masked psum ≙
                 ncclBcast over grid rows/cols) + one batched local MXU
                 einsum per step.
  potrf_2d     — right-looking block Cholesky: replicated b x b diag
                 factor, column-panel trsm on the owner column, panel
                 allgather over 'x' + bcast over 'y', rank-local batched
                 trailing update.
  getrf_2d     — block LU, pivot=False (no-pivot, ≙ the reference's
                 pivot-off path) or pivot=True: the panel column is
                 allgathered and every rank computes the pivoted panel
                 LU redundantly (rows masked below the diagonal block),
                 then the row swaps are applied grid-wide with masked
                 psum row exchanges (≙ cusolverMpGetrf's ipiv
                 application).
  syevd_2d     — accepts the 2D layout, redistributes to the row-sharded
                 Jacobi engine (mp/solver.py) and back — the same
                 internal-redistribution structure ScaLAPACK's p?syevd
                 drivers use.
  syrk_2d      — C = alpha·A·Aᵀ + beta·C on the 2D layout through SUMMA
                 with a block-triangle mask (PBLAS p?syrk).

Tests: distributed-vs-local oracles on the 4x2 virtual mesh at shapes
where every rank holds MULTIPLE blocks per dimension (lbr, lbc >= 2);
__graft_entry__.dryrun_multichip runs potrf_2d on the 2D mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpumathlib.core.errors import check

_HI = jax.lax.Precision.HIGHEST


class BlockCyclic:
    """Descriptor for the 2D block-cyclic layout (≙ the ScaLAPACK descA
    created against a cusolverMp device grid)."""

    def __init__(self, grid, n: int, b: int):
        check(len(grid.axes) == 2, "BlockCyclic needs a 2D grid")
        self.grid = grid
        self.ax_r, self.ax_c = grid.axes
        self.p = grid.mesh.shape[self.ax_r]
        self.q = grid.mesh.shape[self.ax_c]
        self.n, self.b = n, b
        check(n % b == 0, "n must divide into b x b blocks")
        self.nbt = n // b
        check(self.nbt % self.p == 0 and self.nbt % self.q == 0,
              "block count must divide the grid (pad n)")
        self.lbr = self.nbt // self.p
        self.lbc = self.nbt // self.q

    # ---- layout conversion (pure reshape/transpose) ----
    def scatter(self, a):
        """Dense (n, n) -> sharded 6D block-cyclic."""
        n, b, p, q = self.n, self.b, self.p, self.q
        a6 = jnp.reshape(a, (self.lbr, p, b, self.lbc, q, b))
        a6 = jnp.transpose(a6, (1, 4, 0, 3, 2, 5))
        return jax.device_put(a6, NamedSharding(
            self.grid.mesh, P(self.ax_r, self.ax_c)))

    def gather(self, a6):
        """Sharded 6D block-cyclic -> dense (n, n) (replicated)."""
        a6 = jax.device_put(a6, NamedSharding(self.grid.mesh, P()))
        a = jnp.transpose(a6, (2, 0, 4, 3, 1, 5))
        return jnp.reshape(a, (self.n, self.n))

    def spec(self):
        return P(self.ax_r, self.ax_c)


def gemr2d_12(x, desc: BlockCyclic, from_1d_axis: str | None = "x"):
    """Redistribute a 1D block-column-sharded global (n, n) array into the
    2D block-cyclic layout (and back with ``gemr2d_21``) — ≙
    cublasMpGemr2d. The reshape + output-sharding constraint makes XLA
    emit the all-to-all."""
    return desc.scatter(x)


def gemr2d_21(a6, desc: BlockCyclic, to_axis: str = "x"):
    out = desc.gather(a6)
    return jax.device_put(out, NamedSharding(
        desc.grid.mesh, P(None, to_axis)))


# ---- SUMMA ----

def summa_gemm(a6, b6, desc: BlockCyclic, alpha=1.0,
               transpose_b: bool = False):
    """C6 = alpha * A @ op(B) on the 2D layout (SUMMA over global block
    index K; ≙ cublasMpMatmul on a p x q grid)."""
    p, q, lbr, lbc, b = desc.p, desc.q, desc.lbr, desc.lbc, desc.b
    axr, axc = desc.ax_r, desc.ax_c
    nbt = desc.nbt

    def local(al, bl):
        al, bl = al[0, 0], bl[0, 0]          # (lbr, lbc, b, b)
        i = jax.lax.axis_index(axr)
        j = jax.lax.axis_index(axc)
        c = jnp.zeros_like(al)
        for K in range(nbt):
            # A block column K -> broadcast along grid rows ('y' axis)
            amine = jnp.where(j == K % q, al[:, K // q], 0.0)
            acol = jax.lax.psum(amine, axc)              # (lbr, b, b)
            if not transpose_b:
                # B block row K -> broadcast along grid cols
                bmine = jnp.where(i == K % p, bl[K // p], 0.0)
                brow = jax.lax.psum(bmine, axr)          # (lbc, b, b)
                c = c + jnp.einsum("tab,sbc->tsac", acol, brow,
                                   precision=_HI)
            else:
                # op(B) = Bᵀ: global (K, J) of Bᵀ is block (J, K) of B —
                # the needed operands live in B's block COLUMN K, spread
                # over grid rows; allgather it and select J = s*q + j
                bmine = jnp.where(j == K % q, bl[:, K // q], 0.0)
                bcol = jax.lax.psum(bmine, axc)          # (lbr, b, b)
                bfull = jax.lax.all_gather(bcol, axr)    # (p, lbr, b, b)
                bfull = bfull.reshape(p * lbr, b, b)     # index i*lbr+t
                jj = jnp.arange(lbc) * q + j
                brow = jnp.take(bfull, (jj % p) * lbr + jj // p, axis=0)
                c = c + jnp.einsum("tab,scb->tsac", acol, brow,
                                   precision=_HI)
        return (alpha * c)[None, None]

    fn = jax.shard_map(local, mesh=desc.grid.mesh,
                       in_specs=(desc.spec(), desc.spec()),
                       out_specs=desc.spec())
    return jax.jit(fn)(a6, b6)


def syrk_2d(a6, c6, desc: BlockCyclic, alpha=1.0, beta=0.0,
            uplo: str = "lower"):
    """PBLAS p?syrk on the 2D layout: C = alpha A Aᵀ + beta C, touching
    only the ``uplo`` block triangle."""
    prod = summa_gemm(a6, a6, desc, alpha=alpha, transpose_b=True)
    p, q, lbr, lbc = desc.p, desc.q, desc.lbr, desc.lbc

    def mask(cl, pl):
        cl, pl = cl[0, 0], pl[0, 0]
        i = jax.lax.axis_index(desc.ax_r)
        j = jax.lax.axis_index(desc.ax_c)
        gi = (jnp.arange(lbr) * p + i)[:, None]
        gj = (jnp.arange(lbc) * q + j)[None, :]
        strict = gi > gj if uplo == "lower" else gi < gj
        d = jnp.tril(jnp.ones((desc.b, desc.b), cl.dtype)) \
            if uplo == "lower" else jnp.triu(
                jnp.ones((desc.b, desc.b), cl.dtype))
        upd = beta * cl + pl
        out = jnp.where(strict[..., None, None], upd, cl)
        out = jnp.where((gi == gj)[..., None, None],
                        jnp.where(d.astype(bool), upd, cl), out)
        return out[None, None]

    fn = jax.shard_map(mask, mesh=desc.grid.mesh,
                       in_specs=(desc.spec(), desc.spec()),
                       out_specs=desc.spec())
    return jax.jit(fn)(c6, prod)


# ---- factorizations ----

def potrf_2d(a6, desc: BlockCyclic):
    """Right-looking block Cholesky on the p x q block-cyclic layout.
    ≙ cusolverMpPotrf (mp_potrf_potrs.c:314-318) with the 2D panel
    broadcast structure ScaLAPACK pdpotrf uses."""
    p, q, lbr, lbc, b, nbt = (desc.p, desc.q, desc.lbr, desc.lbc, desc.b,
                              desc.nbt)
    axr, axc = desc.ax_r, desc.ax_c

    def local(al):
        al = al[0, 0]
        i = jax.lax.axis_index(axr)
        j = jax.lax.axis_index(axc)
        gi = (jnp.arange(lbr) * p + i)          # global row-block ids
        gj = (jnp.arange(lbc) * q + j)          # global col-block ids
        for K in range(nbt):
            # replicated diagonal factor
            d = jax.lax.psum(jax.lax.psum(
                jnp.where((i == K % p) & (j == K % q),
                          al[K // p, K // q], 0.0), axr), axc)
            lkk = jnp.linalg.cholesky(d)
            ident = jnp.eye(b, dtype=al.dtype)
            linv = jax.scipy.linalg.solve_triangular(lkk, ident, lower=True)
            # column panel on owner column: L[I,K] = A[I,K] inv(Lkk)ᵀ
            pan = jnp.einsum("tab,cb->tac", al[:, K // q], linv,
                             precision=_HI)
            pan = jnp.where(((gi > K)[:, None, None]) & (j == K % q),
                            pan, 0.0)
            # full panel to every rank: allgather over rows, bcast over cols
            panf = jax.lax.psum(jax.lax.all_gather(pan, axr), axc)
            panf = panf.reshape(p * lbr, b, b)   # index i_src*lbr + t
            lr = jnp.take(panf, i * lbr + jnp.arange(lbr), axis=0)
            jj = gj
            lc = jnp.take(panf, (jj % p) * lbr + jj // p, axis=0)
            upd = jnp.einsum("tab,scb->tsac", lr, lc, precision=_HI)
            act = ((gi > K)[:, None] & (gj > K)[None, :])[..., None, None]
            al = al - jnp.where(act, upd, 0.0)
            # write the panel column (and zero the upper blocks of col K)
            newcol = jnp.where((gi > K)[:, None, None], lr,
                               jnp.where((gi == K)[:, None, None],
                                         jnp.tril(lkk)[None],
                                         jnp.zeros_like(lr)))
            iscolK = (gj == K)
            al = jnp.where(iscolK[None, :, None, None],
                           newcol[:, None], al)
        return al[None, None]

    fn = jax.shard_map(local, mesh=desc.grid.mesh,
                       in_specs=(desc.spec(),), out_specs=desc.spec())
    return jax.jit(fn)(a6)


def _masked_panel_lu(panel, k0, b, pivot):
    """Pivoted LU of the gathered panel column (n, b); rows < k0 inert.
    Returns (panel_lu, piv_rows) — piv_rows[c] is the global row swapped
    with row k0+c (LAPACK ipiv semantics, already-swapped panel)."""
    n = panel.shape[0]
    rows = jnp.arange(n)
    piv = jnp.zeros((b,), jnp.int32)
    for c in range(b):
        col = panel[:, c]
        key = jnp.where(rows >= k0 + c, jnp.abs(col), -1.0)
        r2 = jnp.argmax(key).astype(jnp.int32) if pivot else \
            jnp.int32(k0 + c)
        piv = piv.at[c].set(r2)
        # swap rows k0+c <-> r2
        ra = panel[k0 + c]
        rb = jax.lax.dynamic_slice(panel, (r2, jnp.int32(0)), (1, b))[0]
        panel = panel.at[k0 + c].set(rb)
        panel = jax.lax.dynamic_update_slice(panel, ra[None], (r2, jnp.int32(0)))
        pivv = panel[k0 + c, c]
        mult = jnp.where(rows > k0 + c, panel[:, c] / pivv, 0.0)
        # eliminate ONLY the trailing columns (> c): columns <= c hold
        # already-stored multipliers / U entries
        prow = jnp.where(jnp.arange(b) > c, panel[k0 + c], 0.0)
        panel = panel - mult[:, None] * prow[None, :]
        panel = panel.at[:, c].set(
            jnp.where(rows > k0 + c, mult, panel[:, c]))
    return panel, piv


def getrf_2d(a6, desc: BlockCyclic, pivot: bool = True):
    """Block LU on the 2D block-cyclic layout. Returns (lu6, perm) with
    perm the (n,) ROW PERMUTATION vector: L @ U == A[perm] (row r of the
    factored matrix came from global row perm[r]). ≙ cusolverMpGetrf +
    its ipiv output (mp_getrf_getrs.c:400-420), permutation-composed;
    pivot=False is the no-pivot path the reference also ships."""
    p, q, lbr, lbc, b, nbt = (desc.p, desc.q, desc.lbr, desc.lbc, desc.b,
                              desc.nbt)
    n = desc.n
    axr, axc = desc.ax_r, desc.ax_c

    def local(al):
        al = al[0, 0]
        i = jax.lax.axis_index(axr)
        j = jax.lax.axis_index(axc)
        gi = jnp.arange(lbr) * p + i
        gj = jnp.arange(lbc) * q + j
        pivall = jnp.arange(n, dtype=jnp.int32)
        for K in range(nbt):
            k0 = K * b
            # gather the FULL panel column K on every rank
            pmine = jnp.where(j == K % q, al[:, K // q], 0.0)
            pcol = jax.lax.psum(pmine, axc)               # (lbr, b, b)
            pfull = jax.lax.all_gather(pcol, axr)         # (p, lbr, b, b)
            # reorder to global rows: block I = t*p + i_src
            pfull = jnp.transpose(pfull, (1, 0, 2, 3))    # (lbr, p, b, b)
            panel = pfull.reshape(n, b)
            panel, piv = _masked_panel_lu(panel, k0, b, pivot)
            # apply the b row swaps to my local blocks (masked psum row
            # exchange; swaps are sequential but disjoint per column c)
            for c in range(b):
                r1 = k0 + c
                r2 = piv[c]
                # fetch both rows (width = my local cols)
                z = jnp.int32(0)

                def getrow(r):
                    r = jnp.int32(r)
                    tt = (r // b) // p
                    own = ((r // b) % p) == i
                    row = jax.lax.dynamic_slice(
                        al, (tt, z, jnp.mod(r, b), z), (1, lbc, 1, b))
                    return jax.lax.psum(
                        jnp.where(own, row[0, :, 0], 0.0), axr)
                row1 = getrow(r1)
                row2 = getrow(r2)

                def putrow(arr, r, val):
                    r = jnp.int32(r)
                    tt = (r // b) // p
                    own = ((r // b) % p) == i
                    cur = jax.lax.dynamic_slice(
                        arr, (tt, z, jnp.mod(r, b), z), (1, lbc, 1, b))
                    new = jnp.where(own, val[None, :, None, :], cur)
                    return jax.lax.dynamic_update_slice(
                        arr, new, (tt, z, jnp.mod(r, b), z))
                noswap = r1 == r2
                al = jnp.where(noswap, al, putrow(putrow(al, r1, row2),
                                                 r2, row1))
                pa = pivall[r1]
                pb = jax.lax.dynamic_slice(pivall, (r2,), (1,))[0]
                pivall = jnp.where(
                    noswap, pivall,
                    jax.lax.dynamic_update_slice(
                        pivall.at[r1].set(pb), pa[None], (r2,)))
            # write the factored panel column back into my blocks
            pan6 = panel.reshape(lbr, p, b, b)
            mycol = pan6[jnp.arange(lbr), i]              # (lbr, b, b)
            iscolK = gj == K
            al = jnp.where(iscolK[None, :, None, None],
                           mycol[:, None], al)
            # U row panel: U[K, J] = inv(L_kk) A[K, J] for J > K
            lkk = jax.lax.dynamic_slice(panel, (k0, 0), (b, b))
            lkk = jnp.tril(lkk, -1) + jnp.eye(b, dtype=al.dtype)
            urow_mine = jnp.where(i == K % p, al[K // p], 0.0)
            urow = jax.lax.psum(urow_mine, axr)           # (lbc, b, b)
            linv = jax.scipy.linalg.solve_triangular(
                lkk, jnp.eye(b, dtype=al.dtype), lower=True,
                unit_diagonal=True)
            urow = jnp.einsum("ab,sbc->sac", linv, urow, precision=_HI)
            # write U row into owner row
            isrowK = gi == K
            uwrite = jnp.where((gj > K)[:, None, None], urow, 0.0)
            keepcol = jnp.where((gj == K)[:, None, None],
                                al[K // p], uwrite)
            al = jnp.where((isrowK[:, None] & (gj >= K)[None, :])[
                ..., None, None], keepcol[None], al)
            # trailing update: A[I,J] -= L[I,K] @ U[K,J], I>K, J>K
            lcolm = jnp.where(j == K % q, al[:, K // q], 0.0)
            lcol = jax.lax.psum(lcolm, axc)
            urowm = jnp.where(i == K % p, al[K // p], 0.0)
            urow2 = jax.lax.psum(urowm, axr)
            upd = jnp.einsum("tab,sbc->tsac", lcol, urow2, precision=_HI)
            act = ((gi > K)[:, None] & (gj > K)[None, :])[..., None, None]
            al = al - jnp.where(act, upd, 0.0)
        return al[None, None], pivall

    fn = jax.shard_map(local, mesh=desc.grid.mesh,
                       in_specs=(desc.spec(),),
                       out_specs=(desc.spec(), P()),
                       check_vma=False)  # perm is value-replicated (built
    # from psum/all_gather-replicated panels) but the static varying-axes
    # analysis cannot see it through argmax
    return jax.jit(fn)(a6)


def syevd_2d(a6, desc: BlockCyclic, sweeps: int = 12):
    """Symmetric eigendecomposition accepting the 2D block-cyclic layout:
    redistributes to the row-sharded Jacobi engine (mp/solver.py
    mp_syevd) and back — the internal-redistribution structure of
    ScaLAPACK's p?syevd. Returns (w, v6)."""
    from tpumathlib.mp.solver import mp_syevd

    a = jax.device_put(desc.gather(a6), NamedSharding(
        desc.grid.mesh, P(desc.ax_r, None)))   # Jacobi engine row layout
    w, v = mp_syevd(a, desc.grid, axis=desc.ax_r, sweeps=sweeps)
    return w, desc.scatter(v)

"""Distributed PBLAS-style ops over row-sharded operands — the cuBLASMp
op breadth beyond matmul (cuBLASMp/README.md:9-31: trsm, trmm, syrk,
syr2k, syrkx, symm, geadd, tradd; gemm/gemr2d live in mp.matmul).

TPU formulation: operands are row-sharded over one mesh axis
(P(axis, None), the 1-block-per-rank specialization of the 2D block-cyclic
ScaLAPACK layout; block-cyclic specs compose via mp.grid.block_cyclic_spec
+ gemr2d). Rank-local compute is XLA GEMM on the MXU; cross-rank terms ride
one all-gather over ICI, except trsm which runs the classic block
forward/backward substitution with one broadcast per rank step (≙
ScaLAPACK pdtrsm's look-ahead pipeline; the broadcast is a psum of a
one-rank-masked value, which XLA lowers to a bcast).

Every op is verified distributed-vs-single-device in
tests/test_mp_pblas.py (the cuBLASMp verify harness pattern,
cuBLASMp/matmul.h:303-577)."""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpumathlib.mp.grid import Grid


def _rowmask_tri(a_blk, axis, uplo: str, diag_offset: int = 0):
    """Triangle mask for a row-sharded block: global row index vs column."""
    mloc, n = a_blk.shape
    r = jax.lax.axis_index(axis)
    rows = r * mloc + jnp.arange(mloc)[:, None]
    cols = jnp.arange(n)[None, :]
    if uplo == "lower":
        return rows + diag_offset >= cols
    return rows <= cols + diag_offset


def _tri(a_blk, axis, uplo, unit: bool):
    m = _rowmask_tri(a_blk, axis, uplo)
    out = jnp.where(m, a_blk, 0.0)
    if unit:
        mloc = a_blk.shape[0]
        r = jax.lax.axis_index(axis)
        rows = r * mloc + jnp.arange(mloc)[:, None]
        diag = rows == jnp.arange(a_blk.shape[1])[None, :]
        out = jnp.where(diag, 1.0, out)
    return out


def mp_syrk(a, c, grid: Grid, alpha=1.0, beta=0.0, uplo: str = "lower",
            axis: str | None = None):
    """C := alpha·A·Aᵀ + beta·C on the uplo triangle (≙ cublasMpSyrk).
    A: P(axis, None) (m_loc, k), C: P(axis, None) (m_loc, m)."""
    axis = axis or grid.axes[0]

    def f(a_blk, c_blk):
        a_full = jax.lax.all_gather(a_blk, axis, axis=0, tiled=True)
        upd = alpha * jnp.matmul(a_blk, a_full.T,
                                 preferred_element_type=jnp.float32)
        new = upd + beta * c_blk
        return jnp.where(_rowmask_tri(c_blk, axis, uplo), new,
                         c_blk).astype(c_blk.dtype)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(axis, None), P(axis, None)),
                         out_specs=P(axis, None))(a, c)


def mp_syr2k(a, b, c, grid: Grid, alpha=1.0, beta=0.0, uplo: str = "lower",
             axis: str | None = None):
    """C := alpha·(A·Bᵀ + B·Aᵀ) + beta·C on the uplo triangle
    (≙ cublasMpSyr2k)."""
    axis = axis or grid.axes[0]

    def f(a_blk, b_blk, c_blk):
        a_full = jax.lax.all_gather(a_blk, axis, axis=0, tiled=True)
        b_full = jax.lax.all_gather(b_blk, axis, axis=0, tiled=True)
        upd = alpha * (jnp.matmul(a_blk, b_full.T,
                                  preferred_element_type=jnp.float32)
                       + jnp.matmul(b_blk, a_full.T,
                                    preferred_element_type=jnp.float32))
        new = upd + beta * c_blk
        return jnp.where(_rowmask_tri(c_blk, axis, uplo), new,
                         c_blk).astype(c_blk.dtype)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(axis, None),) * 3,
                         out_specs=P(axis, None))(a, b, c)


def mp_syrkx(a, b, c, grid: Grid, alpha=1.0, beta=0.0, uplo: str = "lower",
             axis: str | None = None):
    """C := alpha·A·Bᵀ + beta·C on the uplo triangle (≙ cublasMpSyrkx)."""
    axis = axis or grid.axes[0]

    def f(a_blk, b_blk, c_blk):
        b_full = jax.lax.all_gather(b_blk, axis, axis=0, tiled=True)
        upd = alpha * jnp.matmul(a_blk, b_full.T,
                                 preferred_element_type=jnp.float32)
        new = upd + beta * c_blk
        return jnp.where(_rowmask_tri(c_blk, axis, uplo), new,
                         c_blk).astype(c_blk.dtype)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(axis, None),) * 3,
                         out_specs=P(axis, None))(a, b, c)


def mp_symm(a, b, c, grid: Grid, alpha=1.0, beta=0.0, uplo: str = "lower",
            axis: str | None = None):
    """C := alpha·sym(A)·B + beta·C, A symmetric stored in its uplo triangle
    (left side; ≙ cublasMpSymm). All operands P(axis, None)."""
    axis = axis or grid.axes[0]

    def f(a_blk, b_blk, c_blk):
        a_full = jax.lax.all_gather(a_blk, axis, axis=0, tiled=True)
        m = a_full.shape[0]
        rows = jnp.arange(m)[:, None]
        cols = jnp.arange(m)[None, :]
        keep = rows >= cols if uplo == "lower" else rows <= cols
        a_sym = jnp.where(keep, a_full, a_full.T)
        b_full = jax.lax.all_gather(b_blk, axis, axis=0, tiled=True)
        mloc = a_blk.shape[0]
        r = jax.lax.axis_index(axis)
        my_rows = jax.lax.dynamic_slice(a_sym, (r * mloc, jnp.int32(0)), (mloc, m))
        upd = alpha * jnp.matmul(my_rows, b_full,
                                 preferred_element_type=jnp.float32)
        return (upd + beta * c_blk).astype(c_blk.dtype)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(axis, None),) * 3,
                         out_specs=P(axis, None))(a, b, c)


def mp_trmm(a, b, grid: Grid, alpha=1.0, uplo: str = "lower",
            trans: bool = False, unit: bool = False,
            axis: str | None = None):
    """B := alpha·op(tri(A))·B, left side (≙ cublasMpTrmm).
    A: P(axis, None) (m_loc, m), B: P(axis, None) (m_loc, n)."""
    axis = axis or grid.axes[0]

    def f(a_blk, b_blk):
        b_full = jax.lax.all_gather(b_blk, axis, axis=0, tiled=True)
        if trans:
            a_full = jax.lax.all_gather(
                _tri(a_blk, axis, uplo, unit), axis, axis=0, tiled=True)
            mloc = a_blk.shape[0]
            r = jax.lax.axis_index(axis)
            op_rows = jax.lax.dynamic_slice(
                a_full.T, (r * mloc, jnp.int32(0)), (mloc, a_full.shape[0]))
        else:
            op_rows = _tri(a_blk, axis, uplo, unit)
        return (alpha * jnp.matmul(op_rows, b_full,
                                   preferred_element_type=jnp.float32)
                ).astype(b_blk.dtype)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(axis, None), P(axis, None)),
                         out_specs=P(axis, None))(a, b)


def mp_trsm(a, b, grid: Grid, alpha=1.0, uplo: str = "lower",
            unit: bool = False, axis: str | None = None):
    """Solve tri(A)·X = alpha·B, left side (≙ cublasMpTrsm): block
    forward (lower) / backward (upper) substitution across ranks — one
    diagonal-block local solve + one broadcast per rank step, trailing
    updates on the MXU.

    A: P(axis, None) (m_loc, m), B: P(axis, None) (m_loc, n) → X same."""
    axis = axis or grid.axes[0]
    nranks = grid.mesh.shape[axis]

    def f(a_blk, b_blk):
        mloc, n = b_blk.shape
        me = jax.lax.axis_index(axis)
        at = _tri(a_blk, axis, uplo, unit)
        acc = alpha * b_blk.astype(jnp.float32)
        x_mine = jnp.zeros_like(acc)
        order = range(nranks) if uplo == "lower" else range(nranks - 1, -1, -1)
        for r in order:
            diag = jax.lax.dynamic_slice(at, (jnp.int32(0), jnp.int32(r * mloc)), (mloc, mloc))
            xr_local = jax.scipy.linalg.solve_triangular(
                diag, acc, lower=(uplo == "lower"),
                unit_diagonal=unit)
            is_me = (me == r)
            xr = jax.lax.psum(
                jnp.where(is_me, xr_local, jnp.zeros_like(xr_local)), axis)
            x_mine = jnp.where(is_me, xr, x_mine)
            # trailing update for ranks not yet solved (their stored block
            # in column r is entirely inside the triangle)
            pending = (me > r) if uplo == "lower" else (me < r)
            acc = acc - jnp.where(
                pending,
                jnp.matmul(jax.lax.dynamic_slice(at, (jnp.int32(0), jnp.int32(r * mloc)),
                                                 (mloc, mloc)),
                           xr, preferred_element_type=jnp.float32),
                0.0)
        return x_mine.astype(b_blk.dtype)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(axis, None), P(axis, None)),
                         out_specs=P(axis, None))(a, b)


def mp_geadd(a, c, grid: Grid, alpha=1.0, beta=0.0, trans: bool = False,
             axis: str | None = None):
    """C := alpha·op(A) + beta·C (≙ cublasMpGeadd). With trans=True the
    transpose redistribution rides one all-gather."""
    axis = axis or grid.axes[0]

    def f(a_blk, c_blk):
        if trans:
            a_full = jax.lax.all_gather(a_blk, axis, axis=0, tiled=True)
            mloc = c_blk.shape[0]
            r = jax.lax.axis_index(axis)
            op_a = jax.lax.dynamic_slice(
                a_full.T, (r * mloc, jnp.int32(0)), (mloc, c_blk.shape[1]))
        else:
            op_a = a_blk
        return (alpha * op_a + beta * c_blk).astype(c_blk.dtype)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(axis, None), P(axis, None)),
                         out_specs=P(axis, None))(a, c)


def mp_tradd(a, c, grid: Grid, alpha=1.0, beta=0.0, uplo: str = "lower",
             trans: bool = False, axis: str | None = None):
    """C := alpha·op(A) + beta·C on the uplo triangle only
    (≙ cublasMpTradd); entries outside the triangle are left unchanged."""
    axis = axis or grid.axes[0]

    def f(a_blk, c_blk):
        if trans:
            a_full = jax.lax.all_gather(a_blk, axis, axis=0, tiled=True)
            mloc = c_blk.shape[0]
            r = jax.lax.axis_index(axis)
            op_a = jax.lax.dynamic_slice(
                a_full.T, (r * mloc, jnp.int32(0)), (mloc, c_blk.shape[1]))
        else:
            op_a = a_blk
        new = alpha * op_a + beta * c_blk
        return jnp.where(_rowmask_tri(c_blk, axis, uplo), new,
                         c_blk).astype(c_blk.dtype)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(axis, None), P(axis, None)),
                         out_specs=P(axis, None))(a, c)

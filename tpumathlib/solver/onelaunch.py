"""ONE-pallas_call blocked Cholesky — the single-launch factorization the
round-4 floor analysis (solver/blocked.py) predicted could claim the
~8 TFLOP/s ceiling on this chip.

≙ cusolverDnXpotrf at production sizes
(cuSOLVER/Xpotrf/cusolver_Xpotrf_example.cu:80-107) and the blocked
panel/trailing structure of MathDx's cuSolverDx 10_Advanced sample
(blocked potrf composing the Dx GEMM tier) — but as a LEFT-LOOKING
factorization living entirely inside one kernel launch, so the 246 us
pallas fixed cost (x16 panel launches = 4 ms of the round-4 engine's
7.6 ms) is paid ONCE.

Structure (grid = one sequential step per 256-wide panel; the kernel
body is traced once, offsets are grid-dependent):

  stage s:
    1. wait the previous stage's panel store (makes L[:, <s0] visible)
    2. DMA the full (n, 256) column strip A[:, s0:s0+256] HBM->VMEM
    3. left-looking update: A_panel[s0:, :] -= L[s0:, 0:s0] @ L[s0:s0+256,
       0:s0]^T, streamed in (256, 256) tiles of L with double-buffered
       DMA; the tile matmuls run as the 3-pass bf16-split f32 product
       (33 TFLOP/s measured vs 24.5 for HIGHEST, rel ~5e-6 — the split
       the SpMV/FFT engines validated). The diagonal-row tile of each
       previous panel is the FIRST tile streamed per panel, so its split
       planes are cached in VMEM and no separate "lrow" DMA exists.
    4. factor the panel in VMEM: per 128-column block, the fused
       Cholesky+inverse sweep of solver/blocked.py (_chol_inv128, one
       masked cross-sublane reduce per column instead of 12 dependent
       MXU products), then the 128-row-chunk trsm and within-panel
       trailing update at HIGHEST precision.
    5. zero the strip's rows above the diagonal block and DMA the whole
       (n, 256) strip back (input/output alias — A's consumed panel
       columns become L's storage).

Why left-looking: a right-looking single kernel re-reads/re-writes the
O(n^2) trailing matrix every stage (~2 GB of HBM traffic at n=4096);
left-looking touches each L panel column strip once per later stage
(~180 MB total) and writes each strip once, which fits under the
~260 GB/s manual-pipeline ceiling with room to spare.

MEASURED (round 5, this chip, n=4096 f32, marginal-cost chained timing —
the cost of adding one more dependent factorization per chain link, which
cancels every per-iteration harness term):

    one-launch kernel   1.70 ms   13.5 TFLOP/s
    XLA cholesky        2.19 ms   10.5 TFLOP/s
    round-4 per-panel   2.12 ms   10.8 TFLOP/s

and at n=8192 (sweeps amortize against the O(n^3) update):

    one-launch kernel   7.69 ms   23.8 TFLOP/s   (1.57x XLA's 12.1 ms)

rel err 5.9e-7 vs the f64 oracle; upper triangle exactly zero. Two
conclusions the round-4 numbers hid: (a) the single launch beats both
XLA and the per-panel engine by ~1.3x, and (b) the round-4 bench chain
(`c + 1e-30 * potrf(c)` with the full matrix as fori carry) inflated
EVERY dense-solver timing ~2.4x — the carry round-trips the 64 MB
matrix through HBM each link and defeats donation, so XLA's "7.2 ms"
stock cholesky is really 2.2 ms. The floor analysis in solver/blocked.py
inherits that inflation (its 246 us launch / 33 us dependent-matmul
constants were measured through the same harness); this kernel IS the
single-launch data point the round-4 verdict asked for, and it closes
the question in the positive direction. `solver.dense.xpotrf` routes
square f32 n >= 2048 (n % 256 == 0) through this engine on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.dx.pallas_utils import interpret_mode
from tpumathlib.solver.blocked import _chol_inv128

_HI = jax.lax.Precision.HIGHEST
_NB = 128     # Cholesky sweep block (one VPU tile)
_P = 256      # panel width = DMA tile edge


def _rem32(a, b):
    # lax.rem is promotion-strict; under the test suite's x64 config fori
    # indices and Python literals land on mixed int32/int64 widths
    return jax.lax.rem(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))


def _split(v):
    # in-kernel Dekker split — safe in Mosaic (no excess-precision fold;
    # see fft/stockham.py:_split_bf16)
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3_t(ah, al, bh, bl):
    """3-pass bf16-split product a @ b^T (contract dim 1 vs dim 1)."""
    dn = (((1,), (1,)), ((), ()))
    d = jax.lax.dot_general(ah, bh, dn, preferred_element_type=jnp.float32)
    d = d + jax.lax.dot_general(ah, bl, dn,
                                preferred_element_type=jnp.float32)
    return d + jax.lax.dot_general(al, bh, dn,
                                   preferred_element_type=jnp.float32)


def _onelaunch_kernel(n: int):
    K = n // _P          # number of panels / 256-row chunks
    K2 = n // _NB        # number of 128-row chunks

    def kernel(a_hbm, o_hbm, panel, tiles, lrh, lrl, lsem, psem, osem):
        s = pl.program_id(0)
        s0 = s * _P

        def strip_store(stage):
            return pltpu.make_async_copy(
                panel, o_hbm.at[:, pl.ds(stage * _P, _P)], osem)

        # 1. previous panel store must have drained before we read L
        #    from it (and before we overwrite the panel VMEM buffer)
        @pl.when(s > 0)
        def _():
            strip_store(s - 1).wait()

        # 2. pull the current column strip (rows above s0 are dead weight
        #    but one static-shape DMA beats a dynamic-count chunk loop;
        #    the overhead across all stages is ~n^2/2 * 4B = 32 MB)
        pltpu.make_async_copy(a_hbm.at[:, pl.ds(s0, _P)], panel, psem).start()

        # 3. left-looking update, flattened over (previous panel kb,
        #    row chunk r) with double-buffered tile DMA
        nch = K - s              # live row chunks (rows >= s0)
        total = s * nch

        def tile_copy(slot, t):
            slot = jnp.asarray(slot, jnp.int32)   # x64: bare ints -> i64
            t = jnp.asarray(t, jnp.int32)
            kb = t // nch
            r = s + _rem32(t, nch)
            return pltpu.make_async_copy(
                o_hbm.at[pl.ds(r * _P, _P), pl.ds(kb * _P, _P)],
                tiles.at[slot], lsem.at[slot])

        @pl.when(total > 0)
        def _():
            tile_copy(0, 0).start()

        pltpu.make_async_copy(a_hbm.at[:, pl.ds(s0, _P)], panel, psem).wait()

        def upd_body(t, _):
            slot = _rem32(t, 2)

            @pl.when(t + 1 < total)
            def _():
                tile_copy(_rem32(t + 1, 2), t + 1).start()

            tile_copy(slot, t).wait()
            tile = tiles[slot]
            th, tl = _split(tile)
            r_rel = _rem32(t, nch)          # 0 => this tile IS the
                                            # diagonal-row block of kb

            @pl.when(r_rel == 0)
            def _():
                lrh[...] = th
                lrl[...] = tl

            upd = _dot3_t(th, tl, lrh[...], lrl[...])
            r = s + r_rel
            cur = panel[pl.ds(r * _P, _P)]
            panel[pl.ds(r * _P, _P)] = cur - upd
            return _

        jax.lax.fori_loop(0, total, upd_body, None)

        # 4. factor the panel in place (rows s0:n)
        for ib in range(_P // _NB):
            jc = ib * _NB
            j0 = s0 + jc
            lblk, w = _chol_inv128(panel[pl.ds(j0, _NB), jc:jc + _NB])
            panel[pl.ds(j0, _NB), jc:jc + _NB] = lblk
            wt = w.T
            c0 = 2 * s + ib + 1   # first 128-row chunk below the diag

            def trsm_body(r2, _):
                blk = panel[pl.ds(r2 * _NB, _NB), jc:jc + _NB]
                panel[pl.ds(r2 * _NB, _NB), jc:jc + _NB] = jnp.dot(
                    blk, wt, preferred_element_type=jnp.float32,
                    precision=_HI)
                return _

            jax.lax.fori_loop(c0, K2, trsm_body, None)
            for jb in range(ib + 1, _P // _NB):
                jn = jb * _NB
                # zero the strictly-upper (ib, jb) block of the diagonal
                # square, then subtract the within-panel trailing update
                panel[pl.ds(j0, _NB), jn:jn + _NB] = jnp.zeros(
                    (_NB, _NB), jnp.float32)
                lp = panel[pl.ds(s0 + jn, _NB), jc:jc + _NB]

                def inpanel_body(r2, _):
                    blk = panel[pl.ds(r2 * _NB, _NB), jc:jc + _NB]
                    cur = panel[pl.ds(r2 * _NB, _NB), jn:jn + _NB]
                    panel[pl.ds(r2 * _NB, _NB), jn:jn + _NB] = (
                        cur - jax.lax.dot_general(
                            blk, lp, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_HI))
                    return _

                jax.lax.fori_loop(2 * s + jb, K2, inpanel_body, None)

        # 5. zero the rows above the diagonal block, then store the strip
        def zero_body(r, _):
            panel[pl.ds(r * _P, _P)] = jnp.zeros((_P, _P), jnp.float32)
            return _

        jax.lax.fori_loop(0, s, zero_body, None)
        strip_store(s).start()

        @pl.when(s == K - 1)
        def _():
            strip_store(s).wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _onelaunch_call(n: int):
    return pl.pallas_call(
        _onelaunch_kernel(n),
        grid=(n // _P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, _P), jnp.float32),        # panel strip
            pltpu.VMEM((2, _P, _P), jnp.float32),    # L tile slots
            pltpu.VMEM((_P, _P), jnp.bfloat16),      # lrow hi plane
            pltpu.VMEM((_P, _P), jnp.bfloat16),      # lrow lo plane
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret_mode(),
    )


@jax.jit
def _potrf_onelaunch_f32(a):
    n = a.shape[0]
    return _onelaunch_call(n)(a.astype(jnp.float32))


def potrf_onelaunch(a):
    """Cholesky factor (lower) of one large f32 SPD matrix through the
    single-launch left-looking kernel. n must be a multiple of 256.

    The kernel is pure f32/int32; trace under 32-bit promotion so the
    test suite's x64 config cannot leak i64 indices into Mosaic (whose
    memref ops are 32-bit-only)."""
    n = a.shape[0]
    assert a.shape == (n, n) and n % _P == 0, a.shape
    with jax.enable_x64(False):
        return _potrf_onelaunch_f32(a)


# ---------------------------------------------------------------------------
# One-launch left-looking block LU (no pivoting) — ≙ cusolverDnXgetrf with
# CUSOLVER_ALG no-pivot / cusolverMpGetrf's pivot-off path
# (cuSOLVER/Xgetrf/cusolver_Xgetrf_example.cu:134-185). Valid for
# diagonally-dominant / SPD-like systems, like the reference's path.
#
# Structure per 256-wide column strip (grid step s, strip resident in VMEM):
#   1. load strip A[:, s0:s0+256] (FULL height: rows < s0 become U rows)
#   2. for kb < s:  U_kb = invL_P[kb] @ strip[kb]   (side-buffer DMA), then
#      strip[r > kb] -= L[r, kb] @ U_kb  for every later 256-row block,
#      streaming L tiles from the factored output (3-pass bf16 split)
#   3. factor panel rows [s0:): per 128-block, the no-pivot elimination
#      sweep, then inv(L11)/inv(U11) as 128 descending elementary
#      outer-product steps each (W -= col_k (x) W[k, :] — pure VPU
#      broadcasts, no dependent MXU chain), trsm below (A21 inv(U11)),
#      U12 = inv(L11) A12, within-panel trailing update
#   4. compose the (256,256) inv(L_panel) from the two 128-block inverses
#      (2 MXU products), store it to the side buffer + store the strip
def _lu128(d):
    """No-pivot LU of a (128,128) tile -> compact L\\U (multipliers below
    the diagonal, U on/above)."""
    nb = d.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    for j in range(nb):
        piv = d[j:j + 1, j:j + 1]
        mult = jnp.where(row_i[:, :1] > j, d[:, j:j + 1] / piv, 0.0)
        urow = jnp.where(lane > j, d[j:j + 1, :], 0.0)
        d = d - mult * urow
        d = jnp.where((row_i > j) & (lane == j),
                      jnp.broadcast_to(mult, d.shape), d)
    return d


def _inv_unit_lower128(lu):
    """inv(unit-lower(lu)) via elementary outer products,
    W <- (I - m_k e_k^T) W, m_k = subdiagonal column k.

    ORDER MATTERS: L = (I+m_0 e_0^T)···(I+m_{n-2}e^T) (ascending), so
    inv(L) = (I-m_{n-2}e^T)···(I-m_0 e_0^T) — the k-th factor must be
    applied in ASCENDING k so the largest k lands leftmost. The
    round-5 descending version returned 2I-L (= inv only to first
    order in the multipliers); it slipped through because the no-pivot
    getrf tests used g + n·I whose multipliers are O(1/n)."""
    nb = lu.shape[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    w = jnp.eye(nb, dtype=lu.dtype)
    for k in range(nb - 1):
        mk = jnp.where(row_i[:, :1] > k, lu[:, k:k + 1], 0.0)
        w = w - mk * w[k:k + 1, :]
    return w


def _inv_upper128(lu):
    """inv(upper(lu)): column-scaled elementary factors + diagonal."""
    nb = lu.shape[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    dinv = 1.0 / jnp.sum(jnp.where(row_i == lane, lu, 0.0), axis=1,
                         keepdims=True)          # (nb,1) 1/U[k,k]
    w = jnp.eye(nb, dtype=lu.dtype)
    # Utilde = U D^{-1} (columns scaled): c_k = strict-upper col k / U[k,k]
    dinv_lane = jnp.swapaxes(dinv, 0, 1)          # (1, nb): 1/U[k,k] by k
    for k in range(nb - 1, 0, -1):
        ck = jnp.where(row_i[:, :1] < k,
                       lu[:, k:k + 1] * dinv_lane[:, k:k + 1], 0.0)
        w = w - ck * w[k:k + 1, :]
    # inv(U) = D^{-1} inv(Utilde): scale ROWS by 1/U[k,k]
    return w * dinv


def _getrf_kernel(n: int):
    K = n // _P
    K2 = n // _NB

    def kernel(a_hbm, o_hbm, inv_hbm, panel, tiles, invbuf,
               uh, ul, lsem, psem, osem, vsem):
        s = pl.program_id(0)
        s0 = s * _P

        def strip_store(stage):
            return pltpu.make_async_copy(
                panel, o_hbm.at[:, pl.ds(stage * _P, _P)], osem)

        def inv_store(stage):
            return pltpu.make_async_copy(
                invbuf, inv_hbm.at[pl.ds(stage * _P, _P)], vsem)

        @pl.when(s > 0)
        def _():
            strip_store(s - 1).wait()
            inv_store(s - 1).wait()

        pltpu.make_async_copy(a_hbm.at[:, pl.ds(s0, _P)], panel, psem).start()
        pltpu.make_async_copy(a_hbm.at[:, pl.ds(s0, _P)], panel, psem).wait()

        # 2. left-looking update over previous panels
        def kb_body(kb, _):
            # inv(L_panel[kb]) from the side buffer
            pltpu.make_async_copy(inv_hbm.at[pl.ds(kb * _P, _P)],
                                  invbuf, vsem).start()
            pltpu.make_async_copy(inv_hbm.at[pl.ds(kb * _P, _P)],
                                  invbuf, vsem).wait()
            urows = jnp.dot(invbuf[...], panel[pl.ds(kb * _P, _P)],
                            preferred_element_type=jnp.float32,
                            precision=_HI)
            panel[pl.ds(kb * _P, _P)] = urows
            us = _split(urows)
            uh[...] = us[0]
            ul[...] = us[1]
            nch = K - kb - 1        # row blocks below kb

            def tile_copy(slot, t):
                slot = jnp.asarray(slot, jnp.int32)   # x64: ints -> i64
                r = jnp.asarray(kb + 1 + t, jnp.int32)
                return pltpu.make_async_copy(
                    o_hbm.at[pl.ds(r * _P, _P), pl.ds(kb * _P, _P)],
                    tiles.at[slot], lsem.at[slot])

            tile_copy(0, 0).start()

            def upd_body(t, _):
                slot = _rem32(t, 2)

                @pl.when(t + 1 < nch)
                def _():
                    tile_copy(_rem32(t + 1, 2), t + 1).start()

                tile_copy(slot, t).wait()
                th, tl = _split(tiles[slot])
                dn = (((1,), (0,)), ((), ()))
                upd = jax.lax.dot_general(
                    th, uh[...], dn, preferred_element_type=jnp.float32)
                upd = upd + jax.lax.dot_general(
                    th, ul[...], dn, preferred_element_type=jnp.float32)
                upd = upd + jax.lax.dot_general(
                    tl, uh[...], dn, preferred_element_type=jnp.float32)
                r = kb + 1 + t
                cur = panel[pl.ds(r * _P, _P)]
                panel[pl.ds(r * _P, _P)] = cur - upd
                return _

            jax.lax.fori_loop(0, nch, upd_body, None)
            return _

        jax.lax.fori_loop(0, s, kb_body, None)

        # 3. factor panel rows [s0:)
        winvl = [None, None]
        for ib in range(_P // _NB):
            jc = ib * _NB
            j0 = s0 + jc
            lu = _lu128(panel[pl.ds(j0, _NB), jc:jc + _NB])
            panel[pl.ds(j0, _NB), jc:jc + _NB] = lu
            wl = _inv_unit_lower128(lu)
            wu = _inv_upper128(lu)
            winvl[ib] = wl
            c0 = 2 * s + ib + 1

            def trsm_body(r2, _):
                blk = panel[pl.ds(r2 * _NB, _NB), jc:jc + _NB]
                panel[pl.ds(r2 * _NB, _NB), jc:jc + _NB] = jnp.dot(
                    blk, wu, preferred_element_type=jnp.float32,
                    precision=_HI)
                return _

            jax.lax.fori_loop(c0, K2, trsm_body, None)
            for jb in range(ib + 1, _P // _NB):
                jn = jb * _NB
                u12 = jnp.dot(wl, panel[pl.ds(j0, _NB), jn:jn + _NB],
                              preferred_element_type=jnp.float32,
                              precision=_HI)
                panel[pl.ds(j0, _NB), jn:jn + _NB] = u12

                def inpanel_body(r2, _):
                    blk = panel[pl.ds(r2 * _NB, _NB), jc:jc + _NB]
                    cur = panel[pl.ds(r2 * _NB, _NB), jn:jn + _NB]
                    panel[pl.ds(r2 * _NB, _NB), jn:jn + _NB] = (
                        cur - jnp.dot(blk, u12,
                                      preferred_element_type=jnp.float32,
                                      precision=_HI))
                    return _

                jax.lax.fori_loop(2 * s + ib + 1, K2, inpanel_body, None)

        # 4. compose inv of the (256,256) unit-lower panel diagonal:
        #    [[W1, 0], [-W2 L21 W1, W2]]
        l21 = panel[pl.ds(s0 + _NB, _NB), 0:_NB]
        low = -jnp.dot(winvl[1], jnp.dot(l21, winvl[0],
                                         preferred_element_type=jnp.float32,
                                         precision=_HI),
                       preferred_element_type=jnp.float32, precision=_HI)
        invbuf[0:_NB, 0:_NB] = winvl[0]
        invbuf[0:_NB, _NB:_P] = jnp.zeros((_NB, _NB), jnp.float32)
        invbuf[_NB:_P, 0:_NB] = low
        invbuf[_NB:_P, _NB:_P] = winvl[1]
        inv_store(s).start()
        strip_store(s).start()

        @pl.when(s == K - 1)
        def _():
            strip_store(s).wait()
            inv_store(s).wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _getrf_call(n: int):
    return pl.pallas_call(
        _getrf_kernel(n),
        grid=(n // _P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, _P), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((n, _P), jnp.float32),        # strip
            pltpu.VMEM((2, _P, _P), jnp.float32),    # L tile slots
            pltpu.VMEM((_P, _P), jnp.float32),       # inv panel block
            pltpu.VMEM((_P, _P), jnp.bfloat16),      # U_kb hi
            pltpu.VMEM((_P, _P), jnp.bfloat16),      # U_kb lo
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the strip + side buffers + the unrolled sweeps' temporaries
            # exceed the default 16 MB scoped budget by ~0.7 MB at n=4096
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret_mode(),
    )


@jax.jit
def _getrf_onelaunch_f32(a):
    n = a.shape[0]
    lu, _inv = _getrf_call(n)(a.astype(jnp.float32))
    return lu


def getrf_onelaunch(a):
    """No-pivot LU (compact L\\U, unit-lower L) of one large f32 matrix in
    a single kernel launch. n must be a multiple of 256. The caller owns
    the no-pivot validity contract (diagonal dominance), as with the
    reference's no-pivot algorithm selection. Traced under 32-bit
    promotion (see potrf_onelaunch)."""
    n = a.shape[0]
    assert a.shape == (n, n) and n % _P == 0, a.shape
    with jax.enable_x64(False):
        return _getrf_onelaunch_f32(a)

"""ONE-pallas_call blocked Householder QR (geqrf) + Q materialization
(orgqr) — the third single-launch factorization engine (after potrf and
no-pivot getrf in solver/onelaunch.py).

≙ cusolverDnXgeqrf / cusolverDnXorgqr at production sizes
(cuSOLVER/Xgeqrf/cusolver_Xgeqrf_example.cu:86-120,
cuSOLVER/orgqr/cusolver_orgqr_example.cu:95-135) and cuSOLVERMp's
TSQR-based panel QR (mp_geqrf). Left-looking 256-wide column strips in a
single kernel launch, like the potrf/getrf engines; the output is the
LAPACK-compatible compact V\\R storage plus per-panel compact-WY T
matrices in a side buffer.

Why not plain Householder sweeps for the panel: a rank-1 update on an
(n, 128) VMEM block costs ~0.55 us per pass regardless of lane count
(lane padding), so 128 columns x 32 blocks of full-height sweeps is
~20 ms at n=4096 — 10x slower than the GEMM work. Instead each 128-wide
panel block is factored by **CholeskyQR2 + Householder reconstruction**
(Ballard, Demmel, Grigori, Jacquelin, Nguyen, Solomonik, "Reconstructing
Householder Vectors from Tall-Skinny QR", IPDPS 2014):

  1. G = B^T B (one MXU op, HIGHEST), tiny relative ridge for
     rank-deficient panels;
  2. R1 = chol(G)^T with the fused inverse sweep `_chol_inv128`
     (solver/blocked.py) -> Q1 = B inv(R1); repeat once (CholeskyQR2)
     -> Q orthonormal to f32 eps for panel condition <~ 1/sqrt(eps_f32);
  3. reconstruct TRUE Householder vectors: E1 - Q D = V M is a
     no-pivot LU of a trapezoid whose top 128x128 block is eliminated
     with on-the-fly sign choice D (|M_jj| = |Ea_jj| + |Qa_jj| >= 1, so
     no pivoting is needed — the paper's stability result); then
     V_below = (E1 - Q D) inv(M) in one MXU op and T from the WY
     orthogonality identity T^{-1} = strict_upper(V^T V) + diag(V^T V)/2
     via the in-kernel `_inv_upper128` (no dependent MXU chains).

The result is a genuine Householder factorization (A = Q_house [D R])
whose backward error is bounded by the CholeskyQR2 panel orthogonality;
for pathologically conditioned panels (kappa >~ 4e3 in f32) the ridge
keeps the kernel finite but R degrades — xgeqrf surfaces this through
`info` and its eager path falls back to the XLA lowering automatically.

Trailing/left-looking updates are compact-WY GEMM pairs
(C -= V T^T (V^T C)) with V tiles streamed from the packed output by
double-buffered DMA and multiplied as 3-pass bf16-split f32 products
(the 33-TFLOP/s split validated by the potrf engine).

orgqr materializes Q = H_1 ... H_K I with a second single-launch kernel:
grid over output column strips; strip c needs only panels kb <= c (the
classic trapezoidal orgqr structure), each applied as the same two-pass
streamed WY update with T (not T^T).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.dx.pallas_utils import interpret_mode
from tpumathlib.solver.blocked import _chol_inv128
from tpumathlib.solver.onelaunch import (_HI, _NB, _P, _inv_upper128,
                                         _rem32, _split)


def _dot3_n(ah, al, bh, bl):
    """3-pass bf16-split product a^T @ b (contract dim 0 vs dim 0)."""
    dn = (((0,), (0,)), ((), ()))
    d = jax.lax.dot_general(ah, bh, dn, preferred_element_type=jnp.float32)
    d = d + jax.lax.dot_general(ah, bl, dn,
                                preferred_element_type=jnp.float32)
    return d + jax.lax.dot_general(al, bh, dn,
                                   preferred_element_type=jnp.float32)


def _dot3(ah, al, bh, bl):
    """3-pass bf16-split product a @ b."""
    dn = (((1,), (0,)), ((), ()))
    d = jax.lax.dot_general(ah, bh, dn, preferred_element_type=jnp.float32)
    d = d + jax.lax.dot_general(ah, bl, dn,
                                preferred_element_type=jnp.float32)
    return d + jax.lax.dot_general(al, bh, dn,
                                   preferred_element_type=jnp.float32)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _mm_tn(a, b):
    """a^T @ b at HIGHEST."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _mm_nt(a, b):
    """a @ b^T at HIGHEST."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _qr_block128(bm, e1mask):
    """CholeskyQR2 + Householder reconstruction of one masked (n, 128)
    panel block.

    bm: the block with rows above the panel diagonal already zeroed.
    e1mask: (n, 128) with 1.0 at (j0 + k, k) — the E1 selector for this
    block's diagonal rows (also used as an MXU row gather/scatter).

    Returns (v, v1, rd): v (n, 128) Householder vectors (unit diagonal
    ~1, overwritten by the caller's packing), v1 the exact (128, 128)
    top block from the reconstruction sweep, and rd (128, 128)
    upper-triangular D·R rows. Build T with _t_from_v(masked v) so that
    H = I - V T V^T is orthogonal with H E1 = Q D.
    """
    nb = _NB
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    eye = (row_i == lane).astype(jnp.float32)

    # --- CholeskyQR2 ---
    g = _mm_tn(bm, bm)
    trg = jnp.sum(jnp.where(row_i == lane, g, 0.0))
    ridge = (3e-6 / nb) * trg + 1e-30
    g = g + ridge * eye
    l1, w1 = _chol_inv128(g)              # G = L1 L1^T, w1 = inv(L1)
    q1 = _mm_nt(bm, w1)                   # Q1 = B inv(R1) = B w1^T
    g2 = _mm_tn(q1, q1)
    l2, w2 = _chol_inv128(g2)
    q = _mm_nt(q1, w2)                    # orthonormal panel basis
    r = _mm(jnp.swapaxes(l2, 0, 1), jnp.swapaxes(l1, 0, 1))   # R = R2 R1

    # --- Householder reconstruction: E1 - Q D = V M ---
    qtop = _mm_tn(e1mask, q)              # rows j0..j0+127 of Q (MXU gather)
    ea = eye
    qa = qtop
    v1 = jnp.zeros((nb, nb), jnp.float32)
    dl = jnp.zeros((1, nb), jnp.float32)
    for j in range(nb):
        eaj = ea[j:j + 1, j:j + 1]
        qaj = qa[j:j + 1, j:j + 1]
        dj = jnp.where(eaj * qaj > 0, -1.0, 1.0)          # |diag| maximal
        colj = ea[:, j:j + 1] - dj * qa[:, j:j + 1]
        diag = eaj - dj * qaj                             # |.| >= 1
        mult = jnp.where(row_i[:, :1] > j, colj / diag, 0.0)
        ea = ea - mult * ea[j:j + 1, :]
        qa = qa - mult * qa[j:j + 1, :]
        v1 = jnp.where(lane == j, jnp.broadcast_to(mult, v1.shape), v1)
        dl = jnp.where(lane == j, jnp.broadcast_to(dj, dl.shape), dl)
    m = jnp.where(row_i <= lane, ea - qa * dl, 0.0)
    minv = _inv_upper128(m)
    v = _mm(e1mask - q * dl, minv)        # full trapezoid V (unit diag ~1)
    rd = r * jnp.swapaxes(dl, 0, 1)       # stored R = D R (rows signed)
    return v, v1, rd


def _t_from_v(vm):
    """Compact-WY T from the orthogonality identity
    T^{-1} + T^{-T} = V^T V  =>  T^{-1} = strict_upper(S) + diag(S)/2.
    Numerically safer than T = M inv(V1)^T: inv(V1) entries grow with
    the reconstruction multipliers, while S = V^T V stays O(||v||^2).
    vm: the exact masked V (zeros above the diagonal, unit diagonal)."""
    nb = vm.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    s_vv = _mm_tn(vm, vm)
    tinv = jnp.where(row_i < lane, s_vv,
                     jnp.where(row_i == lane, 0.5 * s_vv, 0.0))
    return _inv_upper128(tinv)


def _geqrf_kernel(n: int):
    K = n // _P

    def kernel(a_hbm, o_hbm, t_hbm, strip, tiles, wacc, tbuf, work,
               lsem, psem, osem, tsem):
        s = pl.program_id(0)
        s0 = s * _P
        rowi = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _NB), 1)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)

        def strip_store(stage):
            return pltpu.make_async_copy(
                strip, o_hbm.at[:, pl.ds(stage * _P, _P)], osem)

        def t_store(stage):
            return pltpu.make_async_copy(
                tbuf, t_hbm.at[pl.ds(stage * _P, _P)], tsem)

        @pl.when(s > 0)
        def _():
            strip_store(s - 1).wait()
            t_store(s - 1).wait()

        pltpu.make_async_copy(a_hbm.at[:, pl.ds(s0, _P)], strip, psem).start()
        pltpu.make_async_copy(a_hbm.at[:, pl.ds(s0, _P)], strip, psem).wait()

        # ---- left-looking: apply H_kb^T for kb < s (two-pass streamed WY)
        def kb_body(kb, _):
            kb = jnp.asarray(kb, jnp.int32)
            pltpu.make_async_copy(t_hbm.at[pl.ds(kb * _P, _P)],
                                  tbuf, tsem).start()
            nch = K - kb                  # row chunks kb..K-1

            def tile_copy(slot, t):
                slot = jnp.asarray(slot, jnp.int32)
                r = kb + jnp.asarray(t, jnp.int32)
                return pltpu.make_async_copy(
                    o_hbm.at[pl.ds(r * _P, _P), pl.ds(kb * _P, _P)],
                    tiles.at[slot], lsem.at[slot])

            def vtile(slot, t):
                """Masked V tile: diagonal chunk (t == 0) gets the
                unit-lower mask; below-diagonal chunks pass through."""
                tile = tiles[slot]
                ri = jax.lax.broadcasted_iota(jnp.int32, (_P, _P), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (_P, _P), 1)
                vdiag = jnp.where(ri > ci, tile,
                                  jnp.where(ri == ci, 1.0, 0.0))
                return jnp.where(t == 0, vdiag, tile)

            tile_copy(0, 0).start()

            # pass A: wacc = sum_r V_r^T C_r
            def passa(t, acc):
                slot = _rem32(t, 2)

                @pl.when(t + 1 < nch)
                def _():
                    tile_copy(_rem32(t + 1, 2), t + 1).start()

                tile_copy(slot, t).wait()
                vt = vtile(slot, jnp.asarray(t, jnp.int32))
                vh, vl = _split(vt)
                r = kb + jnp.asarray(t, jnp.int32)
                c = strip[pl.ds(r * _P, _P)]
                ch, cl = _split(c)
                return acc + _dot3_n(vh, vl, ch, cl)

            w = jax.lax.fori_loop(0, nch,
                                  passa, jnp.zeros((_P, _P), jnp.float32))
            pltpu.make_async_copy(t_hbm.at[pl.ds(kb * _P, _P)],
                                  tbuf, tsem).wait()
            w2 = _mm_tn(tbuf[...], w)     # T^T (V^T C)
            w2h, w2l = _split(w2)

            # pass B: C_r -= V_r W2
            tile_copy(0, 0).start()

            def passb(t, _):
                slot = _rem32(t, 2)

                @pl.when(t + 1 < nch)
                def _():
                    tile_copy(_rem32(t + 1, 2), t + 1).start()

                tile_copy(slot, t).wait()
                vt = vtile(slot, jnp.asarray(t, jnp.int32))
                vh, vl = _split(vt)
                r = kb + jnp.asarray(t, jnp.int32)
                cur = strip[pl.ds(r * _P, _P)]
                strip[pl.ds(r * _P, _P)] = cur - _dot3(vh, vl, w2h, w2l)
                return _

            jax.lax.fori_loop(0, nch, passb, None)
            return _

        jax.lax.fori_loop(0, s, kb_body, None)

        # ---- factor the panel: two 128-blocks ----
        vs = [None, None]
        ts = [None, None]
        for ib in range(_P // _NB):
            jc = ib * _NB
            j0 = s0 + jc
            e1mask = (rowi == j0 + lane).astype(jnp.float32)
            blk = strip[:, jc:jc + _NB]
            if ib == 1:
                # apply block 0's reflectors to this block first
                w = _mm_tn(vs[0], blk)
                w2 = _mm_tn(ts[0], w)
                blk = blk - _mm(vs[0], w2)
            bm = jnp.where(rowi >= j0, blk, 0.0)
            v, v1, rd = _qr_block128(bm, e1mask)
            vm = jnp.where(rowi > j0 + lane, v, 0.0) + e1mask
            vs[ib] = vm
            ts[ib] = _t_from_v(vm)
            # pack: R rows of earlier panels stay, then D·R upper + v below
            work[...] = jnp.where(rowi > j0 + lane, v, 0.0)
            krow = jax.lax.broadcasted_iota(jnp.int32, (_NB, _NB), 0)
            klane = jax.lax.broadcasted_iota(jnp.int32, (_NB, _NB), 1)
            v1s = jnp.where(krow > klane, v1, rd)
            work[pl.ds(j0, _NB)] = v1s
            strip[:, jc:jc + _NB] = jnp.where(rowi < j0, blk, work[...])

        # ---- compose + store the panel T and the strip ----
        t01 = -_mm(ts[0], _mm(_mm_tn(vs[0], vs[1]), ts[1]))
        tbuf[0:_NB, 0:_NB] = ts[0]
        tbuf[0:_NB, _NB:_P] = t01
        tbuf[_NB:_P, 0:_NB] = jnp.zeros((_NB, _NB), jnp.float32)
        tbuf[_NB:_P, _NB:_P] = ts[1]
        t_store(s).start()
        strip_store(s).start()

        @pl.when(s == K - 1)
        def _():
            strip_store(s).wait()
            t_store(s).wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _geqrf_call(n: int):
    return pl.pallas_call(
        _geqrf_kernel(n),
        grid=(n // _P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, _P), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((n, _P), jnp.float32),        # strip
            pltpu.VMEM((2, _P, _P), jnp.float32),    # V tile slots
            pltpu.VMEM((_P, _P), jnp.float32),       # W accumulator
            pltpu.VMEM((_P, _P), jnp.float32),       # T buffer
            pltpu.VMEM((n, _NB), jnp.float32),       # packing workspace
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_mode(),
    )


def _orgqr_kernel(n: int):
    K = n // _P

    def kernel(vr_hbm, t_hbm, q_hbm, cbuf, tiles, tbuf, lsem, osem, tsem):
        c = pl.program_id(0)
        c0 = c * _P
        rowi = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)

        @pl.when(c > 0)
        def _():
            pltpu.make_async_copy(
                cbuf, q_hbm.at[:, pl.ds((c - 1) * _P, _P)], osem).wait()

        cbuf[...] = (rowi == c0 + lane2).astype(jnp.float32)

        # apply H_kb for kb = c down to 0 (panels above c are no-ops)
        def kb_body(i, _):
            kb = c - jnp.asarray(i, jnp.int32)
            pltpu.make_async_copy(t_hbm.at[pl.ds(kb * _P, _P)],
                                  tbuf, tsem).start()
            nch = K - kb

            def tile_copy(slot, t):
                slot = jnp.asarray(slot, jnp.int32)
                r = kb + jnp.asarray(t, jnp.int32)
                return pltpu.make_async_copy(
                    vr_hbm.at[pl.ds(r * _P, _P), pl.ds(kb * _P, _P)],
                    tiles.at[slot], lsem.at[slot])

            def vtile(slot, t):
                tile = tiles[slot]
                ri = jax.lax.broadcasted_iota(jnp.int32, (_P, _P), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (_P, _P), 1)
                vdiag = jnp.where(ri > ci, tile,
                                  jnp.where(ri == ci, 1.0, 0.0))
                return jnp.where(t == 0, vdiag, tile)

            tile_copy(0, 0).start()

            def passa(t, acc):
                slot = _rem32(t, 2)

                @pl.when(t + 1 < nch)
                def _():
                    tile_copy(_rem32(t + 1, 2), t + 1).start()

                tile_copy(slot, t).wait()
                vt = vtile(slot, jnp.asarray(t, jnp.int32))
                vh, vl = _split(vt)
                r = kb + jnp.asarray(t, jnp.int32)
                cc = cbuf[pl.ds(r * _P, _P)]
                ch, cl = _split(cc)
                return acc + _dot3_n(vh, vl, ch, cl)

            w = jax.lax.fori_loop(0, nch,
                                  passa, jnp.zeros((_P, _P), jnp.float32))
            pltpu.make_async_copy(t_hbm.at[pl.ds(kb * _P, _P)],
                                  tbuf, tsem).wait()
            w2 = _mm(tbuf[...], w)        # T (V^T C): applying H, not H^T
            w2h, w2l = _split(w2)
            tile_copy(0, 0).start()

            def passb(t, _):
                slot = _rem32(t, 2)

                @pl.when(t + 1 < nch)
                def _():
                    tile_copy(_rem32(t + 1, 2), t + 1).start()

                tile_copy(slot, t).wait()
                vt = vtile(slot, jnp.asarray(t, jnp.int32))
                vh, vl = _split(vt)
                r = kb + jnp.asarray(t, jnp.int32)
                cur = cbuf[pl.ds(r * _P, _P)]
                cbuf[pl.ds(r * _P, _P)] = cur - _dot3(vh, vl, w2h, w2l)
                return _

            jax.lax.fori_loop(0, nch, passb, None)
            return _

        jax.lax.fori_loop(0, c + 1, kb_body, None)
        pltpu.make_async_copy(cbuf, q_hbm.at[:, pl.ds(c0, _P)], osem).start()

        @pl.when(c == K - 1)
        def _():
            pltpu.make_async_copy(
                cbuf, q_hbm.at[:, pl.ds(c0, _P)], osem).wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _orgqr_call(n: int):
    return pl.pallas_call(
        _orgqr_kernel(n),
        grid=(n // _P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, _P), jnp.float32),        # column strip of Q
            pltpu.VMEM((2, _P, _P), jnp.float32),    # V tile slots
            pltpu.VMEM((_P, _P), jnp.float32),       # T buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_mode(),
    )


@jax.jit
def _geqrf_f32(a):
    n = a.shape[0]
    return _geqrf_call(n)(a.astype(jnp.float32))


@jax.jit
def _orgqr_f32(vr, t):
    n = vr.shape[0]
    return _orgqr_call(n)(vr, t)


def geqrf_onelaunch(a):
    """Compact V\\R Householder QR of one large f32 square matrix in a
    single kernel launch; returns (vr, t) where vr packs R (with
    sign-adjusted rows, on/above the diagonal) over the Householder
    vectors (unit diagonal implicit) and t holds the per-panel (256, 256)
    compact-WY T blocks. n must be a multiple of 256. Panels with f32
    condition >~ 4e3 degrade (documented CholeskyQR2 contract) — check
    `xgeqrf`'s info. Traced under 32-bit promotion (Mosaic memref ops
    are 32-bit-only)."""
    n = a.shape[0]
    assert a.shape == (n, n) and n % _P == 0, a.shape
    with jax.enable_x64(False):
        return _geqrf_f32(a)


def orgqr_onelaunch(vr, t):
    """Materialize the full square Q from geqrf_onelaunch's output in a
    single kernel launch (grid over output column strips; strip c applies
    only panels kb <= c — the trapezoidal orgqr structure)."""
    n = vr.shape[0]
    assert vr.shape == (n, n) and t.shape == (n, _P), (vr.shape, t.shape)
    with jax.enable_x64(False):
        return _orgqr_f32(vr, t)


def qr_onelaunch(a):
    """(Q, R) of one large f32 square matrix through the single-launch
    geqrf + orgqr pair."""
    vr, t = geqrf_onelaunch(a)
    q = orgqr_onelaunch(vr, t)
    n = a.shape[0]
    with jax.enable_x64(False):
        r = jnp.triu(vr)
    return q, r

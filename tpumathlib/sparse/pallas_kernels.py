"""Pallas Blocked-ELL kernels: the MXU-native sparse path.

≙ cuSPARSE Blocked-ELL SpMM (`cuSPARSE/spmm_blockedell/spmm_blockedell_example.c`)
— the format NVIDIA routes to tensor cores; on TPU every stored block is a
dense (bs × bs) tile fed straight to the MXU.

Design: a `PrefetchScalarGridSpec` kernel. The (mb, ellw) block-column-id
table is scalar-prefetched, so the BlockSpec index map for B reads the id
and DMAs exactly the B block each stored A block needs — the gather happens
in the DMA engine at tile granularity, not as an XLA element gather (which
runs at ~126 M elem/s on a v5e and is why unstructured CSR SpMV cannot
reach the HBM roofline on this hardware).

Grid: (mb, k/TK, ellw) with the ell position innermost; the output block is
revisited across the ell dimension and accumulated in place. Padding block
ids (-1) are clamped to 0 at call time — their stored data blocks are zero,
so they contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.core.dtypes import bf16_split
from tpumathlib.core.errors import check
from tpumathlib.dx.pallas_utils import interpret_mode
from tpumathlib.sparse.containers import BlockedELL


def _bell_kernel(bs: int, mb: int, ellw: int, nkk: int, tk: int, n: int,
                 precision):
    """Manual pipeline: per k-tile, DMA the whole B column stripe (n × tk)
    into VMEM once (its cost is ~1% of a k-tile's compute); per block-row,
    double-buffer the A ell-row and issue ONE (bs, ellw·bs) @ (ellw·bs, tk)
    MXU dot — the gathered B rows are dynamic VMEM slices stacked along
    sublanes (in-register moves)."""

    def kernel(cols_ref, a_hbm, b_hbm, o_hbm, bstripe, abuf, obuf,
               bsem, asem, osem):
        def a_load(slot, i):
            return pltpu.make_async_copy(a_hbm.at[i], abuf.at[slot],
                                         asem.at[slot])

        def o_store(slot, kk, i):
            return pltpu.make_async_copy(
                obuf.at[slot],
                o_hbm.at[pl.ds(i * bs, bs), pl.ds(kk * tk, tk)],
                osem.at[slot])

        def kk_body(kk, _):
            bdma = pltpu.make_async_copy(
                b_hbm.at[:, pl.ds(kk * tk, tk)], bstripe, bsem)
            bdma.start()
            a_load(0, 0).start()
            bdma.wait()

            def i_body(i, _):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < mb)
                def _():
                    a_load(nxt, i + 1).start()

                a_load(slot, i).wait()
                # two chunks ago this out slot was queued for store
                @pl.when(i >= 2)
                def _():
                    o_store(slot, kk, i - 2).wait()

                a_cat = jnp.concatenate(
                    [abuf[slot, j] for j in range(ellw)], axis=1)
                b_cat = jnp.concatenate(
                    [bstripe[pl.ds(cols_ref[i, j] * bs, bs), :]
                     for j in range(ellw)], axis=0)
                obuf[slot] = jnp.dot(a_cat, b_cat,
                                     preferred_element_type=jnp.float32,
                                     precision=precision)
                o_store(slot, kk, i).start()
                return ()

            jax.lax.fori_loop(0, mb, i_body, ())
            for i in range(max(0, mb - 2), mb):
                o_store(i % 2, kk, i).wait()
            return ()

        jax.lax.fori_loop(0, nkk, kk_body, ())

    return kernel


@functools.partial(jax.jit, static_argnames=("tk",))
def bell_spmm_pallas(a: BlockedELL, b, alpha=1.0, tk: int = 256):
    """C = alpha·A@B with A Blocked-ELL, B dense (n, k). bs must be a
    multiple of 8 (128 for full MXU tiles)."""
    bs = a.blocksize
    mb, ellw = a.cols.shape
    m, n = a.shape
    k = b.shape[-1]
    check(b.shape[0] == n, "B rows must match A cols")
    # DMA lane slices must be 128-aligned
    tk = max(128, min(tk, -(-k // 128) * 128))
    # single-buffered B stripe + A/O pipeline buffers must fit VMEM
    while n * tk * b.dtype.itemsize > (8 << 20) and tk > 128:
        tk //= 2
    kp = -(-k // tk) * tk
    if kp != k:
        b = jnp.pad(b, ((0, 0), (0, kp - k)))
    nkk = kp // tk
    # clamp pad ids (-1): their data blocks are zero
    cols = jnp.maximum(a.cols, 0).astype(jnp.int32)

    # f32 operands need HIGHEST (the MXU's DEFAULT demotes f32 to bf16 —
    # 0.17 abs error measured on chip); bf16 operands run single-pass
    precision = (jax.lax.Precision.HIGHEST
                 if a.data.dtype == jnp.float32 or b.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    out = pl.pallas_call(
        _bell_kernel(bs, mb, ellw, nkk, tk, n, precision),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m, kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, tk), b.dtype),               # B stripe
            pltpu.VMEM((2, ellw, bs, bs), a.data.dtype),  # A ell-row x2
            pltpu.VMEM((2, bs, tk), jnp.float32),        # out blocks x2
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * mb * ellw * bs * bs * kp,
            bytes_accessed=(a.data.size * a.data.dtype.itemsize
                            + n * kp * b.dtype.itemsize + m * kp * 4),
            transcendentals=0),
        interpret=interpret_mode(),
    )(cols, a.data, b)
    out = alpha * out
    return out[:, :k].astype(b.dtype)


def bell_spmv_pallas(a: BlockedELL, x, alpha=1.0):
    """y = alpha·A@x with A Blocked-ELL: the SpMM kernel with a 128-wide
    padded RHS (A-data streaming dominates; the extra MXU lanes are free).

    For repeated products (iterative solvers) use SpmvPlan, whose
    analysis phase pre-splits A into bf16 hi/lo planes so the execute
    kernel runs 3 single-pass MXU products instead of 6-pass HIGHEST
    and stays A-stream-bound."""
    xb = jnp.zeros((x.shape[0], 128), x.dtype).at[:, 0].set(x)
    out = bell_spmm_pallas(a, xb, alpha=alpha, tk=128)
    return out[:, 0]


def _bell_split_kernel(bs: int, mb: int, ellw: int, n: int, rpi: int = 1):
    """SpMV execute kernel over pre-split operands: A and the padded x
    stripe arrive as bf16 (hi, lo) plane pairs; per block-row the product
    is 3 single-pass bf16 MXU dots (hi·hi + hi·lo + lo·hi ≈ f32, ~1e-6
    rel) with NO in-kernel splitting — compute hides behind the A
    stream. ``rpi`` block-rows are processed per pipeline iteration
    (fewer DMA issue/wait rounds against the ~2 us/iteration fixed
    cost)."""
    nit = mb // rpi

    def kernel(cols_ref, ah_hbm, al_hbm, xh_hbm, xl_hbm, o_hbm,
               bh, bl, abuf_h, abuf_l, obuf, bsem, asem, osem):
        def a_load(slot, it):
            return [pltpu.make_async_copy(h.at[pl.ds(it * rpi, rpi)],
                                          buf.at[slot], asem.at[slot, p])
                    for p, (h, buf) in enumerate(((ah_hbm, abuf_h),
                                                  (al_hbm, abuf_l)))]

        def o_store(slot, it):
            if bs == 128:
                return pltpu.make_async_copy(
                    obuf.at[slot], o_hbm.at[pl.ds(it * rpi, rpi), :],
                    osem.at[slot])
            return pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[pl.ds(it * rpi * bs, rpi * bs), :],
                osem.at[slot])

        for p, (h, buf) in enumerate(((xh_hbm, bh), (xl_hbm, bl))):
            pltpu.make_async_copy(h, buf, bsem.at[p]).start()
        for dma in a_load(0, 0):
            dma.start()
        for p in range(2):
            pltpu.make_async_copy(
                (xh_hbm, xl_hbm)[p], (bh, bl)[p], bsem.at[p]).wait()

        def i_body(it, _):
            slot = jax.lax.rem(it, 2)
            nxt = jax.lax.rem(it + 1, 2)

            @pl.when(it + 1 < nit)
            def _():
                for dma in a_load(nxt, it + 1):
                    dma.start()

            for dma in a_load(slot, it):
                dma.wait()

            @pl.when(it >= 2)
            def _():
                o_store(slot, it - 2).wait()

            for s in range(rpi):
                ah_cat = jnp.concatenate(
                    [abuf_h[slot, s, j] for j in range(ellw)], axis=1)
                al_cat = jnp.concatenate(
                    [abuf_l[slot, s, j] for j in range(ellw)], axis=1)
                bh_cat = jnp.concatenate(
                    [bh[pl.ds(cols_ref[it * rpi + s, j] * bs, bs), :]
                     for j in range(ellw)], axis=0)
                bl_cat = jnp.concatenate(
                    [bl[pl.ds(cols_ref[it * rpi + s, j] * bs, bs), :]
                     for j in range(ellw)], axis=0)
                acc = (jnp.dot(ah_cat, bh_cat,
                               preferred_element_type=jnp.float32)
                       + jnp.dot(ah_cat, bl_cat,
                                 preferred_element_type=jnp.float32)
                       + jnp.dot(al_cat, bh_cat,
                                 preferred_element_type=jnp.float32))
                if bs == 128:
                    # broadcast x makes all 128 output columns identical,
                    # so the lane-oriented y row is acc's diagonal — emit
                    # ONE (1, 128) row per block (128x less output
                    # traffic than storing the tile and lane-slicing)
                    ii = jax.lax.broadcasted_iota(jnp.int32, (bs, 128), 0)
                    jj = jax.lax.broadcasted_iota(jnp.int32, (bs, 128), 1)
                    masked = jnp.where(ii == jj, acc, 0.0)
                    # colsum on the MXU — a cross-sublane VPU reduce here
                    # was measured to cost ~0.4 ms over the block-rows
                    ones_row = (ii[0:1] >= 0).astype(jnp.float32)
                    # HIGHEST: each column has ONE nonzero — the dot is a
                    # selection, must not demote the f32 values to bf16
                    obuf[slot, pl.ds(s, 1)] = jnp.dot(
                        ones_row, masked,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                else:
                    obuf[slot, pl.ds(s * bs, bs)] = acc
            o_store(slot, it).start()
            return ()

        jax.lax.fori_loop(0, nit, i_body, ())
        for it in range(max(0, nit - 2), nit):
            o_store(it % 2, it).wait()

    return kernel


def _bell_row_kernel(bs: int, mb: int, ellw: int, nb: int, rpi: int):
    """SpMV execute kernel over TRANSPOSED pre-split blocks: per block
    row the product is yᵢᵀ = Σⱼ x_{colsᵢⱼ}ᵀ·Aᵢⱼᵀ — ONE
    (1, ellw·bs) @ (ellw·bs, bs) MXU dot per bf16 plane pair, with the
    gathered x row assembled from a COMPACT resident x tile (256 KB vs
    the 8.4 MB broadcast planes of the previous formulation) and the
    stacked-Aᵀ operand a free leading-dim collapse of the DMA buffer.
    Mosaic requires sublane loads at provably 8-aligned offsets, so the
    x tile interleaves the planes at 8-sublane granularity: block j
    occupies sublanes 8j..8j+7 with rows 0-3 = x-hi (replicated) and
    rows 4-7 = x-lo — ONE ``pl.multiple_of(8j, 8)`` load per ell slot
    fetches BOTH planes, and each (8, ellw·bs) @ (ellw·bs, bs) dot
    yields hi·A in row 0 and lo·A in row 4 simultaneously (the 3-pass
    hi/lo product is 2 dots + 3 static row slices). The row output
    lands in a tiny double-buffered (rpi, bs) store (no diagonal mask /
    colsum dot), and the freed VMEM admits ``rpi`` = 2 block-rows per
    pipeline iteration at the bench shape — the iteration-fixed-cost
    lever NOTES_r4 #4 could not afford."""
    nit = mb // rpi

    def kernel(cols_ref, ah_hbm, al_hbm, xc_hbm, o_hbm,
               xc, abuf_h, abuf_l, obuf, xsem, asem, osem):
        def a_load(slot, it):
            return [pltpu.make_async_copy(h.at[pl.ds(it * rpi, rpi)],
                                          buf.at[slot], asem.at[slot, p])
                    for p, (h, buf) in enumerate(((ah_hbm, abuf_h),
                                                  (al_hbm, abuf_l)))]

        def o_store(slot, it):
            return pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[pl.ds(it * rpi, rpi)],
                osem.at[slot])

        pltpu.make_async_copy(xc_hbm, xc, xsem).start()
        for dma in a_load(0, 0):
            dma.start()
        pltpu.make_async_copy(xc_hbm, xc, xsem).wait()

        def i_body(it, _):
            slot = jax.lax.rem(it, 2)
            nxt = jax.lax.rem(it + 1, 2)

            @pl.when(it + 1 < nit)
            def _():
                for dma in a_load(nxt, it + 1):
                    dma.start()

            for dma in a_load(slot, it):
                dma.wait()

            @pl.when(it >= 2)
            def _():
                o_store(slot, it - 2).wait()

            for s in range(rpi):
                at_h = abuf_h[slot, s].reshape(ellw * bs, bs)
                at_l = abuf_l[slot, s].reshape(ellw * bs, bs)
                xrow = jnp.concatenate(
                    [xc[pl.ds(pl.multiple_of(
                        cols_ref[it * rpi + s, j] * 8, 8), 8), :]
                     for j in range(ellw)], axis=1)
                acc_h = jnp.dot(xrow, at_h,
                                preferred_element_type=jnp.float32)
                acc_l = jnp.dot(xrow, at_l,
                                preferred_element_type=jnp.float32)
                # rows 0-3 carry x-hi, rows 4-7 x-lo (see docstring):
                # y = hi·ah + lo·ah + hi·al; the lo·al term (acc_l row
                # 4) is O(2^-32) and dropped as in every 3-pass split
                obuf[slot, pl.ds(s, 1)] = (acc_h[0:1] + acc_h[4:5]
                                           + acc_l[0:1])
            o_store(slot, it).start()
            return ()

        jax.lax.fori_loop(0, nit, i_body, ())
        for it in range(max(0, nit - 2), nit):
            o_store(it % 2, it).wait()

    return kernel


class SpmvPlan:
    """cuSPARSE SpMV descriptor lifecycle for Blocked-ELL: the analysis
    phase splits A (and nothing else) into bf16 hi/lo planes — same total
    bytes as f32 — so every execute() streams A once and runs single-pass
    MXU products (≙ cusparseSpMV's create/analyze/execute split,
    cuSPARSE/spmv_csr/spmv_csr_example.c lifecycle). When the column
    dimension tiles exactly (n % bs == 0) the planes are stored with
    each block TRANSPOSED for the row-form kernel (see
    ``_bell_row_kernel``); the broadcast-x kernel remains for ragged n."""

    def __init__(self, a: BlockedELL):
        check(a.blocksize % 8 == 0, "blocksize must be a multiple of 8")
        self.bs = a.blocksize
        self.mb, self.ellw = a.cols.shape
        self.shape = a.shape
        self.cols = jnp.maximum(a.cols, 0).astype(jnp.int32)
        d = jnp.asarray(a.data, jnp.float32)
        # full-lane blocks only: lane-concat of <128-wide (padded)
        # pieces is a documented Mosaic hazard (NOTES_r2)
        self.rowform = (self.shape[1] % self.bs == 0
                        and self.bs % 128 == 0)
        if self.rowform:
            d = jnp.swapaxes(d, -1, -2)
        self.ah, self.al = bf16_split(d)

    @classmethod
    def from_parts(cls, cols, ah, al, shape, bs):
        """Rebuild from the analysis products — lets callers thread the
        split planes as jit arguments (closing over them embeds ~2x nnz
        bytes as program constants; axon remote-compile rejects that)."""
        p = object.__new__(cls)
        p.bs = bs
        p.mb, p.ellw = cols.shape
        p.shape = shape
        p.cols, p.ah, p.al = cols, ah, al
        p.rowform = shape[1] % bs == 0 and bs % 128 == 0
        return p

    def execute(self, x, alpha=1.0):
        m, n = self.shape
        if self.rowform:
            return self._execute_rowform(x, alpha)
        # split on the (n,) VECTOR, then broadcast: the x-prep is the only
        # per-call XLA work and must stay far below the 268 MB A-stream
        # (an earlier zeros+set+f32-plane version cost ~0.5 ms/call)
        x32 = jnp.asarray(x, jnp.float32)
        xh1, xl1 = bf16_split(x32)
        # (measured r4: an MXU k=1 rank-1 broadcast was SLOWER — 154 vs
        # 171 GB/s fed-back — XLA's broadcast_in_dim stays)
        xh = jnp.broadcast_to(xh1[:, None], (n, 128))
        xl = jnp.broadcast_to(xl1[:, None], (n, 128))
        compact = self.bs == 128
        # 2 block-rows per pipeline iteration when the WHOLE VMEM budget
        # (A slot buffers + resident x planes) allows; at the r4 bench
        # shape (ellw=32, bs=128, n=16384) the budget is fully committed
        # (measured: rpi=2 overflows the 16 MB scoped vmem by 2 KB), so
        # the ~0.3 ms/call fixed cost stands there — see NOTES_r4
        abuf_bytes = 2 * 2 * 2 * self.ellw * self.bs * self.bs * 2
        xbuf_bytes = 2 * n * 128 * 2
        rpi = 2 if (self.mb % 2 == 0
                    and abuf_bytes + xbuf_bytes <= (14 << 20)) else 1
        out_shape = ((self.mb, 128) if compact else (m, 128))
        obuf_shape = ((2, rpi, 128) if compact
                      else (2, rpi * self.bs, 128))
        out = pl.pallas_call(
            _bell_split_kernel(self.bs, self.mb, self.ellw, n, rpi),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n, 128), jnp.bfloat16),
                pltpu.VMEM((n, 128), jnp.bfloat16),
                pltpu.VMEM((2, rpi, self.ellw, self.bs, self.bs),
                           jnp.bfloat16),
                pltpu.VMEM((2, rpi, self.ellw, self.bs, self.bs),
                           jnp.bfloat16),
                pltpu.VMEM(obuf_shape, jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret_mode(),
        )(self.cols, self.ah, self.al, xh, xl)
        if compact:
            return alpha * out.reshape(-1)[:m]
        return alpha * out[:, 0]

    def _execute_rowform(self, x, alpha=1.0):
        m, n = self.shape
        nb = n // self.bs
        x32 = jnp.asarray(x, jnp.float32)
        xh1, xl1 = bf16_split(x32)
        # interleaved resident tile (see _bell_row_kernel): block j at
        # sublanes 8j..8j+7, rows 0-3 hi / 4-7 lo — the only per-call
        # x prep is the bf16 split + a 256 KB broadcast (vs 8.4 MB
        # broadcast planes previously)
        xc = jnp.concatenate(
            [jnp.broadcast_to(xh1.reshape(nb, 1, self.bs),
                              (nb, 4, self.bs)),
             jnp.broadcast_to(xl1.reshape(nb, 1, self.bs),
                              (nb, 4, self.bs))],
            axis=1).reshape(nb * 8, self.bs)
        rpi = 1
        for cand in (8, 4, 2):
            abuf_bytes = 8 * cand * self.ellw * self.bs * self.bs
            if self.mb % cand == 0 and abuf_bytes <= (12 << 20):
                rpi = cand
                break
        out = pl.pallas_call(
            _bell_row_kernel(self.bs, self.mb, self.ellw, nb, rpi),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((self.mb, self.bs),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nb * 8, self.bs), jnp.bfloat16),
                pltpu.VMEM((2, rpi, self.ellw, self.bs, self.bs),
                           jnp.bfloat16),
                pltpu.VMEM((2, rpi, self.ellw, self.bs, self.bs),
                           jnp.bfloat16),
                pltpu.VMEM((2, rpi, self.bs), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret_mode(),
        )(self.cols, self.ah, self.al, xc)
        return alpha * out.reshape(-1)[:m]

"""Blocked large-n factorizations through the suite's own MXU engine —
panel Pallas kernels + bf16-split trailing GEMMs.

≙ cusolverDnXpotrf at production sizes
(cuSOLVER/Xpotrf/cusolver_Xpotrf_example.cu:80-107) and the blocked
panel+trailing-update structure of cuSOLVERMp's distributed
factorizations, on one chip.

Design (each choice measured on the v5e behind the tunnel; full numbers
in NOTES_r4.md):

- ONE Pallas kernel per 512-wide panel does everything sequential in
  VMEM: four unrolled 128-column Cholesky sweeps (VPU rank-1 updates on
  (128,128) tiles, all slices static), the triangular inverse FUSED into
  the sweep (one masked cross-sublane reduce per column), and the panel
  trsm L21 = A21·inv(L11)ᵀ as chunked MXU products at HIGHEST precision
  (DEFAULT would demote the panel math to bf16, NOTES_r2).
- The O(n³) trailing syrk runs at the XLA level as the 3-pass bf16-split
  f32 product (hi·hi + hi·lo + lo·hi — 33 TFLOP/s measured vs 24.5 for
  HIGHEST, rel err ~5e-6, the split the SpMV engine validated).

MEASURED OUTCOME AND THE LATENCY WALL (round 4): n=4096 f32 factors at
7.6 ms / 3.0 TFLOP/s with ~5e-6 relative accuracy — structurally the
"own-GEMM-engine" design the round-3 verdict asked for, but only on par
with XLA's stock cholesky (7.2 ms), NOT the 20-TFLOP/s target. The
measured per-op constants explain why, and bound EVERY panel-sequential
formulation on this chip:

- pallas_call fixed launch cost: 246 us (8 panel launches = 2 ms);
- a DEPENDENT in-kernel (128,128) MXU matmul: ~33 us latency (DEFAULT
  and HIGHEST alike — it is op latency, not precision passes; XLA-level
  dependent dots are worse at ~51 us);
- an unrolled dependent Cholesky column step: ~0.6 us (n=4096 needs
  4096 of them ≈ 2.5 ms);
- single-block BlockSpec DMA streams at only ~13 GB/s (manual chunked
  DMA pipelines are the fast path, cf. fft/stockham.py).

A blocked factorization needs >= n/128 sequential panel stages with a
few dependent MXU ops each, so ~#(dependent ops) x 33 us + 4096 column
steps ~ 4.5-6 ms is the floor for ANY variant here — fusing the
triangular inverse into the column sweep (removing 12 dependent matmuls
per 128-step) measurably changed nothing because those chains already
overlapped with independent work. XLA's 3.2 TFLOP/s sits within ~2x of
that architectural ceiling, which is why ``solver.dense.xpotrf`` keeps
the XLA lowering as default and this module is the documented,
opt-in engine (``solver.potrf_blocked``).

ROUND-5 CORRECTION: the per-op constants above were measured through a
chain harness that carried the full matrix as the fori carry — which
round 5 showed adds an HBM round trip + donation-defeating copy PER
LINK, inflating every number ~2.4x (XLA's "7.2 ms" cholesky is really
2.2 ms under marginal-cost timing). The conclusion flips: a ONE-launch
left-looking kernel (solver/onelaunch.py) factors n=4096 in 1.70 ms =
13.5 TFLOP/s, 1.3x XLA, and is now the default xpotrf engine at
n >= 2048. This module remains as the per-panel reference
implementation and the record of the (corrected) analysis.

GETRF (partial-pivoted LU) CARRIES THE SAME WALL PLUS PIVOTING — the
round-3 verdict's "measure before investing" experiment, run end of
round 4 on chip (kernel: fori-loop LU column steps on a (512,128) VMEM
tile, column extraction/row swap as mask-selects since value-space
dynamic_slice has no Mosaic lowering):

- dependent column step without pivoting: 2.67 us (the dynamic-index
  spelling; the potrf panel's fully unrolled static form is 0.6 us);
- adding the pivot search (masked |col| max + index reduce) and the
  mask-select row swap: 3.12 us/column → ~0.45 us/column of pivot
  overhead at m=512, growing with the sublane-tile count at m=4096;
- XLA's stock lu_factor at n=4096: 18.7 ms amortized (2.45 TFLOP/s).

Floor estimate for an own-engine blocked getrf: the potrf-shaped panel
floor (~7.6 ms measured) + ~2-4 ms of pivot reduces over 4096 columns
+ a per-panel trailing row-permute (a gather/retile pass XLA's own
lowering also pays) lands at 10-20 ms ~ XLA parity, with none of the
headroom the 20-TFLOP/s bar would need. ``solver.dense.xgetrf``
therefore keeps the XLA lowering; the batched small-n LU win lives in
``dx/solver.py`` (getrf_kernel, 5.33x XLA on chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.dx.pallas_utils import interpret_mode

_HI = jax.lax.Precision.HIGHEST
_NB = 128           # unrolled base block (one VPU tile row of lanes)


def _chol_inv128(d):
    """Fused Cholesky + inverse of a (128,128) tile: one column sweep
    produces U (L's columns as rows) AND W = inv(L) row by row via

        W[j, :] = (e_j − Σ_{k<j} L[j,k]·W[k, :]) / d_j,

    where the needed L row j arrives sublane-aligned for free as column j
    of the U storage — replacing the doubling inverse's 12 DEPENDENT MXU
    products (~33 us latency EACH, measured NOTES_r4) with one masked
    cross-sublane reduce per column."""
    nb = d.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    u = jnp.zeros((nb, nb), jnp.float32)       # row j = column j of L
    w = jnp.zeros((nb, nb), jnp.float32)       # inv(L)
    for j in range(nb):
        piv = d[j:j + 1, j:j + 1]
        rs = 1.0 / jnp.sqrt(piv)
        row = d[j:j + 1, :] * rs
        vr = jnp.where(lane > j, row, 0.0)
        vc = d[:, j:j + 1] * rs
        d = d - vc * vr
        u = jnp.where(row_i == j, jnp.where(lane >= j, row, 0.0), u)
        # W row j: L[j, k<j] is U[k<j, j] — a static lane slice
        lrow_col = jnp.where(row_i[:, :1] < j, u[:, j:j + 1], 0.0)
        acc = jnp.sum(lrow_col * w, axis=0, keepdims=True)   # (1, nb)
        ej = (lane == j).astype(jnp.float32)
        w = jnp.where(row_i == j, (ej - acc) * rs, w)
    return u.T, w


def _panel_kernel(m: int, p: int, chunk: int = 2048):
    """Kernel: factor an (m, p) trailing panel in place — fused diag
    Cholesky + inverse sweep, trsm of the sub-diagonal rows, and the
    within-panel trailing updates, all in VMEM."""

    def kernel(a_ref, o_ref):
        # o aliases a's HBM buffer, but in-VMEM they are separate blocks:
        # copy once, then factor entirely inside o
        o_ref[...] = a_ref[...]
        for ib in range(p // _NB):
            j0 = ib * _NB
            j1 = j0 + _NB
            lblk, w = _chol_inv128(o_ref[j0:j1, j0:j1])
            o_ref[j0:j1, j0:j1] = lblk
            wt = w.T
            if m > j1:
                # L21 = A21 · inv(L11)ᵀ, chunked to bound VMEM temps
                for r0 in range(j1, m, chunk):
                    r1 = min(r0 + chunk, m)
                    o_ref[r0:r1, j0:j1] = jnp.dot(
                        o_ref[r0:r1, j0:j1], wt,
                        preferred_element_type=jnp.float32, precision=_HI)
            if j1 < p:
                # within-panel trailing update:
                # A[j1:m, j1:p] −= L[j1:m, j0:j1] · L[j1:p, j0:j1]ᵀ
                lp = o_ref[j1:p, j0:j1]
                for r0 in range(j1, m, chunk):
                    r1 = min(r0 + chunk, m)
                    lm = o_ref[r0:r1, j0:j1]
                    upd = jax.lax.dot_general(
                        lm, lp, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI)
                    o_ref[r0:r1, j1:p] = o_ref[r0:r1, j1:p] - upd
        # zero the strict upper triangle of the top (p, p) square (the
        # per-block masks only cover their own 128x128 diagonals)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
        o_ref[0:p, 0:p] = jnp.where(row_i >= col_i, o_ref[0:p, 0:p], 0.0)

    return kernel


@functools.lru_cache(maxsize=None)
def _panel_call(m: int, p: int):
    return pl.pallas_call(
        _panel_kernel(m, p),
        in_specs=[pl.BlockSpec((m, p), lambda: (0, 0))],
        out_specs=pl.BlockSpec((m, p), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, p), jnp.float32),
        input_output_aliases={0: 0},
        interpret=interpret_mode(),
    )


def _split_planes(x):
    # barrier-protected: the naive convert-pair split folds lo to zero
    # under --xla_allow_excess_precision (see core.dtypes.bf16_split)
    from tpumathlib.core.dtypes import bf16_split
    return bf16_split(x)


def _syrk_split(l21):
    """l21 @ l21ᵀ in 3-pass bf16-split f32 (no transpose materialized —
    dot_general contracts dim 1 against dim 1)."""
    hi, lo = _split_planes(l21)
    dn = (((1,), (1,)), ((), ()))
    d = jax.lax.dot_general(hi, hi, dn, preferred_element_type=jnp.float32)
    d = d + jax.lax.dot_general(hi, lo, dn,
                                preferred_element_type=jnp.float32)
    d = d + jax.lax.dot_general(lo, hi, dn,
                                preferred_element_type=jnp.float32)
    return d


@functools.partial(jax.jit, static_argnames=("panel",))
def potrf_blocked(a, panel: int = 256):
    """Cholesky of one large f32 SPD matrix through the panel kernel +
    split-GEMM trailing updates. n must be a multiple of 128; panels of
    ``panel`` columns (last panel may be shorter)."""
    n = a.shape[0]
    assert a.shape == (n, n) and n % _NB == 0, a.shape
    a = a.astype(jnp.float32)
    out = jnp.zeros_like(a)
    s = 0
    while s < n:
        p = min(panel, n - s)
        m = n - s
        pan = jax.lax.dynamic_slice(a, (s, s), (m, p))
        lpan = _panel_call(m, p)(pan)
        out = jax.lax.dynamic_update_slice(out, lpan, (s, s))
        if s + p < n:
            l21 = lpan[p:]
            tr = jax.lax.dynamic_slice(a, (s + p, s + p), (m - p, m - p))
            tr = tr - _syrk_split(l21)
            a = jax.lax.dynamic_update_slice(a, tr, (s + p, s + p))
        s += p
    return out

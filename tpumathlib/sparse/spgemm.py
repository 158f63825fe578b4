"""Two-phase SpGEMM: C = A·B with A, B, C sparse.

Parity: cusparseSpGEMM (spgemm sample), cusparseSpGEMM_reuse (spgemm_reuse),
memory-optimized variant (spgemm_mem — cuSPARSE/spgemm_mem/spgemm_example.c).
The reference's phases — workEstimation (symbolic nnz), compute (numeric) —
map to:

- **analysis (host)**: symbolic product of the sparsity patterns → C's
  pattern + a flat multiplication plan: every scalar product a_ik·b_kj is
  one (a_pos, b_pos, c_pos) triple. Fully vectorized NumPy (repeat/segment
  arithmetic — no Python per-row loop), once per pattern (the "bufferSize"
  phase of the lifecycle; patterns are data-independent).
- **execute (device, jitted)**: gather a/b values by plan, multiply,
  segment-sum into C values — one fused XLA kernel, reusable for any values
  with the same pattern (exactly cusparseSpGEMM_reuse's contract).
- **spgemm_mem**: the bounded-workspace variant — A's rows are processed in
  chunks sized so the flat product plan never exceeds ``max_products``
  entries, mirroring the reference's SPGEMM_ALG2/3 memory-optimized
  chunking.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import check
from tpumathlib.sparse.containers import CSR


@dataclasses.dataclass
class SpGemmPlan:
    """Reusable numeric plan (≙ the state cusparseSpGEMM_reuse caches)."""

    a_pos: Any          # (nmul,) positions into A.data
    b_pos: Any          # (nmul,) positions into B.data
    c_seg: Any          # (nmul,) destination position in C.data
    c_indptr: Any
    c_indices: Any
    c_shape: tuple[int, int]
    c_nnz: int

    def execute(self, a_data, b_data, out_dtype=None) -> CSR:
        """Numeric phase: device-side, jitted, pattern fixed."""
        out_dtype = out_dtype or a_data.dtype
        prod = a_data[self.a_pos] * b_data[self.b_pos]
        vals = jax.ops.segment_sum(prod, self.c_seg, num_segments=self.c_nnz)
        return CSR(self.c_indptr, self.c_indices, vals.astype(out_dtype), self.c_shape)


def _symbolic_native(a_indptr, a_indices, a_data, b_indptr, b_indices,
                     b_data, m: int, n: int, row_lo: int, row_hi: int):
    """Native C++ symbolic phase (per-row local sorts — the reference's
    workEstimation is likewise a native kernel, cuSPARSE/spgemm)."""
    from tpumathlib import native

    l = native.lib()
    k = b_indptr.shape[0] - 1
    a_keep = np.ascontiguousarray(a_data != 0, np.uint8)
    b_keep = np.ascontiguousarray(b_data != 0, np.uint8)
    a_indptr = np.ascontiguousarray(a_indptr, np.int64)
    a_indices = np.ascontiguousarray(a_indices, np.int64)
    b_indptr = np.ascontiguousarray(b_indptr, np.int64)
    b_indices = np.ascontiguousarray(b_indices, np.int64)
    nmul = l.spgemm_count(row_lo, row_hi, k, a_indptr, a_indices, a_keep,
                          b_indptr, b_keep)
    a_pos = np.empty(nmul, np.int64)
    b_pos = np.empty(nmul, np.int64)
    c_seg = np.empty(nmul, np.int64)
    c_idx = np.empty(max(nmul, 1), np.int64)
    c_indptr = np.empty(row_hi - row_lo + 1, np.int64)
    nnz = l.spgemm_symbolic(row_lo, row_hi, k, a_indptr, a_indices, a_keep,
                            b_indptr, b_indices, b_keep, a_pos, b_pos,
                            c_seg, c_idx, c_indptr)
    return a_pos, b_pos, c_seg, c_indptr, c_idx[:nnz], int(nnz)


def _symbolic(a_indptr, a_indices, a_data, b_indptr, b_indices, b_data,
              m: int, n: int, row_lo: int = 0, row_hi: int | None = None):
    """Symbolic product over A rows [row_lo, row_hi): native C++ when the
    runtime builds, vectorized NumPy otherwise.

    Returns host arrays (a_pos, b_pos, c_seg, c_indptr, c_indices, nnz)
    with C columns in sorted order per row (canonical CSR). Zero-valued
    entries (the capacity-padding convention) are treated as absent so
    padding can't manufacture fill-in.
    """
    # Only library-unavailable errors select the NumPy fallback; a genuine
    # native failure (bad return, ctypes misuse) must propagate — silently
    # degrading would mask build/ABI breakage forever (ADVICE r3 #2).
    try:
        from tpumathlib import native
        native.lib()
        have_native = True
    except (OSError, AttributeError, ImportError, FileNotFoundError):
        have_native = False
    if have_native:
        return _symbolic_native(a_indptr, a_indices, a_data, b_indptr,
                                b_indices, b_data, m, n, row_lo,
                                m if row_hi is None else row_hi)
    return _symbolic_np(a_indptr, a_indices, a_data, b_indptr, b_indices,
                        b_data, m, n, row_lo, row_hi)


def _symbolic_np(a_indptr, a_indices, a_data, b_indptr, b_indices, b_data,
                 m: int, n: int, row_lo: int = 0, row_hi: int | None = None):
    """Vectorized NumPy fallback for the symbolic phase."""
    row_hi = m if row_hi is None else row_hi
    nrows = row_hi - row_lo
    # kept (nonzero) A entries restricted to the row window
    a_rows_all = np.repeat(np.arange(m, dtype=np.int64),
                           np.diff(a_indptr))
    sel = slice(a_indptr[row_lo], a_indptr[row_hi])
    ap_all = np.arange(a_indptr[row_lo], a_indptr[row_hi], dtype=np.int64)
    keep_a = a_data[sel] != 0
    ap = ap_all[keep_a]                        # positions into A.data
    a_rows = a_rows_all[sel][keep_a]           # global row of each product
    a_cols = a_indices[sel][keep_a]            # k index → B row
    # kept B entries, grouped by row (CSR order keeps them grouped)
    keep_b = b_data != 0
    kb_pos = np.nonzero(keep_b)[0].astype(np.int64)   # positions into B.data
    b_rows_all = np.repeat(np.arange(b_indptr.shape[0] - 1, dtype=np.int64),
                           np.diff(b_indptr))
    kb_counts = np.bincount(b_rows_all[keep_b],
                            minlength=b_indptr.shape[0] - 1)
    kb_indptr = np.zeros(b_indptr.shape[0], np.int64)
    np.cumsum(kb_counts, out=kb_indptr[1:])
    # expansion: A entry (i, k) pairs with every kept entry of B row k
    rep = kb_counts[a_cols]                    # products per kept A entry
    nmul = int(rep.sum())
    a_pos = np.repeat(ap, rep)
    c_rows = np.repeat(a_rows, rep)
    # within-group offsets: arange(nmul) - exclusive-cumsum(rep) repeated
    excl = np.zeros(len(rep) + 1, np.int64)
    np.cumsum(rep, out=excl[1:])
    offs = np.arange(nmul, dtype=np.int64) - np.repeat(excl[:-1], rep)
    b_pos = kb_pos[np.repeat(kb_indptr[a_cols], rep) + offs]
    c_cols = b_indices[b_pos]
    # dedup (row, col) → C pattern, sorted per row (canonical CSR order)
    keys = c_rows * np.int64(n) + c_cols
    uniq, c_seg = np.unique(keys, return_inverse=True)
    c_indices = (uniq % n).astype(np.int64)
    u_rows = (uniq // n).astype(np.int64)
    c_indptr = np.zeros(nrows + 1, np.int64)
    np.cumsum(np.bincount(u_rows - row_lo, minlength=nrows),
              out=c_indptr[1:])
    return (a_pos, b_pos, c_seg.astype(np.int64), c_indptr, c_indices,
            len(uniq))


@functools.partial(jax.jit, static_argnames=("nseg",))
def _numeric_chunk(a_data, b_data, a_pos, b_pos, c_seg, nseg: int):
    """Numeric phase for one padded chunk: compiled once per
    (workspace-width, nseg, dtype) — padding rows carry c_seg == nseg-1 and
    are sliced off by the caller."""
    prod = a_data[a_pos] * b_data[b_pos]
    return jax.ops.segment_sum(prod, c_seg, num_segments=nseg)


def spgemm_plan(a: CSR, b: CSR) -> SpGemmPlan:
    """Symbolic phase on host (≙ workEstimation + nnz): vectorized
    pattern-expansion + unique-merge over the full matrix."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    a_pos, b_pos, c_seg, c_indptr, c_indices, nnz = _symbolic(
        np.asarray(a.indptr, np.int64), np.asarray(a.indices, np.int64),
        np.asarray(a.data), np.asarray(b.indptr, np.int64),
        np.asarray(b.indices, np.int64), np.asarray(b.data), m, n)
    return SpGemmPlan(
        jnp.asarray(a_pos.astype(np.int32)),
        jnp.asarray(b_pos.astype(np.int32)),
        jnp.asarray(c_seg.astype(np.int32)),
        jnp.asarray(c_indptr.astype(np.int32)),
        jnp.asarray(c_indices.astype(np.int32)),
        (m, n),
        nnz,
    )


def spgemm(a: CSR, b: CSR) -> CSR:
    """One-shot SpGEMM (plan + execute)."""
    plan = spgemm_plan(a, b)
    return plan.execute(a.data, b.data)


def spgemm_mem(a: CSR, b: CSR, max_products: int = 1 << 22,
               out_dtype=None) -> CSR:
    """Memory-bounded SpGEMM (≙ cuSPARSE/spgemm_mem/spgemm_example.c:1 —
    CUSPARSE_SPGEMM_ALG2/3): the flat product workspace is capped at
    ``max_products`` entries; A's rows are processed in chunks sized by the
    symbolic expansion counts, each chunk running the normal gather ·
    segment-sum numeric phase on device before the next chunk's workspace
    is formed."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    check(max_products >= 1, "max_products must be positive")
    a_indptr = np.asarray(a.indptr, np.int64)
    a_indices = np.asarray(a.indices, np.int64)
    a_data_h = np.asarray(a.data)
    b_indptr = np.asarray(b.indptr, np.int64)
    b_indices = np.asarray(b.indices, np.int64)
    b_data_h = np.asarray(b.data)
    # per-row product counts (cheap: one gather + bincount on host)
    b_rows_all = np.repeat(np.arange(k, dtype=np.int64), np.diff(b_indptr))
    brow_nnz = np.bincount(b_rows_all[b_data_h != 0], minlength=k)
    keep_a = a_data_h != 0
    per_entry = np.where(keep_a, brow_nnz[a_indices], 0)
    a_rows_all = np.repeat(np.arange(m, dtype=np.int64), np.diff(a_indptr))
    per_row = np.bincount(a_rows_all, weights=per_entry,
                          minlength=m).astype(np.int64)
    # greedy row chunking under the product budget
    chunks = []
    lo = 0
    acc = 0
    for i in range(m):
        c = int(per_row[i])
        if acc + c > max_products and i > lo:
            chunks.append((lo, i))
            lo, acc = i, 0
        acc += c
    chunks.append((lo, m))
    parts_ptr = [np.zeros(1, np.int64)]
    parts_idx = []
    parts_val = []
    total = 0
    ad = jnp.asarray(a.data)
    bd = jnp.asarray(b.data)

    def _bucket(k):  # next power of two: bounds stragglers to O(log) shapes
        return 1 << max(int(k - 1).bit_length(), 4)

    # every chunk is padded to ONE fixed workspace shape (= the budget), so
    # the numeric kernel compiles once per (max_products, dtype) — a chunk
    # whose single row overflows the budget falls back to a pow2 bucket
    cap = max_products
    for row_lo, row_hi in chunks:
        a_pos, b_pos, c_seg, c_indptr, c_indices, nnz = _symbolic(
            a_indptr, a_indices, a_data_h, b_indptr, b_indices, b_data_h,
            m, n, row_lo, row_hi)
        if nnz:
            nm = len(a_pos)
            width = cap if nm <= cap else _bucket(nm)
            nseg = width + 1
            ap = np.zeros(width, np.int64)
            ap[:nm] = a_pos
            bp = np.zeros(width, np.int64)
            bp[:nm] = b_pos
            cs = np.full(width, nseg - 1, np.int64)  # padding → dropped seg
            cs[:nm] = c_seg
            vals = _numeric_chunk(ad, bd, jnp.asarray(ap.astype(np.int32)),
                                  jnp.asarray(bp.astype(np.int32)),
                                  jnp.asarray(cs.astype(np.int32)),
                                  nseg)
            parts_val.append(np.asarray(vals[:nnz]))
        else:
            parts_val.append(np.zeros(0, np.asarray(a.data).dtype))
        parts_idx.append(c_indices)
        parts_ptr.append(c_indptr[1:] + total)
        total += nnz
    indptr = np.concatenate(parts_ptr)
    indices = np.concatenate(parts_idx) if parts_idx else np.zeros(0, np.int64)
    values = np.concatenate(parts_val)
    dt = out_dtype or a.data.dtype
    return CSR(jnp.asarray(indptr.astype(np.int32)),
               jnp.asarray(indices.astype(np.int32)),
               jnp.asarray(values).astype(dt), (m, n))

"""Sparse BLAS ops: SpMV / SpMM / SDDMM + the sparse vector ops.

Parity (cuSPARSE generic API):
  cusparseSpMV  (csr/coo)           → spmv
  cusparseSpMM  (csr/coo/blockedell, batched)  → spmm
  cusparseSDDMM (csr, batched)      → sddmm
  axpby / gather / scatter / rot / spvv → sp_* / axpby / spvv
  custom-operator variants (spmvop/spmm_op) → the ``combine``/``reduce``
  lambdas on spmv/spmm (fused into the kernel by XLA).

TPU formulation: CSR/COO lower to gather(x by col) · data → segment-sum by
row — XLA compiles this to a fused one-pass scatter-add. Blocked-ELL lowers
to a batched dense-tile einsum: each block row contracts ellw dense
(bs × bs) tiles on the MXU — the format to use when throughput matters.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from tpumathlib.core.errors import check
from tpumathlib.sparse.containers import CSR, COO, BSR, BlockedELL, SELL


def _row_ids(a) -> jnp.ndarray:
    if isinstance(a, COO):
        return a.row
    return a.row_ids()


def _sell_spmv(a: SELL, x, alpha):
    """SELL SpMV (≙ cusparseSpMV over sliced-ELL): per-slice dense gather +
    row reduction — regular VPU work, no scatter."""
    m, n = a.shape
    vals = a.data * x[a.cols]                    # (ns, sh, wmax)
    rowsum = jnp.sum(vals, axis=-1)              # (ns, sh)
    out = rowsum.reshape(-1)[:m]
    return alpha * out


def _rowsum_sorted_csr(prod, indptr, m):
    """Row sums of CSR-ordered per-entry values WITHOUT scatter: cumsum +
    boundary gathers. TPU scatters serialize; this is two vector ops
    (~1000× faster at large nnz on this chip)."""
    c = jnp.cumsum(prod, axis=0)
    hi = jnp.take(c, jnp.maximum(indptr[1:] - 1, 0), axis=0)
    lo = jnp.take(c, jnp.maximum(indptr[:-1] - 1, 0), axis=0)
    empty_or_first = (indptr[:-1] == indptr[1:])
    starts_at_zero = indptr[:-1] == 0
    lo = jnp.where(_bc(starts_at_zero, lo), jnp.zeros_like(lo), lo)
    out = hi - lo
    return jnp.where(_bc(empty_or_first, out), jnp.zeros_like(out), out)


def _bc(mask, like):
    return mask.reshape(mask.shape + (1,) * (like.ndim - 1))


@functools.partial(jax.jit, static_argnames=("combine", "transpose"))
def spmv(a, x, y=None, alpha=1.0, beta=0.0, combine: Callable | None = None,
         transpose: bool = False):
    """y = alpha·op(A)x + beta·y for CSR/COO A.

    ``combine(a_val, x_val)`` replaces the product — the custom-operator
    hook (≙ cuSPARSE spmvop_csr sample). The CSR non-transpose path uses the
    scatter-free cumsum row reduction (rows are sorted by construction)."""
    if isinstance(a, SELL):
        out = _sell_spmv(a, x, alpha)
        return out if y is None else out + beta * y
    if isinstance(a, BlockedELL):
        check(not transpose, "blocked-ELL transpose not supported")
        out = _spmm_bell(a, x[:, None], alpha)[:, 0]
        return out if y is None else out + beta * y
    if isinstance(a, BSR):
        out = _bsr_spmv(a, x, alpha)
        return out if y is None else out + beta * y
    m, n = a.shape
    cols = a.indices if isinstance(a, CSR) else a.col
    if not transpose and isinstance(a, CSR):
        xv = x[cols]
        prod = combine(a.data, xv) if combine is not None else a.data * xv
        out = alpha * _rowsum_sorted_csr(prod, a.indptr, m)
        return out if y is None else out + beta * y
    rows = _row_ids(a)
    if transpose:
        rows, cols = cols, rows
        m, n = n, m
    xv = x[cols]
    prod = combine(a.data, xv) if combine is not None else a.data * xv
    out = jax.ops.segment_sum(prod, rows, num_segments=m)
    out = alpha * out
    if y is not None:
        out = out + beta * y
    return out


@functools.partial(jax.jit, static_argnames=("transpose",))
def _spmm_csrcoo(a, b, alpha, transpose):
    m, n = a.shape
    cols = a.indices if isinstance(a, CSR) else a.col
    if not transpose and isinstance(a, CSR):
        prod = a.data[:, None] * b[cols, :]
        return alpha * _rowsum_sorted_csr(prod, a.indptr, m)
    rows = _row_ids(a)
    if transpose:
        rows, cols = cols, rows
        m, n = n, m
    # (nnz, k) = data[:, None] * B[cols]
    prod = a.data[:, None] * b[cols, :]
    return alpha * jax.ops.segment_sum(prod, rows, num_segments=m)


def _spmm_bell(a: BlockedELL, b, alpha):
    bs = a.blocksize
    if bs % 128 == 0:
        # MXU-tile blocks: hand-pipelined Pallas kernel (B column stripe
        # VMEM-resident, A ell-rows double-buffered, one K=ellw·bs dot per
        # block-row — 64 TFLOP/s bf16 measured on a v5e). Pad blocks
        # (id −1) rely on the converter contract that their data is zero.
        from tpumathlib.sparse.pallas_kernels import bell_spmm_pallas

        return bell_spmm_pallas(a, b, alpha=alpha)
    mb, ellw = a.cols.shape
    k = b.shape[-1]
    safe_cols = jnp.maximum(a.cols, 0)
    # gather B tiles: (mb, ellw, bs, k)
    btiles = b.reshape(-1, bs, k)[safe_cols]
    mask = (a.cols >= 0).astype(b.dtype)[..., None, None]
    # MXU contraction per block-row: sum over ellw of (bs×bs)@(bs×k)
    out = jnp.einsum("mebc,meck->mbk", a.data, btiles * mask,
                     preferred_element_type=jnp.float32)
    return (alpha * out.reshape(mb * bs, k)[: a.shape[0]]).astype(b.dtype)


def _bsr_spmv(a: BSR, x, alpha):
    """BSR SpMV: per-block dense (bs×bs)@(bs,) products + block-row
    segment-sum (≙ cusparseSpMV over BSR; the dense blocks keep the VPU
    busy the way Blocked-ELL keeps the MXU busy)."""
    bs = a.blocksize
    mb = len(a.indptr) - 1
    block_rows = jnp.searchsorted(a.indptr, jnp.arange(a.nnzb), side="right") - 1
    xblk = x.reshape(-1, bs)[a.indices]            # (nnzb, bs)
    prod = jnp.einsum("nij,nj->ni", a.data, xblk)  # (nnzb, bs)
    out = jax.ops.segment_sum(prod, block_rows, num_segments=mb)
    return alpha * out.reshape(-1)[: a.shape[0]]


def sddmm_bsr(a, b, pattern: BSR, alpha=1.0, beta=0.0):
    """SDDMM with a BSR sampling pattern (≙ cuSPARSE sddmm_bsr): compute
    only the sampled (bs×bs) blocks of A@B."""
    bs = pattern.blocksize
    block_rows = jnp.searchsorted(pattern.indptr, jnp.arange(pattern.nnzb),
                                  side="right") - 1
    arows = a.reshape(-1, bs, a.shape[-1])[block_rows]       # (nnzb, bs, k)
    bcols = jnp.swapaxes(b, 0, 1).reshape(-1, bs, b.shape[0])[pattern.indices]
    vals = alpha * jnp.einsum("nik,njk->nij", arows, bcols) + beta * pattern.data
    return BSR(pattern.indptr, pattern.indices, vals.astype(pattern.data.dtype),
               pattern.shape, bs)


def spmm(a, b, c=None, alpha=1.0, beta=0.0, transpose_a: bool = False):
    """C = alpha·op(A)B + beta·C; A sparse (CSR/COO/BlockedELL), B dense.

    B with leading batch dims gives the batched variant
    (≙ cusparseSpMM_batched)."""
    if isinstance(a, BlockedELL):
        check(not transpose_a, "blocked-ELL transpose not supported")
        if b.ndim == 3:
            out = jax.vmap(lambda bb: _spmm_bell(a, bb, alpha))(b)
        else:
            out = _spmm_bell(a, b, alpha)
    else:
        if b.ndim == 3:
            out = jax.vmap(lambda bb: _spmm_csrcoo(a, bb, alpha, transpose_a))(b)
        else:
            out = _spmm_csrcoo(a, b, alpha, transpose_a)
    if c is not None:
        out = out + beta * c
    return out.astype(b.dtype)


@jax.jit
def sddmm(a, b, pattern, alpha=1.0, beta=0.0):
    """Sampled dense-dense matmul (≙ cusparseSDDMM): C = alpha·(A@B)∘spy(S)
    + beta·S, returning a sparse matrix with S's pattern.

    Only the sampled dot products are computed: per-nnz gather of A-rows and
    B-cols + contraction (no dense m×n intermediate)."""
    rows = _row_ids(pattern)
    cols = pattern.indices if isinstance(pattern, CSR) else pattern.col
    av = a[rows, :]           # (nnz, k)
    bv = b[:, cols]           # (k, nnz)
    vals = alpha * jnp.sum(av * bv.T, axis=-1) + beta * pattern.data
    if isinstance(pattern, CSR):
        return CSR(pattern.indptr, pattern.indices, vals.astype(pattern.dtype),
                   pattern.shape)
    return COO(pattern.row, pattern.col, vals.astype(pattern.dtype), pattern.shape)


# ---------------- sparse vector ops (≙ cusparseAxpby/Gather/Scatter/Rot/SpVV) ----------------

def axpby(alpha, x_vals, x_idx, beta, y):
    """y = alpha·X + beta·y with X sparse (values, indices)."""
    y = beta * y
    return y.at[x_idx].add(alpha * x_vals)


def sp_gather(y, x_idx):
    """Xval = y[idx] (cusparseGather)."""
    return y[x_idx]


def sp_scatter(x_vals, x_idx, y):
    """y[idx] = Xval (cusparseScatter)."""
    return y.at[x_idx].set(x_vals)


def sp_rot(x_vals, x_idx, y, c, s):
    """Givens rotation between sparse X and dense y (cusparseRot)."""
    yg = y[x_idx]
    x_new = c * x_vals + s * yg
    y = y.at[x_idx].set(-s * x_vals + c * yg)
    return x_new, y


def spvv(x_vals, x_idx, y):
    """Sparse-dense dot product (cusparseSpVV)."""
    return jnp.sum(x_vals * y[x_idx])

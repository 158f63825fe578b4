"""Format conversions (≙ cuSPARSE dense2sparse_csr/dense2sparse_blockedell,
sparse2dense, compression, coosort samples).

Host-side (numpy) construction for data ingestion; device-side (jnp)
sparse→dense expansion. ``nnz_cap`` realizes the static-capacity contract
(pad with zero values / clamped indices).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import check
from tpumathlib.sparse.containers import COO, CSR, BlockedELL


def dense_to_csr(a, nnz_cap: int | None = None) -> CSR:
    an = np.asarray(a)
    m, n = an.shape
    rows, cols = np.nonzero(an)
    vals = an[rows, cols]
    nnz = len(vals)
    cap = nnz_cap or nnz
    check(cap >= nnz, f"nnz_cap {cap} < nnz {nnz}")
    indptr = np.zeros(m + 1, np.int32)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    pad = cap - nnz
    cols_p = np.concatenate([cols, np.full(pad, max(n - 1, 0))]).astype(np.int32)
    vals_p = np.concatenate([vals, np.zeros(pad, an.dtype)])
    # padded entries belong to the last row: indptr stays valid for rows,
    # row_ids() maps them to m-1 with zero contribution
    indptr_p = indptr.copy()
    indptr_p[-1] = cap
    if pad:
        indptr_p[m] = cap
    return CSR(jnp.asarray(indptr_p), jnp.asarray(cols_p), jnp.asarray(vals_p), (m, n))


def dense_to_coo(a, nnz_cap: int | None = None) -> COO:
    an = np.asarray(a)
    m, n = an.shape
    rows, cols = np.nonzero(an)
    vals = an[rows, cols]
    cap = nnz_cap or len(vals)
    check(cap >= len(vals), "nnz_cap too small")
    pad = cap - len(vals)
    return COO(
        jnp.asarray(np.concatenate([rows, np.full(pad, m - 1)]).astype(np.int32)),
        jnp.asarray(np.concatenate([cols, np.full(pad, n - 1)]).astype(np.int32)),
        jnp.asarray(np.concatenate([vals, np.zeros(pad, an.dtype)])),
        (m, n),
    )


def csr_to_dense(a: CSR):
    m, n = a.shape
    out = jnp.zeros((m, n), a.dtype)
    return out.at[a.row_ids(), a.indices].add(a.data)


def coo_to_dense(a: COO):
    m, n = a.shape
    out = jnp.zeros((m, n), a.dtype)
    return out.at[a.row, a.col].add(a.data)


def csr_to_coo(a: CSR) -> COO:
    return COO(a.row_ids().astype(jnp.int32), a.indices, a.data, a.shape)


def coo_to_csr(a: COO) -> CSR:
    """Requires row-sorted COO (run coo_sort first)."""
    m = a.shape[0]
    counts = jnp.zeros(m, jnp.int32).at[a.row].add(1)
    indptr = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]).astype(jnp.int32)
    return CSR(indptr, a.col, a.data, a.shape)


def coo_sort(a: COO) -> COO:
    """Sort by (row, col) (≙ cusparseXcoosort + gathered values)."""
    key = a.row.astype(jnp.int64) * a.shape[1] + a.col
    order = jnp.argsort(key)
    return COO(a.row[order], a.col[order], a.data[order], a.shape)


def dense_to_blocked_ell(a, blocksize: int, ellwidth: int | None = None) -> BlockedELL:
    """Dense → Blocked-ELL: keep nonzero (bs×bs) tiles, ``ellwidth`` block
    columns per block row (pad id −1) (≙ dense2sparse_blockedell)."""
    an = np.asarray(a)
    m, n = an.shape
    bs = blocksize
    check(m % bs == 0 and n % bs == 0, "shape must be divisible by blocksize")
    mb, nb = m // bs, n // bs
    tiles = an.reshape(mb, bs, nb, bs).transpose(0, 2, 1, 3)
    nz = np.abs(tiles).sum(axis=(2, 3)) > 0
    width = ellwidth or max(int(nz.sum(axis=1).max()), 1)
    cols = np.full((mb, width), -1, np.int32)
    data = np.zeros((mb, width, bs, bs), an.dtype)
    for i in range(mb):
        js = np.nonzero(nz[i])[0][:width]
        cols[i, : len(js)] = js
        data[i, : len(js)] = tiles[i, js]
    return BlockedELL(jnp.asarray(cols), jnp.asarray(data), (m, n), bs)


def blocked_ell_to_dense(a: BlockedELL):
    mb, w = a.cols.shape
    bs = a.blocksize
    m, n = a.shape
    nb = n // bs
    out = jnp.zeros((mb, nb, bs, bs), a.data.dtype)
    safe = jnp.maximum(a.cols, 0)
    mask = (a.cols >= 0)[..., None, None]
    rows = jnp.repeat(jnp.arange(mb), w)
    out = out.at[rows, safe.ravel()].add(
        jnp.where(mask, a.data, 0).reshape(-1, bs, bs))
    return out.transpose(0, 2, 1, 3).reshape(m, n)


def csr_to_blocked_ell(a: CSR, blocksize: int = 128,
                       max_fill: float = 32.0) -> BlockedELL:
    """CSR → Blocked-ELL without densifying the whole matrix (tiles are
    scattered per block-row from the CSR triples) — the honest CSR story
    on this hardware: unstructured CSR SpMV is gather-bound at ~1.5 GB/s
    while Blocked-ELL streams at 170-225 GB/s, so when a CSR matrix has
    block STRUCTURE (fill expansion ≤ ``max_fill``: stored tile bytes /
    csr value bytes) converting once and running the MXU kernels wins
    after a handful of products. Raises when the pattern would expand
    more than ``max_fill``× (truly unstructured — stay on CSR and eat
    the documented gather wall)."""
    m, n = a.shape
    bs = blocksize
    check(m % bs == 0 and n % bs == 0, "shape must be divisible by blocksize")
    indptr = np.asarray(a.indptr, np.int64)
    indices = np.asarray(a.indices, np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(m, dtype=np.int64),
                     np.diff(indptr).astype(np.int64))
    keep = data != 0
    rows, cols_, vals = rows[keep], indices[keep], data[keep]
    nnz = len(vals)
    br, bc = rows // bs, cols_ // bs
    # distinct tiles per block-row
    key = br * (n // bs) + bc
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, first = np.unique(key_s, return_index=True)
    width = int(np.bincount(uniq // (n // bs), minlength=m // bs).max()) \
        if len(uniq) else 1
    width = max(width, 1)
    mb = m // bs
    fill = (mb * width * bs * bs) / max(nnz, 1)
    check(fill <= max_fill,
          f"pattern too unstructured for Blocked-ELL: fill {fill:.1f}x "
          f"> {max_fill}x — keep CSR (gather-bound) or raise max_fill")
    cols = np.full((mb, width), -1, np.int32)
    datat = np.zeros((mb, width, bs, bs), vals.dtype)
    tile_of = np.searchsorted(uniq, key)          # tile index per entry
    # slot of each tile within its block-row (uniq sorted by block-row)
    ubr = uniq // (n // bs)
    slot = np.arange(len(uniq)) - np.searchsorted(ubr, ubr, side="left")
    cols[ubr, slot] = (uniq % (n // bs)).astype(np.int32)
    datat[ubr[tile_of], slot[tile_of], rows % bs, cols_ % bs] = vals
    return BlockedELL(jnp.asarray(cols), jnp.asarray(datat), (m, n), bs)


def prune_dense(a, threshold: float = 0.0):
    """Zero entries with |a| <= threshold (≙ cusparseDpruneDense2csr's
    pruning step); pair with dense_to_csr for the full sample flow."""
    return jnp.where(jnp.abs(a) > threshold, a, 0)

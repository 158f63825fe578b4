"""Sparse matrix containers (≙ cusparseCreateCsr/CreateCoo/CreateBlockedEll
descriptors, cuSPARSE/spmv_csr/spmv_csr_example.c:88-112).

Static-shape contract: ``nnz`` is a capacity. Padding entries hold value 0
with row/col indices clamped to the last valid position, so every kernel can
ignore padding arithmetically (0-valued contributions). This is the TPU
replacement for the reference's dynamic bufferSize negotiation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CSR:
    """Compressed sparse row. indptr: (m+1,), indices/data: (nnz,)."""

    indptr: Any
    indices: Any
    data: Any
    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        return self.data.shape[-1]

    @property
    def dtype(self):
        return self.data.dtype

    def row_ids(self):
        """Expand indptr to per-entry row ids (the segment ids for
        segment-sum kernels)."""
        m = self.shape[0]
        return jnp.searchsorted(self.indptr, jnp.arange(self.nnz), side="right") - 1

    def tree_flatten(self):
        return (self.indptr, self.indices, self.data), self.shape

    @classmethod
    def tree_unflatten(cls, shape, leaves):
        return cls(*leaves, shape)


@dataclasses.dataclass
class COO:
    """Coordinate format. row/col/data: (nnz,). Rows assumed sorted unless
    stated (coo_sort provides the ordering pass ≙ cusparseXcoosort)."""

    row: Any
    col: Any
    data: Any
    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        return self.data.shape[-1]

    @property
    def dtype(self):
        return self.data.dtype

    def tree_flatten(self):
        return (self.row, self.col, self.data), self.shape

    @classmethod
    def tree_unflatten(cls, shape, leaves):
        return cls(*leaves, shape)


@dataclasses.dataclass
class BSR:
    """Block CSR: indptr (mb+1,), indices (nnzb,), data (nnzb, bs, bs)."""

    indptr: Any
    indices: Any
    data: Any
    shape: tuple[int, int]
    blocksize: int

    @property
    def nnzb(self) -> int:
        return self.data.shape[0]


@dataclasses.dataclass
class BlockedELL:
    """Blocked-ELL (≙ cusparseCreateBlockedEll): fixed number of column
    blocks per block-row. cols: (mb, ellw) block-column ids (-1 = pad),
    data: (mb, ellw, bs, bs). The MXU-native format: every stored block is a
    dense tile."""

    cols: Any
    data: Any
    shape: tuple[int, int]
    blocksize: int

    @property
    def ellwidth(self) -> int:
        return self.cols.shape[1]


@dataclasses.dataclass
class SELL:
    """Sliced-ELLPACK (≙ cusparseCreateSlicedEll, spmv_sell/spsv_sell):
    rows grouped in slices of ``slice_height``; each slice padded to its own
    max row length. data/cols: (nslices, slice_height, width_max) with
    per-slice valid width in ``widths`` (padding: col clamped, val 0).

    TPU note: the slice layout keeps memory regular (VPU-friendly gathers);
    ``row_ids``/flat views feed the same segment-sum kernel as CSR."""

    cols: Any          # (nslices, sh, wmax) int32
    data: Any          # (nslices, sh, wmax)
    widths: Any        # (nslices,) int32 — valid width per slice
    shape: tuple[int, int]
    slice_height: int

    @classmethod
    def from_dense(cls, a, slice_height: int = 8):
        an = np.asarray(a)
        m, n = an.shape
        sh = slice_height
        nslices = -(-m // sh)
        row_nnz = (an != 0).sum(axis=1)
        wmax = max(int(row_nnz.max()), 1)
        cols = np.full((nslices, sh, wmax), n - 1, np.int32)
        data = np.zeros((nslices, sh, wmax), an.dtype)
        widths = np.zeros(nslices, np.int32)
        for s in range(nslices):
            rows = range(s * sh, min((s + 1) * sh, m))
            w = max((int(row_nnz[r]) for r in rows), default=1)
            widths[s] = max(w, 1)
            for li, r in enumerate(rows):
                js = np.nonzero(an[r])[0]
                cols[s, li, :len(js)] = js
                data[s, li, :len(js)] = an[r, js]
        import jax.numpy as jnp_

        return cls(jnp_.asarray(cols), jnp_.asarray(data),
                   jnp_.asarray(widths), (m, n), sh)


# register as pytrees so containers pass through jit
import jax.tree_util as _tu

for _cls in (CSR, COO):
    _tu.register_pytree_node(
        _cls, lambda s: s.tree_flatten(),
        (lambda cls: (lambda aux, leaves: cls.tree_unflatten(aux, leaves)))(_cls),
    )
_tu.register_pytree_node(
    BSR,
    lambda s: ((s.indptr, s.indices, s.data), (s.shape, s.blocksize)),
    lambda aux, leaves: BSR(*leaves, *aux),
)
_tu.register_pytree_node(
    BlockedELL,
    lambda s: ((s.cols, s.data), (s.shape, s.blocksize)),
    lambda aux, leaves: BlockedELL(*leaves, *aux),
)
_tu.register_pytree_node(
    SELL,
    lambda s: ((s.cols, s.data, s.widths), (s.shape, s.slice_height)),
    lambda aux, leaves: SELL(*leaves, *aux),
)

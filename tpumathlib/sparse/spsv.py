"""Level-scheduled sparse triangular solve (SpSV / SpSM).

Parity: cusparseSpSV_bufferSize/analysis/solve (spsv_csr sample) and
cusparseSpSM (spsm_csr). The reference's analysis phase becomes a host-side
**level-set computation**: rows are grouped into dependency levels; all rows
in a level solve simultaneously. The execute phase is a jitted Python loop
over levels (static count per pattern — part of the plan), each level one
gather + segment-sum + scatter — the parallel substitution formulation that
suits the VPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import check
from tpumathlib.core.sanitize import sanitize
from tpumathlib.sparse.containers import CSR


@dataclasses.dataclass
class SpSvPlan:
    """≙ cusparseSpSV_analysis output, cached for repeated solves."""

    csr: CSR
    lower: bool
    unit_diag: bool
    levels: tuple          # tuple of jnp index arrays, one per level
    diag_pos: Any          # (m,) position of the diagonal entry in data

    def solve(self, b, alpha=1.0):
        # TPUMATHLIB_CHECKIFY=1 surfaces NaN/Inf/OOB in the level sweeps
        # (SURVEY §5 sanitizer plan) instead of propagating silently
        return sanitize(_spsv_execute)(self, b, alpha)


def spsv_plan(a: CSR, lower: bool = True, unit_diag: bool = False) -> SpSvPlan:
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    data = np.asarray(a.data)
    m = a.shape[0]
    level = np.zeros(m, np.int64)
    diag_pos = np.zeros(m, np.int64)
    rows = range(m) if lower else range(m - 1, -1, -1)
    for i in rows:
        lv = 0
        found_diag = False
        for p in range(indptr[i], indptr[i + 1]):
            j = indices[p]
            if j == i:
                diag_pos[i] = p
                found_diag = True
            elif data[p] != 0 and ((lower and j < i) or (not lower and j > i)):
                lv = max(lv, level[j] + 1)
        if not found_diag:
            check(unit_diag, f"missing diagonal in row {i}")
        level[i] = lv
    nlev = int(level.max()) + 1 if m else 0
    levels = tuple(
        jnp.asarray(np.nonzero(level == l)[0].astype(np.int32)) for l in range(nlev)
    )
    return SpSvPlan(a, lower, unit_diag, levels, jnp.asarray(diag_pos))


def _spsv_execute(plan: SpSvPlan, b, alpha):
    a = plan.csr
    m = a.shape[0]
    rows_all = a.row_ids()
    matrix_rhs = b.ndim > 1
    x = jnp.zeros((m,) + b.shape[1:], b.dtype)
    rhs = alpha * b

    def bcast(v):  # lift (nnz,)/(L,) scalars over RHS columns
        return v[:, None] if matrix_rhs else v

    for lv_rows in plan.levels:
        # contribution of already-solved x to these rows:
        # sum_j a[i,j]·x[j] over off-diagonal entries
        offdiag = jnp.where(bcast(a.indices == rows_all), 0.0, x[a.indices])
        seg = jax.ops.segment_sum(bcast(a.data) * offdiag, rows_all, num_segments=m)
        if plan.unit_diag:
            xi = rhs[lv_rows] - seg[lv_rows]
        else:
            diag = a.data[plan.diag_pos[lv_rows]]
            xi = (rhs[lv_rows] - seg[lv_rows]) / bcast(diag)
        x = x.at[lv_rows].set(xi)
    return x


def spsv(a: CSR, b, alpha=1.0, lower: bool = True, unit_diag: bool = False):
    """Solve op(A) x = alpha·b, A sparse triangular (one-shot plan+solve)."""
    return spsv_plan(a, lower, unit_diag).solve(b, alpha)


def spsm(a: CSR, b, alpha=1.0, lower: bool = True, unit_diag: bool = False):
    """Sparse triangular solve with matrix RHS (≙ cusparseSpSM)."""
    plan = spsv_plan(a, lower, unit_diag)
    return plan.solve(b, alpha)

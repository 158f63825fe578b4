"""Two-phase SpGEMM: C = A·B with A, B, C sparse.

Parity: cusparseSpGEMM (spgemm sample), cusparseSpGEMM_reuse (spgemm_reuse),
memory-optimized variant (spgemm_mem). The reference's phases —
workEstimation (symbolic nnz), compute (numeric) — map to:

- **analysis (host)**: symbolic product of the sparsity patterns → C's
  pattern + a flat multiplication plan: every scalar product a_ik·b_kj is
  one (a_pos, b_pos, c_pos) triple. Host-side, once per pattern (the
  "bufferSize" phase of the lifecycle; patterns are data-independent).
- **execute (device, jitted)**: gather a/b values by plan, multiply,
  segment-sum into C values — one fused XLA kernel, reusable for any values
  with the same pattern (exactly cusparseSpGEMM_reuse's contract).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

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


def spgemm_plan(a: CSR, b: CSR) -> SpGemmPlan:
    """Symbolic phase on host (≙ workEstimation + nnz): row-merge over the
    patterns."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    a_indptr = np.asarray(a.indptr)
    a_indices = np.asarray(a.indices)
    a_data = np.asarray(a.data)
    b_indptr = np.asarray(b.indptr)
    b_indices = np.asarray(b.indices)
    b_data = np.asarray(b.data)

    c_indptr = [0]
    c_indices: list[int] = []
    a_pos_l: list[int] = []
    b_pos_l: list[int] = []
    c_seg_l: list[int] = []
    # zero-valued entries (the capacity-padding convention) are treated as
    # absent from the pattern so padding can't manufacture fill-in
    for i in range(m):
        col_to_cpos: dict[int, int] = {}
        for ap in range(a_indptr[i], a_indptr[i + 1]):
            if a_data[ap] == 0:
                continue
            kcol = a_indices[ap]
            for bp in range(b_indptr[kcol], b_indptr[kcol + 1]):
                if b_data[bp] == 0:
                    continue
                j = b_indices[bp]
                if j not in col_to_cpos:
                    col_to_cpos[j] = len(c_indices)
                    c_indices.append(j)
                a_pos_l.append(ap)
                b_pos_l.append(bp)
                c_seg_l.append(col_to_cpos[j])
        c_indptr.append(len(c_indices))

    return SpGemmPlan(
        jnp.asarray(np.asarray(a_pos_l, np.int32)),
        jnp.asarray(np.asarray(b_pos_l, np.int32)),
        jnp.asarray(np.asarray(c_seg_l, np.int32)),
        jnp.asarray(np.asarray(c_indptr, np.int32)),
        jnp.asarray(np.asarray(c_indices, np.int32)),
        (m, n),
        len(c_indices),
    )


def spgemm(a: CSR, b: CSR) -> CSR:
    """One-shot SpGEMM (plan + execute)."""
    plan = spgemm_plan(a, b)
    return plan.execute(a.data, b.data)

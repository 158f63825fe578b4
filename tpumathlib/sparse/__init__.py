"""sparse — the cuSPARSE / cuSPARSELt capability surface, TPU-native.

- containers: CSR / COO / BSR / Blocked-ELL matrix types with **static nnz
  capacity** (XLA static shapes; padding rows carry zero values and clamped
  indices — the TPU analogue of the reference's bufferSize contract)
- ops:      SpMV, SpMM (+batched), SDDMM, axpby/gather/scatter/rot/spvv
- spgemm:   two-phase SpGEMM (host symbolic "analysis" + device numeric
  "execute" — ≙ cusparseSpGEMM workEstimation/compute split), with
  reuse plans (≙ spgemm_reuse)
- spsv:     level-scheduled sparse triangular solve (host analysis ≙
  SpSV_analysis, device execute) + SpSM
- convert:  dense↔CSR/COO/Blocked-ELL, prune/compress, coosort
- tridiag:  gtsv (Thomas) and gpsv interleaved-batch pentadiagonal solvers
- solvers:  preconditioned CG (IC0) and BiCGStab (ILU0) as single jitted
  while_loops (≙ cuSPARSE/cg, cuSPARSE/bicgstab — but device-resident)
- sparselt: 2:4 structured sparsity — prune/pruneCheck/compress/matmul with
  ReLU/bias epilogues (≙ cuSPARSELt)

Blocked-ELL is the MXU-native format (dense tiles feed the systolic array);
CSR/COO paths lower to gather + segment-sum.
"""

from tpumathlib.sparse.containers import CSR, COO, BSR, BlockedELL  # noqa: F401
from tpumathlib.sparse.ops import (  # noqa: F401
    spmv, spmm, sddmm, axpby, sp_gather, sp_scatter, sp_rot, spvv,
)
from tpumathlib.sparse.autoplan import SpmvAutoPlan  # noqa: F401
from tpumathlib.sparse.spgemm import spgemm, spgemm_mem, SpGemmPlan  # noqa: F401
from tpumathlib.sparse.spsv import SpSvPlan, spsv, spsm  # noqa: F401
from tpumathlib.sparse.convert import (  # noqa: F401
    dense_to_csr, dense_to_coo, csr_to_dense, coo_to_dense, coo_sort,
    dense_to_blocked_ell, csr_to_blocked_ell, csr_to_coo, coo_to_csr,
    prune_dense,
)
from tpumathlib.sparse.tridiag import gtsv, gpsv_interleaved_batch  # noqa: F401
from tpumathlib.sparse.solvers import cg, bicgstab, ic0, ilu0  # noqa: F401

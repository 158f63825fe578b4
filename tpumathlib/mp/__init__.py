"""mp — the distributed tier (≙ cuBLASMp / cuFFTMp / cuSOLVERMp / cuDSS MGMN /
cutensorMp).

The reference's three-layer comm stack (MPI bootstrap + NCCL collectives +
NVSHMEM one-sided heap — SURVEY.md §5) collapses into the JAX runtime:
``jax.distributed.initialize`` is the bootstrap, XLA collectives over ICI/DCN
are the data plane, and Pallas ``make_async_remote_copy`` is the one-sided
path for hand-overlapped kernels.

- grid:    process grids + 2D block-cyclic layouts (≙ cublasMpGridCreate,
           cusolverMpCreateDeviceGrid, numroc)
- matmul:  TP matmul — AllGather+GEMM, GEMM+ReduceScatter, GEMM+AllReduce
           (≙ cuBLASMp tp_matmul.cu / matmul_ag / matmul_rs / matmul_ar)
- pblas:   2D block-cyclic PBLAS ops incl. gemr2d redistribution
- fft:     slab/pencil-decomposed distributed FFT (≙ cuFFTMp; see fft.mp)
"""

from tpumathlib.mp.grid import Grid, block_cyclic_spec, numroc  # noqa: F401
from tpumathlib.mp.cyclic import (  # noqa: F401
    BlockCyclic,
    gemr2d_12,
    gemr2d_21,
    getrf_2d,
    potrf_2d,
    summa_gemm,
    syevd_2d,
    syrk_2d,
)
from tpumathlib.mp.matmul import (  # noqa: F401
    matmul_ag,
    matmul_allreduce,
    matmul_rs,
    tp_matmul,
)
from tpumathlib.mp.pblas import (  # noqa: F401
    mp_geadd,
    mp_symm,
    mp_syr2k,
    mp_syrk,
    mp_syrkx,
    mp_tradd,
    mp_trmm,
    mp_trsm,
)

"""blas — the cuBLAS capability surface, TPU-native.

- level1: amax, amin, asum, axpy, copy, dot, nrm2, rot, rotg, rotm, rotmg,
  scal, swap (≙ cuBLAS/Level-1, 13 samples)
- level2: gemv/gbmv/ger/symv/syr/... — the full banded/packed/symmetric/
  triangular MV surface (≙ cuBLAS/Level-2, 23 samples)
- level3: gemm (+batched/strided/grouped), symm/syrk/syr2k/syrkx, hemm/herk/
  her2k/herkx, trmm, trsm (+batched), gemm3m (≙ cuBLAS/Level-3, 16 samples)
- ext: GemmEx mixed-precision semantics, geam, dgmm, tpttr/trttp,
  Nrm2Ex/AxpyEx/DotEx/... (≙ cuBLAS/Extensions, 18 samples)
- emulation: fp32-via-bf16x3/6/9 and fp64-via-int8 Ozaki-scheme GEMM
  (≙ cuBLAS/Emulation + MathDx 16_dgemm_emulation)
- lt: the descriptor matmul engine (≙ cuBLASLt)

Functions take/return JAX arrays; the row-major "C convention" is used
throughout (the reference's column-major examples transpose-map 1:1).
"""

from tpumathlib.blas import level1, level2, level3, ext, lt  # noqa: F401
from tpumathlib.blas.level3 import gemm  # noqa: F401
from tpumathlib.blas.lt import Matmul, MatmulDesc, MatrixLayout, matmul  # noqa: F401

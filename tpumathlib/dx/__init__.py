"""dx — the Pallas TPU kernel library (≙ the MathDx device-side tier).

Where MathDx composes CUDA device functions into user kernels
(cuBLASDx/cuFFTDx/cuSolverDx/cuRANDDx), this package holds the Pallas
kernels the host-level APIs lower to: the tiled MXU GEMM with fused
epilogues, FFT stages, quantization, reductions, and the remote-DMA
collective kernels used by the mp tier.
"""

from tpumathlib.dx.pallas_utils import interpret_mode, on_tpu  # noqa: F401
from tpumathlib.dx.gemm import pallas_matmul, MatmulConfig  # noqa: F401
from tpumathlib.dx.solver import (  # noqa: F401
    geqrf_batched,
    gesv_batched,
    getrf_batched,
    posv_batched,
    potrf_batched,
    potrf_blocked,
)
from tpumathlib.dx.comp import (  # noqa: F401
    dx_compress,
    dx_decompress,
    dx_decompress_dot,
    dx_required_bits,
)

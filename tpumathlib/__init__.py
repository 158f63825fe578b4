"""tpumathlib — a TPU-native math-library suite (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capability surface exercised by NVIDIA's CUDA
Library Samples (reference: /root/reference, see SURVEY.md) as ONE coherent
TPU-first library:

- ``tpumathlib.blas``     — cuBLAS L1/L2/L3 + Ex + emulation surface
- ``tpumathlib.blas.lt``  — cuBLASLt-class descriptor matmul engine (MXU)
- ``tpumathlib.fft``      — cuFFT-class plan/exec FFT stack (+ callbacks)
- ``tpumathlib.solver``   — cuSOLVER-class dense factorizations/eig/SVD
- ``tpumathlib.sparse``   — cuSPARSE-class SpMV/SpMM/SpGEMM/SpSV + CG/BiCGStab
- ``tpumathlib.tensor``   — cuTENSOR-class einsum/elementwise/reduction
- ``tpumathlib.rand``     — cuRAND-class RNG (philox/threefry/sobol + dists)
- ``tpumathlib.comp``     — nvCOMP-class compression codecs
- ``tpumathlib.image``    — NPP-class image ops
- ``tpumathlib.mp``       — distributed tier (cuBLASMp/cuFFTMp/cuSOLVERMp):
                            mesh grids, TP matmul (AG+GEMM / GEMM+RS / +AR),
                            slab/pencil FFT, block-cyclic factorizations
- ``tpumathlib.dx``       — the Pallas kernel library underpinning everything
                            (MathDx-class device-side tier)
- ``tpumathlib.heuristics`` — MXU/HBM roofline model + autotuner discovery

Design: descriptor/plan objects resolve to jitted callables; XLA is the
default backend and Pallas kernels are the tuned hot path; distribution is
expressed with ``jax.sharding`` meshes + ``shard_map`` collectives riding ICI.
"""

__version__ = "0.1.0"

from tpumathlib.core import errors, dtypes  # noqa: F401

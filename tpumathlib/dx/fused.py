"""Fused device-side compositions (≙ the MathDx fusion examples).

On CUDA, fusing GEMM+FFT into one kernel requires cuBLASDx+cuFFTDx template
composition (MathDx/cuBLASDx 13_gemm_fft, 14_gemm_fused; cuFFTDx
06_convolution). On TPU, jit IS the fusion mechanism: composing the engine
calls under one jit yields a single XLA program whose intermediates never
round-trip HBM unless the scheduler wants them to — the same property the
Dx examples demonstrate. These wrappers pin the composition and document
the parity point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpumathlib.dx.gemm import pallas_matmul
from tpumathlib.fft.kernels import _fft_planar, mxu_irfft, mxu_rfft


@functools.partial(jax.jit, static_argnames=("epilogue",))
def gemm_fft(a, b, epilogue: str = "default"):
    """FFT(A@B) along output rows — one fused program (≙ 13_gemm_fft).
    Returns planar (re, im)."""
    c = pallas_matmul(a, b, epilogue=epilogue, out_dtype=jnp.float32)
    return _fft_planar(c, jnp.zeros_like(c), inverse=False)


@jax.jit
def gemm_gemm(a, b, c):
    """(A@B)@C fused chain (≙ 14_gemm_fused)."""
    return pallas_matmul(pallas_matmul(a, b, out_dtype=jnp.float32), c,
                         out_dtype=jnp.float32)


@jax.jit
def fft_convolution(x, kernel):
    """Circular convolution via rFFT → pointwise multiply → irFFT along the
    last axis (≙ cuFFTDx 06_convolution: load-FFT-multiply-inverse-store in
    one program). Real inputs, real output; kernel broadcast over batch."""
    n = x.shape[-1]
    xf = mxu_rfft(x)
    kf = mxu_rfft(kernel)
    yf = xf * kf
    # mxu_irfft is unnormalized (cuFFT convention): divide by n
    return mxu_irfft(yf, n) / n

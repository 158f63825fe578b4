"""Fused device-side compositions (≙ the MathDx fusion examples).

On CUDA, fusing GEMM+FFT into one kernel requires cuBLASDx+cuFFTDx template
composition (MathDx/cuBLASDx 13_gemm_fft, 14_gemm_fused; cuFFTDx
06_convolution). Here ``gemm_fft`` is a REAL single-kernel fusion: one
Pallas kernel computes the GEMM tile, applies the epilogue, and runs the
row FFT as an in-VMEM DFT matmul — the product C never round-trips HBM.
(Pallas calls are opaque to XLA fusion, so merely composing two
pallas_calls under jit does NOT fuse them; the round-2 version of this
module claimed it did. The chain spellings below that compose separate
kernels are labeled as compositions, not fusions.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.core.errors import check
from tpumathlib.dx.gemm import pallas_matmul
from tpumathlib.dx.pallas_utils import interpret_mode
from tpumathlib.fft.kernels import _dft_mats, _fft_planar
from tpumathlib.fft.kernels import irfft_planar, rfft_planar


@functools.partial(jax.jit, static_argnames=("epilogue", "bm"))
def gemm_fft(a, b, epilogue: str = "default", bm: int = 256):
    """FFT(epilogue(A@B)) along output rows in ONE kernel (≙ cuBLASDx
    13_gemm_fft): the (bm, n) product tile stays in VMEM through the
    epilogue and both DFT matmuls. Returns planar (re, im).

    n and k must be small enough that B and the two n×n DFT matrices are
    VMEM-resident (n, k ≤ 1024). Measured on a v5e: 1.12× the composed
    spelling at n=256, 1.00× at n=128; BEYOND n≈384 the fused direct-DFT
    O(n²)/row cost overtakes the saved HBM round trip and
    ``gemm_fft_composed`` (four-step FFT, O(n√n)/row) wins — pick by n."""
    m, k = a.shape
    k2, n = b.shape
    check(k == k2, "inner dims must match")
    check(n <= 1024 and k <= 1024,
          "fused gemm_fft holds B and the DFT matrices in VMEM: n, k <= "
          "1024 (use gemm_fft_composed beyond)")
    wr_np, wi_np = _dft_mats(n, inverse=False)
    bm = min(bm, m)
    pad = (-m) % bm
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
    mp = a.shape[0]

    def kernel(a_ref, b_ref, wr_ref, wi_ref, or_ref, oi_ref):
        hp = jax.lax.Precision.HIGHEST
        c = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                    precision=hp)
        if epilogue == "relu":
            c = jnp.maximum(c, 0.0)
        elif epilogue == "gelu":
            k0, k1 = 0.7978845608028654, 0.044715
            c = 0.5 * c * (1.0 + jnp.tanh(k0 * (c + k1 * c * c * c)))
        # row FFT as an in-VMEM matmul: the DFT matrix is symmetric, so
        # FFT over rows = C @ W
        or_ref[:] = jnp.dot(c, wr_ref[:], preferred_element_type=jnp.float32,
                            precision=hp)
        oi_ref[:] = jnp.dot(c, wi_ref[:], preferred_element_type=jnp.float32,
                            precision=hp)

    yr, yi = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0)),
                  pl.BlockSpec((n, n), lambda i: (0, 0)),
                  pl.BlockSpec((n, n), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((bm, n), lambda i: (i, 0)),
                   pl.BlockSpec((bm, n), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((mp, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret_mode(),
    )(a.astype(jnp.float32), b.astype(jnp.float32),
      jnp.asarray(wr_np), jnp.asarray(wi_np))
    return yr[:m], yi[:m]


@functools.partial(jax.jit, static_argnames=("epilogue",))
def gemm_fft_composed(a, b, epilogue: str = "default"):
    """GEMM → row FFT as a COMPOSITION of separate kernels (the product
    does round-trip HBM between them — use ``gemm_fft`` when shapes allow
    true fusion). Returns planar (re, im)."""
    c = pallas_matmul(a, b, epilogue=epilogue, out_dtype=jnp.float32)
    return _fft_planar(c, jnp.zeros_like(c), inverse=False)


@jax.jit
def gemm_gemm(a, b, c):
    """(A@B)@C chain (≙ 14_gemm_fused) — two MXU kernels composed under
    one jit (the intermediate product is HBM-resident between them)."""
    return pallas_matmul(pallas_matmul(a, b, out_dtype=jnp.float32), c,
                         out_dtype=jnp.float32)


@jax.jit
def fft_convolution(x, kernel):
    """Circular convolution via rFFT → pointwise multiply → irFFT along the
    last axis (≙ cuFFTDx 06_convolution). Real inputs, real output; kernel
    broadcast over batch. Planar engines throughout — chip-executable on
    complex-free backends."""
    n = x.shape[-1]
    xr, xi = rfft_planar(x)
    kr, ki = rfft_planar(kernel)
    yr = xr * kr - xi * ki
    yi = xr * ki + xi * kr
    # irfft_planar is unnormalized (cuFFT convention): divide by n
    return irfft_planar(yr, yi, n) / n


@functools.partial(jax.jit, static_argnames=("naxes",))
def fft_convolution_nd(x, kernel, naxes: int = 3):
    """Circular convolution over the trailing ``naxes`` axes via planar
    C2C FFTs (≙ cuFFTDx 07_convolution_3d: forward FFT → pointwise
    filter → inverse FFT in one fused program). Real inputs/output;
    leading axes of ``x`` beyond ``kernel``'s rank broadcast as batch."""
    from tpumathlib.fft.kernels import fftn_planar

    shape = x.shape[-naxes:]
    check(kernel.shape[-naxes:] == shape,
          "kernel trailing dims must match x")
    zero = jnp.zeros_like(x)
    xr, xi = fftn_planar(x.astype(jnp.float32), zero, naxes)
    kr, ki = fftn_planar(kernel.astype(jnp.float32),
                         jnp.zeros_like(kernel, jnp.float32), naxes)
    yr = xr * kr - xi * ki
    yi = xr * ki + xi * kr
    out_r, _ = fftn_planar(yr, yi, naxes, inverse=True)
    scale = 1.0
    for d in shape:
        scale *= d
    return out_r / scale

"""Precision emulation: FP32 GEMM on bf16 MXU passes and FP64 GEMM via the
Ozaki int8-slice scheme.

Parity: cuBLAS/Emulation — bf16x9 FP32-emulated sgemm
(Emulation/bf16x9_sgemm), Ozaki-scheme fixed/dynamic-mantissa dgemm
(Emulation/dgemm_fixed, dgemm_dynamic, zgemm_*), and the MathDx blueprint
(MathDx/cuBLASDx/16_dgemm_emulation — int8 slicing + per-slice-pair GEMM +
power-of-two recombination). Implemented from the published algorithm
(Ozaki et al., split-and-accumulate), NOT translated from the reference.

TPU mapping: every slice-pair product is a native MXU matmul (bf16·bf16→f32
or int8·int8→i32); splitting/recombination are VPU elementwise ops. This is
how fp64-class GEMM goes fast on hardware with no fp64 units — the exact
same motivation as the reference's emulation tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpumathlib.core.errors import NotSupportedError, check

# ---------------- FP32 via bf16 multi-word arithmetic ----------------


def split_bf16(x, k: int):
    """Split f32 array into k bf16 words: x ≈ Σ w_i, w_0 holding the leading
    bits. Classic multi-word (Dekker-style) splitting."""
    import jax

    words = []
    r = x.astype(jnp.float32)
    for _ in range(k):
        # barrier: --xla_allow_excess_precision folds the f32->bf16->f32
        # convert pair to identity, zeroing every residual word (see
        # core.dtypes.bf16_split)
        w = jax.lax.optimization_barrier(r.astype(jnp.bfloat16))
        words.append(w)
        r = r - w.astype(jnp.float32)
    return words


@functools.partial(jax.jit, static_argnames=("scheme",))
def sgemm_emulated(a, b, scheme: str = "bf16x9"):
    """FP32 GEMM computed as bf16 MXU products (cublasSetEmulationStrategy +
    bf16x9_sgemm sample semantics).

    schemes: bf16x3 (3 products, ~fp32 for well-scaled data), bf16x6
    (6 products), bf16x9 (9 products, full fp32-equivalent)."""
    check(scheme in ("bf16x3", "bf16x6", "bf16x9"), f"unknown scheme {scheme}")
    nprod = int(scheme[5:])
    k = {3: 2, 6: 3, 9: 3}[nprod]
    aw = split_bf16(a, k)
    bw = split_bf16(b, k)
    # product (i, j) contributes at magnitude ~2^-8(i+j); keep pairs by
    # increasing i+j until nprod products are used.
    pairs = sorted(
        ((i, j) for i in range(k) for j in range(k)),
        key=lambda p: (p[0] + p[1], p[0]),
    )[:nprod]
    acc = None
    for i, j in pairs:
        p = jnp.matmul(aw[i], bw[j], preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    return acc


# ---------------- FP64 via Ozaki int8 slicing ----------------


def _int8_slices(x, axis: int, num_slices: int, bits: int):
    """Slice mantissas of x (f64) into int8 words after per-vector exponent
    normalization along ``axis`` (the contraction dim).

    Returns (slices[s] int8 arrays, exp) with
    x ≈ 2^exp · Σ_s slices[s] · 2^(-bits·(s+1)), |slices[s]| ≤ 2^(bits-1).
    """
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    # exponent of the leading slice; amax=0 vectors get exp 0
    exp = jnp.where(amax > 0, jnp.ceil(jnp.log2(jnp.where(amax > 0, amax, 1.0))), 0.0)
    m = x / jnp.exp2(exp)  # |m| <= 1
    slices = []
    r = m
    scale = 2.0**bits
    for _ in range(num_slices):
        s = jnp.round(r * scale)
        # rounding can hit ±2^bits; renormalize that corner into range
        s = jnp.clip(s, -(2.0 ** (bits)), 2.0**bits - 1)
        slices.append(s.astype(jnp.int8) if bits <= 7 else s.astype(jnp.int32))
        r = r * scale - s
    return slices, exp


@functools.partial(
    jax.jit, static_argnames=("num_slices", "bits", "mantissa_control", "out_dtype")
)
def dgemm_emulated(
    a,
    b,
    num_slices: int = 8,
    bits: int = 7,
    mantissa_control: str = "fixed",
    out_dtype=jnp.float64,
):
    """FP64-class GEMM from int8 MXU products (Ozaki scheme).

    ≙ cublasSetEmulationStrategy / cublasSetFixedPointEmulationMantissaControl
    (Emulation/dgemm_dynamic/cublas_dgemm_dynamic_example.cu:55,133-136).
    ``mantissa_control``:
      - "fixed": use exactly ``num_slices`` slices per operand.
      - "dynamic": pick the slice count from the operands' exponent spread so
        the result is correctly rounded to fp64 for the given K (more slices
        when rows/cols of A/B span wide magnitude ranges).

    Slices pair (i, j) with i+j < num_slices (lower-magnitude pairs are below
    the fp64 ulp of the result); each pair is one int8·int8→int32 MXU matmul,
    recombined as Σ 2^(ea+eb-bits(i+j+2))·P_ij in f64.
    """
    check(bits <= 7, "int8 slices need bits<=7")
    check(jax.config.jax_enable_x64,
          "dgemm_emulated needs jax_enable_x64: without it the f64 "
          "slicing/recombination silently demotes to f32 and the Ozaki "
          "scheme loses its fp64-class accuracy",
          NotSupportedError)
    a = jnp.asarray(a, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    kdim = a.shape[-1]
    # int32 accumulator overflow bound: K·2^(2·bits) < 2^31
    check(kdim * 4 ** bits < 2**31, f"K={kdim} too large for {bits}-bit slices")

    if mantissa_control == "dynamic":
        # fp64 has 53 mantissa bits; each slice carries ``bits`` bits and the
        # product accumulates log2(K) carry bits — choose ceil to cover.
        import math

        need = 53 + math.ceil(math.log2(max(kdim, 2)))
        num_slices = min(12, -(-need // bits) + 1)

    sa, ea = _int8_slices(a, axis=-1, num_slices=num_slices, bits=bits)
    sb, eb = _int8_slices(b, axis=-2, num_slices=num_slices, bits=bits)

    out = None
    for i in range(num_slices):
        for j in range(num_slices - i):
            p = jnp.matmul(sa[i], sb[j], preferred_element_type=jnp.int32)
            term = p.astype(jnp.float64) * jnp.exp2(-float(bits) * (i + j + 2))
            out = term if out is None else out + term
    # per-row exp of A + per-col exp of B
    out = out * jnp.exp2(ea + eb)
    return out.astype(out_dtype)


def zgemm_emulated(a, b, **kw):
    """Complex fp64-class GEMM via 4 real Ozaki products (≙ Emulation/zgemm_*)."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    rr = dgemm_emulated(ar, br, **kw) - dgemm_emulated(ai, bi, **kw)
    ri = dgemm_emulated(ar, bi, **kw) + dgemm_emulated(ai, br, **kw)
    return rr + 1j * ri

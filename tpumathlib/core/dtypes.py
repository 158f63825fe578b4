"""Dtype traits for the whole suite.

Reference analogue: the ``traits<T>`` structs in cuBLAS/utils/cublas_utils.h:62-134
(cuda_data_type mapping, printing), the narrow-precision storage traits in
cuBLASLt/Common/helpers.h:39-55, and the dtype-dependent verification rtol in
cuBLASMp/matmul.h:579 (``matmul_default_rtol``).

TPU notes: the MXU natively consumes bf16/f32 (and int8/fp8 on recent gens);
fp64 is emulated (see blas.emulation). Sub-byte types (fp4) are stored packed
or widened — see ``StorageTraits``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

# Sub-lane × lane min tile per dtype (Pallas TPU tiling constraints).
_MIN_TILE = {
    4: (8, 128),   # f32/i32
    2: (16, 128),  # bf16/f16
    1: (32, 128),  # int8/fp8
}


@dataclasses.dataclass(frozen=True)
class DtypeTraits:
    dtype: Any
    name: str
    is_complex: bool
    is_float: bool
    itemsize: int
    # dtype-dependent verification tolerance (≙ matmul_default_rtol,
    # cuBLASMp/matmul.h:579): half/bf16 ~1e-2, fp8 ~1e-1, f32 ~1e-5, f64 ~1e-12.
    rtol: float
    # MXU-preferred accumulation dtype.
    acc_dtype: Any

    @property
    def min_tile(self) -> tuple[int, int]:
        return _MIN_TILE.get(self.itemsize, (8, 128))


_TRAITS: dict[Any, DtypeTraits] = {}


def _reg(dtype, name, rtol, acc=jnp.float32):
    dt = jnp.dtype(dtype)
    _TRAITS[dt] = DtypeTraits(
        dtype=dt,
        name=name,
        is_complex=jnp.issubdtype(dt, jnp.complexfloating),
        is_float=jnp.issubdtype(dt, jnp.floating),
        itemsize=dt.itemsize,
        rtol=rtol,
        acc_dtype=jnp.dtype(acc),
    )


_reg(jnp.float64, "f64", 1e-12, jnp.float64)
_reg(jnp.float32, "f32", 1e-5)
_reg(jnp.bfloat16, "bf16", 1e-2)
_reg(jnp.float16, "f16", 1e-2)
_reg(jnp.float8_e4m3fn, "e4m3", 1.25e-1)
_reg(jnp.float8_e5m2, "e5m2", 2.5e-1)
_reg(jnp.int8, "i8", 0.0, jnp.int32)
_reg(jnp.int32, "i32", 0.0, jnp.int32)
_reg(jnp.complex64, "c64", 1e-5)
_reg(jnp.complex128, "c128", 1e-12, jnp.complex128)


def traits(dtype) -> DtypeTraits:
    dt = jnp.dtype(dtype)
    if dt not in _TRAITS:
        _reg(dt, str(dt), 1e-5)
    return _TRAITS[dt]


def default_rtol(*dtypes) -> float:
    """Verification rtol for an op over the given operand dtypes — the loosest
    operand wins (≙ cuBLASMp/matmul.h:579 keyed on A/B/C types)."""
    return max(traits(d).rtol for d in dtypes) or 1e-5


def real_dtype(dtype):
    """Real counterpart of a complex dtype (c64→f32, c128→f64)."""
    dt = jnp.dtype(dtype)
    if dt == jnp.complex64:
        return jnp.dtype(jnp.float32)
    if dt == jnp.complex128:
        return jnp.dtype(jnp.float64)
    return dt


def complex_dtype(dtype):
    dt = jnp.dtype(dtype)
    if dt == jnp.float64:
        return jnp.dtype(jnp.complex128)
    return jnp.dtype(jnp.complex64)


def bf16_split(x):
    """(hi, lo) bf16 planes of an f32 array with hi + lo ≈ x (Dekker-style
    two-word split; lo carries the next 8 mantissa bits).

    The naive ``x - x.astype(bf16).astype(f32)`` is UNSAFE under jit on
    this TPU backend: the terminal compiles with
    ``--xla_allow_excess_precision=true``, which lets XLA fold the
    f32→bf16→f32 convert pair to the identity, collapsing lo to ZERO
    (measured on chip: the SpMV x-plane split silently returned lo=0 at
    1.7e-3 rel while interpret/CPU runs were exact). The
    optimization_barrier pins the rounded hi value."""
    import jax

    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, lo


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def random_array(key, shape, dtype, kind: str = "uniform"):
    """Test-data generator (≙ generate_random_vector / diagonally-dominant
    matrix gen, cublas_utils.h:269-306). ``kind``: uniform | normal | posdef |
    diagdom."""
    import jax

    dt = jnp.dtype(dtype)
    if kind == "posdef":
        n = shape[-1]
        a = jax.random.normal(key, shape, real_dtype(jnp.float32))
        m = a @ np.swapaxes(a, -1, -2) / n + 2.0 * jnp.eye(n)
        return m.astype(dt)
    if kind == "diagdom":
        n = shape[-1]
        a = jax.random.uniform(key, shape, jnp.float32)
        m = a + n * jnp.eye(n)
        return m.astype(dt)
    if jnp.issubdtype(dt, jnp.complexfloating):
        rk, ik = jax.random.split(key)
        rdt = real_dtype(dt)
        f = jax.random.normal if kind == "normal" else jax.random.uniform
        return (f(rk, shape, rdt) + 1j * f(ik, shape, rdt)).astype(dt)
    if jnp.issubdtype(dt, jnp.integer):
        return jax.random.randint(key, shape, -4, 5, jnp.int32).astype(dt)
    f = jax.random.normal if kind == "normal" else jax.random.uniform
    return f(key, shape, jnp.float32).astype(dt)

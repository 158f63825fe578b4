"""cuBLAS Extensions: mixed-precision Ex APIs and utility ops.

Parity: cuBLAS/Extensions (18 samples) — GemmEx (+Batched/StridedBatched/
GroupedBatched flavors via level3), AxpyEx, DotEx, Nrm2Ex, RotEx, ScalEx,
CherkEx/Cherk3mEx, CsyrkEx/Csyrk3mEx, dgmm, geam, tpttr, trttp.
GemmExAutoTuning (cached algo sweep) lives in blas.lt.

The Ex pattern — separate storage dtype vs compute dtype — maps to
``compute_dtype`` arguments: operands are upcast to the compute type, the op
runs there (MXU for matmul), and the result is cast to the requested output
type. That is exactly what CUBLAS_COMPUTE_32F with CUDA_R_16BF operands does.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpumathlib.blas import level1, level3
from tpumathlib.blas.level2 import dense_to_packed, packed_to_dense


def gemm_ex(alpha, a, b, beta=0.0, c=None, transa="N", transb="N",
            compute_dtype=jnp.float32, out_dtype=None):
    """cublasGemmEx: storage dtypes from the arrays, compute in
    ``compute_dtype``, output in ``out_dtype`` (defaults to C's/A's dtype)."""
    out_dtype = out_dtype or (c.dtype if c is not None else a.dtype)
    ac = a.astype(compute_dtype)
    bc = b.astype(compute_dtype)
    cc = c.astype(compute_dtype) if c is not None else None
    r = level3.gemm(alpha, ac, bc, beta, cc, transa, transb)
    return r.astype(out_dtype)


def axpy_ex(alpha, x, y, compute_dtype=jnp.float32):
    return level1.axpy(alpha, x.astype(compute_dtype), y.astype(compute_dtype)).astype(y.dtype)


def dot_ex(x, y, compute_dtype=jnp.float32, out_dtype=None):
    r = level1.dot(x.astype(compute_dtype), y.astype(compute_dtype))
    return r.astype(out_dtype or compute_dtype)


def nrm2_ex(x, compute_dtype=jnp.float32, out_dtype=None):
    r = level1.nrm2(x.astype(compute_dtype))
    return r.astype(out_dtype or compute_dtype)


def scal_ex(alpha, x, compute_dtype=jnp.float32):
    return level1.scal(alpha, x.astype(compute_dtype)).astype(x.dtype)


def rot_ex(x, y, c, s, compute_dtype=jnp.float32):
    xn, yn = level1.rot(x.astype(compute_dtype), y.astype(compute_dtype), c, s)
    return xn.astype(x.dtype), yn.astype(y.dtype)


def cherk_ex(alpha, a, beta=0.0, c=None, uplo="L", trans="N",
             compute_dtype=jnp.complex64):
    return level3.herk(alpha, a.astype(compute_dtype), beta,
                       None if c is None else c.astype(compute_dtype),
                       uplo, trans)


def cherk3m_ex(alpha, a, beta=0.0, c=None, uplo="L", trans="N"):
    """herk via the 3m complex-multiply scheme (cublasCherk3mEx)."""
    aa = a if trans.upper() == "N" else jnp.swapaxes(a, -1, -2).conj()
    from tpumathlib.blas.level3 import _tri_update, gemm3m

    r = alpha * gemm3m(1.0, aa, jnp.swapaxes(aa, -1, -2).conj())
    if c is not None:
        r = r + beta * c
    return _tri_update(r, c, uplo)


def csyrk_ex(alpha, a, beta=0.0, c=None, uplo="L", trans="N",
             compute_dtype=jnp.complex64):
    return level3.syrk(alpha, a.astype(compute_dtype), beta,
                       None if c is None else c.astype(compute_dtype),
                       uplo, trans)


def csyrk3m_ex(alpha, a, beta=0.0, c=None, uplo="L", trans="N"):
    aa = a if trans.upper() == "N" else jnp.swapaxes(a, -1, -2)
    from tpumathlib.blas.level3 import _tri_update, gemm3m

    r = alpha * gemm3m(1.0, aa, jnp.swapaxes(aa, -1, -2))
    if c is not None:
        r = r + beta * c
    return _tri_update(r, c, uplo)


def geam(alpha, a, beta, b, transa="N", transb="N"):
    """C = alpha*op(A) + beta*op(B) (cublas<t>geam) — the out-of-place
    transpose/add utility."""
    from tpumathlib.blas.level3 import _op_nd

    return alpha * _op_nd(a, transa) + beta * _op_nd(b, transb)


def dgmm(a, x, side: str = "R"):
    """C = A*diag(x) (side=R) or diag(x)*A (side=L) (cublas<t>dgmm)."""
    if side.upper() == "R":
        return a * x[None, :]
    return a * x[:, None]


def tpttr(ap, n: int, uplo: str = "L"):
    """Packed triangular → dense triangular (cublas<t>tpttr)."""
    return packed_to_dense(ap, n, uplo)


def trttp(a, uplo: str = "L"):
    """Dense triangular → packed (cublas<t>trttp)."""
    return dense_to_packed(a, uplo)

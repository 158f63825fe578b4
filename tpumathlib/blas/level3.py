"""cuBLAS Level-3: matrix-matrix ops.

Parity: the 16 Level-3 samples (dir cuBLAS/Level-3/): gemm, gemm3m,
gemmBatched, gemmGroupedBatched, gemmStridedBatched, hemm, her2k, herk,
herkx, symm, syr2k, syrk, syrkx, trmm, trsm, trsmBatched.

``gemm`` is the hot path: real dtypes route to the Pallas MXU engine
(dx.gemm), complex to XLA's dot (which lowers complex matmul to MXU real
matmuls already — the "3m" trick is exposed explicitly as ``gemm3m``).
Everything else is a triangle-select + gemm, which XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpumathlib.blas.level2 import _op, herm_full, sym_full, tri_full
from tpumathlib.dx.gemm import pallas_matmul


def _is_complex(*xs):
    return any(jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating) for x in xs)


def gemm(alpha, a, b, beta=0.0, c=None, transa: str = "N", transb: str = "N",
         backend: str = "auto"):
    """C := alpha*op(A)op(B) + beta*C (cublas<t>gemm,
    cuBLAS/Level-3/gemm/cublas_gemm_example.cu:87). Supports leading batch
    dims (gemmStridedBatched when both operands carry them)."""
    a = _op_nd(a, transa)
    b = _op_nd(b, transb)
    # L3 gemm is always "plain" (no fused epilogue/scales): the Lt heuristic
    # (lt.matmul_algo_get_heuristic) picks the XLA emitter for this case —
    # fastest on MXU; the Pallas engine serves the fused paths. backend=
    # "pallas" forces the Pallas kernel.
    use_xla = backend in ("xla", "auto") or _is_complex(a, b) or a.ndim != b.ndim
    if use_xla:
        r = alpha * _bmm(a, b)
        return r if c is None else r + beta * jnp.asarray(c)
    if a.ndim > 2 and a.shape[:-2] != b.shape[:-2]:
        b = jnp.broadcast_to(b, a.shape[:-2] + b.shape[-2:])
    return pallas_matmul(a, b, c=c, alpha=float(alpha), beta=float(beta),
                         out_dtype=(c.dtype if c is not None else a.dtype))


def _op_nd(a, trans):
    trans = trans.upper()
    if trans == "N":
        return a
    at = jnp.swapaxes(a, -1, -2)
    return at.conj() if trans == "C" else at


def _bmm(a, b):
    return jnp.matmul(a, b)


def gemm3m(alpha, a, b, beta=0.0, c=None, transa: str = "N", transb: str = "N"):
    """Complex GEMM with the 3-multiplication (Karatsuba) scheme
    (cublasCgemm3m): (Ar+iAi)(Br+iBi) via 3 real products instead of 4.
    On TPU each real product hits the MXU; saves 25% MXU flops vs naive."""
    a = _op_nd(a, transa)
    b = _op_nd(b, transb)
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    t1 = _bmm(ar, br)
    t2 = _bmm(ai, bi)
    t3 = _bmm(ar + ai, br + bi)
    r = (t1 - t2) + 1j * (t3 - t1 - t2)
    r = alpha * r.astype(a.dtype)
    return r if c is None else r + beta * c


def gemm_batched(alpha, as_, bs, beta=0.0, cs=None, transa: str = "N", transb: str = "N"):
    """Pointer-array batched gemm (cublas<t>gemmBatched): list/stacked inputs,
    uniform shapes."""
    a = jnp.stack(list(as_)) if isinstance(as_, (list, tuple)) else as_
    b = jnp.stack(list(bs)) if isinstance(bs, (list, tuple)) else bs
    c = jnp.stack(list(cs)) if isinstance(cs, (list, tuple)) else cs
    return gemm(alpha, a, b, beta, c, transa, transb)


def gemm_strided_batched(alpha, a, b, beta=0.0, c=None, transa: str = "N",
                         transb: str = "N"):
    """Strided-batch gemm — leading batch dim (cublas<t>gemmStridedBatched)."""
    return gemm(alpha, a, b, beta, c, transa, transb)


def gemm_grouped_batched(alphas, as_, bs, betas=None, cs=None,
                         transas=None, transbs=None):
    """Grouped batched gemm (cublasGemmGroupedBatchedEx): per-group shapes/
    scalars — a Python loop of engine calls, one compiled plan per distinct
    shape (plans are cached by jit)."""
    n = len(as_)
    betas = betas or [0.0] * n
    cs = cs or [None] * n
    transas = transas or ["N"] * n
    transbs = transbs or ["N"] * n
    return [
        gemm(alphas[i], as_[i], bs[i], betas[i], cs[i], transas[i], transbs[i])
        for i in range(n)
    ]


# ---------- symmetric / hermitian ----------

def symm(alpha, a, b, beta=0.0, c=None, side: str = "L", uplo: str = "L"):
    """C := alpha*A*B + beta*C with A symmetric (cublas<t>symm)."""
    af = sym_full(a, uplo)
    r = alpha * (af @ b if side.upper() == "L" else b @ af)
    return r if c is None else r + beta * c


def hemm(alpha, a, b, beta=0.0, c=None, side: str = "L", uplo: str = "L"):
    af = herm_full(a, uplo)
    r = alpha * (af @ b if side.upper() == "L" else b @ af)
    return r if c is None else r + beta * c


def _tri_update(c_new, c_old, uplo):
    """syrk-family only updates the referenced triangle of C."""
    mask = (
        jnp.tril(jnp.ones(c_new.shape[-2:], bool))
        if uplo.upper() == "L"
        else jnp.triu(jnp.ones(c_new.shape[-2:], bool))
    )
    if c_old is None:
        return jnp.where(mask, c_new, 0)
    return jnp.where(mask, c_new, c_old)


def syrk(alpha, a, beta=0.0, c=None, uplo: str = "L", trans: str = "N"):
    """C := alpha*op(A)op(A)^T + beta*C, triangle-only update."""
    aa = a if trans.upper() == "N" else jnp.swapaxes(a, -1, -2)
    r = alpha * (aa @ jnp.swapaxes(aa, -1, -2))
    if c is not None:
        r = r + beta * c
    return _tri_update(r, c, uplo)


def syr2k(alpha, a, b, beta=0.0, c=None, uplo: str = "L", trans: str = "N"):
    aa = a if trans.upper() == "N" else jnp.swapaxes(a, -1, -2)
    bb = b if trans.upper() == "N" else jnp.swapaxes(b, -1, -2)
    r = alpha * (aa @ jnp.swapaxes(bb, -1, -2) + bb @ jnp.swapaxes(aa, -1, -2))
    if c is not None:
        r = r + beta * c
    return _tri_update(r, c, uplo)


def syrkx(alpha, a, b, beta=0.0, c=None, uplo: str = "L", trans: str = "N"):
    """C := alpha*op(A)op(B)^T + beta*C (syrk "extended": A,B distinct but
    assumed to produce a symmetric product)."""
    aa = a if trans.upper() == "N" else jnp.swapaxes(a, -1, -2)
    bb = b if trans.upper() == "N" else jnp.swapaxes(b, -1, -2)
    r = alpha * (aa @ jnp.swapaxes(bb, -1, -2))
    if c is not None:
        r = r + beta * c
    return _tri_update(r, c, uplo)


def herk(alpha, a, beta=0.0, c=None, uplo: str = "L", trans: str = "N"):
    """C := alpha*op(A)op(A)^H + beta*C (alpha, beta real)."""
    aa = a if trans.upper() == "N" else jnp.swapaxes(a, -1, -2).conj()
    r = alpha * (aa @ jnp.swapaxes(aa, -1, -2).conj())
    if c is not None:
        r = r + beta * c
    return _tri_update(r, c, uplo)


def her2k(alpha, a, b, beta=0.0, c=None, uplo: str = "L", trans: str = "N"):
    aa = a if trans.upper() == "N" else jnp.swapaxes(a, -1, -2).conj()
    bb = b if trans.upper() == "N" else jnp.swapaxes(b, -1, -2).conj()
    r = alpha * (aa @ jnp.swapaxes(bb, -1, -2).conj()) + jnp.conj(alpha) * (
        bb @ jnp.swapaxes(aa, -1, -2).conj()
    )
    if c is not None:
        r = r + beta * c
    return _tri_update(r, c, uplo)


def herkx(alpha, a, b, beta=0.0, c=None, uplo: str = "L", trans: str = "N"):
    aa = a if trans.upper() == "N" else jnp.swapaxes(a, -1, -2).conj()
    bb = b if trans.upper() == "N" else jnp.swapaxes(b, -1, -2).conj()
    r = alpha * (aa @ jnp.swapaxes(bb, -1, -2).conj())
    if c is not None:
        r = r + beta * c
    return _tri_update(r, c, uplo)


# ---------- triangular ----------

def trmm(alpha, a, b, side: str = "L", uplo: str = "L", transa: str = "N",
         diag: str = "N"):
    """C := alpha*op(A)*B (side=L) or alpha*B*op(A) (side=R), A triangular.
    cuBLAS out-of-place variant."""
    t = _op(tri_full(a, uplo, diag), transa)
    return alpha * (t @ b if side.upper() == "L" else b @ t)


def trsm(alpha, a, b, side: str = "L", uplo: str = "L", transa: str = "N",
         diag: str = "N"):
    """Solve op(A) X = alpha*B (side=L) or X op(A) = alpha*B (side=R)."""
    from jax.scipy.linalg import solve_triangular

    lower = uplo.upper() == "L"
    tr = {"N": 0, "T": 1, "C": 2}[transa.upper()]
    unit = diag.upper() == "U"
    if side.upper() == "L":
        return solve_triangular(a, alpha * b, lower=lower, trans=tr,
                                unit_diagonal=unit)
    # X op(A) = alpha*B  ⇔  op(A)^T X^T = alpha*B^T
    xt = solve_triangular(
        jnp.swapaxes(a, -1, -2), alpha * jnp.swapaxes(b, -1, -2),
        lower=not lower, trans=tr, unit_diagonal=unit,
    )
    return jnp.swapaxes(xt, -1, -2)


def trsm_batched(alpha, a, b, **kw):
    """Batched trsm — leading batch dims (cublas<t>trsmBatched)."""
    return trsm(alpha, a, b, **kw)

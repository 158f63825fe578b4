"""cuBLAS Level-1: vector ops.

Parity: the 13 Level-1 samples (cuBLAS/README.md:11-64) — amax, amin, asum,
axpy, copy, dot, nrm2, rot, rotg, rotm, rotmg, scal, swap. All are jnp
expressions (the VPU path); XLA fuses chains of them into single kernels,
which is the TPU-correct design — no per-op kernel launches to save.

Semantics notes:
- ``amax``/``amin`` return the index of the max/min |x| (first occurrence),
  like cublasI<t>amax (1-based in CUBLAS; we are 0-based, documented).
- For complex x, |x| is |Re| + |Im| (the BLAS "absolute value" convention
  used by i?amax) — matching netlib/cuBLAS.
- ``rotg``/``rotmg`` are scalar host-side computations returning the rotation
  parameters; ``rot``/``rotm`` apply them on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _abs1(x):
    """BLAS |·| for i?amax: |Re|+|Im| for complex, |x| otherwise."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.abs(x.real) + jnp.abs(x.imag)
    return jnp.abs(x)


def amax(x) -> jnp.ndarray:
    """Index of first element with maximum |x| (cublasI<t>amax; 0-based)."""
    return jnp.argmax(_abs1(x))


def amin(x) -> jnp.ndarray:
    """Index of first element with minimum |x| (cublasI<t>amin; 0-based)."""
    return jnp.argmin(_abs1(x))


def asum(x) -> jnp.ndarray:
    """Sum of |Re|+|Im| (cublas<t>asum)."""
    return jnp.sum(_abs1(x))


def axpy(alpha, x, y) -> jnp.ndarray:
    """y := alpha*x + y."""
    return alpha * x + y


def copy(x) -> jnp.ndarray:
    """y := x (device copy)."""
    return jnp.array(x, copy=True)


def dot(x, y, conj: bool = False) -> jnp.ndarray:
    """cublas<t>dot (dotu) / dotc when ``conj``."""
    xv = jnp.conj(x) if conj else x
    return jnp.sum(xv * y)


def dotc(x, y) -> jnp.ndarray:
    return dot(x, y, conj=True)


def nrm2(x) -> jnp.ndarray:
    """Euclidean norm (cublas<t>nrm2)."""
    return jnp.sqrt(jnp.sum(jnp.abs(x) ** 2)).real.astype(
        x.real.dtype if jnp.issubdtype(x.dtype, jnp.complexfloating) else x.dtype
    )


def scal(alpha, x) -> jnp.ndarray:
    """x := alpha*x."""
    return alpha * x


def swap(x, y):
    """(x, y) := (y, x)."""
    return y, x


def rot(x, y, c, s):
    """Apply Givens rotation: x' = c*x + s*y; y' = -conj(s)*x + c*y
    (cublas<t>rot)."""
    xn = c * x + s * y
    yn = -jnp.conj(jnp.asarray(s)) * x + c * y
    return xn, yn


def rotg(a, b):
    """Construct Givens rotation (cublas<t>rotg): returns (r, z, c, s) with
    [c s; -s c] @ [a; b] = [r; 0]. Host-scalar computation (LAPACK drotg)."""
    a, b = complex(a) if np.iscomplexobj(a) else float(a), complex(b) if np.iscomplexobj(b) else float(b)
    if not np.iscomplexobj(a) and not np.iscomplexobj(b):
        # BLAS drotg
        roe = b if abs(b) > abs(a) else a
        scale = abs(a) + abs(b)
        if scale == 0.0:
            return 0.0, 0.0, 1.0, 0.0
        r = scale * np.hypot(a / scale, b / scale)
        r = np.copysign(r, roe)
        c, s = a / r, b / r
        # netlib/cuBLAS drotg z convention: z=s when |a|>|b|, z=1/c when
        # |a|<=|b| and c!=0, z=1 when c==0 — so the rotation can be
        # reconstructed from z alone.
        z = s if abs(a) > abs(b) else (1.0 / c if c != 0.0 else 1.0)
        return r, z, c, s
    # complex crotg
    absa = abs(a)
    if absa == 0.0:
        return b, 0.0, 0.0, 1.0 + 0.0j
    norm = np.hypot(absa, abs(b))
    alpha = a / absa
    c = absa / norm
    s = alpha * np.conj(b) / norm
    r = alpha * norm
    return r, 0.0, c, s


def rotm(x, y, param):
    """Apply modified (fast) Givens rotation (cublas<t>rotm).

    param = [flag, h11, h21, h12, h22] per the BLAS srotm convention."""
    param = np.asarray(param, dtype=np.float64)
    flag = float(param[0])
    h11, h21, h12, h22 = (float(p) for p in param[1:5])
    if flag == -2.0:
        return x, y
    if flag == -1.0:
        H = (h11, h12, h21, h22)
    elif flag == 0.0:
        H = (1.0, h12, h21, 1.0)
    elif flag == 1.0:
        H = (h11, 1.0, -1.0, h22)
    else:
        raise ValueError(f"bad rotm flag {flag}")
    a, b, c, d = H
    return a * x + b * y, c * x + d * y


def rotmg(d1, d2, x1, y1):
    """Construct modified Givens rotation (cublas<t>rotmg): returns
    (d1', d2', x1', param). Reference algorithm: BLAS drotmg."""
    gam, gamsq, rgamsq = 4096.0, 4096.0**2, 1.0 / 4096.0**2
    d1, d2, x1, y1 = float(d1), float(d2), float(x1), float(y1)
    param = np.zeros(5)
    if d1 < 0.0:
        param[0] = -1.0
        return 0.0, 0.0, 0.0, param
    p2 = d2 * y1
    if p2 == 0.0:
        param[0] = -2.0
        return d1, d2, x1, param
    p1 = d1 * x1
    q2 = p2 * y1
    q1 = p1 * x1
    if abs(q1) > abs(q2):
        h21 = -y1 / x1
        h12 = p2 / p1
        u = 1.0 - h12 * h21
        if u <= 0.0:
            param[0] = -1.0
            return 0.0, 0.0, 0.0, param
        flag = 0.0
        d1, d2, x1 = d1 / u, d2 / u, x1 * u
        h11 = h22 = 0.0
    else:
        if q2 < 0.0:
            param[0] = -1.0
            return 0.0, 0.0, 0.0, param
        flag = 1.0
        h11 = p1 / p2
        h22 = x1 / y1
        u = 1.0 + h11 * h22
        d1, d2 = d2 / u, d1 / u
        x1 = y1 * u
        h12 = h21 = 0.0
    # rescaling (netlib drotmg): if either d falls outside [1/gam^2, gam^2],
    # materialize the implicit unit entries of H, switch to flag=-1, and scale.
    def _materialize():
        nonlocal h11, h12, h21, h22, flag
        if flag == 0.0:
            h11, h22 = 1.0, 1.0
        elif flag == 1.0:
            h12, h21 = 1.0, -1.0
        flag = -1.0

    while d1 != 0.0 and (d1 <= rgamsq or d1 >= gamsq):
        _materialize()
        if d1 <= rgamsq:
            d1 *= gam**2
            x1 /= gam
            h11 /= gam
            h12 /= gam
        else:
            d1 /= gam**2
            x1 *= gam
            h11 *= gam
            h12 *= gam
    while d2 != 0.0 and (abs(d2) <= rgamsq or abs(d2) >= gamsq):
        _materialize()
        if abs(d2) <= rgamsq:
            d2 *= gam**2
            h21 /= gam
            h22 /= gam
        else:
            d2 /= gam**2
            h21 *= gam
            h22 *= gam
    if flag == -1.0:
        param[1:5] = (h11, h21, h12, h22)
    elif flag == 0.0:
        param[3], param[2] = h12, h21
    else:
        param[1], param[4] = h11, h22
    param[0] = flag
    return d1, d2, x1, param

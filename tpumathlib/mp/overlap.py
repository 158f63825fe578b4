"""Hand-overlapped AllGather+GEMM: a Pallas ring kernel with explicit
remote DMA (≙ cuBLASMp's NVSHMEM-backed matmul_ag overlap — the
communication hidden behind the MXU, SURVEY.md §7.8: "Pallas async
remote-copy overlap").

Ring schedule: P-1 steps; at step s every rank computes the GEMM for the
A-chunk it already holds while its next chunk streams in from the left
neighbor over ICI. Compute (MXU) and the RDMA overlap inside one kernel —
the XLA-collective path (mp.matmul.matmul_ag) relies on the compiler to
overlap; this kernel guarantees it.

Race-freedom: every remote write lands in a slot that is written exactly
once over the whole kernel (per-chunk slots in the all-gather, per-step
slots in the reduce-scatter), the same discipline as the upstream ring
all-gather pattern that DMAs straight into the output. A neighbor running
one step ahead can therefore never clobber data still being read — no
backpressure protocol is needed beyond the slot map itself.

Runs compiled on TPU meshes and under the Pallas TPU interpreter on the
CPU test mesh (which is how the correctness oracle exercises it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from tpumathlib.dx.pallas_utils import interpret_mode
from tpumathlib.mp.grid import Grid


def _neighbor_barrier(left, right):
    # neighborhood barrier: both neighbors' comm buffers must be live
    # before any remote write lands (guide's local-barrier pattern;
    # unsupported by the interpreter, where the runtime orders the
    # sends itself)
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)


def _ring_ag_gemm_kernel(nranks: int, mloc: int, axis: str,
                         use_barrier: bool):
    def kernel(a_ref, b_ref, out_ref, comm_buf, send_sem, recv_sem):
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        nr = jnp.int32(nranks)
        right = jax.lax.rem(my + jnp.int32(1), nr)
        left = jax.lax.rem(my - jnp.int32(1) + nr, nr)

        if use_barrier:
            _neighbor_barrier(left, right)

        # comm_buf has one slot PER ORIGINATING RANK; slot r only ever
        # receives rank r's chunk (once), so remote writes can never race
        # a local read of a recycled slot.
        comm_buf[pl.ds(my * mloc, mloc), :] = a_ref[:]

        for step in range(nranks - 1):  # static unroll
            # chunk in hand at step s originates from rank (my - s) mod P
            src = jax.lax.rem(my - jnp.int32(step) + nr, nr)
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_buf.at[pl.ds(src * mloc, mloc), :],
                dst_ref=comm_buf.at[pl.ds(src * mloc, mloc), :],
                send_sem=send_sem.at[step],
                recv_sem=recv_sem.at[step],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            # compute with the chunk in hand while the next one streams in
            out_ref[pl.ds(src * mloc, mloc), :] = jnp.dot(
                comm_buf[pl.ds(src * mloc, mloc), :], b_ref[:],
                preferred_element_type=jnp.float32)
            # the left neighbor's step-s copy lands chunk (my-s-1) in our
            # slot (my-s-1) and signals our recv_sem[step]
            incoming = jax.lax.rem(my - jnp.int32(step + 1) + nr, nr)
            pltpu.make_async_remote_copy(
                src_ref=comm_buf.at[pl.ds(incoming * mloc, mloc), :],
                dst_ref=comm_buf.at[pl.ds(incoming * mloc, mloc), :],
                send_sem=send_sem.at[step],
                recv_sem=recv_sem.at[step],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            rdma.wait_send()
        last = jax.lax.rem(my - jnp.int32(nranks - 1) + nr, nr)
        out_ref[pl.ds(last * mloc, mloc), :] = jnp.dot(
            comm_buf[pl.ds(last * mloc, mloc), :], b_ref[:],
            preferred_element_type=jnp.float32)

    return kernel


def matmul_ag_overlapped(a, b, grid: Grid, axis: str | None = None):
    """D = all_gather(A) @ B with the gather hand-overlapped in-kernel.

    A: P(axis, None) (row chunks), B: P(None, axis) (column chunks) →
    D: P(None, axis) — same contract as mp.matmul.matmul_ag."""
    axis = axis or grid.axes[0]
    nranks = grid.mesh.shape[axis]
    m, k = a.shape
    mloc = m // nranks

    def per_device(a_loc, b_loc):
        nloc = b_loc.shape[-1]
        return pl.pallas_call(
            _ring_ag_gemm_kernel(nranks, mloc, axis, not interpret_mode()),
            out_shape=jax.ShapeDtypeStruct((m, nloc), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nranks * mloc, k), a_loc.dtype),
                pltpu.SemaphoreType.DMA((nranks - 1,)),
                pltpu.SemaphoreType.DMA((nranks - 1,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7),
            interpret=interpret_mode(),
        )(a_loc, b_loc).astype(a_loc.dtype)

    return jax.jit(jax.shard_map(
        per_device, mesh=grid.mesh,
        in_specs=(P(axis, None), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    ))(a, b)


def _ring_rs_gemm_kernel(nranks: int, sp: int, axis: str, use_barrier: bool):
    def kernel(a_ref, b_ref, out_ref, comm_buf, send_sem, recv_sem):
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        nr = jnp.int32(nranks)
        right = jax.lax.rem(my + jnp.int32(1), nr)
        left = jax.lax.rem(my - jnp.int32(1) + nr, nr)
        if use_barrier:
            _neighbor_barrier(left, right)

        def partial(c):
            rows = a_ref[pl.ds(c * sp, sp), :]
            return jnp.dot(rows, b_ref[:], preferred_element_type=jnp.float32)

        # comm_buf has one slot PER RING STEP: slot s+1 is written remotely
        # exactly once (by the left neighbor's step-s send), then read
        # locally — never recycled, so a fast neighbor cannot clobber a
        # slot still in use.
        c0 = jax.lax.rem(my - jnp.int32(1) + nr, nr)
        comm_buf[0] = partial(c0)
        for step in range(nranks - 1):
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_buf.at[step],
                dst_ref=comm_buf.at[step + 1],
                send_sem=send_sem.at[step],
                recv_sem=recv_sem.at[step],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            # overlap: compute my partial for the chunk about to arrive
            c_in = jax.lax.rem(my - jnp.int32(step + 2) + nr * 2, nr)
            mine = partial(c_in)
            rdma.wait()
            comm_buf[step + 1] = comm_buf[step + 1] + mine
        out_ref[:] = comm_buf[nranks - 1]

    return kernel


def matmul_rs_overlapped(a, b, grid: Grid, axis: str | None = None):
    """D = reduce_scatter(A @ B) with the reduction hand-overlapped in a
    remote-DMA ring (≙ cuBLASMp matmul_rs over NVSHMEM).

    A: P(None, axis) (column chunks), B: P(axis, None) (row chunks) →
    D: P(axis, None) — same contract as mp.matmul.matmul_rs. Per step the
    next chunk's local GEMM runs while the accumulating chunk is in flight.
    """
    axis = axis or grid.axes[0]
    nranks = grid.mesh.shape[axis]
    m = a.shape[0]
    sp = m // nranks

    def per_device(a_loc, b_loc):
        h = b_loc.shape[-1]
        return pl.pallas_call(
            _ring_rs_gemm_kernel(nranks, sp, axis, not interpret_mode()),
            out_shape=jax.ShapeDtypeStruct((sp, h), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nranks, sp, h), jnp.float32),
                pltpu.SemaphoreType.DMA((nranks - 1,)),
                pltpu.SemaphoreType.DMA((nranks - 1,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=8),
            interpret=interpret_mode(),
        )(a_loc, b_loc).astype(a_loc.dtype)

    return jax.jit(jax.shard_map(
        per_device, mesh=grid.mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    ))(a, b)

"""Process grids and block-cyclic layouts.

Reference parity:
- ``cublasMpGridCreate(nranks, 1, COL_MAJOR, comm, &grid)``
  (cuBLASMp/tp_matmul.cu:72-73) → ``Grid`` over a jax Mesh.
- ``cusolverMpCreateDeviceGrid(handle, &grid, ncclComm, nprow, npcol, layout)``
  (cuSOLVERMp/mp_getrf_getrs.c:346) → 2D ``Grid``.
- ``numroc`` (cuBLASMp/helpers.h:1384) → local row/col counts for 2D
  block-cyclic distributions.

TPU mapping: a Grid wraps a ``jax.sharding.Mesh``; plain block (non-cyclic)
distributions are ``NamedSharding(P('x'), ...)``; block-cyclic layouts keep
an explicit (block_id → rank) map used by shard_map kernels — ScaLAPACK
block-cyclic is equivalent to a reshaped tiled sharding
(nb_blocks, block, …) with blocks round-robined over ranks.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def numroc(n: int, nb: int, iproc: int, nprocs: int, srcproc: int = 0) -> int:
    """Number of rows/cols of a block-cyclically distributed dimension owned
    by process ``iproc`` (ScaLAPACK NUMROC semantics; cuBLASMp/helpers.h:1384)."""
    dist = (nprocs + iproc - srcproc) % nprocs
    nblocks = n // nb
    mine = (nblocks // nprocs) * nb
    extra = nblocks % nprocs
    if dist < extra:
        mine += nb
    elif dist == extra:
        mine += n % nb
    return mine


@dataclasses.dataclass
class Grid:
    """A process grid bound to a device mesh (≙ cublasMpGrid_t).

    ``axes`` names the mesh axes used as (row, col) of the grid. 1D grids use
    a single axis ('x',); 2D grids ('x', 'y') with nprow = mesh.shape['x'].
    """

    mesh: Mesh
    axes: tuple[str, ...] = ("x",)
    layout: str = "col"  # grid rank ordering, parity only

    @classmethod
    def create(cls, devices=None, nprow: int | None = None, npcol: int = 1,
               layout: str = "col") -> "Grid":
        devices = devices if devices is not None else jax.devices()
        n = len(devices)
        if nprow is None:
            nprow, npcol = n, 1
        assert nprow * npcol == n, (nprow, npcol, n)
        if npcol == 1:
            mesh = Mesh(np.asarray(devices), ("x",))
            return cls(mesh, ("x",), layout)
        mesh = Mesh(np.asarray(devices).reshape(nprow, npcol), ("x", "y"))
        return cls(mesh, ("x", "y"), layout)

    @property
    def nprow(self) -> int:
        return self.mesh.shape[self.axes[0]]

    @property
    def npcol(self) -> int:
        return self.mesh.shape[self.axes[1]] if len(self.axes) > 1 else 1

    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)


def block_cyclic_spec(n: int, nb: int, nprocs: int):
    """Block-cyclic layout map for one dimension: returns (nblocks, owner,
    local_index) arrays — block b lives on rank b % nprocs at local block
    slot b // nprocs. Used by pblas kernels to build gather/scatter indices."""
    nblocks = -(-n // nb)
    owner = np.arange(nblocks) % nprocs
    local_slot = np.arange(nblocks) // nprocs
    return nblocks, owner, local_slot


def block_cyclic_to_global(a_local_blocks, n: int, nb: int, nprocs: int):
    """Reassemble a global dimension from per-rank block lists (host-side
    verification helper, ≙ the gather in cuBLASMp/matmul.h:303+)."""
    nblocks, owner, slot = block_cyclic_spec(n, nb, nprocs)
    parts = []
    for b in range(nblocks):
        blk = a_local_blocks[owner[b]][slot[b]]
        parts.append(blk)
    out = np.concatenate(parts, axis=0)
    return out[:n]

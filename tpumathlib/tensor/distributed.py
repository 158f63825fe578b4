"""Sharded einsum — the Mg/Mp tensor tier.

Parity: cuTENSORMg (single-process multi-GPU contraction with device lists,
blog_post.cu:64-151) and cutensorMp (MPI+NCCL distributed contraction,
cutensorMp_contraction.cu:81-95). On TPU both collapse into one path: shard
the operands over a Grid's mesh with NamedShardings derived from a
mode→axis assignment, jit the einsum with an output sharding, and XLA
inserts the ICI collectives (psum over contracted sharded modes).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpumathlib.mp.grid import Grid


def _spec_for(modes: str, assignment: Mapping[str, str]):
    return P(*[assignment.get(m) for m in modes])


def sharded_einsum(subscripts: str, a, b, grid: Grid,
                   mode_axes: Mapping[str, str], out_modes: str | None = None):
    """Distributed contraction: ``mode_axes`` maps tensor modes to mesh axes
    (e.g. {"m": "x"} shards mode m over mesh axis x) — the TPU analogue of
    cuTENSORMg's per-mode device grids.

    Operands are resharded as needed (gemr2d-style); the contraction runs
    under jit with sharding-annotated inputs/outputs, XLA choosing the
    collective schedule (psum for contracted sharded modes rides ICI).
    """
    lhs, out = subscripts.split("->")
    am, bm = lhs.split(",")
    out = out_modes or out
    mesh = grid.mesh

    a = jax.device_put(a, NamedSharding(mesh, _spec_for(am, mode_axes)))
    b = jax.device_put(b, NamedSharding(mesh, _spec_for(bm, mode_axes)))
    out_spec = _spec_for(out, {m: ax for m, ax in mode_axes.items() if m in out})

    f = jax.jit(
        lambda x, y: jnp.einsum(subscripts, x, y),
        out_shardings=NamedSharding(mesh, out_spec),
    )
    return f(a, b)

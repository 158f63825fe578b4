"""tensor — the cuTENSOR / cuTENSORMg / cutensorMp capability surface.

- einsum:      contraction plans + plan cache (≙ cutensorCreatePlan /
               contraction_plan_cache.cu), generic einsum parser
               (≙ einsum.cu), trinary contractions
- elementwise: binary/trinary elementwise with permutation (+padding)
               (≙ cuTENSOR elementwise_binary/trinary/permute samples)
- reduction:   tensor reductions with operator choice (≙ reduction.cu)
- blocksparse: block-sparse einsum (≙ blocksparse.cu) over BlockedELL tiles
- distributed: sharded einsum over a Grid (≙ cuTENSORMg device lists /
               cutensorMp MPI+NCCL contraction) — NamedSharding + jit does
               the decomposition, psum rides ICI

jnp.einsum already maps contractions onto the MXU via dot_general; the value
here is the plan/descriptor API surface, caching, and the sharded tier.
"""

from tpumathlib.tensor.einsum import (  # noqa: F401
    ContractionPlan,
    contraction,
    einsum,
    plan_contraction,
)
from tpumathlib.tensor.elementwise import (  # noqa: F401
    elementwise_binary,
    elementwise_trinary,
    permute,
)
from tpumathlib.tensor.reduction import reduction  # noqa: F401
from tpumathlib.tensor.blocksparse import block_sparse_einsum  # noqa: F401
from tpumathlib.tensor.distributed import sharded_einsum  # noqa: F401

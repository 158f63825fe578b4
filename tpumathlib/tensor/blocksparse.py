"""Block-sparse contraction (≙ cuTENSOR blocksparse.cu).

The matrix operand is Blocked-ELL (sparse/containers) — dense tiles on the
MXU; the contraction runs only over stored blocks. Covers the matmul-like
case "mk,kn->mn" with A block-sparse, which is the blocksparse.cu sample's
shape; general mode strings reduce to it via transposes.
"""

from __future__ import annotations

from tpumathlib.core.errors import check
from tpumathlib.sparse.containers import BlockedELL
from tpumathlib.sparse.ops import spmm


def block_sparse_einsum(subscripts: str, a: BlockedELL, b):
    """einsum with a block-sparse left operand. Supported: "mk,kn->mn",
    "km,kn->mn" (via transpose), "mk,nk->mn" (transpose B)."""
    check(isinstance(a, BlockedELL), "left operand must be BlockedELL")
    lhs, out = subscripts.split("->")
    am, bm = lhs.split(",")
    check(len(am) == 2 and len(bm) == 2 and len(out) == 2, "2D modes only")
    # normalize to mk,kn->mn
    contracted = (set(am) & set(bm)).pop()
    if bm[0] != contracted:
        b = b.T
        bm = bm[::-1]
    check(am[1] == contracted, "block-sparse A must have modes (out, contracted)")
    r = spmm(a, b)
    if out[0] != am[0]:
        r = r.T
    return r

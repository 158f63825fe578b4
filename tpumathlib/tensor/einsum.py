"""Einsum contraction engine with plan objects and a plan cache.

Parity: cuTENSOR contraction.cu:162-261 (descriptor → plan → execute with
alpha/beta), contraction_plan_cache.cu (cache), einsum.cu (generic parser),
contraction_trinary. JIT-compiled kernels (contraction_jit.cu) correspond to
XLA compilation — every plan is a compiled executable.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from tpumathlib.core.plan import PlanCache

_cache = PlanCache(maxsize=256)


@dataclasses.dataclass
class ContractionPlan:
    """≙ cutensorPlan_t: compiled contraction D = alpha·op(A)op(B) + beta·C."""

    subscripts: str
    fn: Any

    def __call__(self, *operands, alpha=1.0, beta=0.0, c=None):
        return self.fn(alpha, beta, c, *operands)


def plan_contraction(subscripts: str, *shapes_dtypes, out_dtype=None) -> ContractionPlan:
    """Build (or fetch from cache) a contraction plan. shapes_dtypes are
    (shape, dtype) pairs for each operand (the descriptor data)."""
    key = ("contraction", subscripts, tuple((tuple(s), str(d)) for s, d in shapes_dtypes),
           str(out_dtype))

    def build():
        @jax.jit
        def fn(alpha, beta, c, *ops):
            r = jnp.einsum(subscripts, *ops)
            r = alpha * r
            if c is not None:
                r = r + beta * c
            if out_dtype is not None:
                r = r.astype(out_dtype)
            return r

        return ContractionPlan(subscripts, fn)

    return _cache.get_or_build(key, build)


def contraction(subscripts: str, a, b, c=None, alpha=1.0, beta=0.0, out_dtype=None):
    """One-shot binary contraction (plan-cached)."""
    plan = plan_contraction(subscripts, (a.shape, a.dtype), (b.shape, b.dtype),
                            out_dtype=out_dtype)
    return plan(a, b, alpha=alpha, beta=beta, c=c)


def einsum(subscripts: str, *operands, alpha=1.0):
    """Generic einsum (≙ einsum.cu's parser — jnp.einsum IS the parser;
    supports any number of operands, ellipses, trinary contractions)."""
    plan = plan_contraction(subscripts, *[(o.shape, o.dtype) for o in operands])
    return plan(*operands, alpha=alpha)

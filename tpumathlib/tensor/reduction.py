"""Tensor reductions (≙ cuTENSOR reduction.cu): D = alpha·reduce(op(A)) +
beta·C over the modes missing from the output."""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

_REDUCERS = {
    "add": jnp.sum,
    "max": jnp.max,
    "min": jnp.min,
    "mul": jnp.prod,
    "norm1": lambda x, axis: jnp.sum(jnp.abs(x), axis=axis),
    "norm2": lambda x, axis: jnp.sqrt(jnp.sum(x * x, axis=axis)),
}


def reduction(a, modes_a: str, modes_out: str, alpha=1.0, beta=0.0, c=None,
              reduce_op: str = "add", unary_op: Callable | None = None):
    """≙ cutensorReduce: reduce the modes of A absent from modes_out."""
    axes = tuple(i for i, m in enumerate(modes_a) if m not in modes_out)
    x = unary_op(a) if unary_op is not None else a
    red = _REDUCERS[reduce_op]
    y = red(x, axis=axes)
    # reorder surviving modes
    kept = [m for m in modes_a if m in modes_out]
    if "".join(kept) != modes_out:
        y = jnp.transpose(y, [kept.index(m) for m in modes_out])
    y = alpha * y
    if c is not None:
        y = y + beta * c
    return y

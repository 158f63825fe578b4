"""Elementwise tensor ops with permutation (≙ cuTENSOR elementwise_binary /
elementwise_trinary / permutation samples, incl. the padded-permute variant).

Semantics: C = binary_op(alpha·op(Φ_A(A)), gamma·op(Φ_C(C))) where Φ are
mode permutations given einsum-style ("abc->cab"). Unary ``op`` is any jnp
elementwise fn; everything fuses into one XLA kernel (VPU)."""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def _perm(modes_in: str, modes_out: str, x):
    if modes_in == modes_out:
        return x
    axes = [modes_in.index(m) for m in modes_out]
    return jnp.transpose(x, axes)


def permute(x, modes: str, alpha=1.0, op: Callable | None = None,
            pad_to: Sequence[int] | None = None, pad_value=0.0):
    """B = alpha·op(permute(A)) (≙ cutensorPermute; ``pad_to`` gives the
    padded variant)."""
    src, dst = modes.split("->")
    y = alpha * _perm(src, dst, x)
    if op is not None:
        y = op(y)
    if pad_to is not None:
        pads = [(0, int(t) - int(s)) for s, t in zip(y.shape, pad_to)]
        y = jnp.pad(y, pads, constant_values=pad_value)
    return y


def elementwise_binary(a, modes_a: str, c, modes_c: str, modes_out: str,
                       alpha=1.0, gamma=1.0, op_a: Callable | None = None,
                       op_c: Callable | None = None,
                       op: Callable = jnp.add):
    """D = op(alpha·op_a(Φ(A)), gamma·op_c(Φ(C))) (≙ cutensorElementwiseBinary)."""
    av = alpha * _perm(modes_a, modes_out, a)
    cv = gamma * _perm(modes_c, modes_out, c)
    if op_a is not None:
        av = op_a(av)
    if op_c is not None:
        cv = op_c(cv)
    return op(av, cv)


def elementwise_trinary(a, modes_a: str, b, modes_b: str, c, modes_c: str,
                        modes_out: str, alpha=1.0, beta=1.0, gamma=1.0,
                        op_ab: Callable = jnp.add, op_abc: Callable = jnp.add):
    """D = op_abc(op_ab(alpha·Φ(A), beta·Φ(B)), gamma·Φ(C))
    (≙ cutensorElementwiseTrinary)."""
    av = alpha * _perm(modes_a, modes_out, a)
    bv = beta * _perm(modes_b, modes_out, b)
    cv = gamma * _perm(modes_c, modes_out, c)
    return op_abc(op_ab(av, bv), cv)

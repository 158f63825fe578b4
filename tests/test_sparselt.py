"""cuSPARSELt 2:4 structured sparsity oracles (≙ matmul / matmul_advanced)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.core import assert_allclose
from tpumathlib.sparse.sparselt import (
    compress24,
    decompress24,
    matmul24,
    prune24,
    prune_check24,
)


def test_prune_and_check(rng):
    a = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    p = prune24(a)
    assert int(prune_check24(p)) == 1
    assert int(prune_check24(a)) == 0  # dense fails the check
    # pruning keeps the 2 largest |.| per group
    g = np.asarray(a).reshape(16, 8, 4)
    pn = np.asarray(p).reshape(16, 8, 4)
    for i in range(16):
        for j in range(8):
            kept = np.nonzero(pn[i, j])[0]
            assert len(kept) <= 2
            top2 = np.argsort(-np.abs(g[i, j]))[:2]
            assert set(kept) <= set(top2)


def test_compress_roundtrip(rng):
    a = prune24(jnp.asarray(rng.normal(size=(8, 16)), jnp.float32))
    vals, meta = compress24(a)
    assert vals.shape == (8, 8) and meta.shape == (8, 8)
    back = decompress24(vals, meta)
    assert_allclose(back, np.asarray(a), rtol=0)


def test_matmul24(rng):
    m, k, n = 16, 32, 24
    a = prune24(jnp.asarray(rng.normal(size=(m, k)), jnp.float32))
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    vals, meta = compress24(a)
    d = matmul24(vals, meta, b)
    assert_allclose(d, np.asarray(a) @ np.asarray(b), rtol=1e-4)


def test_matmul24_relu_bias_batched(rng):
    """≙ matmul_advanced: batched + ReLU upper-bound/threshold + bias."""
    bsz, m, k, n = 3, 8, 16, 12
    a = prune24(jnp.asarray(rng.normal(size=(bsz, m, k)), jnp.float32))
    b = jnp.asarray(rng.normal(size=(bsz, k, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    vals, meta = compress24(a)
    d = matmul24(vals, meta, b, bias=bias, relu=True,
                 relu_upperbound=1.5, relu_threshold=0.1)
    pre = np.einsum("bij,bjk->bik", np.asarray(a), np.asarray(b)) + np.asarray(bias)
    want = np.where(pre > 0.1, pre, 0)
    want = np.minimum(want, 1.5)
    assert_allclose(d, want, rtol=1e-4)

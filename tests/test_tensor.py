"""cuTENSOR tier oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpumathlib.core import assert_allclose
from tpumathlib.mp import Grid
from tpumathlib.sparse import dense_to_blocked_ell
from tpumathlib.tensor import (
    block_sparse_einsum,
    contraction,
    einsum,
    elementwise_binary,
    elementwise_trinary,
    permute,
    plan_contraction,
    reduction,
    sharded_einsum,
)


def test_contraction_plan_cache(rng):
    a = jnp.asarray(rng.normal(size=(8, 6, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6, 4, 5)), jnp.float32)
    p1 = plan_contraction("mhk,hkn->mn", (a.shape, a.dtype), (b.shape, b.dtype))
    p2 = plan_contraction("mhk,hkn->mn", (a.shape, a.dtype), (b.shape, b.dtype))
    assert p1 is p2  # plan cache hit (≙ contraction_plan_cache.cu)
    got = p1(a, b, alpha=2.0)
    want = 2.0 * np.einsum("mhk,hkn->mn", np.asarray(a), np.asarray(b))
    assert_allclose(got, want, rtol=1e-4)


def test_contraction_alpha_beta(rng):
    a = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6, 5)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(8, 5)), jnp.float32)
    got = contraction("mk,kn->mn", a, b, c=c, alpha=1.5, beta=0.5)
    assert_allclose(got, 1.5 * np.asarray(a) @ np.asarray(b) + 0.5 * np.asarray(c), rtol=1e-4)


def test_einsum_trinary(rng):
    a = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(5, 6)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
    got = einsum("ij,jk,kl->il", a, b, c)
    assert_allclose(got, np.asarray(a) @ np.asarray(b) @ np.asarray(c), rtol=1e-4)


def test_permute_pad(rng):
    a = jnp.asarray(rng.normal(size=(3, 4, 5)), jnp.float32)
    got = permute(a, "abc->cab", alpha=2.0, pad_to=(6, 4, 4), pad_value=-1.0)
    want = np.full((6, 4, 4), -1.0, np.float32)
    want[:5, :3, :4] = 2.0 * np.transpose(np.asarray(a), (2, 0, 1))
    assert_allclose(got, want, rtol=1e-6)


def test_elementwise_binary_trinary(rng):
    a = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    got = elementwise_binary(a, "ab", c, "ba", "ab", alpha=2.0, gamma=-1.0,
                             op=jnp.add)
    assert_allclose(got, 2 * np.asarray(a) - np.asarray(c).T, rtol=1e-6)
    b = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    got3 = elementwise_trinary(a, "ab", b, "ab", c, "ba", "ab",
                               op_ab=jnp.minimum, op_abc=jnp.multiply)
    want3 = np.minimum(np.asarray(a), np.asarray(b)) * np.asarray(c).T
    assert_allclose(got3, want3, rtol=1e-6)


def test_reduction(rng):
    a = jnp.asarray(rng.normal(size=(4, 5, 6)), jnp.float32)
    got = reduction(a, "abc", "b", alpha=2.0)
    assert_allclose(got, 2 * np.asarray(a).sum(axis=(0, 2)), rtol=1e-5)
    gmax = reduction(a, "abc", "ca", reduce_op="max")
    assert_allclose(gmax, np.asarray(a).max(axis=1).T, rtol=1e-6)
    gn1 = reduction(a, "abc", "a", reduce_op="norm1")
    assert_allclose(gn1, np.abs(np.asarray(a)).sum(axis=(1, 2)), rtol=1e-5)


def test_block_sparse_einsum(rng):
    m, k, bs = 16, 24, 4
    blocks = rng.uniform(size=(m // bs, k // bs)) < 0.5
    a = np.kron(blocks, np.ones((bs, bs))) * rng.normal(size=(m, k))
    bell = dense_to_blocked_ell(a.astype(np.float32), bs)
    b = rng.normal(size=(k, 10)).astype(np.float32)
    got = block_sparse_einsum("mk,kn->mn", bell, jnp.asarray(b))
    assert_allclose(got, a @ b, rtol=1e-4)
    bt = rng.normal(size=(10, k)).astype(np.float32)
    got2 = block_sparse_einsum("mk,nk->mn", bell, jnp.asarray(bt))
    assert_allclose(got2, a @ bt.T, rtol=1e-4)


def test_sharded_einsum(rng):
    """≙ cuTENSORMg/cutensorMp distributed contraction, dist-vs-local oracle."""
    grid = Grid.create(jax.devices())
    a = rng.normal(size=(32, 48)).astype(np.float32)
    b = rng.normal(size=(48, 16)).astype(np.float32)
    got = sharded_einsum("mk,kn->mn", jnp.asarray(a), jnp.asarray(b), grid,
                         {"m": "x"})
    assert_allclose(got, a @ b, rtol=1e-4)
    # contracted-mode sharding → psum over ICI
    got2 = sharded_einsum("mk,kn->mn", jnp.asarray(a), jnp.asarray(b), grid,
                          {"k": "x"})
    assert_allclose(got2, a @ b, rtol=1e-4)

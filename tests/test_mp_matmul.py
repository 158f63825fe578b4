"""Distributed TP matmul oracles: distributed-vs-single-device comparison
(≙ the cuBLASMp verify harness: gather + single-GPU cuBLASLt reference +
allclose, cuBLASMp/matmul.h:303-577). Runs on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpumathlib.core import assert_allclose
from tpumathlib.mp import Grid, matmul_ag, matmul_allreduce, matmul_rs, numroc, tp_matmul
from tpumathlib.mp.matmul import gemr2d

S, H, F = 64, 32, 128  # seq, hidden, ffn


@pytest.fixture(scope="module")
def grid():
    return Grid.create(jax.devices())


@pytest.fixture
def data(rng):
    x = rng.normal(size=(S, H)).astype(np.float32)
    w1 = rng.normal(size=(H, F)).astype(np.float32) / np.sqrt(H)
    w2 = rng.normal(size=(F, H)).astype(np.float32) / np.sqrt(F)
    return x, w1, w2


def _put(grid, arr, spec):
    return jax.device_put(jnp.asarray(arr), NamedSharding(grid.mesh, spec))


def test_matmul_ag(grid, data):
    x, w1, _ = data
    xs = _put(grid, x, P("x", None))
    ws = _put(grid, w1, P(None, "x"))
    d = matmul_ag(xs, ws, grid)
    assert_allclose(d, x @ w1, rtol=1e-4, msg="AG+GEMM")


def test_matmul_ag_bias_epilogue(grid, data, rng):
    x, w1, _ = data
    bias = rng.normal(size=F).astype(np.float32)
    xs = _put(grid, x, P("x", None))
    ws = _put(grid, w1, P(None, "x"))
    bs = _put(grid, bias, P("x"))
    d = matmul_ag(xs, ws, grid, epilogue="relu_bias", bias=bs)
    assert_allclose(d, np.maximum(x @ w1 + bias, 0), rtol=1e-4, msg="AG+GEMM relu_bias")


def test_matmul_rs(grid, data):
    x, _, _ = data
    a = np.random.default_rng(7).normal(size=(S, F)).astype(np.float32)
    b = np.random.default_rng(8).normal(size=(F, H)).astype(np.float32)
    as_ = _put(grid, a, P(None, "x"))
    bs = _put(grid, b, P("x", None))
    d = matmul_rs(as_, bs, grid)
    assert d.sharding.spec == P("x", None)
    assert_allclose(d, a @ b, rtol=1e-4, msg="GEMM+RS")


def test_matmul_allreduce(grid, data):
    a = np.random.default_rng(7).normal(size=(S, F)).astype(np.float32)
    b = np.random.default_rng(8).normal(size=(F, H)).astype(np.float32)
    as_ = _put(grid, a, P(None, "x"))
    bs = _put(grid, b, P("x", None))
    d = matmul_allreduce(as_, bs, grid)
    assert_allclose(d, a @ b, rtol=1e-4, msg="GEMM+AR")


def test_tp_matmul_cycle(grid, data):
    """Full TP-MLP: distributed vs single-device reference."""
    x, w1, w2 = data
    xs = _put(grid, x, P("x", None))
    w1s = _put(grid, w1, P(None, "x"))
    w2s = _put(grid, w2, P("x", None))
    d = jax.jit(
        lambda x, a, b: tp_matmul(x, a, b, grid, epilogue="gelu"),
    )(xs, w1s, w2s)
    pre = x @ w1
    h = 0.5 * pre * (1 + np.tanh(np.sqrt(2 / np.pi) * (pre + 0.044715 * pre**3)))
    assert_allclose(d, h @ w2, rtol=1e-4, msg="tp_matmul")


def test_gemr2d(grid, data):
    x, _, _ = data
    xs = _put(grid, x, P("x", None))
    y = gemr2d(xs, NamedSharding(grid.mesh, P(None, "x")))
    assert y.sharding.spec == P(None, "x")
    assert_allclose(y, x, rtol=0)


def test_numroc():
    # ScaLAPACK reference values: n=10, nb=3, 4 procs → blocks 0..3 of sizes
    # 3,3,3,1 round-robin
    assert [numroc(10, 3, p, 4) for p in range(4)] == [3, 3, 3, 1]
    assert [numroc(10, 2, p, 2) for p in range(2)] == [6, 4]
    assert sum(numroc(1000, 32, p, 8) for p in range(8)) == 1000


def test_matmul_ag_overlapped(grid, data):
    """Hand-overlapped ring AG+GEMM Pallas kernel vs the XLA-collective
    path and the local reference (≙ cuBLASMp's NVSHMEM overlap)."""
    from tpumathlib.mp.overlap import matmul_ag_overlapped

    x, w1, _ = data
    xs = _put(grid, x, P("x", None))
    ws = _put(grid, w1, P(None, "x"))
    d = matmul_ag_overlapped(xs, ws, grid)
    assert d.sharding.spec == P(None, "x")
    assert_allclose(d, x @ w1, rtol=1e-4, msg="overlapped AG+GEMM")


def test_matmul_rs_overlapped(grid, data):
    """Hand-overlapped ring GEMM+ReduceScatter (≙ cuBLASMp matmul_rs)."""
    from tpumathlib.mp.overlap import matmul_rs_overlapped

    a = np.random.default_rng(7).normal(size=(S, F)).astype(np.float32)
    b = np.random.default_rng(8).normal(size=(F, H)).astype(np.float32)
    as_ = _put(grid, a, P(None, "x"))
    bs = _put(grid, b, P("x", None))
    d = matmul_rs_overlapped(as_, bs, grid)
    assert d.sharding.spec in (P("x", None), P("x"))
    assert_allclose(d, a @ b, rtol=1e-4, msg="overlapped GEMM+RS")

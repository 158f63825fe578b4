"""Pallas MXU GEMM kernel oracles vs NumPy.

Parity model: cuBLAS/Level-3/gemm + cuBLASLt epilogue samples — result
checked against a host reference at dtype-dependent rtol (≙ allclose_host,
cuBLASMp/helpers.h:1300-1362).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.core import assert_allclose, default_rtol
from tpumathlib.dx import MatmulConfig, pallas_matmul


def _ref_gelu(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(128, 128, 128), (256, 384, 512), (100, 50, 70)])
def test_matmul_basic(dtype, shape, rng):
    m, n, k = shape
    a = jnp.asarray(rng.normal(size=(m, k)), dtype)
    b = jnp.asarray(rng.normal(size=(k, n)), dtype)
    got = pallas_matmul(a, b, out_dtype=jnp.float32)
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    assert_allclose(got, want, rtol=10 * default_rtol(dtype), msg="matmul")


def test_matmul_alpha_beta_c(rng):
    m, n, k = 64, 96, 128
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    got = pallas_matmul(a, b, c, alpha=2.5, beta=-0.5)
    want = 2.5 * np.asarray(a, np.float64) @ np.asarray(b, np.float64) - 0.5 * np.asarray(c)
    assert_allclose(got, want, rtol=1e-4, msg="alpha/beta")


def test_matmul_batched(rng):
    a = jnp.asarray(rng.normal(size=(3, 64, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(3, 32, 48)), jnp.float32)
    got = pallas_matmul(a, b)
    want = np.einsum("bmk,bkn->bmn", np.asarray(a, np.float64), np.asarray(b, np.float64))
    assert_allclose(got, want, rtol=1e-4, msg="batched")


@pytest.mark.parametrize("epi", ["bias", "relu", "gelu_bias", "relu_aux_bias"])
def test_matmul_epilogues(epi, rng):
    m, n, k = 64, 128, 64
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32) if "bias" in epi else None
    aux_wanted = "aux" in epi
    out = pallas_matmul(a, b, bias=bias, epilogue=epi, return_aux=aux_wanted)
    got = out[0] if aux_wanted else out
    pre = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    if bias is not None:
        pre = pre + np.asarray(bias)
    if epi.startswith("relu"):
        want = np.maximum(pre, 0)
    elif epi.startswith("gelu"):
        want = _ref_gelu(pre)
    else:
        want = pre
    assert_allclose(got, want, rtol=1e-4, msg=epi)
    if aux_wanted:
        assert_allclose(out[1], pre, rtol=1e-4, msg=epi + " aux")


def test_matmul_explicit_config(rng):
    a = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    got = pallas_matmul(a, b, config=MatmulConfig(128, 128, 128))
    assert_allclose(got, np.asarray(a) @ np.asarray(b), rtol=1e-4)


def test_matmul_int8(rng):
    a = jnp.asarray(rng.integers(-4, 5, size=(64, 128)), jnp.int8)
    b = jnp.asarray(rng.integers(-4, 5, size=(128, 64)), jnp.int8)
    got = pallas_matmul(a, b, out_dtype=jnp.float32)
    want = np.asarray(a, np.int64) @ np.asarray(b, np.int64)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.float32))


# ---------------- nvCOMPDx tier: in-kernel (de)compression ----------------

def test_dx_comp_roundtrip(rng):
    """In-kernel cascaded (delta+zigzag+bitpack) codec (≙ nvCOMPDx):
    exact roundtrip and the advertised ratio."""
    import jax.numpy as jnp

    from tpumathlib.dx.comp import (
        dx_compress, dx_decompress, dx_required_bits)

    v = np.cumsum(rng.integers(-20, 21, 65536)).astype(np.int32)
    bits = dx_required_bits(v)
    packed, leaders = dx_compress(jnp.asarray(v), bits=bits)
    dec = np.asarray(dx_decompress(packed, leaders, bits=bits))
    np.testing.assert_array_equal(dec[:len(v)], v)
    nbytes = (np.asarray(packed).size + np.asarray(leaders).size) * 4
    assert v.nbytes / nbytes > 4.0  # 6-bit deltas + 3% leaders


def test_dx_decompress_dot(rng):
    """Decompress-then-compute fusion: decoded values feed the MXU without
    an HBM round trip (the nvCOMPDx premise)."""
    import jax.numpy as jnp

    from tpumathlib.dx.comp import (
        dx_compress, dx_decompress_dot, dx_required_bits)

    v = np.cumsum(rng.integers(-20, 21, 32768)).astype(np.int32)
    bits = dx_required_bits(v)
    packed, leaders = dx_compress(jnp.asarray(v), bits=bits)
    w = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
    out = np.asarray(dx_decompress_dot(packed, leaders, w, bits=bits,
                                       scale=0.01))
    ref = (v.reshape(-1, 128).astype(np.float64) * 0.01) @ np.asarray(
        w, np.float64)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, rel

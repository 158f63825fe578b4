"""cuBLASLt engine oracles: descriptor flow, epilogues, narrow-precision
scale modes, algo heuristic/search, quantization.

Parity: LtSgemm, LtFp8Matmul, LtMxfp8Matmul, LtNvfp4Matmul,
LtBlk128x128Fp8Matmul, LtMatmulCustomFind (SURVEY.md §2.2). Note: the
reference Lt samples check status only; we check numerics too.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.blas import lt
from tpumathlib.core import assert_allclose

M, N, K = 64, 96, 128


@pytest.fixture
def ab(rng):
    a = rng.normal(size=(M, K)).astype(np.float32)
    b = rng.normal(size=(K, N)).astype(np.float32)
    return a, b


def test_lt_sgemm_flow(ab):
    """≙ sample_cublasLt_LtSgemm.cu:54-84: desc → heuristic → matmul."""
    a, b = ab
    desc = lt.MatmulDesc(transa="N", transb="N")
    algos = lt.matmul_algo_get_heuristic(
        desc, lt.MatrixLayout(jnp.float32, M, K), lt.MatrixLayout(jnp.float32, K, N))
    assert len(algos) == 1
    d = lt.matmul(desc, jnp.asarray(a), jnp.asarray(b), algo=algos[0])
    assert_allclose(d, a @ b, rtol=1e-4)


def test_lt_trans_alpha_beta(ab, rng):
    a, b = ab  # a: (M,K) → op(A)=aᵀ (K,M); bt: (N,M) → op(B)=btᵀ (M,N)
    bt = rng.normal(size=(N, M)).astype(np.float32)
    c = rng.normal(size=(K, N)).astype(np.float32)
    desc = lt.MatmulDesc(transa="T", transb="T")
    d = lt.matmul(desc, jnp.asarray(a), jnp.asarray(bt),
                  jnp.asarray(c), alpha=1.5, beta=0.5)
    assert_allclose(d, 1.5 * a.T @ bt.T + 0.5 * c, rtol=1e-4)


@pytest.mark.parametrize("epi", [lt.Epilogue.GELU_BIAS, lt.Epilogue.RELU_AUX_BIAS])
def test_lt_epilogues(ab, rng, epi):
    a, b = ab
    bias = rng.normal(size=N).astype(np.float32)
    desc = lt.MatmulDesc(epilogue=epi)
    out = lt.matmul(desc, jnp.asarray(a), jnp.asarray(b), bias=jnp.asarray(bias))
    pre = a @ b + bias
    if "aux" in epi.value:
        d, aux = out
        assert_allclose(aux, pre, rtol=1e-4)
    else:
        d = out
    if epi.value.startswith("relu"):
        want = np.maximum(pre, 0)
    else:
        want = 0.5 * pre * (1 + np.tanh(np.sqrt(2 / np.pi) * (pre + 0.044715 * pre**3)))
    assert_allclose(d, want, rtol=1e-4)


def test_lt_fp8_per_tensor(ab):
    """≙ LtFp8Matmul: e4m3 operands, per-tensor scales, amax_d out."""
    a, b = ab
    qa, sa = lt.quantize(jnp.asarray(a), jnp.float8_e4m3fn)
    qb, sb = lt.quantize(jnp.asarray(b), jnp.float8_e4m3fn)
    assert qa.dtype == jnp.float8_e4m3fn and sa.shape == ()
    desc = lt.MatmulDesc(amax_d=True)
    d, amax = lt.matmul(desc, qa, qb, a_scale=sa, b_scale=sb, out_dtype=jnp.float32)
    want = a @ b
    assert_allclose(d, want, rtol=0.15)
    assert np.isclose(float(amax), np.abs(np.asarray(d)).max(), rtol=1e-5)


def test_lt_mxfp8_block_scales(ab):
    """≙ LtMxfp8Matmul: 1×32 UE8M0 block scales."""
    a, b = ab
    mode = lt.ScaleMode.VEC32_UE8M0
    qa, sa = lt.quantize(jnp.asarray(a), jnp.float8_e4m3fn, mode, "a")
    qb, sb = lt.quantize(jnp.asarray(b), jnp.float8_e4m3fn, mode, "b")
    assert sa.shape == lt.scale_tensor_shape(mode, M, K, "a") == (M, K // 32)
    assert sb.shape == lt.scale_tensor_shape(mode, K, N, "b") == (K // 32, N)
    # UE8M0 scales are exact powers of two
    assert np.all(np.exp2(np.round(np.log2(np.asarray(sa)))) == np.asarray(sa))
    desc = lt.MatmulDesc(a_scale_mode=mode, b_scale_mode=mode)
    d = lt.matmul(desc, qa, qb, a_scale=sa, b_scale=sb, out_dtype=jnp.float32)
    assert_allclose(d, a @ b, rtol=0.1)


def test_lt_nvfp4(ab):
    """≙ LtNvfp4Matmul: fp4 e2m1 + 1×16 e4m3 block scales."""
    a, b = ab
    mode = lt.ScaleMode.VEC16_E4M3
    qa, sa = lt.quantize(jnp.asarray(a), jnp.float4_e2m1fn, mode, "a")
    qb, sb = lt.quantize(jnp.asarray(b), jnp.float4_e2m1fn, mode, "b")
    assert sa.shape == (M, K // 16)
    desc = lt.MatmulDesc(a_scale_mode=mode, b_scale_mode=mode)
    d = lt.matmul(desc, qa, qb, a_scale=sa, b_scale=sb, out_dtype=jnp.float32)
    # fp4 is very coarse: check correlation rather than tight error
    want = a @ b
    g = np.asarray(d).ravel()
    w = want.ravel()
    corr = np.corrcoef(g, w)[0, 1]
    assert corr > 0.98, corr


def test_lt_nvfp4_packed(ab):
    """Packed-int4 e2m1 storage (the sample's core point: 4-bit operands —
    sample_cublasLt_LtNvfp4Matmul.cu:73-79): quantize → PackedFp4 (two
    codes per byte) + 1×16 e4m3 scales → lt.matmul → rel err ≤ 0.1."""
    a, b = ab
    mode = lt.ScaleMode.VEC16_E4M3
    qa, sa = lt.fp4_quantize(jnp.asarray(a), mode, "a")
    qb, sb = lt.fp4_quantize(jnp.asarray(b), mode, "b")
    # truly 4-bit storage: half a byte per element
    assert qa.data.dtype == jnp.uint8 and qa.data.shape == (M, K // 2)
    assert np.asarray(sa).dtype == jnp.float8_e4m3fn
    # codes round-trip bit-exactly through pack/unpack
    codes = lt.fp4_encode(jnp.asarray(a) / lt._expand_scale(
        a.shape, sa, mode, "a"))
    np.testing.assert_array_equal(
        np.asarray(lt.fp4_unpack(lt.fp4_pack(codes))), np.asarray(codes))
    # decoded values are e2m1 levels exactly
    vals = np.asarray(lt.fp4_dequantize(qa))
    assert set(np.unique(np.abs(vals))) <= {0.0, 0.5, 1.0, 1.5, 2.0, 3.0,
                                            4.0, 6.0}
    desc = lt.MatmulDesc(a_scale_mode=mode, b_scale_mode=mode, amax_d=True)
    d, amax = lt.matmul(desc, qa, qb, a_scale=sa, b_scale=sb,
                        out_dtype=jnp.float32)
    want = a @ b
    rel = np.linalg.norm(np.asarray(d) - want) / np.linalg.norm(want)
    # intrinsic e2m1 noise: ~8-10% RMS per operand at the sample's amax/6
    # scale mapping → ~0.14 on the product for N(0,1) data
    assert rel <= 0.15, rel
    assert np.isclose(float(amax), np.abs(np.asarray(d)).max(), rtol=1e-5)


def test_lt_blk128(rng):
    """≙ LtBlk128x128Fp8Matmul: DeepSeek-style 2D block scaling."""
    m, n, k = 256, 256, 256
    a = rng.normal(size=(m, k)).astype(np.float32)
    b = rng.normal(size=(k, n)).astype(np.float32)
    mode = lt.ScaleMode.BLK128_F32
    qa, sa = lt.quantize(jnp.asarray(a), jnp.float8_e4m3fn, mode, "a")
    qb, sb = lt.quantize(jnp.asarray(b), jnp.float8_e4m3fn, mode, "b")
    assert sa.shape == (2, 2)
    desc = lt.MatmulDesc(a_scale_mode=mode, b_scale_mode=mode)
    d = lt.matmul(desc, qa, qb, a_scale=sa, b_scale=sb, out_dtype=jnp.float32)
    assert_allclose(d, a @ b, rtol=0.15)


def test_lt_int8(ab):
    a, b = ab
    qa, sa = lt.quantize(jnp.asarray(a), jnp.int8)
    qb, sb = lt.quantize(jnp.asarray(b), jnp.int8)
    desc = lt.MatmulDesc()
    d = lt.matmul(desc, qa, qb, a_scale=sa, b_scale=sb, out_dtype=jnp.float32)
    assert_allclose(d, a @ b, rtol=0.1)


def test_lt_backward_epilogues(ab, rng):
    a, b = ab
    aux = (a @ b).astype(np.float32)
    desc = lt.MatmulDesc(epilogue=lt.Epilogue.DRELU)
    d = lt.matmul(desc, jnp.asarray(a), jnp.asarray(b), aux=jnp.asarray(aux))
    want = (a @ b) * (aux > 0)
    assert_allclose(d, want, rtol=1e-4)
    desc = lt.MatmulDesc(epilogue=lt.Epilogue.BGRADB)
    d, bgrad = lt.matmul(desc, jnp.asarray(a), jnp.asarray(b))
    assert_allclose(bgrad, b.sum(axis=0), rtol=1e-4)


def test_lt_plan_and_autotune(ab, tmp_path, monkeypatch):
    """≙ LtMatmulCustomFind: timed sweep returns a working algo."""
    import tpumathlib.core.tuning as tuning

    monkeypatch.setattr(tuning, "_global_cache", tuning.AutotuneCache(str(tmp_path / "at.json")))
    a, b = ab
    desc = lt.MatmulDesc()
    cands = [lt.Algo("xla"), lt.Algo("pallas")]
    algo = lt.matmul_autotune(desc, jnp.asarray(a), jnp.asarray(b), candidates=cands)
    assert algo in cands
    plan = lt.Matmul(desc, algo)
    assert_allclose(plan(jnp.asarray(a), jnp.asarray(b)), a @ b, rtol=1e-4)


def test_lt_dgemm_emulated(rng):
    """≙ LtDgemmEmulated: fp64 matmul through the Ozaki int8-slice engine."""
    a = rng.normal(size=(24, 32))
    b = rng.normal(size=(32, 16))
    c = rng.normal(size=(24, 16))
    desc = lt.MatmulDesc(compute_dtype=jnp.float64)
    d = lt.matmul(desc, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                  alpha=1.5, beta=0.5)
    assert d.dtype == jnp.float64
    want = 1.5 * a @ b + 0.5 * c
    err = np.abs(np.asarray(d) - want).max() / np.abs(want).max()
    assert err < 1e-12, err


def test_igemm_int32_exact(rng):
    """≙ LtIgemmTensor: CUBLAS_COMPUTE_32I int8×int8→int32 matmul is
    bit-exact vs the NumPy int32 reference (no dequant round trip)."""
    m, k, n = 64, 96, 48
    a = rng.integers(-128, 128, (m, k), dtype=np.int8)
    b = rng.integers(-128, 128, (k, n), dtype=np.int8)
    ref = a.astype(np.int32) @ b.astype(np.int32)
    desc = lt.MatmulDesc(compute_dtype=jnp.int32)
    d = lt.matmul(desc, jnp.asarray(a), jnp.asarray(b))
    assert d.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(d), ref)
    # alpha/beta integer semantics + int32 C accumulation
    cmat = rng.integers(-1000, 1000, (m, n), dtype=np.int32)
    d2 = lt.matmul(desc, jnp.asarray(a), jnp.asarray(b), c=jnp.asarray(cmat),
                   alpha=2, beta=-3)
    np.testing.assert_array_equal(np.asarray(d2), 2 * ref - 3 * cmat)
    # transposed A spelling of the reference sample (op(A)=T)
    desc_t = lt.MatmulDesc(compute_dtype=jnp.int32, transa="T")
    d3 = lt.matmul(desc_t, jnp.asarray(a.T.copy()), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(d3), ref)
    # non-integer alpha is rejected
    import pytest

    with pytest.raises(Exception):
        lt.matmul(desc, jnp.asarray(a), jnp.asarray(b), alpha=0.5)

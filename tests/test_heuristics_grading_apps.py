"""nvMatmulHeuristics, gemm_grading, csrqr/csreigvsi, MathDx fused ops,
cuPQC primitives, and the cuEST-class SCF app."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpumathlib.blas.grading import (
    classify_gemm,
    fixedpoint_matmul,
    strassen_matmul,
)
from tpumathlib.core import assert_allclose, rel_l2
from tpumathlib.dx.fused import fft_convolution, gemm_fft, gemm_gemm
from tpumathlib.dx.gemm import MatmulConfig
from tpumathlib.heuristics import (
    PREDEFINED,
    detect_hardware,
    estimate_runtime,
    get_configs,
)
from tpumathlib.pqc import kyber_intt, kyber_ntt, kyber_polymul, merkle_root, sha256
from tpumathlib.sparse.convert import dense_to_csr
from tpumathlib.sparse.lsq import csreigvsi, csrqr_batched


# ---------------- heuristics ----------------

def test_heuristics_configs():
    cfgs = get_configs(4096, 4096, 4096, jnp.bfloat16, count=5)
    assert len(cfgs) == 5
    assert all(isinstance(c, MatmulConfig) for c in cfgs)
    # big square problems should prefer large tiles
    assert cfgs[0].bm >= 256 and cfgs[0].bn >= 256


def test_heuristics_roofline_sanity():
    hw = PREDEFINED["TPU v5e"]
    big = estimate_runtime(8192, 8192, 8192, jnp.bfloat16, MatmulConfig(512, 512, 512), hw)
    small = estimate_runtime(512, 512, 512, jnp.bfloat16, MatmulConfig(512, 512, 512), hw)
    assert big > small
    # compute-bound lower bound: ≥ flops/peak
    assert big >= 2 * 8192**3 / (hw.bf16_tflops * 1e12)
    assert detect_hardware().name.startswith("TPU")


# ---------------- grading ----------------

def test_strassen_and_fixedpoint_oracles(rng):
    a = rng.normal(size=(128, 128))
    b = rng.normal(size=(128, 128))
    assert rel_l2(strassen_matmul(a, b, leaf=32), a @ b) < 1e-12
    assert rel_l2(fixedpoint_matmul(a, b), a @ b) < 1e-3


def test_classify_gemm_classes(rng):
    r64 = classify_gemm(lambda a, b: a @ b)
    assert r64["precision_class"] == "fp64" and r64["grade"] == "A"
    r32 = classify_gemm(lambda a, b: (a.astype(np.float32) @ b.astype(np.float32)))
    assert r32["precision_class"] == "fp32"
    # extended-precision GEMM → indistinguishable from exact
    rex = classify_gemm(
        lambda a, b: (a.astype(np.longdouble) @ b.astype(np.longdouble)).astype(np.float64))
    assert rex["precision_class"] == "exact"
    # input-quantized (fixed-point-style) GEMM lands in the low-precision class
    rq = classify_gemm(lambda a, b: (np.round(a * 8) @ np.round(b * 8)) / 64)
    assert rq["precision_class"] in ("fp16", "bf16")

    def bf16ish(a, b):
        # input-truncated GEMM: error is an input perturbation (√K
        # cancellation), so it classifies at-or-above its storage precision
        def trunc(x):
            v = x.astype(np.float32)
            u = v.view(np.uint32) & 0xFFFF0000
            return u.view(np.float32)
        return trunc(a) @ trunc(b)

    rb = classify_gemm(bf16ish)
    assert rb["unit_roundoff_estimate"] > r32["unit_roundoff_estimate"]


# ---------------- csrqr / csreigvsi ----------------

def test_csrqr_batched(rng):
    m, n = 30, 12
    a = sp.random(m, n, 0.4, random_state=5).toarray() + np.pad(
        np.eye(n), ((0, m - n), (0, 0)))
    bs = rng.normal(size=(3, m))
    xs = csrqr_batched(dense_to_csr(a), bs)
    for b, x in zip(bs, xs):
        want = np.linalg.lstsq(a, b, rcond=None)[0]
        assert_allclose(x, want, rtol=1e-8, msg="csrqr")


def test_csreigvsi(rng):
    n = 20
    g = rng.normal(size=(n, n))
    a = (g + g.T) / 2
    w = np.linalg.eigvalsh(a)
    target = w[3]
    mu, x, iters = csreigvsi(dense_to_csr(a), float(target + 0.05))
    assert abs(mu - target) < 1e-8
    assert_allclose(a @ x, mu * x, rtol=1e-6)


def test_csreigs(rng):
    """Contour-integral eigenvalue count in a complex box (≙
    csreigs2cuDSS_dcomplex.cpp): the sample's own 4x4 fixture + a random
    dense complex matrix, both counted against numpy eigvals."""
    from tpumathlib.sparse.lsq import csreigs

    # the reference sample's fixture and box
    a = np.zeros((4, 4), complex)
    a[0, 0], a[0, 1] = 1 + 1j, 1 + 1j
    a[1, 1], a[1, 2] = 1 - 2j, -1 - 1j
    a[2, 2], a[2, 3] = 1 - 2j, 1 - 1j
    a[3, 0], a[3, 3] = -2 + 2j, 1j
    lb, ru = -1 - 3j, 1 + 1j

    def inside(w):
        return int(np.sum((w.real > lb.real) & (w.real < ru.real)
                          & (w.imag > lb.imag) & (w.imag < ru.imag)))

    got = csreigs(dense_to_csr(a.real), dense_to_csr(a.imag), lb, ru)
    assert got == inside(np.linalg.eigvals(a)), got
    # random complex matrix, a box catching part of the spectrum
    n = 12
    m = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))) / np.sqrt(n)
    lb2, ru2 = -0.8 - 0.8j, 0.8 + 0.8j
    got2 = csreigs(dense_to_csr(m.real), dense_to_csr(m.imag), lb2, ru2,
                   nh=32, nv=32)
    want2 = int(np.sum((np.linalg.eigvals(m).real > -0.8)
                       & (np.linalg.eigvals(m).real < 0.8)
                       & (np.linalg.eigvals(m).imag > -0.8)
                       & (np.linalg.eigvals(m).imag < 0.8)))
    assert got2 == want2, (got2, want2)


# ---------------- fused (MathDx) ----------------

def test_gemm_fft(rng):
    a = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    yr, yi = gemm_fft(a, b)
    want = np.fft.fft(np.asarray(a) @ np.asarray(b), axis=-1)
    assert rel_l2(np.asarray(yr) + 1j * np.asarray(yi), want) < 1e-5


def test_gemm_gemm(rng):
    a = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(16, 24)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(24, 8)), jnp.float32)
    assert_allclose(gemm_gemm(a, b, c),
                    np.asarray(a) @ np.asarray(b) @ np.asarray(c), rtol=1e-4)


def test_fft_convolution_3d(rng):
    """3-D circular convolution via planar FFTs (≙ cuFFTDx
    07_convolution_3d) vs a scipy.ndimage/NumPy direct reference."""
    from tpumathlib.dx.fused import fft_convolution_nd

    x = rng.normal(size=(2, 8, 16, 32)).astype(np.float32)
    k = rng.normal(size=(8, 16, 32)).astype(np.float32)
    got = np.asarray(fft_convolution_nd(jnp.asarray(x), jnp.asarray(k),
                                        naxes=3))
    want = np.real(np.fft.ifftn(
        np.fft.fftn(x, axes=(-3, -2, -1))
        * np.fft.fftn(k, axes=(-3, -2, -1)), axes=(-3, -2, -1)))
    assert_allclose(got, want, rtol=2e-4, msg="conv3d")


def test_fft_convolution(rng):
    n = 128
    x = rng.normal(size=(4, n)).astype(np.float32)
    k = np.zeros(n, np.float32)
    k[:5] = rng.normal(size=5)
    got = np.asarray(fft_convolution(jnp.asarray(x), jnp.asarray(k)))
    want = np.stack([np.real(np.fft.ifft(np.fft.fft(r) * np.fft.fft(k))) for r in x])
    assert rel_l2(got, want) < 1e-4


# ---------------- pqc ----------------

def test_sha256_vs_hashlib(rng):
    msgs = [bytes(rng.integers(0, 256, 100, dtype=np.uint8)) for _ in range(8)]
    got = sha256(msgs)
    for m, d in zip(msgs, got):
        assert d == hashlib.sha256(m).digest()
    # single-message API, block boundary cases
    for ln in (0, 55, 56, 64, 119):
        m = bytes(range(ln % 256))[:ln]
        assert sha256(m) == hashlib.sha256(m).digest()


def test_merkle_root():
    leaves = [b"leaf%d" % i for i in range(5)]
    root = merkle_root(leaves)
    # reference: duplicate-last binary tree over hashlib
    lvl = [hashlib.sha256(l).digest() for l in leaves]
    while len(lvl) > 1:
        if len(lvl) % 2:
            lvl.append(lvl[-1])
        lvl = [hashlib.sha256(lvl[i] + lvl[i + 1]).digest()
               for i in range(0, len(lvl), 2)]
    assert root == lvl[0]


def test_kyber_ntt(rng):
    from tpumathlib.pqc.ntt import N, Q

    a = rng.integers(0, Q, N).astype(np.int32)
    b = rng.integers(0, Q, N).astype(np.int32)
    r = np.asarray(kyber_intt(kyber_ntt(jnp.asarray(a)))) % Q
    np.testing.assert_array_equal(r, a % Q)
    c = np.zeros(N, np.int64)
    for i in range(N):
        c[i:] += a[i] * b[: N - i]
        c[:i] -= a[i] * b[N - i:]
    c %= Q
    got = np.asarray(kyber_polymul(jnp.asarray(a), jnp.asarray(b))) % Q
    np.testing.assert_array_equal(got, c)
    # batched polynomials (the Kyber k×k matrix case)
    ab = rng.integers(0, Q, (3, N)).astype(np.int32)
    rb = np.asarray(kyber_intt(kyber_ntt(jnp.asarray(ab)))) % Q
    np.testing.assert_array_equal(rb, ab % Q)


# ---------------- scf ----------------

def test_rhf_h2():
    """Szabo–Ostlund benchmark: H₂/STO-3G at R = 1.4 a₀ → −1.1167 Ha."""
    from tpumathlib.apps import Molecule, rhf

    mol = Molecule(["H", "H"], np.array([[0, 0, 0], [0, 0, 1.4]]))
    out = rhf(mol)
    assert out["converged"]
    assert abs(out["energy"] - (-1.11671)) < 2e-4
    # density idempotency in the S metric: D S D = D
    from tpumathlib.apps.scf import overlap, sto3g_basis

    s = overlap(sto3g_basis(mol))
    d = out["density"]
    assert_allclose(d @ s @ d, d, rtol=1e-6)


def test_rhf_heh_plus():
    from tpumathlib.apps import Molecule, rhf

    mol = Molecule(["He", "H"], np.array([[0, 0, 0], [0, 0, 1.4632]]), charge=1)
    out = rhf(mol)
    assert out["converged"]
    # 2 electrons in the bonding orbital, energy in the physical range
    assert -2.95 < out["energy"] < -2.7
    assert out["orbital_energies"][0] < out["orbital_energies"][1]


def test_j2k_codec(rng):
    """nvJPEG2000-class reversible wavelet codec."""
    from tpumathlib.image.j2k import dwt53_2d, idwt53_2d, j2k_decode, j2k_encode
    import jax.numpy as jnp

    base = np.cumsum(np.cumsum(rng.normal(size=(64, 64)), 0), 1)
    img = ((base - base.min()) / (base.max() - base.min()) * 255).astype(np.uint8)
    co = dwt53_2d(jnp.asarray(img, jnp.int32), 3)
    np.testing.assert_array_equal(np.asarray(idwt53_2d(co, 3)), img)
    blob = j2k_encode(img)
    assert len(blob) < img.size  # compresses
    np.testing.assert_array_equal(j2k_decode(blob), img)  # lossless
    np.testing.assert_array_equal(j2k_decode(blob, region=(8, 8, 16, 16)),
                                  img[8:24, 8:24])


def test_cuest_api_lifecycle(rng):
    """cuEST context + plan/compute surface."""
    from tpumathlib.apps.cuest_api import (
        Context,
        ContextParams,
        IntegralPlan,
        compute_coulomb,
        compute_exchange,
    )
    from tpumathlib.apps import Molecule
    from tpumathlib.core.errors import NotSupportedError
    import jax.numpy as jnp

    mol = Molecule(["H", "H"], np.array([[0, 0, 0], [0, 0, 1.4]]))
    with Context(ContextParams(max_memory_mb=128)) as ctx:
        assert ctx.version() == (0, 1, 0)
        s = IntegralPlan(ctx, mol, "overlap").compute()
        assert np.allclose(np.diag(np.asarray(s)), 1.0, atol=1e-6)
        t = IntegralPlan(ctx, mol, "kinetic").compute()
        assert np.asarray(t)[0, 0] > 0
        d = IntegralPlan(ctx, mol, "dipole").compute()
        assert d.shape == (3, 2, 2)
        # dipole of center atom block ~ its z coordinate
        assert abs(float(d[2, 1, 1]) - 1.4) < 1e-6
        eri = IntegralPlan(ctx, mol, "eri").compute()
        dm = jnp.asarray(np.eye(2) * 0.5)
        j = compute_coulomb(eri, dm)
        k = compute_exchange(eri, dm)
        assert j.shape == (2, 2) and k.shape == (2, 2)
        with pytest.raises(NotSupportedError):
            IntegralPlan(ctx, mol, "pcm").compute()
    # destroyed context refuses plans
    ctx2 = Context()
    ctx2.destroy()
    with pytest.raises(NotSupportedError):
        IntegralPlan(ctx2, mol, "overlap")


def test_grade_blas3_report():
    """≙ grade_blas3.cpp: sweep the engines / emulation strategies and
    grade error-bound compliance. The Ozaki fp64 emulation must grade A
    in the fp64 class, bf16x9 must reach fp32-class Grade A, and the
    exact-arithmetic engines must grade A."""
    from tpumathlib.blas.grading import grade_blas3_report

    rep = {r["engine"]: r for r in grade_blas3_report(n=96)}
    assert rep["ozaki_dgemm_fixed"]["precision_class"] == "fp64"
    assert rep["ozaki_dgemm_fixed"]["grade"] == "A"
    assert rep["ozaki_dgemm_dynamic"]["grade"] == "A"
    assert rep["bf16x9_sgemm"]["precision_class"] == "fp32"
    assert rep["bf16x9_sgemm"]["grade"] == "A"
    assert rep["xla_f32_highest"]["grade"] == "A"
    assert rep["pallas_f32"]["grade"] == "A"
    # plain bf16 inputs cannot reach fp32-class grade A
    assert rep["xla_bf16"]["grade"] != "A"


def test_discovery_buckets(rng, tmp_path, monkeypatch):
    """run_discovery measures a shape-class-spanning set with chained
    dispatches and calibrates per arithmetic-intensity bucket; the
    estimator picks the nearest bucket (≙ LoadInternalDiscoverySet)."""
    import jax.numpy as jnp

    from tpumathlib.dx.gemm import MatmulConfig
    from tpumathlib.heuristics import (
        _DISCOVERY_SET,
        _intensity_bucket,
        estimate_runtime,
        load_discovery,
        run_discovery,
    )

    assert len(_DISCOVERY_SET) >= 6
    classes = {_intensity_bucket(*p) for p in _DISCOVERY_SET}
    assert len(classes) >= 3        # spans several intensity classes
    cal = run_discovery(problems=[(128, 128, 128), (128, 128, 512),
                                  (512, 512, 512)])
    assert cal["n"] == 3 and cal["buckets"]
    assert load_discovery()["buckets"] == cal["buckets"]
    cfg = MatmulConfig(128, 128, 128)
    t_cal = estimate_runtime(256, 256, 256, jnp.bfloat16, cfg,
                             calibration=cal)
    t_raw = estimate_runtime(256, 256, 256, jnp.bfloat16, cfg)
    key = str(min((int(k) for k in cal["buckets"]),
                  key=lambda x: abs(x - _intensity_bucket(256, 256, 256))))
    assert abs(t_cal - t_raw * cal["buckets"][key]) < 1e-12

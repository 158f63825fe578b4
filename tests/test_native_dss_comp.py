"""Native layer + cuDSS-class direct solver + nvCOMP-class codecs."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpumathlib import comp, native
from tpumathlib.core import assert_allclose
from tpumathlib.dss import (
    BatchSolver,
    Config,
    MatrixType,
    Phase,
    Solver,
    from_matrix_market,
    mgmn_solve,
)
from tpumathlib.sparse.convert import dense_to_csr


def _spd(rng, n, density=0.25):
    g = sp.random(n, n, density, random_state=7).toarray()
    a = g @ g.T * 0.1 + np.diag(3 + rng.uniform(size=n))
    a[np.abs(a) < 0.02] = 0
    return (a + a.T) / 2 + 0.5 * np.eye(n)


def test_solver_high_precision(rng):
    """≙ cuDSS/simple_high_precision: double-double refinement. On an
    ill-conditioned SPD system (squared 1D Laplacian, κ ~ n⁴) the
    fp64x2 iterate's exactly-evaluated residual must land orders below
    the plain f64 direct solve's."""
    from tpumathlib.dss import _dd_residual

    n = 300
    lap = (np.diag(np.full(n, 2.0)) - np.diag(np.ones(n - 1), 1)
           - np.diag(np.ones(n - 1), -1))
    a = lap @ lap                          # pentadiagonal SPD, κ ~ 8e8
    csr = dense_to_csr(a)
    x_true = np.cos(np.arange(n) * 0.1)
    b = a @ x_true
    s = Solver(csr, Config(matrix_type=MatrixType.SPD))
    s.factorize()
    indptr = np.asarray(csr.indptr, np.int64)
    indices = np.asarray(csr.indices, np.int64)
    vals = np.asarray(csr.data, np.float64)

    x0 = s.solve(b)
    r0 = np.abs(_dd_residual(indptr, indices, vals, x0,
                             np.zeros_like(x0), b)).max()
    xhi, xlo = s.solve_hp(b)
    r1 = np.abs(_dd_residual(indptr, indices, vals, xhi, xlo, b)).max()
    assert r1 < 1e-3 * max(r0, 1e-300), (r1, r0)
    # forward error no worse than the unrefined solve
    assert (np.abs(xhi + xlo - x_true).max()
            <= np.abs(x0 - x_true).max() * (1 + 1e-9))
    # the lo word is genuinely carrying information
    assert np.abs(xlo).max() > 0


# ---------------- native ----------------

def test_native_lz4_roundtrip(rng):
    data = bytes(rng.integers(0, 4, 5000, dtype=np.uint8)) + b"A" * 1000
    c = native.lz4_compress(data)
    assert len(c) < len(data)
    assert native.lz4_decompress(c, len(data)) == data


def test_native_crc32():
    assert native.crc32(b"123456789") == 0xCBF43926  # IEEE check value


def test_native_mmio(tmp_path):
    path = str(tmp_path / "t.mtx")
    native.mm_write(path, 4, 4, np.array([0, 1, 3]), np.array([1, 2, 0]),
                    np.array([1.5, -2.0, 3.25]))
    rows, cols, r, c, v = native.mm_read(path)
    assert (rows, cols) == (4, 4)
    np.testing.assert_array_equal(r, [0, 1, 3])
    np.testing.assert_array_equal(v, [1.5, -2.0, 3.25])


def test_native_md_ordering_reduces_fill(rng):
    # arrow matrix: natural order fills completely; MD orders hub last
    n = 20
    a = np.eye(n)
    a[0, :] = 1
    a[:, 0] = 1
    A = sp.csr_matrix(a)
    perm = native.md_ordering(A.indptr.astype(np.int64), A.indices.astype(np.int64))
    assert sorted(perm) == list(range(n))
    # the hub must be deferred to the end (degree-19 vs degree-1 leaves);
    # the final two (hub + last leaf) are a degree tie
    assert list(perm).index(0) >= n - 2


# ---------------- dss ----------------

def test_dss_spd_three_phase(rng):
    n = 40
    a = _spd(rng, n)
    solver = Solver(dense_to_csr(a), Config(matrix_type=MatrixType.SPD))
    solver.execute(Phase.ANALYSIS)
    assert solver.data.sym_nnz > 0  # bufferSize-style symbolic count
    solver.execute(Phase.FACTORIZATION)
    assert solver.data.inertia == (n, 0, 0)
    b = rng.normal(size=n)
    x = solver.execute(Phase.SOLVE, b)
    assert_allclose(a @ x, b, rtol=1e-10, msg="dss spd")
    assert solver.residual(x, b) < 1e-12


def test_dss_general_lu(rng):
    n = 35
    a = sp.random(n, n, 0.2, random_state=3).toarray() + np.diag(4 + rng.uniform(size=n))
    solver = Solver(dense_to_csr(a), Config(matrix_type=MatrixType.GENERAL))
    solver.factorize()
    b = rng.normal(size=(n, 3))  # uniform batch of RHS
    x = solver.solve(b)
    assert_allclose(a @ x, b, rtol=1e-9, msg="dss lu")
    assert solver.data.lu_nnz > 0
    assert solver.data.inertia[0] + solver.data.inertia[1] == n


def test_dss_device_solve_path(rng):
    n = 24
    a = _spd(rng, n)
    solver = Solver(dense_to_csr(a),
                    Config(matrix_type=MatrixType.SPD, hybrid_execute=False))
    solver.factorize()
    b = rng.normal(size=n)
    x = solver.solve(b)
    assert_allclose(a @ x, b, rtol=1e-8, msg="dss device solve")


def test_dss_batch(rng):
    mats = []
    bs = []
    dense = []
    for n in (10, 16):
        a = _spd(rng, n)
        dense.append(a)
        mats.append(dense_to_csr(a))
        bs.append(rng.normal(size=n))
    out = BatchSolver(mats, Config(matrix_type=MatrixType.SPD)).factorize().solve(bs)
    for a, b, x in zip(dense, bs, out):
        assert_allclose(a @ x, b, rtol=1e-9)


def test_dss_matrix_market(tmp_path, rng):
    n = 12
    a = _spd(rng, n)
    A = sp.coo_matrix(a)
    path = str(tmp_path / "a.mtx")
    native.mm_write(path, n, n, A.row.astype(np.int64), A.col.astype(np.int64),
                    A.data)
    solver = from_matrix_market(path, Config(matrix_type=MatrixType.SPD))
    solver.factorize()
    b = rng.normal(size=n)
    assert_allclose(a @ solver.solve(b), b, rtol=1e-9)


def test_dss_schur(rng):
    n, split = 20, 12
    a = _spd(rng, n)
    solver = Solver(dense_to_csr(a), Config(matrix_type=MatrixType.SPD))
    s = solver.schur_complement(split)
    want = a[split:, split:] - a[split:, :split] @ np.linalg.solve(
        a[:split, :split], a[:split, split:])
    assert_allclose(s, want, rtol=1e-8, msg="schur")


def test_dss_mgmn(rng):
    n = 32
    a = _spd(rng, n)
    parts = [dense_to_csr(a[:16]), dense_to_csr(a[16:])]
    # row partitions have rectangular shapes
    parts[0].shape = (16, n)
    parts[1].shape = (16, n)
    b = rng.normal(size=n)
    xs = mgmn_solve(parts, [b[:16], b[16:]], Config(matrix_type=MatrixType.SPD))
    x = np.concatenate(xs)
    assert_allclose(a @ x, b, rtol=1e-9, msg="mgmn")


# ---------------- comp ----------------

@pytest.mark.parametrize("codec", ["lz4", "deflate", "gzip", "snappy",
                                   "cascaded", "bitcomp", "ans", "gdeflate",
                                   "zstd"])
def test_codec_roundtrip(codec, rng):
    data = (np.repeat(rng.integers(0, 50, 200), rng.integers(1, 20, 200))
            .astype(np.int32).tobytes())
    c = comp.batched_compress(codec, [data])[0]
    d = comp.batched_decompress(codec, [c], [len(data)])[0]
    assert d == data
    if codec in ("lz4", "cascaded", "bitcomp", "ans", "deflate",
                 "gdeflate", "zstd"):
        assert len(c) < len(data)  # really compresses RLE-friendly data


def _grid_laplacian(k):
    n = k * k
    i = np.arange(n)
    a = np.zeros((n, n))
    a[i, i] = 4.0
    m1 = (i % k) < k - 1
    a[i[m1], i[m1] + 1] = a[i[m1] + 1, i[m1]] = -1.0
    mk = i < n - k
    a[i[mk], i[mk] + k] = a[i[mk] + k, i[mk]] = -1.0
    return a


def test_dss_threading_layer(rng):
    """≙ cuDSS/test_threading_layer: the threaded supernodal
    factorization (supernode tasks over the supernodal etree) must
    produce BIT-IDENTICAL factors to the sequential engine, and solves
    must agree across thread counts."""
    from tpumathlib import native

    a = _grid_laplacian(24)
    n = a.shape[0]
    low_mask = np.tril(np.ones_like(a, bool))
    nzr, nzc = np.nonzero((a != 0) & low_mask)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, nzr + 1, 1)
    indptr = np.cumsum(indptr)
    ref = native.spchol_supernodal(indptr, nzc.astype(np.int64),
                                   a[nzr, nzc], threads=1)
    for th in (2, 4, 8):
        got = native.spchol_supernodal(indptr, nzc.astype(np.int64),
                                       a[nzr, nzc], threads=th)
        assert np.array_equal(ref[0], got[0])
        assert np.array_equal(ref[1], got[1])
        np.testing.assert_allclose(ref[2], got[2], rtol=1e-14)
    # end-to-end through the Config knob
    x_true = rng.normal(size=n)
    b = a @ x_true
    csr = dense_to_csr(a)
    for th in (1, 4):
        s = Solver(csr, Config(matrix_type=MatrixType.SPD, threads=th))
        s.factorize()
        np.testing.assert_allclose(s.solve(b), x_true, atol=1e-8)


def test_dss_nested_dissection(rng):
    """Nested-dissection ordering: correct solves, and fill near minimum
    degree on a 2D grid Laplacian. The ratio improves with size (measured
    nnz(L) ND/MD: 1.33 at k=48, 1.21 at k=64, 1.07 at k=120) while the
    ordering itself runs ~500x faster than the quotient-graph MD — the
    production trade ND exists for. Asserted at k=64 against a 1.25 bar
    (the k=120 number is in NOTES_r4)."""
    from tpumathlib import native

    a = _grid_laplacian(64)
    n = a.shape[0]
    sym = dense_to_csr(a)
    indptr = np.asarray(sym.indptr, np.int64)
    indices = np.asarray(sym.indices, np.int64)
    perm_nd = native.nd_ordering(indptr, indices)
    assert sorted(perm_nd) == list(range(n))
    fills = {}
    for name, perm in (("md", native.md_ordering(indptr, indices)),
                       ("nd", perm_nd)):
        ap = a[np.ix_(perm, perm)]
        low_mask = np.tril(np.ones_like(ap, bool))
        nzr, nzc = np.nonzero((ap != 0) & low_mask)
        ip = np.zeros(n + 1, np.int64)
        np.add.at(ip, nzr + 1, 1)
        lp, li, lx = native.spchol_supernodal(np.cumsum(ip),
                                              nzc.astype(np.int64),
                                              ap[nzr, nzc])
        fills[name] = lp[-1]
    assert fills["nd"] <= 1.25 * fills["md"], fills
    # solve through the public Config
    x_true = rng.normal(size=n)
    b = a @ x_true
    s = Solver(dense_to_csr(a),
               Config(matrix_type=MatrixType.SPD, reordering="nd"))
    s.factorize()
    np.testing.assert_allclose(s.solve(b), x_true, atol=1e-8)


def test_ans_native_engine(rng):
    """Native interleaved rANS (native/src/rans.cpp): multi-chunk
    roundtrip, near-entropy ratio, and agreement with the Python
    reference model's compressed-size class (≙ nvCOMP ANS examples)."""
    from tpumathlib.comp import _ans_compress_py, ans_compress, \
        ans_decompress

    # skewed alphabet over several 64 KB chunks
    p = np.r_[np.full(4, 0.2), np.full(252, 0.2 / 252)]
    data = rng.choice(256, size=300_000, p=p).astype(np.uint8).tobytes()
    blob = ans_compress(data)
    assert blob[:4] == b"rANS"
    assert ans_decompress(blob, len(data)) == data
    entropy_bits = -(p * np.log2(p)).sum()
    achieved = 8.0 * len(blob) / len(data)
    assert achieved < entropy_bits * 1.10 + 0.2, (achieved, entropy_bits)
    # python reference lands in the same size class (same model)
    small = data[:20_000]
    ratio_native = len(small) / len(ans_compress(small))
    ratio_py = len(small) / len(_ans_compress_py(small))
    assert abs(ratio_native - ratio_py) / ratio_py < 0.1
    # empty + tiny + incompressible inputs
    assert ans_decompress(ans_compress(b""), 0) == b""
    t = bytes(range(7))
    assert ans_decompress(ans_compress(t), 7) == t
    rnd = rng.integers(0, 256, 70_000, dtype=np.uint8).tobytes()
    assert ans_decompress(ans_compress(rnd), len(rnd)) == rnd


def test_manager_self_describing(rng):
    data = bytes(rng.integers(0, 8, 200000, dtype=np.uint8))
    m = comp.Manager(codec="lz4", chunk_size=1 << 14)
    blob = m.compress(data)
    assert comp.Manager.decompress(blob) == data  # no codec/config needed


def test_comp_crc32():
    assert comp.crc32(b"123456789") == 0xCBF43926


def test_dss_save_load_factors(tmp_path, rng):
    """Checkpoint/resume of the factorization state (≙ plan-cache
    serialization, SURVEY.md §5)."""
    from tpumathlib.dss import load_factors, save_factors

    n = 20
    a = _spd(rng, n)
    s1 = Solver(dense_to_csr(a), Config(matrix_type=MatrixType.SPD))
    s1.factorize()
    path = str(tmp_path / "factors.npz")
    save_factors(s1, path)
    s2 = load_factors(path)
    b = rng.normal(size=n)
    x = s2.solve(b)  # no re-analysis/factorization
    assert_allclose(a @ x, b, rtol=1e-9, msg="resumed solve")


def test_snappy_block_format_spec():
    """Real snappy BLOCK format: decode hand-built spec-conformant streams
    (format_description.txt) — not an alias of another codec."""
    from tpumathlib.comp import snappy

    # varint(25) + 1-byte literal 'a' + tag-2 copy len=24 offset=1
    blob = bytes([25, 0x00, ord("a"), ((24 - 1) << 2) | 2, 1, 0])
    assert snappy.decompress(blob) == b"a" * 25
    # tag-1 copy with 1-byte offset: 'ab' then len-6 copy at offset 2
    blob = bytes([8, 0x04, ord("a"), ord("b"), ((6 - 4) << 2) | 1, 2])
    assert snappy.decompress(blob) == b"abababab"
    # 4-byte-offset copy tag decodes too
    lit = bytes(range(256)) * 2
    blob = (snappy._varint_encode(len(lit) + 4) + bytes([63 << 2]) +
            (len(lit) - 1).to_bytes(4, "little") + lit +
            bytes([(4 - 1) << 2 | 3]) + (4).to_bytes(4, "little"))
    out = snappy.decompress(blob)
    assert out[-4:] == lit[-4:]


def test_dss_mgmn_schur_decomposition(rng):
    """MGMN with genuine domain-decomposition structure: two interior
    domains coupled only through a small interface — the Schur path must
    reproduce the dense solve (≙ simple_mgmn_distributed_matrix with a
    distributed factorization, not gather-to-root)."""
    from tpumathlib.dss import mgmn_solve
    from tpumathlib.sparse.convert import dense_to_csr

    ni, ng = 20, 4          # two domains of 20 + interface of 4
    n = 2 * ni + ng
    a = np.zeros((n, n))
    for d in range(2):
        s = d * ni
        blk = rng.normal(size=(ni, ni)) * (rng.uniform(size=(ni, ni)) < 0.3)
        a[s:s + ni, s:s + ni] = blk @ blk.T + ni * np.eye(ni)
        cup = rng.normal(size=(ni, ng)) * (rng.uniform(size=(ni, ng)) < 0.5)
        a[s:s + ni, 2 * ni:] = cup
        a[2 * ni:, s:s + ni] = cup.T
    a[2 * ni:, 2 * ni:] = n * np.eye(ng) + rng.normal(size=(ng, ng))
    x_true = rng.normal(size=n)
    b = a @ x_true
    # rank 0: domain 0 rows; rank 1: domain 1 + interface rows
    parts = [dense_to_csr(a[:ni]), dense_to_csr(a[ni:])]
    xs = mgmn_solve(parts, [b[:ni], b[ni:]])
    got = np.concatenate(xs)
    np.testing.assert_allclose(got, x_true, rtol=1e-8, atol=1e-8)


def test_dss_hybrid_memory_mode(rng):
    """Hybrid host/device memory mode (≙ the cuDSS hybrid-memory sample):
    factors stay host-resident and stream per solve."""
    n = 24
    a = _spd(rng, n)
    solver = Solver(dense_to_csr(a),
                    Config(matrix_type=MatrixType.SPD, hybrid_execute=False,
                           hybrid_memory=True))
    solver.factorize()
    b = rng.normal(size=n)
    x = solver.solve(b)
    assert_allclose(a @ x, b, rtol=1e-8, msg="hybrid memory solve")


def test_dss_complex(tmp_path, rng):
    """cuDSS complex systems (≙ cuDSS/simple_complex/simple_complex.cpp):
    planar real-block embedding solves A x = b exactly for complex A."""
    n = 24
    ar = _spd(rng, n)
    ai = np.triu(rng.uniform(-0.3, 0.3, (n, n)), 1)
    ai = ai - ai.T  # Hermitian: A = Ar + i*Ai with Ar sym, Ai skew
    a = ar + 1j * ai
    path = str(tmp_path / "c.mtx")
    ri, ci = np.nonzero(a)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate complex general\n")
        f.write(f"{n} {n} {len(ri)}\n")
        for r, c in zip(ri, ci):
            f.write(f"{r + 1} {c + 1} {a[r, c].real:.17g} {a[r, c].imag:.17g}\n")
    solver = from_matrix_market(path)
    from tpumathlib.dss import ComplexSolver

    assert isinstance(solver, ComplexSolver)
    solver.factorize()
    b = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    x = solver.solve(b)
    assert_allclose(a @ x, b, atol=1e-8)
    # planar RHS spelling
    x2 = solver.solve((b.real, b.imag))
    assert_allclose(x2, x, atol=1e-12)


def test_dss_hybrid_memory_reuses_analysis(rng):
    """Hybrid host/device memory mode: repeated solves must not redo the
    level-schedule analysis (plans are built once; values stream)."""
    n = 40
    a = _spd(rng, n)
    solver = Solver(dense_to_csr(a), Config(matrix_type=MatrixType.SPD,
                                            hybrid_execute=False,
                                            hybrid_memory=True))
    solver.factorize()
    import tpumathlib.dss as dss_mod

    calls = {"n": 0}
    orig = dss_mod.spsv_plan
    dss_mod.spsv_plan = lambda *a_, **k_: (calls.__setitem__("n", calls["n"] + 1)
                                           or orig(*a_, **k_))
    try:
        for _ in range(3):
            b = rng.uniform(-1, 1, n)
            x = solver.solve(b)
            assert_allclose(a @ x, b, atol=1e-4)
    finally:
        dss_mod.spsv_plan = orig
    assert calls["n"] == 0  # analysis resident: no re-planning per solve


def test_zstd_no_masquerade(rng):
    """zstd either round-trips real zstd frames or raises NotSupportedError
    — never a zlib stream labeled zstd."""
    data = bytes(rng.integers(0, 8, 4096, dtype=np.uint8))
    from tpumathlib.core.errors import NotSupportedError

    try:
        import zstandard  # noqa: F401
    except ImportError:
        with pytest.raises(NotSupportedError):
            comp.batched_compress("zstd", [data])
        return
    [c] = comp.batched_compress("zstd", [data])
    assert c[:4] == b"\x28\xb5\x2f\xfd"  # zstd frame magic
    assert comp.batched_decompress("zstd", [c], [len(data)]) == [data]


def test_dx_comp_bits_guard(rng):
    """dx codec rejects widths beyond its 32-bit packing instead of
    silently corrupting (advisor round-2 finding)."""
    from tpumathlib.dx.comp import dx_compress, dx_decompress, dx_required_bits
    import jax.numpy as jnp

    v = np.array([0, 2**31 - 1, -(2**31) + 1, 0] * 8, np.int32)
    with pytest.raises(ValueError):
        dx_required_bits(v)
    with pytest.raises(Exception):
        dx_compress(jnp.asarray(v), bits=33)
    with pytest.raises(Exception):
        dx_decompress(jnp.zeros((4, 33), jnp.uint32),
                      jnp.zeros(1, jnp.int32), bits=33)


def test_device_cascaded_roundtrip(rng):
    """Device-resident cascaded codec (≙ nvCOMP device GB/s path): exact
    int32 roundtrip through the public comp API, data device-resident."""
    import jax.numpy as jnp

    v = np.cumsum(rng.integers(-5, 6, 100_003)).astype(np.int32)
    packed, meta = comp.device_cascaded_compress(jnp.asarray(v))
    out = comp.device_cascaded_decompress(packed, meta)
    np.testing.assert_array_equal(np.asarray(out), v)
    ratio = comp.device_cascaded_ratio(meta, packed)
    assert ratio > 4.0  # small deltas pack far below 32 bits
    # explicit bits stays device-only (no host reduction)
    p2, m2 = comp.device_cascaded_compress(jnp.asarray(v), bits=8)
    np.testing.assert_array_equal(
        np.asarray(comp.device_cascaded_decompress(p2, m2)), v)


def test_gdeflate_multipage_buffer(rng):
    """gdeflate tiles >64 KiB buffers into pages like the reference
    library (found by fuzzing: every other codec accepted arbitrary
    sizes); single-page streams decode through the same entry point."""
    from tpumathlib.comp import _codec_fns

    cfun, dfun = _codec_fns("gdeflate")
    for n in (0, 1, 65536, 65537, 200_000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert dfun(cfun(data), n) == data
    # compressible multi-page data actually compresses
    runs = bytes(np.repeat(rng.integers(0, 256, 4000, dtype=np.uint8),
                           50).tobytes())
    blob = cfun(runs)
    assert len(blob) < len(runs) // 2
    assert dfun(blob, len(runs)) == runs


def test_device_bitcomp_lossy(rng):
    """Error-bounded lossy float compression (≙ nvCOMP Bitcomp Native API,
    bitcomp_native_lossy.cu: smooth sine data, delta=1.0, verify max
    reconstruction error <= delta/2 and that non-power-of-two deltas round
    down like bitcompSetLossyDelta)."""
    import jax.numpy as jnp

    x = 100.0 * np.sin(np.arange(1 << 16, dtype=np.float32) * 0.001)
    for delta in (1.0, 0.3):            # 0.3 rounds down to 0.25
        payload, meta = comp.device_bitcomp_lossy_compress(
            jnp.asarray(x), delta)
        d2 = meta[2]
        assert d2 == (1.0 if delta == 1.0 else 0.25)
        out = np.asarray(comp.device_bitcomp_lossy_decompress(payload, meta))
        assert np.max(np.abs(out - x)) <= d2 / 2 + 1e-6
    # smooth data quantized at delta=1 packs well below 32 bits
    payload, meta = comp.device_bitcomp_lossy_compress(jnp.asarray(x), 1.0)
    assert comp.device_cascaded_ratio(meta[:2], payload) > 4.0
    with pytest.raises(ValueError):
        comp.device_bitcomp_lossy_compress(jnp.asarray(x), 0.0)


def test_host_bitpack_vectorized(rng):
    """Vectorized packbits bitstream is byte-identical to the round-2
    serial format (container compatibility)."""
    from tpumathlib.comp import _bitpack, _bitunpack

    for bits in (1, 7, 13, 32, 45):
        vals = rng.integers(0, 2**min(bits, 62), 999, dtype=np.uint64)
        vals &= (1 << bits) - 1
        blob = _bitpack(vals, bits)
        assert len(blob) == (999 * bits + 7) // 8
        back = _bitunpack(blob, bits, 999)
        np.testing.assert_array_equal(back, vals)


def test_dss_mgmn_mesh(rng):
    """MGMN over a jax device mesh: per-rank interior factorization via
    shard_map + pure_callback, interface gathered as exact (hi, lo) f32
    plane pairs and solved in f64 — direct-solver accuracy
    (≙ cuDSS/simple_mgmn_distributed_matrix.cpp:562-574)."""
    import jax

    from tpumathlib.mp import Grid

    nranks = 4
    grid = Grid.create(jax.devices()[:nranks])
    ni, ng = 24, 6
    n = nranks * ni + ng
    a = np.zeros((n, n))
    for d in range(nranks):
        s = d * ni
        blk = rng.normal(size=(ni, ni)) * (rng.uniform(size=(ni, ni)) < 0.3)
        a[s:s + ni, s:s + ni] = blk @ blk.T + ni * np.eye(ni)
        cup = rng.normal(size=(ni, ng)) * (rng.uniform(size=(ni, ng)) < 0.5)
        a[s:s + ni, nranks * ni:] = cup
        a[nranks * ni:, s:s + ni] = cup.T
    a[nranks * ni:, nranks * ni:] = n * np.eye(ng) + rng.normal(size=(ng, ng))
    x_true = rng.normal(size=n)
    b = a @ x_true
    # rank r: domain r rows; last rank also owns the interface rows
    bounds = [ni * r for r in range(nranks)] + [n]
    parts = [dense_to_csr(a[bounds[r]:bounds[r + 1]]) for r in range(nranks)]
    xs = mgmn_solve(parts, [b[bounds[r]:bounds[r + 1]]
                            for r in range(nranks)], grid=grid)
    got = np.concatenate(xs)
    # default comm="all_gather": f64 interface solve (direct accuracy)
    np.testing.assert_allclose(got, x_true, rtol=0,
                               atol=1e-9 * np.abs(x_true).max())
    # f32 psum fast path: documented ~1e-7-class contract
    xs32 = mgmn_solve(parts, [b[bounds[r]:bounds[r + 1]]
                              for r in range(nranks)], grid=grid,
                      comm="psum")
    np.testing.assert_allclose(np.concatenate(xs32), x_true, rtol=0,
                               atol=2e-3 * np.abs(x_true).max())


def test_dss_mgmn_large_sparse(rng):
    """1e5-row problem completes WITHOUT densification (the round-2 body
    materialized each rank's full row block as dense — O(rows·n) memory)."""
    import time

    import scipy.sparse as sp

    from tpumathlib.sparse.containers import CSR
    import jax.numpy as jnp

    n = 100_000
    nranks = 4
    # block-tridiagonal-ish: 1D Laplacian + long-range coupling at the
    # partition boundaries only
    main = 4.0 * np.ones(n)
    off = -1.0 * np.ones(n - 1)
    a = sp.diags([off, main, off], [-1, 0, 1], format="csr")
    x_true = rng.normal(size=n)
    b = a @ x_true
    per = n // nranks
    parts = []
    for r in range(nranks):
        blk = a[r * per:(r + 1) * per].tocsr()
        parts.append(CSR(jnp.asarray(blk.indptr.astype(np.int64)),
                         jnp.asarray(blk.indices.astype(np.int64)),
                         jnp.asarray(blk.data), (per, n)))
    t0 = time.perf_counter()
    xs = mgmn_solve(parts, [b[r * per:(r + 1) * per] for r in range(nranks)],
                    Config(matrix_type=MatrixType.SPD))
    dt = time.perf_counter() - t0
    got = np.concatenate(xs)
    r = np.abs(a @ got - b).max() / np.abs(b).max()
    assert r < 1e-8, r
    assert dt < 120, f"mgmn 1e5 rows took {dt:.0f}s"


def test_dss_threading_and_comm_layer(rng):
    """cuDSS threading-layer (parallel batch factorization) and
    communication-layer (pluggable collective) knobs
    (≙ cuDSS/test_threading_layer, test_communication_layer)."""
    import jax

    from tpumathlib.mp import Grid

    mats, bs = [], []
    for k in range(6):
        n = 20 + 4 * k
        a = _spd(rng, n)
        mats.append(dense_to_csr(a))
        bs.append(rng.normal(size=n))
    solver = BatchSolver(mats, Config(matrix_type=MatrixType.SPD), threads=4)
    xs = solver.factorize().solve(bs)
    for s, x, b in zip(solver.solvers, xs, bs):
        assert s.residual(x, b) < 1e-8
    # pluggable comm: all_gather schedule matches psum
    nranks = 2
    grid = Grid.create(jax.devices()[:nranks])
    ni, ng = 16, 4
    n = nranks * ni + ng
    a = np.zeros((n, n))
    for d in range(nranks):
        s0 = d * ni
        blk = rng.normal(size=(ni, ni)) * (rng.uniform(size=(ni, ni)) < 0.4)
        a[s0:s0 + ni, s0:s0 + ni] = blk @ blk.T + ni * np.eye(ni)
        cup = rng.normal(size=(ni, ng)) * 0.5
        a[s0:s0 + ni, nranks * ni:] = cup
        a[nranks * ni:, s0:s0 + ni] = cup.T
    a[nranks * ni:, nranks * ni:] = n * np.eye(ng)
    xt = rng.normal(size=n)
    b = a @ xt
    bounds = [ni * r for r in range(nranks)] + [n]
    parts = [dense_to_csr(a[bounds[r]:bounds[r + 1]]) for r in range(nranks)]
    bp = [b[bounds[r]:bounds[r + 1]] for r in range(nranks)]
    x1 = np.concatenate(mgmn_solve(parts, bp, grid=grid, comm="psum"))
    x2 = np.concatenate(mgmn_solve(parts, bp, grid=grid, comm="all_gather"))
    np.testing.assert_allclose(x1, xt, atol=2e-3 * np.abs(xt).max())
    np.testing.assert_allclose(x2, x1, atol=1e-5)


def test_gdeflate_pages(rng):
    """GDeflate pages (≙ nvCOMP gdeflate_cpu_compression): 64 KB bound
    enforced; pages carry the real 32-substream interleave (native LZ77 +
    shared canonical Huffman, token k on sub-stream k mod 32), compress
    comparably to zlib on LZ-friendly data, and the round-3
    single-substream degenerate form stays readable."""
    import zlib

    from tpumathlib.comp import gdeflate
    from tpumathlib.core.errors import TpuMathError

    data = bytes(rng.integers(0, 16, 50000, dtype=np.uint8))
    page = gdeflate.compress(data)
    assert page[0] == 32        # sub-stream count
    assert gdeflate.decompress(page, len(data)) == data
    # LZ-friendly payload: ratio within 2x of zlib level-6
    rep = (b"abcdefgh" * 4000)[:30000] + bytes(data[:20000])
    pg = gdeflate.compress(rep)
    assert gdeflate.decompress(pg, len(rep)) == rep
    assert len(pg) < 2 * len(zlib.compress(rep, 6)) + 512
    # incompressible + exhaustive small sizes
    rnd = bytes(rng.integers(0, 256, 65536, dtype=np.uint8))
    assert gdeflate.decompress(gdeflate.compress(rnd), len(rnd)) == rnd
    for n in (0, 1, 2, 3, 7, 258):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert gdeflate.decompress(gdeflate.compress(d), n) == d
    # legacy single-substream form (header 0x01, raw RFC 1951 payload)
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    legacy = b"\x01" + co.compress(data) + co.flush()
    assert gdeflate.decompress(legacy, len(data)) == data
    with pytest.raises(TpuMathError):
        gdeflate.compress(bytes(70000))


def test_spchol_supernodal_matches_simplicial(rng):
    """The amalgamated supernodal engine (≙ cuDSS's supernodal
    factorization) reproduces L·Lᵀ = A with the spchol_ll output contract
    (CSR rows, diag last); panel fill adds only structural zeros."""
    import scipy.sparse as sp

    from tpumathlib import native

    k = 20
    n = k * k
    d = sp.eye(n) * 4
    o1 = sp.diags([np.ones(n - 1)], [1])
    ok_ = sp.diags([np.ones(n - k)], [k])
    a = (d - (o1 + o1.T) - (ok_ + ok_.T)).tocsr()
    al = sp.tril(a).tocsr()
    args = (al.indptr.astype(np.int64), al.indices.astype(np.int64),
            al.data.astype(np.float64))
    lp1, li1, lx1 = native.spchol(*args)
    lp2, li2, lx2 = native.spchol_supernodal(*args)
    def dense_l(lp, li, lx):
        out = np.zeros((n, n))
        for i in range(n):
            out[i, li[lp[i]:lp[i + 1]]] = lx[lp[i]:lp[i + 1]]
        return out
    l1 = dense_l(lp1, li1, lx1)
    l2 = dense_l(lp2, li2, lx2)
    assert_allclose(l2, l1, rtol=1e-10, atol=1e-12, msg="supernodal L")
    assert_allclose(l2 @ l2.T, a.toarray(), rtol=1e-10, atol=1e-12,
                    msg="L L^T")
    # diag-last ordering per row (the solve path's assumption)
    for i in range(0, n, 37):
        assert li2[lp2[i + 1] - 1] == i

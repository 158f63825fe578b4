"""benchmarks — the measurement harness (SURVEY.md §5/§6).

Reproduces the reference's self-measuring conventions:
- GEMM: GFlop/s = 2·m·n·k/t (cuBLASMp/gemm.cu:501)
- FFT: GFlop/s = 5·N·log₂N/t, GB/s = 8·N/t, median over ≥10 cycles
  (cuFFTMp/JAX_FFT/tests/fft_test.py:148-158)
- SpMV: GB/s effective bandwidth
- Compression: comp/decomp GB/s + ratio (nvCOMP NVBench reports)
- Canny: ms vs torch/OpenCV-class CPU baselines across resolutions
  (NPP+/cannyEdgeDetectorPython)

Each function returns a dict record; ``run_all`` prints one JSON line per
benchmark (the PASSED/FAILED + metric record contract). Timing uses the
readback-amortized protocol (tunnel-safe — see .claude/skills/verify).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _amortized_seconds(step_fn, x, chain: int = 50, repeats: int = 3,
                       params=None):
    """Median seconds per op with fori_loop amortization + scalar readback.

    ``params``: large loop-invariant operands, threaded as a jit ARGUMENT
    (closed over by the loop body only) — closing over them in ``step_fn``
    would embed them as constants (axon HTTP-413 for GB-scale arrays), and
    carrying them through the fori_loop would copy them every iteration
    (.claude/skills/verify timing traps)."""
    import jax
    import jax.numpy as jnp

    def run(v, p):
        def body(_, c):
            return step_fn(c) if p is None else step_fn(c, p)
        out = jax.lax.fori_loop(0, chain, body, v)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) for l in leaves)

    g = jax.jit(run)
    float(g(x, params))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(g(x, params))
        times.append((time.perf_counter() - t0) / chain)
    return float(np.median(times))


def bench_gemm(m=4096, n=4096, k=4096, dtype="bfloat16") -> dict:
    import jax
    import jax.numpy as jnp

    from tpumathlib.blas import level3

    key = jax.random.key(0)
    a = jax.random.normal(key, (m, k), jnp.dtype(dtype))
    b = jax.random.normal(key, (k, n), jnp.dtype(dtype))
    t = _amortized_seconds(lambda x: level3.gemm(1.0, x, b).astype(a.dtype), a,
                           chain=200)
    return {"bench": "gemm", "m": m, "n": n, "k": k, "dtype": dtype,
            "ms": t * 1e3, "tflops": 2.0 * m * n * k / t / 1e12}


def bench_fft(batch=4096, n=4096) -> dict:
    import jax
    import jax.numpy as jnp

    from tpumathlib.fft.stockham import dif_fft

    key = jax.random.key(0)
    xr = jax.random.normal(key, (batch, n), jnp.float32)
    xi = jax.random.normal(key, (batch, n), jnp.float32)
    t = _amortized_seconds(lambda c: dif_fft(c[0], c[1]), (xr, xi), chain=50)
    total = batch * n
    return {"bench": "fft_c2c_batch", "batch": batch, "n": n, "ms": t * 1e3,
            "gflops": 5.0 * total * np.log2(n) / t / 1e9,
            "gbps": 2.0 * total * 8 / t / 1e9}


def bench_spmv(n=100_000, nnz_per_row=32) -> dict:
    import jax
    import jax.numpy as jnp

    from tpumathlib.sparse import CSR, spmv

    rng = np.random.default_rng(0)
    nnz = n * nnz_per_row
    indptr = jnp.asarray(np.arange(n + 1) * nnz_per_row, jnp.int32)
    indices = jnp.asarray(rng.integers(0, n, nnz), jnp.int32)
    data = jnp.asarray(rng.normal(size=nnz), jnp.float32)
    a = CSR(indptr, indices, data, (n, n))
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    t = _amortized_seconds(lambda v: spmv(a, v), x, chain=20)
    bytes_moved = nnz * (4 + 4 + 4) + n * 8
    return {"bench": "spmv_csr", "n": n, "nnz": nnz, "ms": t * 1e3,
            "gbps": bytes_moved / t / 1e9}


def bench_spmv_bell(mb=128, nb=128, ellw=32, bs=128) -> dict:
    """Blocked-ELL SpMV (the TPU-native sparse format): SpmvPlan
    analysis outside the timed loop (the cuSPARSE descriptor lifecycle).
    Measured on a v5e (~4e-6 rel) with the r4 rowform kernel: 158.7 GB/s
    with the solver-style fed-back chain (x changes per call; per-call
    split/retile prep ~0.12 ms, down from 0.38), within 7% of the
    kernel's own no-compute DMA twin (170 GB/s same-day) — vs 1.5 GB/s
    for gather-bound unstructured CSR. NOTE the absolute ceiling drifts
    with the chip/tunnel environment: the round-3 records (171 fed-back
    / 225 fixed-x) were taken when the same A/B pattern streamed ~35%
    faster; the old broadcast kernel re-measured 155 GB/s fixed-x the
    day the rowform kernel measured 170."""
    import jax
    import jax.numpy as jnp

    from tpumathlib.sparse import BlockedELL
    from tpumathlib.sparse.pallas_kernels import SpmvPlan

    rng = np.random.default_rng(0)
    n = nb * bs
    cols = np.sort(rng.permuted(np.tile(np.arange(nb), (mb, 1)),
                                axis=1)[:, :ellw], axis=1).astype(np.int32)
    cols_j = jnp.asarray(cols)
    data = jnp.asarray(rng.normal(size=(mb, ellw, bs, bs)), jnp.float32)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    plan = SpmvPlan(BlockedELL(cols_j, data, (mb * bs, n), bs))

    # the bf16 planes are jit ARGUMENTS closed over by the loop body, NOT
    # part of the fori carry — carrying them would copy 268 MB/iteration
    # (measured: 155 vs 225 GB/s) — and NOT closure constants (axon 413)
    import time as _time

    chain = 20

    def run(ah, al, v0):
        p = SpmvPlan.from_parts(cols_j, ah, al, (mb * bs, n), bs)

        def body(_, c):
            v, s = c
            y = p.execute(v).astype(v.dtype)[:n]
            return y, s + y[0]

        _, s = jax.lax.fori_loop(0, chain, body, (v0, jnp.float32(0)))
        return s

    g = jax.jit(run)
    float(g(plan.ah, plan.al, x))
    t = float("inf")
    for _ in range(3):
        t0 = _time.perf_counter()
        float(g(plan.ah, plan.al, x))
        t = min(t, (_time.perf_counter() - t0) / chain)
    nnz = mb * ellw * bs * bs
    bytes_moved = nnz * 4 + n * 4 + mb * bs * 4
    return {"bench": "spmv_blockedell", "n": n, "nnz": nnz, "ms": t * 1e3,
            "gbps": bytes_moved / t / 1e9}


def bench_spmm_bell(mb=128, nb=128, ellw=16, bs=128, k=4096) -> dict:
    """Blocked-ELL SpMM bf16 (≙ cusparse spmm_blockedell on tensor cores):
    MXU block tiles, 64 TFLOP/s measured on a v5e."""
    import jax
    import jax.numpy as jnp

    from tpumathlib.sparse import BlockedELL, spmm

    rng = np.random.default_rng(0)
    n = nb * bs
    cols = np.sort(rng.permuted(np.tile(np.arange(nb), (mb, 1)),
                                axis=1)[:, :ellw], axis=1).astype(np.int32)
    cols_j = jnp.asarray(cols)
    data = jnp.asarray(rng.normal(size=(mb, ellw, bs, bs)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(n, k)), jnp.bfloat16)

    # A data is a loop-invariant jit ARG (a fori carry would copy the
    # 134 MB every iteration — the same artifact fixed in bench_spmv_bell)
    import time as _time

    chain = 20

    def run(d, v0):
        a = BlockedELL(cols_j, d, (mb * bs, n), bs)

        def body(_, c):
            v, s = c
            y = spmm(a, v).astype(v.dtype)
            return y, s + y[0, 0].astype(jnp.float32)

        _, s = jax.lax.fori_loop(0, chain, body, (v0, jnp.float32(0)))
        return s

    g = jax.jit(run)
    float(g(data, b))
    t = float("inf")
    for _ in range(3):
        t0 = _time.perf_counter()
        float(g(data, b))
        t = min(t, (_time.perf_counter() - t0) / chain)
    flops = 2 * mb * ellw * bs * bs * k
    return {"bench": "spmm_blockedell_bf16", "n": n, "k": k, "ms": t * 1e3,
            "tflops": flops / t / 1e12}


def bench_compression(codec="lz4", size=1 << 22) -> dict:
    """≙ NVBench chunked benchmark: comp GB/s, decomp GB/s, ratio."""
    from tpumathlib import comp

    rng = np.random.default_rng(0)
    data = np.repeat(rng.integers(0, 64, size // 8), 8).astype(np.uint8).tobytes()
    chunk = 1 << 16
    chunks = [data[i:i + chunk] for i in range(0, len(data), chunk)]
    t0 = time.perf_counter()
    cs = comp.batched_compress(codec, chunks)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    ds = comp.batched_decompress(codec, cs, [len(c) for c in chunks])
    td = time.perf_counter() - t0
    assert b"".join(ds) == data
    ratio = len(data) / sum(len(c) for c in cs)
    return {"bench": f"comp_{codec}", "bytes": len(data),
            "comp_gbps": len(data) / tc / 1e9,
            "decomp_gbps": len(data) / td / 1e9,
            "ratio": ratio}


def bench_canny(sizes=((512, 512), (1024, 1024))) -> list[dict]:
    """≙ NPP+ cannyEdgeDetectorPython: ms across resolutions vs a CPU
    baseline (torch, if available)."""
    import jax.numpy as jnp

    from tpumathlib.image import canny

    rng = np.random.default_rng(0)
    out = []
    for h, w in sizes:
        img = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))
        t = _amortized_seconds(lambda v: canny(v).astype(jnp.float32), img, chain=5)
        rec = {"bench": "canny", "size": f"{h}x{w}", "ms": t * 1e3}
        try:
            import torch
            import torch.nn.functional as F

            timg = torch.from_numpy(np.asarray(img))[None, None]
            kx = torch.tensor([[-1., 0, 1], [-2, 0, 2], [-1, 0, 1]])[None, None]
            t0 = time.perf_counter()
            for _ in range(5):
                gx = F.conv2d(timg, kx, padding=1)
                gy = F.conv2d(timg, kx.transpose(2, 3), padding=1)
                (gx**2 + gy**2).sqrt()
            rec["torch_sobel_ms"] = (time.perf_counter() - t0) / 5 * 1e3
        except ImportError:
            pass
        out.append(rec)
    return out


def bench_jpeg(h=512, w=512, backend="native") -> dict:
    """nvJPEG-style throughput line (≙ the decoder samples' images/sec
    report, nvJPEG/nvJPEG-Decoder): encode + decode MP/s with the stage
    split documented — entropy coding is host (native C++, LUT Huffman +
    fused symbol/frequency walk, restart-segment threading); the pixel
    pipeline (DCT/dequant/upsample/color) runs per the backend:
    "native" = C++ next to the entropy stage (the honest engine on this
    setup, where the accelerator sits behind a ~30 MB/s tunnel and
    coefficient upload alone costs more than the whole host decode:
    3.1 MP hybrid-on-chip 3.0 MP/s, measured round 5), "cpu" = the same
    fused jit pipeline on the XLA host backend, "hybrid" = device. The
    record also carries a same-host libjpeg-turbo (Pillow) oracle run
    on the identical stream/image — the hardware-normalized ratio."""
    from tpumathlib.image.jpeg import jfif_decode, jfif_encode

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # smooth it so entropy statistics resemble a photo
    img = (img.astype(np.float32) + np.roll(img, 1, 0) + np.roll(img, 1, 1)
           + np.roll(img, 2, 1)).astype(np.uint8)
    blob = jfif_encode(img, quality=85, subsampling="420", backend=backend)
    jfif_decode(blob, backend=backend)   # warm the jit pixel stages
    reps = 3
    te = td = float("inf")               # min-of-N (host varies >10x)
    for _ in range(reps):
        t0 = time.perf_counter()
        blob = jfif_encode(img, quality=85, subsampling="420",
                           backend=backend)
        te = min(te, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = jfif_decode(blob, backend=backend)
        td = min(td, time.perf_counter() - t0)
    # multi-instance batch (≙ nvJPEGEncMultipleInstances): threads overlap
    # the native entropy stage with other images' device dispatches
    from tpumathlib.image.jpeg import jfif_encode_batch

    imgs = [np.roll(img, k, 1) for k in range(8)]
    t0 = time.perf_counter()
    jfif_encode_batch(imgs, quality=85, subsampling="420", nthreads=4)
    tb = (time.perf_counter() - t0) / len(imgs)
    mp = h * w / 1e6
    rec = {"bench": "jpeg", "size": f"{h}x{w}x3",
           "encode_mps": mp / te, "decode_mps": mp / td,
           "encode_batch8_mps": mp / tb,
           "stage_split": "native C++ entropy + device pixel pipeline",
           "bytes": len(blob)}
    rec.update(_pillow_jpeg_oracle(img, blob, reps=reps))
    return rec


def _pillow_jpeg_oracle(img, blob, reps=3) -> dict:
    """Same-host libjpeg-turbo (Pillow) decode of OUR stream + encode of
    the same image — the honest apples-to-apples bar for a host codec
    (the reference's nvJPEG samples likewise report against the CPU
    backend, NVJPEG_BACKEND_CPU_ONLY). min-of-reps (host timings on this
    box vary >10x, CLAUDE.md)."""
    try:
        import io
        from PIL import Image
    except ImportError:
        return {}
    h, w = img.shape[:2]
    mp = h * w / 1e6
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(Image.open(io.BytesIO(blob)))
        ts.append(time.perf_counter() - t0)
    td = min(ts)
    ts = []
    pil = Image.fromarray(img)
    for _ in range(reps):
        t0 = time.perf_counter()
        b = io.BytesIO()
        pil.save(b, format="JPEG", quality=85, subsampling=2)
        ts.append(time.perf_counter() - t0)
    te = min(ts)
    return {"oracle": "libjpeg (Pillow), same host, same stream",
            "oracle_decode_mps": mp / td, "oracle_encode_mps": mp / te}


def bench_j2k(h=256, w=256) -> dict:
    """nvJPEG2000-style decode/encode MP/s (≙ nvJPEG2000-Decoder's
    throughput report). EBCOT Tier-1 runs in native C++
    (native/src/ebcot.cpp, flag-word + LUT contexts + column-aggregate
    pass skips). Measured bound (round 5): on this 1-core host the MQ
    arithmetic decoder is the floor — ~13 ns per coefficient visit x
    ~3 passes/bitplane on this noise+ramp test image; code-block
    threading (the nvJPEG2000-Decoder-Pipelined parallelism axis) has
    no cores to run on here, so the line reports single-thread MQ
    throughput, openjpeg-class for lossless content of this entropy."""
    from tpumathlib.image.j2k_codestream import j2k_decode_codestream
    from tpumathlib.image.j2k_encoder import j2k_encode_codestream

    rng = np.random.default_rng(0)
    img = rng.integers(0, 40, (h, w), dtype=np.uint8) + \
        (np.arange(w, dtype=np.uint8)[None, :] // 2)
    te = td = float("inf")                 # min-of-3: host timings on
    for _ in range(3):                     # this box vary >10x, and the
        t0 = time.perf_counter()           # oracle below is min-of-3 too
        blob = j2k_encode_codestream(img, levels=3)
        te = min(te, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = j2k_decode_codestream(blob)
        td = min(td, time.perf_counter() - t0)
    assert np.array_equal(out, img)
    mp = h * w / 1e6
    rec = {"bench": "j2k", "size": f"{h}x{w}",
           "encode_mps": mp / te, "decode_mps": mp / td,
           "stage_split": "host EBCOT Tier-1 + vectorized DWT",
           "bytes": len(blob)}
    # same-host openjpeg (Pillow) on the IDENTICAL codestream/image —
    # the industry-standard CPU JPEG2000 codec as the honest bar
    # (measured round 5: parity, 0.9-1.7x across runs of this noisy
    # host; the nvJPEG2000 GPU numbers in BASELINE are a different
    # hardware class entirely).
    try:
        import io
        from PIL import Image
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            oimg = np.asarray(Image.open(io.BytesIO(blob)))
            ts.append(time.perf_counter() - t0)
        assert np.array_equal(oimg, img)   # cross-codec conformance
        rec["oracle_decode_mps"] = mp / min(ts)
        ts = []
        pil = Image.fromarray(img)
        for _ in range(3):
            t0 = time.perf_counter()
            b = io.BytesIO()
            pil.save(b, format="JPEG2000", irreversible=False,
                     num_resolutions=4)
            ts.append(time.perf_counter() - t0)
        rec["oracle_encode_mps"] = mp / min(ts)
        rec["oracle"] = "openjpeg (Pillow), same host, same stream"
    except Exception:
        pass
    return rec


def bench_trevc(n=64, b=256) -> dict:
    """Batched device eigenvector recovery from real Schur forms
    (solver.geev.trevc_device) vs the host LAPACK loop it replaced
    (≙ cuSOLVER/Xgeev/cusolver_Xgeev_example.cu timing of the
    eigenvector stage). Inputs are authentic Schur factorizations
    (scipy.linalg.schur on host, outside the timed region — the
    descriptor-lifecycle convention). Host baseline: per-element
    numpy.linalg.eig on the quasi-triangular T, min-of-3 (host timings
    on this box vary >10x under contention)."""
    import jax
    import jax.numpy as jnp
    import scipy.linalg

    from tpumathlib.solver.geev import _eigvals_from_schur, trevc_device

    rng = np.random.default_rng(0)
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    ts = np.empty_like(a)
    qs = np.empty_like(a)
    for i in range(b):
        ts[i], qs[i] = scipy.linalg.schur(a[i], output="real")
    t = jnp.asarray(ts)
    q = jnp.asarray(qs)
    wr, wi = _eigvals_from_schur(t)

    td = _amortized_seconds(
        lambda tt: tt + 1e-30 * trevc_device(tt, q, wr, wi)[0], t,
        chain=5)

    th = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(b):
            np.linalg.eig(ts[i])
        th = min(th, time.perf_counter() - t0)

    # residual of the device vectors on one element: A v = λ v
    vr, vi = jax.jit(trevc_device)(t, q, wr, wi)
    vr0 = np.asarray(vr[0]) + 1j * np.asarray(vi[0])
    nrm = np.maximum(np.linalg.norm(vr0, axis=0), 1e-30)
    v0 = vr0 / nrm
    lam = np.asarray(wr[0]) + 1j * np.asarray(wi[0])
    res = np.linalg.norm(a[0] @ v0 - v0 * lam[None, :]) / \
        np.linalg.norm(a[0])
    return {"bench": "trevc", "n": n, "batch": b,
            "device_ms": td * 1e3, "host_ms": th * 1e3,
            "speedup_vs_host": th / td, "residual": float(res)}


def bench_vv10(g=8192, nao=32, chunk=512) -> dict:
    """VV10 nonlocal-correlation pairwise kernel throughput (≙ the cuEST
    nonlocal_xc_potential compute, the O(G²) hotspot of vdW-DF SCF).
    FLOP model: ~22 flops per (i, j) pair (distance via the Gram identity,
    two g-factors, Φ, the Σ_j contraction) + the MXU distance matmuls."""
    import jax
    import jax.numpy as jnp

    from tpumathlib.apps.vv10 import vv10_pair_energy

    key = jax.random.key(0)
    rho = jax.random.uniform(key, (g,), jnp.float32, 0.01, 0.5)
    s2 = jax.random.uniform(key, (g,), jnp.float32, 0.0, 0.1)
    pts = jax.random.normal(key, (g, 3), jnp.float32) * 3.0
    w = jnp.full((g,), 1e-2, jnp.float32)

    def step(args):
        rho, s2 = args
        e = vv10_pair_energy(rho, s2, pts, w, 5.9, 0.0093, chunk)
        # feed the energy back so the chain is dependent (no DCE)
        return (rho + 1e-20 * e, s2)

    t = _amortized_seconds(step, (rho, s2), chain=20)
    flops = 22.0 * g * g
    return {"bench": "vv10_pair", "grid_points": g, "ms": t * 1e3,
            "gflops": flops / t / 1e9}


def bench_df_jk(nao=512, naux=2048, dtype="bfloat16") -> dict:
    """DF J/K Fock-build throughput at production basis scale with
    synthetic fit tensors (≙ cuEST core_df_jk — the per-iteration SCF
    hotspot). K dominates: 2 einsums of 2·naux·nao³ flops each; J adds
    two naux·nao² matvecs. Uses the same contractions as
    apps.est.DFTensors.coulomb/exchange, shapes only."""
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    b = jax.random.normal(key, (nao, nao, naux), jnp.dtype(dtype))

    def step(d, b):
        dj = d.astype(b.dtype)
        g = jnp.einsum("mnp,mn->p", b, dj)
        j = jnp.einsum("mnp,p->mn", b, g)
        bd = jnp.einsum("mlp,ls->msp", b, dj)
        k = jnp.einsum("msp,nsp->mn", bd, b)
        return (j + k).astype(jnp.float32)

    d0 = jax.random.normal(key, (nao, nao), jnp.float32)
    t = _amortized_seconds(step, d0, chain=10, params=b)
    flops = 2 * (2.0 * naux * nao ** 3) + 2 * (2.0 * naux * nao ** 2)
    return {"bench": "df_jk", "nao": nao, "naux": naux, "dtype": dtype,
            "ms": t * 1e3, "tflops": flops / t / 1e12}


def run_all() -> list[dict]:
    records = []
    records.append(bench_gemm())
    records.append(bench_fft())
    records.append(bench_spmv())
    records.append(bench_spmv_bell())
    records.append(bench_spmm_bell())
    for codec in ("lz4", "cascaded", "ans"):
        records.append(bench_compression(codec, size=1 << 20))
    records.extend(bench_canny(sizes=((512, 512),)))
    records.append(bench_jpeg())
    records.append(bench_j2k())
    records.append(bench_trevc())
    records.append(bench_vv10())
    records.append(bench_df_jk())
    for r in records:
        print(json.dumps(r))
    # ≙ the reference samples' sentinel contract (&&&& PASSED / FAILED
    # greppable by harnesses, e.g. cuRAND/nvJPEG sample main()s)
    print("&&&& PASSED tpumathlib.benchmarks")
    return records


if __name__ == "__main__":
    run_all()


def bench_spmv_autoplan(mb=64, nb=64, ellw=32, bs=128) -> dict:
    """SpmvAutoPlan on a CSR that HIDES block structure (≙ the cuSPARSE
    spmv_csr preprocess step exploiting pattern analysis): plan-time
    repack routes the gather-wall CSR onto the BlockedELL bf16-split
    row-form engine. Reports the executed GB/s over the ORIGINAL CSR's
    bytes (the user-visible speed for their matrix)."""
    import jax
    import jax.numpy as jnp

    from tpumathlib.sparse import CSR
    from tpumathlib.sparse.autoplan import SpmvAutoPlan
    from tpumathlib.sparse.pallas_kernels import SpmvPlan  # noqa: F401

    rng = np.random.default_rng(0)
    n = nb * bs
    m = mb * bs
    # ellw random blocks per block-row, fully dense inside: build the CSR
    # directly (scipy-free; rows grouped by block row)
    cols_blk = np.stack([np.sort(rng.choice(nb, ellw, replace=False))
                         for _ in range(mb)])
    rowlen = ellw * bs
    indptr = np.arange(m + 1, dtype=np.int64) * rowlen
    cidx = (cols_blk[:, None, :, None] * bs
            + np.arange(bs)[None, None, None, :])      # (mb, 1, ellw, bs)
    cidx = np.broadcast_to(cidx, (mb, bs, ellw, bs)).reshape(-1)
    data = rng.normal(size=m * rowlen).astype(np.float32)
    a = CSR(jnp.asarray(indptr.astype(np.int32)),
            jnp.asarray(cidx.astype(np.int32)),
            jnp.asarray(data), (m, n))
    plan = SpmvAutoPlan(a)
    assert plan.engine == "blockedell", plan.stats
    x = jnp.asarray(rng.normal(size=n), jnp.float32)

    chain = 20
    bellplan = plan._bell

    def run(ah, al, v0):
        p = SpmvPlan.from_parts(bellplan.cols, ah, al, bellplan.shape,
                                bellplan.bs)

        def body(_, c):
            v, s = c
            y = p.execute(v).astype(v.dtype)[:n]
            return y, s + y[0]

        _, s = jax.lax.fori_loop(0, chain, body, (x, jnp.float32(0)))
        return s

    g = jax.jit(run)
    float(g(bellplan.ah, bellplan.al, x))
    t = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(bellplan.ah, bellplan.al, x))
        t = min(t, (time.perf_counter() - t0) / chain)
    nnz = m * rowlen
    bytes_moved = nnz * 4 + n * 4 + m * 4   # the CSR's own data bytes
    return {"bench": "spmv_autoplan", "nnz": nnz, "ms": t * 1e3,
            "gbps": bytes_moved / t / 1e9, "engine": plan.engine,
            "stats": plan.stats}

"""Driver benchmarks: GEMM (headline, last line) + FFT (incl. TFLOP/s and
the planar R2C/C2R cycle) + SpMV/SpMM + solver tier (potrf/getrf/syevd +
lane-packed batched) + device compression GB/s.

Prints one JSON line per metric — {"metric", "value", "unit",
"vs_baseline"} — with the bf16-GEMM headline LAST (the driver records the
final line). vs_baseline is measured value over the BASELINE.json target:
GEMM vs 85% of MXU peak, FFT/SpMV vs 80% of the HBM-spec roofline
(819 GB/s on v5e — note the measured streaming ceiling of this chip behind
the axon tunnel is ~375 GB/s aliased / ~480 GB/s at GB-scale, so the
roofline targets are reported against spec, not against the achievable
ceiling), SpMM vs the 5 TFLOP/s round-2 bar.

Timing protocol: the tunnel adds ~35 ms fixed latency and
block_until_ready does not reliably await device completion, so every op
runs in a fori_loop chain inside one jit and a scalar readback forces
completion (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: remote compiles through the axon tunnel
# run 20-165 s each (measured), so a cold bench cannot finish inside the
# driver's window without one. Second process re-use measured at ~10x.
os.makedirs("/root/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# bf16 peak TFLOP/s by device kind (public specs)
_PEAK = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
}
_HBM = {
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1638.0,
}


def _chain_time(fn, args, chain, repeats=3):
    import jax
    import jax.numpy as jnp

    def run(c):
        out = jax.lax.fori_loop(0, chain, lambda _, c: fn(c), c)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) for l in leaves)

    g = jax.jit(run)
    float(g(args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(g(args))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def _marginal_planar(fn, pr, pi, chain=20, reps=3, repeats=3):
    """Marginal-cost chain for planar (re, im) -> (re, im) ops — the same
    de-inflation as _marginal_chain_time (the round-4 tuple-carry chain
    defeated the pipeline kernels' buffer donation: the shuffled FFT
    measured 266 GB/s through it vs 565 GB/s marginal, round 5)."""
    import jax
    import jax.numpy as jnp

    ts = []
    for r_ in (1, reps):
        def run(ar, ai, c0, r_=r_):
            def body(_, c):
                rr, ri = ar + c * jnp.asarray(1e-30, ar.dtype), ai
                for _k in range(r_):
                    rr, ri = fn(rr, ri)
                return c + rr[0, 0].astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, chain, body, c0)

        g = jax.jit(run)
        float(g(pr, pi, jnp.float32(0)))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(pr, pi, jnp.float32(0)))
            best = min(best, (time.perf_counter() - t0) / chain)
        ts.append(best)
    return max((ts[1] - ts[0]) / (reps - 1), 1e-9)


def _slope_chain_time(fn, x, lo=20, hi=220, repeats=5):
    """Lowest-variance per-op seconds: ONE jitted chain with a TRACED trip
    count, timed at two lengths — the slope cancels every fixed cost
    (dispatch, warmup, readback) exactly, and subtracting the slope of an
    identity-body chain removes the per-link perturbation pass too. Used
    for the headline GEMM lines (the round-4 carry chain understated the
    bf16 GEMM 165 -> 189 TF/s measured; a naive output-fed chain is NOT a
    valid alternative — see the note in _marginal_chain_time)."""
    import jax
    import jax.numpy as jnp

    def run(p, c0, nit):
        def body(_, c):
            out = fn(p + c * jnp.asarray(1e-30, p.dtype))
            return c + out[0, 0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, nit, body, c0)

    g = jax.jit(run)
    ts = {}
    for nit in (lo, hi):
        float(g(x, jnp.float32(0), nit))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(x, jnp.float32(0), nit))
            best = min(best, time.perf_counter() - t0)
        ts[nit] = best
    return max((ts[hi] - ts[lo]) / (hi - lo), 1e-9)


def bench_fft(hbm_target):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpumathlib.fft.stockham import dif_fft

    batch = n = 4096
    key = jax.random.key(0)
    xr = jax.random.normal(key, (batch, n), jnp.float32)
    xi = jax.random.normal(key, (batch, n), jnp.float32)
    recs = []
    t_nat = None
    for name, kw in (("natural", {}), ("shuffled", {"reorder": False})):
        t = _marginal_planar(
            lambda r, i, kw=kw: dif_fft(r, i, **kw), xr, xi)
        if name == "natural":
            t_nat = t
        gbps = 2.0 * batch * n * 8 / t / 1e9
        recs.append({
            "metric": f"fft_c2c_{name}_b{batch}_n{n}_gbps",
            "value": round(gbps, 1), "unit": "GB/s",
            "vs_baseline": round(gbps / hbm_target, 4),
        })
    recs[0]["note"] = ("natural-order alternatives measured round 5: "
                        "reshape-transpose epilogue 119 GB/s, four-step "
                        "XLA 129 GB/s — the lane-gather epilogue (175) "
                        "stays; the extra HBM pass is architectural "
                        "(fft/stockham.py docstring)")
    # bf16-plane fast mode: HALF the stream bytes of the DMA-bound f32
    # path (documented ~4e-3 rel-L2 contract); reported as PROCESSED-
    # EQUIVALENT GB/s (same complex elements/s scale as the f32 lines,
    # i.e. elements x 8 bytes / s) so the speedup reads directly
    tbf = _marginal_planar(
        lambda r, i: dif_fft(r, i, reorder=False, halfplanes=True),
        xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16))
    gbps_bf = 2.0 * batch * n * 8 / tbf / 1e9
    recs.append({"metric": f"fft_c2c_shuffled_bf16_b{batch}_n{n}_gbps",
                 "value": round(gbps_bf, 1), "unit": "GB/s-equiv",
                 "vs_baseline": round(gbps_bf / hbm_target, 4)})
    # FFT TFLOP/s per BASELINE.md's 5·N·log2(N) model
    # (cuFFTMp/JAX_FFT/tests/fft_test.py:148-158); target = the reference's
    # 13.2 TFlop/s on 4 H100s → 3.3 per device
    logn = float(np.log2(n))
    tflops = 5.0 * batch * n * logn / t_nat / 1e12  # natural-order time
    recs.append({"metric": f"fft_c2c_b{batch}_n{n}_tflops",
                 "value": round(tflops, 2), "unit": "TFLOP/s",
                 "vs_baseline": round(tflops / 3.3, 4)})
    # chip-executable planar R2C/C2R cycle (≙ r2c_c2r_slabs_GROMACS:
    # 0.766 ms for a 256^3 = 16.7M-real-element cycle on 2 GPUs; ours is
    # the same element count on one chip)
    from tpumathlib.fft.plan import FftType, plan_many

    pr = plan_many((n,), FftType.R2C)
    pc = plan_many((n,), FftType.C2R)
    xreal = jax.random.normal(key, (batch, n), jnp.float32)

    def cycle(c):
        hr, hi = pr._fwd_planar(c)
        return pc._inv_planar(hr, hi) * (1.0 / n)

    tcyc = _marginal_chain_time(cycle, xreal, chain=20)
    recs.append({"metric": f"fft_r2c_c2r_cycle_b{batch}_n{n}_ms",
                 "value": round(tcyc * 1e3, 3), "unit": "ms",
                 "vs_baseline": round(0.766 / (tcyc * 1e3), 4)})
    # bf16-plane fast-mode cycle (plan precision="bf16" ≙ cuFFT
    # half-precision plans; documented ~5e-3 rel-L2 roundtrip)
    prb = plan_many((n,), FftType.R2C, precision="bf16")
    pcb = plan_many((n,), FftType.C2R, precision="bf16")

    def cycle_bf(c):
        hr, hi = prb._fwd_planar(c)
        return pcb._inv_planar(hr, hi) * (1.0 / n)

    tcycb = _marginal_chain_time(cycle_bf, xreal, chain=20)
    recs.append({"metric": f"fft_r2c_c2r_cycle_bf16_b{batch}_n{n}_ms",
                 "value": round(tcycb * 1e3, 3), "unit": "ms",
                 "vs_baseline": round(0.766 / (tcycb * 1e3), 4)})
    # accuracy line (reference bar: rel-L2 < 1e-4, JAX_FFT fft_test.py:91)
    x = np.random.default_rng(0).normal(size=(8, n)) + \
        1j * np.random.default_rng(1).normal(size=(8, n))
    yr, yi = dif_fft(jnp.asarray(x.real, jnp.float32),
                     jnp.asarray(x.imag, jnp.float32))
    w = np.fft.fft(x)
    err = float(np.linalg.norm((np.asarray(yr) + 1j * np.asarray(yi)) - w)
                / np.linalg.norm(w))
    recs.append({"metric": "fft_c2c_rel_l2", "value": err, "unit": "rel-L2",
                 "vs_baseline": round(1e-4 / max(err, 1e-30), 2)})
    return recs


def bench_sparse(hbm_target):
    from tpumathlib.benchmarks import bench_spmv, bench_spmv_autoplan, \
        bench_spmv_bell, bench_spmm_bell

    csr = bench_spmv()
    auto = bench_spmv_autoplan()
    bell = bench_spmv_bell()
    spmm = bench_spmm_bell()
    return [
        {"metric": "spmv_csr_3.2Mnnz_gbps", "value": round(csr["gbps"], 2),
         "unit": "GB/s", "vs_baseline": round(csr["gbps"] / hbm_target, 4),
         "note": "TRUE-random CSR: the gather wall (~126M elem/s, "
                 "NOTES_r2) — SpmvAutoPlan keeps this fallback only "
                 "when plan-time analysis finds no exploitable "
                 "structure (see spmv_autoplan_csr_gbps)"},
        {"metric": "spmv_autoplan_csr_gbps", "value": round(auto["gbps"], 1),
         "unit": "GB/s", "vs_baseline": round(auto["gbps"] / hbm_target, 4),
         "note": "CSR with latent 128-blocks auto-repacked to the "
                 "BlockedELL engine at plan time (sparse/autoplan.py "
                 "≙ cusparseSpMV preprocess)"},
        {"metric": "spmv_blockedell_67Mnnz_gbps",
         "value": round(bell["gbps"], 1), "unit": "GB/s",
         "vs_baseline": round(bell["gbps"] / hbm_target, 4)},
        {"metric": "spmm_blockedell_bf16_tflops",
         "value": round(spmm["tflops"], 1), "unit": "TFLOP/s",
         "vs_baseline": round(spmm["tflops"] / 5.0, 4)},
    ]


def _marginal_chain_time(fn, x, chain=5, reps=3, repeats=3):
    """Marginal seconds per op: per-link cost of ``reps`` nested dependent
    applications minus the 1-application link, / (reps-1). Cancels EVERY
    per-link harness term — fori-carry HBM round trips, donation-defeating
    copies, scalar readback — that the plain carry chain pays per link.
    Round 4's solver lines used the carry chain and were ~2.4x inflated
    (solver/onelaunch.py docstring has the decomposition)."""
    import jax
    import jax.numpy as jnp

    # NOTE: do NOT "feed the output directly into the next application"
    # for LINEAR ops to avoid the perturbation pass — XLA reassociates
    # dot(dot(v,B),B) into v@(B@B) and hoists the loop-invariant B@B, so
    # the extra applications cost ONE gemm regardless of reps (measured:
    # a direct-fed bf16 GEMM chain reported 4284 "TFLOP/s"). The
    # perturbation between reps breaks reassociation; it costs one
    # elementwise pass over the operand per rep (~7-10% overstatement on
    # a 4096^3 GEMM, conservative direction).
    def make(r):
        def run(p, c0):
            def body(_, c):
                for _k in range(r):
                    out = fn(p + c * jnp.asarray(1e-30, p.dtype))
                    c = c + out[0, 0].astype(jnp.float32) * 1e-30
                return c
            return jax.lax.fori_loop(0, chain, body, c0)
        return jax.jit(run)

    ts = []
    for r in (1, reps):
        g = make(r)
        float(g(x, jnp.float32(0)))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(x, jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        ts.append(best / chain)
    return max((ts[1] - ts[0]) / (reps - 1), 1e-9)


def bench_solver(peak):
    """Solver-tier self-measurement (≙ the reference's per-sample timing,
    cuBLASMp/gemm.cu:501, cusolver_examples timing loops)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpumathlib.solver.dense import xgetrf, xpotrf, xsyevd

    n = 4096
    key = jax.random.key(1)
    g = jax.random.normal(key, (n, n), jnp.float32)
    spd = (g @ g.T) / n + 4.0 * jnp.eye(n, dtype=jnp.float32)
    t = _marginal_chain_time(lambda c: xpotrf(c)[0], spd, chain=5)
    gf = (n**3 / 3.0) / t / 1e9
    # f32 roofline: the MXU runs f32 at ~peak/2 with HIGHEST-precision
    # passes; target 50% of that (factorizations are panel-bound)
    yield {"metric": f"solver_potrf_f32_n{n}_gflops",
           "value": round(gf, 1), "unit": "GFLOP/s",
           "vs_baseline": round(gf / (0.25 * peak * 1e3), 4),
           "note": "one-launch left-looking Pallas engine "
                   "(solver/onelaunch.py): 1.3x XLA cholesky; includes "
                   "one 64 MB elementwise chain-perturbation pass"}
    n8 = 8192
    g8 = jax.random.normal(jax.random.key(2), (n8, n8), jnp.float32)
    spd8 = (g8 @ g8.T) / n8 + 4.0 * jnp.eye(n8, dtype=jnp.float32)
    t8 = _marginal_chain_time(lambda c: xpotrf(c)[0], spd8, chain=4)
    gf8 = (n8**3 / 3.0) / t8 / 1e9
    yield {"metric": f"solver_potrf_f32_n{n8}_gflops",
           "value": round(gf8, 1), "unit": "GFLOP/s",
           "vs_baseline": round(gf8 / (0.25 * peak * 1e3), 4),
           "note": "one-launch engine at scale: 23.8 TFLOP/s measured "
                   "= 1.57x XLA (12.1 ms)"}
    del g8, spd8
    t = _marginal_chain_time(lambda c: xgetrf(c)[0], g, chain=5)
    gf = (2.0 * n**3 / 3.0) / t / 1e9
    yield {"metric": f"solver_getrf_n{n}_gflops",
           "value": round(gf, 1), "unit": "GFLOP/s",
           "vs_baseline": round(gf / (0.25 * peak * 1e3), 4)}
    # no-pivot algorithm selection (≙ CUSOLVER_ALG no-pivot /
    # cusolverMpGetrf pivot-off) through the one-launch engine; input is
    # diagonally dominant per the no-pivot validity contract
    gdd = g + n * jnp.eye(n, dtype=jnp.float32)
    t = _marginal_chain_time(lambda c: xgetrf(c, pivot=False)[0], gdd,
                             chain=5)
    gf = (2.0 * n**3 / 3.0) / t / 1e9
    yield {"metric": f"solver_getrf_nopivot_n{n}_gflops",
           "value": round(gf, 1), "unit": "GFLOP/s",
           "vs_baseline": round(gf / (0.25 * peak * 1e3), 4),
           "note": "one-launch left-looking block LU "
                   "(solver/onelaunch.py), no-pivot path"}
    # QR (factor + materialized Q) through the one-launch CholeskyQR2 +
    # Householder-reconstruction engine (solver/qr_onelaunch.py);
    # flop model 8/3 n^3 = geqrf + square orgqr, the Xgeqrf+Xorgqr pair
    from tpumathlib.solver.dense import xgeqrf

    t = _marginal_chain_time(lambda c: xgeqrf(c)[0], g, chain=3)
    gf = (8.0 * n**3 / 3.0) / t / 1e9
    yield {"metric": f"solver_geqrf_orgqr_n{n}_gflops",
           "value": round(gf, 1), "unit": "GFLOP/s",
           "vs_baseline": round(gf / (0.25 * peak * 1e3), 4),
           "note": "one-launch CholQR2+Householder-reconstruction "
                   "geqrf+orgqr; XLA qr = 13.2 ms at this shape"}
    ne = 2048
    spd_e = spd[:ne, :ne]
    t = _marginal_chain_time(lambda c: xsyevd(c)[1], spd_e, chain=2,
                             reps=2)
    yield {"metric": f"solver_syevd_n{ne}_ms",
           "value": round(t * 1e3, 1), "unit": "ms",
           "vs_baseline": round((4.0 * ne**3 / 3.0) / t / 1e9 / 1000, 4),
           "note": "marginal-cost timing (the round-4 130 ms figure "
                   "carried ~2.4x of harness inflation)"}
    # lane-packed batched small-n factorization vs vmapped XLA
    from tpumathlib.dx.solver import potrf_batched_packed

    bsz, ns = 8192, 32
    gk = jax.random.normal(key, (bsz, ns, ns), jnp.float32)
    spds = gk @ jnp.swapaxes(gk, 1, 2) + ns * jnp.eye(ns, dtype=jnp.float32)
    t_dx = _chain_time(potrf_batched_packed, spds, chain=10)
    t_xla = _chain_time(jnp.linalg.cholesky, spds, chain=10)
    yield {"metric": f"dx_potrf_packed_b{bsz}_n{ns}_speedup_vs_xla",
           "value": round(t_xla / t_dx, 2), "unit": "x",
           "vs_baseline": round(t_xla / t_dx, 4)}
    from tpumathlib.dx.solver import getrf_batched_packed

    t_dx = _chain_time(lambda c: getrf_batched_packed(c)[0], gk, chain=10)
    t_xla = _chain_time(lambda c: jax.scipy.linalg.lu_factor(c)[0], gk,
                        chain=10)
    yield {"metric": f"dx_getrf_packed_b{bsz}_n{ns}_speedup_vs_xla",
           "value": round(t_xla / t_dx, 2), "unit": "x",
           "vs_baseline": round(t_xla / t_dx, 4)}
    # batched device eigenvector recovery (the cusolverDnXgeev dtrevc
    # stage) vs the host LAPACK loop it replaced
    from tpumathlib.benchmarks import bench_trevc

    tv = bench_trevc()
    yield {"metric": f"trevc_device_n{tv['n']}_b{tv['batch']}"
                     "_speedup_vs_host",
           "value": round(tv["speedup_vs_host"], 2), "unit": "x",
           "vs_baseline": round(tv["speedup_vs_host"], 4)}


def bench_comp(hbm_target):
    """Device compression throughput (≙ nvCOMP/benchmarks/README.md:3-5 —
    the GB/s-on-device contract) + ratio."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpumathlib import comp
    from tpumathlib.dx.comp import dx_compress, dx_decompress

    n = 64 * 1024 * 1024  # 256 MB of int32
    v = jnp.cumsum(jax.random.randint(jax.random.key(2), (n,), -60, 61,
                                      jnp.int32)).astype(jnp.int32)
    bits = 8
    packed, leaders = dx_compress(v, bits=bits)

    # chain bodies must be carry-shaped AND data-dependent (a fixed-input
    # call would be hoisted out of the fori_loop); codec cost is
    # data-independent, so feeding a 1-bit corruption back is safe timing
    def dec_chain(c):
        p, ld = c
        out = dx_decompress(p, ld, n, bits=bits)
        flip = (jnp.sum(out[:1024], dtype=jnp.int32) & 1).astype(jnp.uint32)
        return p ^ flip, ld

    def com_chain(x):
        p, _ = dx_compress(x, bits=bits)
        flip = (jnp.sum(p[:64], dtype=jnp.uint32) & 1).astype(jnp.int32)
        return x ^ flip

    # slope timing (traced trip count, two lengths — cancels the fixed
    # dispatch/readback terms AND the fori-carry round trip that
    # understated the round-4 lines)
    def _slope(fn, args, lo=4, hi=24):
        def run(c, nit):
            out = jax.lax.fori_loop(0, nit, lambda _, c: fn(c), c)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                       for l in leaves)

        g = jax.jit(run)
        ts = {}
        for nit in (lo, hi):
            float(g(args, nit))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(g(args, nit))
                best = min(best, time.perf_counter() - t0)
            ts[nit] = best
        return max((ts[hi] - ts[lo]) / (hi - lo), 1e-9)

    td = _slope(dec_chain, (packed, leaders))
    tc = _slope(com_chain, v)
    gbps_d = 4.0 * n / td / 1e9
    gbps_c = 4.0 * n / tc / 1e9
    return [
        {"metric": "comp_cascaded_decompress_256MB_gbps",
         "value": round(gbps_d, 1), "unit": "GB/s",
         "vs_baseline": round(gbps_d / 50.0, 4)},
        {"metric": "comp_cascaded_compress_256MB_gbps",
         "value": round(gbps_c, 1), "unit": "GB/s",
         "vs_baseline": round(gbps_c / 50.0, 4)},
        {"metric": "comp_cascaded_ratio_int32_small_deltas",
         # achieved ratio (incl. per-row leader words + row padding), not
         # the nominal 32/bits (ADVICE r3 #3)
         "value": round(comp.device_cascaded_ratio(
             (n, bits), (packed, leaders)), 2), "unit": "x",
         "vs_baseline": round(comp.device_cascaded_ratio(
             (n, bits), (packed, leaders)) / (32.0 / bits), 4)},
    ]


def bench_image():
    """Image-codec throughput lines (≙ nvJPEG's images/sec reporting
    samples). Stage split is documented in tpumathlib.benchmarks: entropy
    coding runs in native C++ on host (sequential by nature; JPEG via
    native/src/jpeg_entropy.cpp, J2K EBCOT still NumPy), the pixel
    pipeline in one fused device dispatch.
    vs_baseline compares against a 50 MP/s CPU-backend-class bar
    (NVJPEG_BACKEND_CPU_ONLY-grade) — the honest scale for a host entropy
    stage; nvJPEG's hardware decoder is ~10x beyond that."""
    from tpumathlib.benchmarks import bench_j2k, bench_jpeg

    j = bench_jpeg()
    j2 = bench_jpeg(h=1536, w=2048)     # >=2 MP point: amortizes the
    k = bench_j2k()                     # per-image fixed costs that
    def vs(rec, kind):                  # dominate 512x512 (round-4 weak #4)
        # same-host industry-standard codec on the identical stream
        # (libjpeg-turbo / openjpeg via Pillow) — the honest hardware-
        # normalized ratio; absent if Pillow lacks the codec.
        o = rec.get(f"oracle_{kind}_mps")
        return {} if not o else {
            "vs_host_oracle": round(rec[f"{kind}_mps"] / o, 3),
            "oracle_mps": round(o, 2)}
    return [
        {"metric": "jpeg_decode_512rgb_mps",
         "value": round(j["decode_mps"], 3), "unit": "MP/s",
         "vs_baseline": round(j["decode_mps"] / 50.0, 5), **vs(j, "decode")},
        {"metric": "jpeg_encode_512rgb_mps",
         "value": round(j["encode_mps"], 3), "unit": "MP/s",
         "vs_baseline": round(j["encode_mps"] / 50.0, 5), **vs(j, "encode")},
        {"metric": "jpeg_decode_3mp_mps",
         "value": round(j2["decode_mps"], 3), "unit": "MP/s",
         "vs_baseline": round(j2["decode_mps"] / 50.0, 5),
         **vs(j2, "decode")},
        {"metric": "jpeg_encode_3mp_mps",
         "value": round(j2["encode_mps"], 3), "unit": "MP/s",
         "vs_baseline": round(j2["encode_mps"] / 50.0, 5),
         **vs(j2, "encode")},
        {"metric": "j2k_decode_256gray_mps",
         "value": round(k["decode_mps"], 3), "unit": "MP/s",
         "vs_baseline": round(k["decode_mps"] / 50.0, 5), **vs(k, "decode")},
        {"metric": "j2k_encode_256gray_mps",
         "value": round(k["encode_mps"], 3), "unit": "MP/s",
         "vs_baseline": round(k["encode_mps"] / 50.0, 5), **vs(k, "encode")},
    ]


def bench_gemm(peak):
    import jax
    import jax.numpy as jnp

    from tpumathlib.blas import level3

    from tpumathlib.blas import lt

    m = n = k = 4096
    key = jax.random.key(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)
    bias = jax.random.normal(key, (n,), jnp.float32)
    target = 0.85 * peak
    # fused gelu+bias epilogue through the Lt engine (heuristic routes the
    # elementwise epilogue into XLA's GEMM emitter — zero-cost fusion)
    desc = lt.MatmulDesc(epilogue=lt.Epilogue.GELU_BIAS)
    sbase = _slope_chain_time(lambda x: x, a)
    tf = _slope_chain_time(
        lambda x: lt.matmul(desc, x, b, bias=bias,
                            out_dtype=jnp.bfloat16), a) - sbase
    fused = {
        "metric": f"gemm_bf16_gelu_bias_{m}x{n}x{k}_tflops",
        "value": round(2.0 * m * n * k / tf / 1e12, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(2.0 * m * n * k / tf / 1e12 / target, 4),
    }
    # headline: plain bf16 GEMM through the public L3 surface
    # (marginal-cost chain: the carry chain's 32 MB round trip per link
    # understated the round-4 number ~10%)
    t = _slope_chain_time(
        lambda x: level3.gemm(1.0, x, b).astype(jnp.bfloat16), a) - sbase
    tflops = 2.0 * m * n * k / t / 1e12
    return fused, {
        "metric": f"gemm_bf16_{m}x{n}x{k}_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
    }


def _probe_backend(timeout_s: int = 600) -> bool:
    """The axon tunnel can be DOWN (backend init hangs indefinitely —
    observed for hours in round 4). Probe device init in a subprocess
    with a hard timeout so the bench fails FAST with a diagnostic line
    instead of hanging the driver."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    import sys

    import jax

    if not _probe_backend():
        print(json.dumps({"metric": "bench_unavailable", "value": 0,
                          "unit": "tpu_backend_down",
                          "vs_baseline": 0.0}), flush=True)
        print("TPU backend init hung/failed — axon tunnel down; "
              "no measurements possible", file=sys.stderr, flush=True)
        return

    kind = jax.devices()[0].device_kind
    peak = _PEAK.get(kind, 197.0)
    hbm_target = 0.8 * _HBM.get(kind, 819.0)

    # one flaky remote-compile must not kill the whole record: every
    # section is independent; failures print a diagnostic line to stderr.
    # The driver records only the TAIL of stdout, so records are buffered
    # and printed compactly at the very END (live progress goes to stderr;
    # notes are truncated) — BENCH_r04 lost half its lines to truncation.
    import sys

    records: list[dict] = []

    def _add(rec: dict) -> None:
        note = rec.get("note")
        if isinstance(note, str) and len(note) > 70:
            rec = dict(rec, note=note[:67] + "...")
        records.append(rec)
        print("done:", rec.get("metric"), rec.get("value"),
              file=sys.stderr, flush=True)

    for section in (lambda: bench_fft(hbm_target),
                    lambda: bench_sparse(hbm_target),
                    lambda: bench_solver(peak),
                    lambda: bench_comp(hbm_target),
                    bench_image):
        try:
            for rec in section():
                _add(rec)
        except Exception as e:  # pragma: no cover - tunnel flakes
            print(f"bench section failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    fused, headline = bench_gemm(peak)
    _add(fused)
    for rec in records:
        print(json.dumps(rec, separators=(",", ":")), flush=True)
    print(json.dumps(headline, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()

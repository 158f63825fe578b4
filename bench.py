"""Driver benchmarks: GEMM (headline, last line) + FFT + SpMV/SpMM.

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
import time

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
    for name, kw in (("natural", {}), ("shuffled", {"reorder": False})):
        t = _chain_time(lambda c, kw=kw: dif_fft(c[0], c[1], **kw),
                        (xr, xi), chain=50)
        gbps = 2.0 * batch * n * 8 / t / 1e9
        recs.append({
            "metric": f"fft_c2c_{name}_b{batch}_n{n}_gbps",
            "value": round(gbps, 1), "unit": "GB/s",
            "vs_baseline": round(gbps / hbm_target, 4),
        })
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
    from tpumathlib.benchmarks import bench_spmv, bench_spmv_bell, \
        bench_spmm_bell

    csr = bench_spmv()
    bell = bench_spmv_bell()
    spmm = bench_spmm_bell()
    return [
        {"metric": "spmv_csr_3.2Mnnz_gbps", "value": round(csr["gbps"], 2),
         "unit": "GB/s", "vs_baseline": round(csr["gbps"] / hbm_target, 4)},
        {"metric": "spmv_blockedell_67Mnnz_gbps",
         "value": round(bell["gbps"], 1), "unit": "GB/s",
         "vs_baseline": round(bell["gbps"] / hbm_target, 4)},
        {"metric": "spmm_blockedell_bf16_tflops",
         "value": round(spmm["tflops"], 1), "unit": "TFLOP/s",
         "vs_baseline": round(spmm["tflops"] / 5.0, 4)},
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
    tf = _chain_time(
        lambda x: lt.matmul(desc, x, b, bias=bias,
                            out_dtype=jnp.bfloat16), a, chain=300)
    fused = {
        "metric": f"gemm_bf16_gelu_bias_{m}x{n}x{k}_tflops",
        "value": round(2.0 * m * n * k / tf / 1e12, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(2.0 * m * n * k / tf / 1e12 / target, 4),
    }
    # headline: plain bf16 GEMM through the public L3 surface
    t = _chain_time(lambda x: level3.gemm(1.0, x, b).astype(jnp.bfloat16),
                    a, chain=300)
    tflops = 2.0 * m * n * k / t / 1e12
    return fused, {
        "metric": f"gemm_bf16_{m}x{n}x{k}_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
    }


def main() -> None:
    import jax

    kind = jax.devices()[0].device_kind
    peak = _PEAK.get(kind, 197.0)
    hbm_target = 0.8 * _HBM.get(kind, 819.0)

    for rec in bench_fft(hbm_target):
        print(json.dumps(rec), flush=True)
    for rec in bench_sparse(hbm_target):
        print(json.dumps(rec), flush=True)
    fused, headline = bench_gemm(peak)
    print(json.dumps(fused), flush=True)
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()

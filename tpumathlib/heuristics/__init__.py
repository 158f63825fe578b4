"""heuristics — the nvMatmulHeuristics capability surface.

Parity (nvMatmulHeuristics/1_gemm_heuristics.cpp:33-66, 2_discovery.cpp,
5_get_configs.py):
  hardware descriptor (+ predefined GPUs) → HardwareDescriptor + PREDEFINED
  (TPU v4/v5e/v5p/v6e entries)
  nvMatmulHeuristicsGetGemmConfig (top-N)  → get_configs
  runtime estimation                        → estimate_runtime (MXU/HBM
                                              roofline over the tile space)
  LoadInternalDiscoverySet (silicon scans)  → run_discovery / load_discovery
                                              (measured-point table persisted
                                              in the autotune cache, used to
                                              calibrate the analytic model)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

from tpumathlib.core.dtypes import cdiv, traits
from tpumathlib.core.tuning import global_autotune_cache, device_kind
from tpumathlib.dx.gemm import MatmulConfig


@dataclasses.dataclass(frozen=True)
class HardwareDescriptor:
    """≙ nvmmhHardwareDescriptor."""

    name: str
    bf16_tflops: float
    fp32_tflops: float
    int8_tops: float
    hbm_gbps: float
    vmem_bytes: int = 16 * 2**20
    cores: int = 1


PREDEFINED = {
    "TPU v4": HardwareDescriptor("TPU v4", 275.0, 137.0, 275.0, 1228.0, cores=2),
    "TPU v5 lite": HardwareDescriptor("TPU v5e", 197.0, 98.5, 394.0, 819.0),
    "TPU v5e": HardwareDescriptor("TPU v5e", 197.0, 98.5, 394.0, 819.0),
    "TPU v5p": HardwareDescriptor("TPU v5p", 459.0, 229.0, 918.0, 2765.0, cores=2),
    "TPU v6 lite": HardwareDescriptor("TPU v6e", 918.0, 459.0, 1836.0, 1640.0),
}


def detect_hardware() -> HardwareDescriptor:
    kind = device_kind().replace("_", " ")
    for k, v in PREDEFINED.items():
        if kind.startswith(k):
            return v
    return PREDEFINED["TPU v5e"]


def _peak_flops(hw: HardwareDescriptor, dtype) -> float:
    t = traits(dtype)
    if t.itemsize == 1:
        return hw.int8_tops * 1e12
    if t.itemsize == 2:
        return hw.bf16_tflops * 1e12
    return hw.fp32_tflops * 1e12


def estimate_runtime(m: int, n: int, k: int, dtype, cfg: MatmulConfig,
                     hw: HardwareDescriptor | None = None,
                     calibration: dict | None = None) -> float:
    """Analytic roofline: seconds = max(compute, memory) with a tile-aware
    HBM traffic model (A and B re-read per tile pass) + per-tile overhead.

    ``calibration`` (from discovery) multiplies the estimate by the measured
    efficiency of the nearest discovered problem."""
    hw = hw or detect_hardware()
    it = traits(dtype).itemsize
    nm, nn, nk = cdiv(m, cfg.bm), cdiv(n, cfg.bn), cdiv(k, cfg.bk)
    flops = 2.0 * m * n * k
    # each (i, j) tile streams the full K panel of A and B
    bytes_moved = (
        nm * nn * (cfg.bm * k * it + k * cfg.bn * it) + m * n * it
    )
    t_compute = flops / _peak_flops(hw, dtype)
    t_memory = bytes_moved / (hw.hbm_gbps * 1e9)
    # MXU efficiency drops for skinny tiles (<128 in either matmul dim)
    eff = min(cfg.bm, 128) / 128 * min(cfg.bn, 128) / 128
    t = max(t_compute / max(eff, 1e-3), t_memory) + nm * nn * nk * 2e-7
    if calibration:
        buckets = calibration.get("buckets")
        if buckets:
            key = _intensity_bucket(m, n, k)
            ks = sorted(int(x) for x in buckets)
            nearest = min(ks, key=lambda x: abs(x - key))
            t *= buckets[str(nearest)]
        else:
            t *= calibration.get("factor", 1.0)
    return t


def get_configs(m: int, n: int, k: int, dtype, count: int = 8,
                hw: HardwareDescriptor | None = None) -> list[MatmulConfig]:
    """Top-``count`` kernel configs by estimated runtime (≙ get_configs.py /
    nvMatmulHeuristicsGetGemmConfig)."""
    from tpumathlib.dx.gemm import default_configs

    cal = load_discovery()
    cands = list(default_configs(dtype))
    ranked = sorted(cands, key=lambda c: estimate_runtime(m, n, k, dtype, c, hw, cal))
    return ranked[:count]


_DISCOVERY_KEY = "mmh_discovery"


# the internal discovery set spans the shape classes the estimator must
# rank: square ladder, skinny-K/M/N panels, and a tall-batched panel
# (≙ nvMatmulHeuristics' internal silicon scan covering problem classes)
_DISCOVERY_SET = (
    (512, 512, 512),
    (1024, 1024, 1024),
    (2048, 2048, 2048),
    (4096, 4096, 4096),
    (4096, 4096, 512),      # skinny K
    (512, 4096, 4096),      # skinny M
    (4096, 512, 4096),      # skinny N
    (8192, 1024, 1024),     # tall panel
)


def _intensity_bucket(m: int, n: int, k: int) -> int:
    """log2 bucket of arithmetic intensity — the calibration key."""
    import math as _math

    it = 2  # bf16 discovery operands
    ai = 2.0 * m * n * k / ((m * k + k * n + m * n) * it)
    return int(_math.log2(max(ai, 1.0)))


def run_discovery(problems: Sequence[tuple] | None = None) -> dict:
    """Measured silicon scan (≙ nvMatmulHeuristicsLoadInternalDiscoverySet):
    times the internal GEMM discovery set on the attached device with
    chained dispatches (single dispatches hide behind the ~35 ms tunnel
    latency) and stores measured/predicted factors PER arithmetic-
    intensity bucket, so skinny and square problems calibrate
    independently."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from tpumathlib.dx.gemm import pallas_matmul

    problems = problems or _DISCOVERY_SET
    hw = detect_hardware()
    buckets: dict = {}
    for (m, n, k) in problems:
        a = jnp.ones((m, k), jnp.bfloat16)
        b = jnp.ones((k, n), jnp.bfloat16)
        cfg = MatmulConfig(min(512, m), min(512, n), min(512, k))
        chain = max(3, min(20, int(2e11 / (2.0 * m * n * k))))

        def run(a, b):
            def body(_, c):
                aa, s = c
                out = pallas_matmul(aa, b, config=cfg)
                return aa, s + out[0, 0].astype(jnp.float32)
            _, s = jax.lax.fori_loop(0, chain, body,
                                     (a, jnp.float32(0)))
            return s

        g = jax.jit(run)
        float(g(a, b))
        best = float("inf")
        for _ in range(2):
            t0 = _time.perf_counter()
            float(g(a, b))
            best = min(best, _time.perf_counter() - t0)
        meas = best / chain
        pred = estimate_runtime(m, n, k, jnp.bfloat16, cfg, hw)
        buckets.setdefault(_intensity_bucket(m, n, k), []).append(
            meas / pred)
    cal = {"buckets": {str(kk): sum(v) / len(v)
                       for kk, v in buckets.items()},
           "factor": (sum(x for v in buckets.values() for x in v)
                      / sum(len(v) for v in buckets.values())),
           "n": sum(len(v) for v in buckets.values())}
    global_autotune_cache().put(
        global_autotune_cache().make_key(_DISCOVERY_KEY, ()), cal)
    return cal


def load_discovery() -> dict | None:
    return global_autotune_cache().get(
        global_autotune_cache().make_key(_DISCOVERY_KEY, ()))

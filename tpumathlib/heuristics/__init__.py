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


def run_discovery(problems: Sequence[tuple] | None = None) -> dict:
    """Measured silicon scan (≙ nvMatmulHeuristicsLoadInternalDiscoverySet):
    times a small GEMM set on the attached device, stores the measured/
    predicted efficiency factor in the autotune cache."""
    import jax.numpy as jnp

    from tpumathlib.core.timer import benchmark
    from tpumathlib.dx.gemm import pallas_matmul

    problems = problems or [(512, 512, 512), (1024, 1024, 1024)]
    hw = detect_hardware()
    factors = []
    for (m, n, k) in problems:
        a = jnp.ones((m, k), jnp.bfloat16)
        b = jnp.ones((k, n), jnp.bfloat16)
        cfg = MatmulConfig(min(512, m), min(512, n), min(512, k))
        stats = benchmark(lambda: pallas_matmul(a, b, config=cfg), warmup=1, iters=3)
        pred = estimate_runtime(m, n, k, jnp.bfloat16, cfg, hw)
        factors.append(stats["med"] / pred)
    cal = {"factor": sum(factors) / len(factors), "n": len(factors)}
    global_autotune_cache().put(
        global_autotune_cache().make_key(_DISCOVERY_KEY, ()), cal)
    return cal


def load_discovery() -> dict | None:
    return global_autotune_cache().get(
        global_autotune_cache().make_key(_DISCOVERY_KEY, ()))

"""Benchmark timer with warm-up and avg/med/std/min/max stats.

Reference analogue: the JAX FFT harness timing loop
(cuFFTMp/JAX_FFT/tests/fft_test.py:133-158) and the MathDx microbench
(``measure_execution_ms`` with warm-up + repeats,
MathDx/cuFFTDx/03_block_fft_performance/block_fft_performance.hpp:66-141).
CUDA events ≙ ``block_until_ready`` walls.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import numpy as np


def _block(out):
    return jax.block_until_ready(out)


def benchmark(
    fn: Callable[..., Any],
    *args,
    warmup: int = 2,
    iters: int = 10,
    **kwargs,
) -> dict:
    """Time ``fn(*args)`` after warm-up; returns stats in seconds.

    Keys: avg, med, std, min, max, times. Median is the headline number
    (fft_test.py prefers median over mean)."""
    for _ in range(warmup):
        _block(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    t = np.asarray(times)
    return {
        "avg": float(t.mean()),
        "med": float(np.median(t)),
        "std": float(t.std()),
        "min": float(t.min()),
        "max": float(t.max()),
        "times": times,
    }


def gemm_gflops(m: int, n: int, k: int, seconds: float, complex_op: bool = False) -> float:
    """GFlop/s = 2mnk/t (cuBLASMp/gemm.cu:501); 8mnk for complex (gemm3m aside)."""
    mult = 8 if complex_op else 2
    return mult * m * n * k / seconds / 1e9


def fft_gflops(n_total: int, seconds: float) -> float:
    """GFlop/s = 5·N·log2(N)/t (fft_test.py:156)."""
    return 5.0 * n_total * np.log2(max(n_total, 2)) / seconds / 1e9

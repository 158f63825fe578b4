"""Tracing / profiling aux (SURVEY.md §5).

The reference's story is CUDA events around hot calls + per-stage timer
breakdowns (cuBLASMp/gemm.cu:373-375; r2c_c2r_slabs_GROMACS README stage
table; cuEST timer.py). TPU-native equivalents:

- ``trace(dir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable device trace (the real profiler).
- ``StageTimer``: wall-clock stage breakdown with the readback-forcing
  discipline this backend needs; prints the GROMACS-style per-stage table.
- ``flops_report``: attach a flop/byte model to a stage (the metric-print
  convention of gemm.cu:501 / fft_test.py:156).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (view in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Per-stage wall-clock breakdown (≙ the C2R/scale/R2C stage table in
    r2c_c2r_slabs_GROMACS). Forces completion via block_until_ready on the
    stage output (plus scalar readback when ``strict``)."""

    def __init__(self, strict: bool = False):
        self.stages: list[tuple[str, float, dict]] = []
        self.strict = strict

    @contextlib.contextmanager
    def stage(self, name: str, **model):
        t0 = time.perf_counter()
        box: dict[str, Any] = {}
        yield box
        out = box.get("out")
        if out is not None:
            out = jax.block_until_ready(out)
            if self.strict:
                import jax.numpy as jnp

                leaves = jax.tree_util.tree_leaves(out)
                if leaves:
                    float(jnp.sum(jnp.abs(leaves[0]).astype(jnp.float32)).ravel()[0])
        dt = time.perf_counter() - t0
        rec = dict(model)
        if "flops" in model:
            rec["gflops"] = model["flops"] / dt / 1e9
        if "bytes" in model:
            rec["gbps"] = model["bytes"] / dt / 1e9
        self.stages.append((name, dt, rec))

    def report(self) -> str:
        lines = []
        total = sum(dt for _, dt, _ in self.stages)
        for name, dt, rec in self.stages:
            extra = " ".join(f"{k}={v:.2f}" for k, v in rec.items()
                             if k in ("gflops", "gbps"))
            lines.append(f"{name:>24s}: {dt * 1e3:9.3f} ms {extra}")
        lines.append(f"{'total':>24s}: {total * 1e3:9.3f} ms")
        return "\n".join(lines)

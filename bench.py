"""Headline benchmark: bf16 GEMM TFLOP/s on the MXU via the Pallas engine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured TFLOP/s over the roofline target (85% of peak —
BASELINE.json: "GEMM ≥85% MXU roofline"), so vs_baseline ≥ 1.0 beats the
reference's bar.

Timing protocol: the tunnel to the chip adds ~35 ms fixed latency and
block_until_ready does not reliably await device completion, so the op runs
in a fori_loop chain inside one jit and a scalar readback forces completion
(see .claude/skills/verify/SKILL.md).
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpumathlib.blas import level3

    m = n = k = 4096
    key = jax.random.key(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)
    chain = 300

    def run(a, b):
        def body(_, x):
            # public L3 gemm; the Lt heuristic routes plain bf16 matmul to the
            # fastest algo (XLA emitter); fused/narrow cases go to Pallas.
            return level3.gemm(1.0, x, b).astype(jnp.bfloat16)

        x = jax.lax.fori_loop(0, chain, body, a)
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(run)
    float(f(a, b))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(a, b))
        best = min(best, time.perf_counter() - t0)
    tflops = 2.0 * chain * m * n * k / best / 1e12

    kind = jax.devices()[0].device_kind
    peak = _PEAK.get(kind, 197.0)
    target = 0.85 * peak
    print(json.dumps({
        "metric": f"gemm_bf16_{m}x{n}x{k}_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
    }))


if __name__ == "__main__":
    main()

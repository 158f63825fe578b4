"""Core utilities: dtype traits, verification helpers, plan cache, timer."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.core import (
    allclose,
    assert_allclose,
    benchmark,
    default_rtol,
    rel_l2,
    rel_linf,
    traits,
)
from tpumathlib.core.check import max_abs_rel
from tpumathlib.core.plan import PlanCache
from tpumathlib.core.tuning import AutotuneCache


def test_traits():
    t = traits(jnp.bfloat16)
    assert t.itemsize == 2 and t.min_tile == (16, 128)
    assert traits(jnp.float32).rtol == 1e-5
    assert traits(jnp.complex64).is_complex
    assert default_rtol(jnp.float32, jnp.bfloat16) == traits(jnp.bfloat16).rtol


def test_allclose_report():
    a = np.ones((4, 4))
    b = a.copy()
    b[0, 0] = 1.5
    assert allclose(a, a, rtol=1e-6)
    assert not allclose(b, a, rtol=1e-3)
    ma, mr = max_abs_rel(b, a)
    assert ma == pytest.approx(0.5) and mr == pytest.approx(0.5)
    with pytest.raises(AssertionError, match="max_abs"):
        assert_allclose(b, a, rtol=1e-3)


def test_rel_errors():
    w = np.random.default_rng(0).normal(size=100)
    g = w + 1e-7
    assert rel_l2(g, w) < 1e-6
    assert rel_linf(g, w) < 1e-5


def test_plan_cache():
    cache = PlanCache(maxsize=2)
    built = []

    def make(k):
        def b():
            built.append(k)
            return k * 2
        return b

    assert cache.get_or_build(("a",), make(1)) == 2
    assert cache.get_or_build(("a",), make(1)) == 2
    assert built == [1]
    cache.get_or_build(("b",), make(2))
    cache.get_or_build(("c",), make(3))  # evicts ("a",)
    cache.get_or_build(("a",), make(1))
    assert built == [1, 2, 3, 1]


def test_autotune_cache(tmp_path):
    cache = AutotuneCache(path=str(tmp_path / "at.json"))
    calls = []

    def build(cfg):
        def run():
            calls.append(cfg)
        return run

    def measure(run):
        run()
        return {"x": 3.0, "y": 1.0, "z": 2.0}[calls[-1]]

    win = cache.tune("op", (128, 128), ["x", "y", "z"], build, measure=measure)
    assert win == "y"
    # second call hits the on-disk cache, no re-measurement
    cache2 = AutotuneCache(path=str(tmp_path / "at.json"))
    n = len(calls)
    assert cache2.tune("op", (128, 128), ["x", "y", "z"], build, measure=measure) == "y"
    assert len(calls) == n


def test_benchmark():
    stats = benchmark(lambda x: x + 1, jnp.ones((8,)), warmup=1, iters=3)
    assert stats["min"] <= stats["med"] <= stats["max"]
    assert len(stats["times"]) == 3


def test_stage_timer():
    import jax.numpy as jnp

    from tpumathlib.core.profiler import StageTimer

    t = StageTimer()
    with t.stage("gemm", flops=2 * 64**3) as box:
        box["out"] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    with t.stage("scale") as box:
        box["out"] = jnp.ones(8) * 2
    rep = t.report()
    assert "gemm" in rep and "total" in rep
    assert t.stages[0][2]["gflops"] > 0


def test_sanitize_checkify(monkeypatch):
    """SURVEY §5 sanitizer: under TPUMATHLIB_CHECKIFY=1 a NaN produced in
    a device sweep raises instead of propagating (memcheck-class numeric
    sanitation; races are precluded by jit purity)."""
    import jax.numpy as jnp

    from tpumathlib.core.sanitize import sanitize, sanitizing

    assert not sanitizing()

    @sanitize(force=True)
    def bad(x):
        return x / jnp.sum(x * 0.0)  # 1/0 -> inf -> flagged

    import pytest

    with pytest.raises(Exception):
        bad(jnp.ones(4))

    @sanitize(force=True)
    def good(x):
        return x + 1.0

    np.testing.assert_allclose(np.asarray(good(jnp.ones(4))), 2.0)
    # spsv path honors the env flag
    monkeypatch.setenv("TPUMATHLIB_CHECKIFY", "1")
    from tpumathlib.sparse.containers import CSR
    from tpumathlib.sparse.spsv import spsv

    a = CSR(jnp.asarray(np.array([0, 1, 2])), jnp.asarray(np.array([0, 1])),
            jnp.asarray(np.array([1.0, 0.0])), (2, 2))  # zero diagonal
    with pytest.raises(Exception):
        spsv(a, jnp.ones(2), lower=True)

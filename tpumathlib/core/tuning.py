"""On-disk autotune cache.

Reference analogue: CUBLAS_GEMM_AUTOTUNE with cached algo
(cuBLAS/Extensions/GemmExAutoTuning/cublas_GemmExAutoTuning_example.cu:128-154)
and the Lt exhaustive algo sweep (cuBLASLt/Common/LtMatmulCustomFind.h:189-274).
Here an "algo" is a Pallas kernel config (tile sizes etc.); the cache persists
measured winners keyed by (op, problem, device_kind) so a process restart
doesn't re-tune (≙ serialized plan cache, cuTENSOR/contraction_plan_cache.cu).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Callable, Iterable

import jax

_DEFAULT_PATH = os.environ.get(
    "TPUMATHLIB_AUTOTUNE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "tpumathlib", "autotune.json"),
)


def device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


class AutotuneCache:
    def __init__(self, path: str | None = None):
        self.path = path or _DEFAULT_PATH
        self._mem: dict[str, Any] = {}
        self._lock = threading.Lock()
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        self._loaded = True
        try:
            with open(self.path) as f:
                self._mem.update(json.load(f))
        except (OSError, json.JSONDecodeError):
            pass

    def _save(self):
        try:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self._mem, f)
            os.replace(tmp, self.path)
        except OSError:
            pass

    @staticmethod
    def make_key(op: str, problem: tuple) -> str:
        return f"{device_kind()}|{op}|{'/'.join(map(str, problem))}"

    def get(self, key: str):
        with self._lock:
            self._load()
            return self._mem.get(key)

    def put(self, key: str, value):
        with self._lock:
            self._load()
            self._mem[key] = value
            self._save()

    def tune(
        self,
        op: str,
        problem: tuple,
        candidates: Iterable[Any],
        build: Callable[[Any], Callable[[], Any]],
        measure: Callable[[Callable[[], Any]], float] | None = None,
    ):
        """Timed sweep over candidate configs (≙ LtMatmulCustomFind timed run
        loop). ``build(cfg)`` returns a nullary runner; returns winning cfg.

        Configs that fail to compile/run are skipped (≙ heuristic returning
        no algo for a config)."""
        key = self.make_key(op, problem)
        cached = self.get(key)
        cands = list(candidates)
        if cached is not None:
            for c in cands:
                if _cfg_to_jsonable(c) == cached:
                    return c
        if measure is None:
            from tpumathlib.core.timer import benchmark

            def measure(run):  # noqa: F811
                return benchmark(run, warmup=1, iters=3)["med"]

        best, best_t = None, float("inf")
        for cfg in cands:
            try:
                run = build(cfg)
                t = measure(run)
            except Exception:
                continue
            if t < best_t:
                best, best_t = cfg, t
        if best is None:
            raise RuntimeError(f"autotune: no working candidate for {key}")
        self.put(key, _cfg_to_jsonable(best))
        return best


def _cfg_to_jsonable(cfg):
    if isinstance(cfg, tuple):
        return list(cfg)
    if isinstance(cfg, dict):
        return {k: _cfg_to_jsonable(v) for k, v in sorted(cfg.items())}
    return cfg


_global_cache: AutotuneCache | None = None


def global_autotune_cache() -> AutotuneCache:
    global _global_cache
    if _global_cache is None:
        _global_cache = AutotuneCache()
    return _global_cache

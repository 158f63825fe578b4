"""Shared Pallas plumbing: backend detection and interpret-mode fallback.

All dx kernels run compiled on TPU and in Pallas interpret mode elsewhere
(CPU CI uses an 8-device virtual mesh — SURVEY.md §4), so every pytest oracle
exercises the same kernel code path that runs on hardware.
"""

from __future__ import annotations

import jax

_FORCE_INTERPRET = False


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """True when pallas_call must use the interpreter (non-TPU backend)."""
    return _FORCE_INTERPRET or not on_tpu()

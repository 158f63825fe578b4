"""Numerical verification helpers.

Reference analogues:
- ``allclose_host`` with max_abs/max_rel reporting (cuBLASMp/helpers.h:1300-1362)
- relative L2/Linf error checks, tol 1e-6 (cuFFTMp/samples/common/error_checks.hpp:43-69)
- JAX harness L2 < 1e-4 (cuFFTMp/JAX_FFT/tests/fft_test.py:91)

These power every pytest oracle in tests/ — gather the device result, compare
against a NumPy/SciPy reference at the dtype-dependent tolerance.
"""

from __future__ import annotations

import numpy as np

from tpumathlib.core.dtypes import default_rtol


def max_abs_rel(got, want) -> tuple[float, float]:
    """(max_abs_diff, max_rel_diff) — the report printed by allclose_host
    (cuBLASMp/helpers.h:1340-1361)."""
    g = np.asarray(got, dtype=np.complex128 if np.iscomplexobj(np.asarray(want)) else np.float64)
    w = np.asarray(want, dtype=g.dtype)
    diff = np.abs(g - w)
    denom = np.maximum(np.abs(w), 1e-30)
    return float(diff.max(initial=0.0)), float((diff / denom).max(initial=0.0))


def rel_l2(got, want) -> float:
    """Relative L2 error (≙ error_checks.hpp:61-69; fft_test.py:91)."""
    g = np.asarray(got, dtype=np.complex128)
    w = np.asarray(want, dtype=np.complex128)
    nw = np.linalg.norm(w.ravel())
    return float(np.linalg.norm((g - w).ravel()) / max(nw, 1e-300))


def rel_linf(got, want) -> float:
    g = np.asarray(got, dtype=np.complex128)
    w = np.asarray(want, dtype=np.complex128)
    mw = np.abs(w).max(initial=0.0)
    return float(np.abs(g - w).max(initial=0.0) / max(mw, 1e-300))


def allclose(got, want, rtol: float | None = None, atol: float = 0.0) -> bool:
    if rtol is None:
        rtol = default_rtol(np.asarray(got).dtype)
    g = np.asarray(got, dtype=np.complex128 if np.iscomplexobj(np.asarray(want)) else np.float64)
    w = np.asarray(want, dtype=g.dtype)
    scale = max(np.abs(w).max(initial=0.0), 1.0)
    return bool(np.all(np.abs(g - w) <= atol + rtol * scale))


def assert_allclose(got, want, rtol: float | None = None, atol: float = 0.0, msg: str = ""):
    """Assert with the allclose_host-style max_abs/max_rel report."""
    got = np.asarray(got)
    if rtol is None:
        rtol = default_rtol(got.dtype)
    if not allclose(got, want, rtol=rtol, atol=atol):
        ma, mr = max_abs_rel(got, want)
        raise AssertionError(
            f"{msg} FAILED: max_abs={ma:.3e} max_rel={mr:.3e} rtol={rtol:.1e} atol={atol:.1e}"
        )

"""Core plumbing: error types, dtype traits, plan/handle objects, verification
helpers, bench timers, and the autotune cache.

Reference analogue: the per-family ``*_utils.h`` headers (CHECK macros, dtype
traits, random/verify helpers — e.g. cuBLAS/utils/cublas_utils.h) and the
shared harness machinery (cuBLASMp/helpers.h, cuFFTMp/samples/common).
"""

from tpumathlib.core.errors import (  # noqa: F401
    Status,
    TpuMathError,
    InvalidValueError,
    NotSupportedError,
    ExecutionError,
    check,
)
from tpumathlib.core.dtypes import traits, default_rtol  # noqa: F401
from tpumathlib.core.check import (  # noqa: F401
    allclose,
    max_abs_rel,
    rel_l2,
    rel_linf,
    assert_allclose,
)
from tpumathlib.core.sanitize import sanitize, sanitizing  # noqa: F401
from tpumathlib.core.timer import benchmark  # noqa: F401
from tpumathlib.core.plan import Handle, Plan, PlanCache  # noqa: F401
from tpumathlib.core.tuning import AutotuneCache  # noqa: F401

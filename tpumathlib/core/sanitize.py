"""Numeric sanitizer layer (SURVEY.md §5 "race detection / sanitizers").

jit purity already gives the TPU programs the data-race freedom that the
reference checks with compute-sanitizer (racecheck has nothing to find in
a functional dataflow program). What remains meaningful on TPU is NUMERIC
sanitation: surfacing NaN/Inf production and out-of-bounds indexing as
errors instead of silent garbage — the memcheck/initcheck analogue.

``sanitize(fn)`` wraps a jittable callable with ``jax.experimental.checkify``
(float + index error sets). It is a no-op unless the TPUMATHLIB_CHECKIFY=1
environment flag is set (or ``force=True``), so production paths pay
nothing. Kernel-internal state (Pallas) is validated by the on-chip verify
protocol instead — checkify instruments the XLA tier.
"""

from __future__ import annotations

import functools
import os


def sanitizing() -> bool:
    return os.environ.get("TPUMATHLIB_CHECKIFY", "0") == "1"


def sanitize(fn=None, *, force: bool = False):
    """Decorator: checkify-instrument ``fn`` when sanitizing() or force."""

    def wrap(f):
        @functools.wraps(f)
        def run(*args, **kwargs):
            if not (force or sanitizing()):
                return f(*args, **kwargs)
            from jax.experimental import checkify

            checked = checkify.checkify(
                lambda *a: f(*a, **kwargs),
                errors=checkify.float_checks | checkify.index_checks)
            err, out = checked(*args)
            checkify.check_error(err)
            return out

        return run

    return wrap(fn) if fn is not None else wrap

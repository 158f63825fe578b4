"""Mixed-precision iterative-refinement solvers (IRS).

Parity: cusolverDnIRSXgesv expert API (gesv/cusolver_irs_expert_cuda-11.cu:
46-141) — main precision vs lowest precision, classical vs GMRES refinement,
max iters, returned iteration count.

TPU mapping: factorize in the fast precision (f32 — the MXU path; TPU has no
f64 units so this is exactly the hardware situation IRS was designed for),
compute residuals in the high precision, correct. The whole loop is one
jitted lax.while_loop — device-resident, unlike the reference's host loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpumathlib.core.errors import check


@functools.partial(jax.jit, static_argnames=("lowest_dtype", "refinement", "max_iters"))
def irs_gesv(a, b, lowest_dtype=jnp.float32, refinement: str = "classical",
             max_iters: int = 50, tol: float = None):
    """Solve A x = b with LU in ``lowest_dtype`` + refinement in A's dtype.

    refinement: "classical" (IRS_REFINE_CLASSICAL) | "gmres"
    (IRS_REFINE_GMRES — restarted FGMRES preconditioned by the low-precision
    LU). Returns (x, n_iters, info): info=0 converged, 1 = hit max_iters.
    """
    check(refinement in ("classical", "gmres"), refinement)
    hi = a.dtype
    n = a.shape[-1]
    if tol is None:
        tol = 1e-13 if hi == jnp.float64 else 1e-6

    a_lo = a.astype(lowest_dtype)
    lu, piv = jax.scipy.linalg.lu_factor(a_lo)

    def lo_solve(r):
        return jax.scipy.linalg.lu_solve((lu, piv), r.astype(lowest_dtype)).astype(hi)

    bnorm = jnp.linalg.norm(b)
    x0 = lo_solve(b)

    if refinement == "classical":
        def body(state):
            x, it, rn = state
            r = b - a @ x
            x = x + lo_solve(r)
            return x, it + 1, jnp.linalg.norm(b - a @ x)

        def cond(state):
            _, it, rn = state
            return jnp.logical_and(it < max_iters, rn > tol * bnorm)

        x, iters, rn = jax.lax.while_loop(
            cond, body, (x0, jnp.int32(1), jnp.linalg.norm(b - a @ x0))
        )
        info = jnp.where(rn <= tol * bnorm, 0, 1).astype(jnp.int32)
        return x, iters, info

    # FGMRES(m) with the low-precision solve as right preconditioner
    restart = min(20, max_iters)

    def gmres_cycle(x):
        r0 = b - a @ x
        beta = jnp.linalg.norm(r0)
        q0 = r0 / jnp.maximum(beta, 1e-300)
        qs = jnp.zeros((restart + 1, n), hi).at[0].set(q0)
        zs = jnp.zeros((restart, n), hi)
        h = jnp.zeros((restart + 1, restart), hi)

        def arnoldi(j, carry):
            qs, zs, h = carry
            z = lo_solve(qs[j])
            w = a @ z
            # modified Gram-Schmidt
            def mgs(i, wh):
                w, hcol = wh
                hij = jnp.dot(qs[i], w)
                return w - hij * qs[i], hcol.at[i].set(hij)

            w, hcol = jax.lax.fori_loop(0, j + 1, mgs,
                                        (w, jnp.zeros(restart + 1, hi)))
            hj1 = jnp.linalg.norm(w)
            hcol = hcol.at[j + 1].set(hj1)
            qs = qs.at[j + 1].set(w / jnp.maximum(hj1, 1e-300))
            zs = zs.at[j].set(z)
            h = h.at[:, j].set(hcol)
            return qs, zs, h

        qs, zs, h = jax.lax.fori_loop(0, restart, arnoldi, (qs, zs, h))
        # least squares min ||beta e1 - H y||
        e1 = jnp.zeros(restart + 1, hi).at[0].set(beta)
        y = jnp.linalg.lstsq(h, e1)[0]
        return x + zs.T @ y

    def body(state):
        x, it, rn = state
        x = gmres_cycle(x)
        return x, it + 1, jnp.linalg.norm(b - a @ x)

    def cond(state):
        _, it, rn = state
        return jnp.logical_and(it < max_iters // restart + 1, rn > tol * bnorm)

    x, cycles, rn = jax.lax.while_loop(
        cond, body, (x0, jnp.int32(0), jnp.linalg.norm(b - a @ x0))
    )
    info = jnp.where(rn <= tol * bnorm, 0, 1).astype(jnp.int32)
    return x, cycles * restart, info

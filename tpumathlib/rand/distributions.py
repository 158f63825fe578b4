"""Distribution transforms over raw uint32 bits (≙ curandGenerateUniform /
Normal / LogNormal / Poisson).

cuRAND conventions honored:
- uniform: (0, 1] (cuRAND excludes 0, includes 1)
- normal: Box–Muller over uniform pairs
- poisson: inverse-CDF accumulation (bounded device loop) for small λ,
  normal approximation above the reference's large-λ crossover
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bits_to_uniform(bits, dtype=jnp.float32):
    """uint32 → (0, 1] (cuRAND's curand_uniform convention)."""
    u = (bits.astype(jnp.float64) + 1.0) / 4294967296.0
    return u.astype(dtype)


def bits_to_normal(bits, mean=0.0, stddev=1.0):
    """Box–Muller over consecutive uniform pairs; input length must be even;
    returns same length."""
    u = bits_to_uniform(bits, jnp.float32).reshape(-1, 2)
    r = jnp.sqrt(-2.0 * jnp.log(u[:, 0]))
    theta = 2.0 * jnp.pi * u[:, 1]
    z = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1).reshape(-1)
    return mean + stddev * z


def bits_to_lognormal(bits, mean=0.0, stddev=1.0):
    return jnp.exp(bits_to_normal(bits, mean, stddev))


def bits_to_poisson(bits, lam: float, max_iters: int | None = None):
    """Poisson(λ) from 4 uint32 per sample: inverse-CDF scan for λ ≤ 64
    (bounded multiplication loop), normal approximation beyond
    (curand_poisson uses the same regime split)."""
    n = bits.shape[0]
    if lam <= 64.0:
        # product-of-uniforms (Knuth): count multiplications until
        # prod < e^-λ. Bound iterations at λ + 10√λ + 16.
        kmax = int(lam + 10 * lam**0.5 + 16)
        # derive a per-sample uniform stream from the 4 seed words via philox
        from tpumathlib.rand.generators import philox4x32_10

        ctr = jnp.zeros((n, 4), jnp.uint32)
        key = bits[:, :2].astype(jnp.uint32)
        limit = jnp.exp(-lam)

        def body(i, state):
            count, prod, ctr = state
            blk = philox4x32_10(ctr, key)
            u = bits_to_uniform(blk[:, 0], jnp.float32)
            prod_new = prod * u
            alive = prod >= limit
            count = count + alive.astype(jnp.int32)
            prod = jnp.where(alive, prod_new, prod)
            ctr = ctr.at[:, 0].add(jnp.uint32(1))
            return count, prod, ctr

        count, _, _ = jax.lax.fori_loop(
            0, kmax, body, (jnp.zeros(n, jnp.int32) - 1, jnp.ones(n, jnp.float32), ctr)
        )
        return jnp.maximum(count, 0)
    # normal approximation with continuity correction
    z = bits_to_normal(bits[:, :2].reshape(-1))[:n]
    return jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * z - 0.5), 0.0).astype(jnp.int32)

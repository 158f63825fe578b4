"""In-kernel random number generation (≙ cuRANDDx: RNG composed INTO a user
kernel rather than a host-API generate call).

The Pallas TPU PRNG primitives (pltpu.prng_seed / prng_random_bits) are the
device-side generator; this module shows the canonical fused patterns:
random bits feeding computation without an HBM round trip for the noise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.dx.pallas_utils import interpret_mode


def _uniform_from_bits(bits):
    # Mosaic can't cast uint32→f32: go through int32 with a 24-bit mask
    # (full f32 mantissa) → (0, 1] (cuRAND convention)
    v = pltpu.bitcast(bits, jnp.int32) & jnp.int32(0x00FFFFFF)
    return (v.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)


@functools.partial(jax.jit, static_argnames=("shape",))
def random_uniform_kernel(seed, shape: tuple):
    """Generate uniforms entirely in-kernel (≙ cuRANDDx thread API sample:
    seed → generate → use, one kernel).

    The Pallas TPU PRNG has no interpreter support — non-TPU backends use a
    jax.random fallback (same API/determinism contract, different stream)."""
    if interpret_mode():
        key = jax.random.fold_in(jax.random.key(0), seed)
        return jax.random.uniform(key, shape, jnp.float32, minval=1e-10, maxval=1.0)

    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits(out_ref.shape)
        out_ref[:] = _uniform_from_bits(pltpu.bitcast(bits, jnp.uint32))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )(jnp.asarray([seed], jnp.int32))


@functools.partial(jax.jit, static_argnames=("rate",))
def dropout_matmul_kernel(a, b, seed, rate: float = 0.1):
    """Fused matmul + in-kernel dropout noise (the cuRANDDx use-case:
    stochastic op without materializing the mask in HBM)."""
    if interpret_mode():
        acc = jnp.matmul(a, b, preferred_element_type=jnp.float32)
        key = jax.random.fold_in(jax.random.key(0), seed)
        keep = jax.random.uniform(key, acc.shape) > rate
        return jnp.where(keep, acc / (1.0 - rate), 0.0)

    def kernel(a_ref, b_ref, seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        acc = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
        bits = pltpu.bitcast(pltpu.prng_random_bits(acc.shape), jnp.uint32)
        keep = _uniform_from_bits(bits) > rate
        out_ref[:] = jnp.where(keep, acc / (1.0 - rate), 0.0)

    m, n = a.shape[0], b.shape[1]
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret_mode(),
    )(a, b, jnp.asarray([seed], jnp.int32))

"""Butterfly FFT Pallas kernel: radix-2 DIF with every stage expressed as
sublane/lane rolls + selects — pure VPU work, O(N log N) flops, ONE HBM
round trip per element.

This is the memory-bound formulation the HBM-roofline FFT target needs
(NOTES_r1.md #1): the DFT-as-matmul engine (fft.kernels) burns ~2300
flops/point on HIGHEST-precision MXU passes; this kernel does ~10·log₂N
f32 VPU ops/point with exact f32 butterflies (rel-L2 ~1e-7, no precision
passes).

Layout: x (batch, N) planar f32 viewed as (batch, M0, 128) — all log₂(M0)
cross-row stages are sublane rolls, the final 7 stages are lane rolls.
Output order is bit-reversed (the classic in-place DIF property — exactly
cufftXt's INPLACE_SHUFFLED contract); ``reorder=True`` appends one XLA
gather pass to produce natural order.

Validated against numpy.fft in tests; the twiddle tables (per-stage masks ×
ω) are precomputed host-side and streamed as one (nstages, M0, 128) pair.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.dx.pallas_utils import interpret_mode

_LANES = 128


@functools.lru_cache(maxsize=32)
def _twiddle_table(n: int, inverse: bool):
    """(nstages, M0, 128) re/im twiddles; stage order: sublane distances
    M0/2..1 then lane distances 64..1."""
    m0 = n // _LANES
    m = np.arange(m0)[:, None] * np.ones((1, _LANES), int)
    l = np.ones((m0, 1), int) * np.arange(_LANES)[None, :]
    sign = 2.0 if inverse else -2.0
    ws = []
    d = m0 // 2
    while d >= 1:
        ncur = 2 * d * _LANES
        ws.append(np.exp(sign * 1j * np.pi * ((m & (d - 1)) * _LANES + l) / ncur))
        d //= 2
    d = _LANES // 2
    while d >= 1:
        ws.append(np.exp(sign * 1j * np.pi * (l & (d - 1)) / (2 * d)))
        d //= 2
    w = np.stack(ws)
    return (np.ascontiguousarray(w.real.astype(np.float32)),
            np.ascontiguousarray(w.imag.astype(np.float32)))


@functools.lru_cache(maxsize=32)
def _bitrev_perm(n: int) -> np.ndarray:
    bits = int(math.log2(n))
    p = np.arange(n)
    out = np.zeros(n, np.int32)
    for i in range(bits):
        out |= ((p >> i) & 1) << (bits - 1 - i)
    return out


def _dif_kernel(m0: int, nstages_mid: int, nstages_lane: int):
    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref):
        vr = xr_ref[:]
        vi = xi_ref[:]
        t = vr.shape[0]
        m_idx = jax.lax.broadcasted_iota(jnp.int32, (t, m0, _LANES), 1)
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (t, m0, _LANES), 2)

        stage = 0
        d = m0 // 2
        while d >= 1:  # sublane stages
            bit = (m_idx & d) != 0
            ppr = pltpu.roll(vr, d, axis=1)
            ppi = pltpu.roll(vi, d, axis=1)
            pmr = pltpu.roll(vr, m0 - d, axis=1)  # roll API: shift >= 0
            pmi = pltpu.roll(vi, m0 - d, axis=1)
            wr = wr_ref[stage][None]
            wi = wi_ref[stage][None]
            dr = ppr - vr
            di = ppi - vi
            vr = jnp.where(bit, dr * wr - di * wi, vr + pmr)
            vi = jnp.where(bit, dr * wi + di * wr, vi + pmi)
            stage += 1
            d //= 2
        d = _LANES // 2
        while d >= 1:  # lane stages
            bit = (l_idx & d) != 0
            ppr = pltpu.roll(vr, d, axis=2)
            ppi = pltpu.roll(vi, d, axis=2)
            pmr = pltpu.roll(vr, _LANES - d, axis=2)
            pmi = pltpu.roll(vi, _LANES - d, axis=2)
            wr = wr_ref[stage][None]
            wi = wi_ref[stage][None]
            dr = ppr - vr
            di = ppi - vi
            vr = jnp.where(bit, dr * wr - di * wi, vr + pmr)
            vi = jnp.where(bit, dr * wi + di * wr, vi + pmi)
            stage += 1
            d //= 2
        or_ref[:] = vr
        oi_ref[:] = vi

    return kernel


@functools.partial(jax.jit, static_argnames=("inverse", "reorder", "tile"))
def dif_fft(xr, xi, inverse: bool = False, reorder: bool = True,
            tile: int = 16):
    """Planar C2C FFT over the last axis; N = power of two ≥ 256.

    cuFFT-convention unnormalized in both directions. With reorder=False the
    result is bit-reversed along the last axis (INPLACE_SHUFFLED) — pointwise
    spectral work (convolution!) composes in that domain for free."""
    n = xr.shape[-1]
    m0 = n // _LANES
    assert n >= 2 * _LANES and (n & (n - 1)) == 0, "N must be pow2 >= 256"
    batch_shape = xr.shape[:-1]
    xr2 = xr.reshape(-1, n).astype(jnp.float32)
    xi2 = xi.reshape(-1, n).astype(jnp.float32)
    b = xr2.shape[0]
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
    bp = xr2.shape[0]
    nb = bp // tile
    xr3 = xr2.reshape(bp, m0, _LANES)
    xi3 = xi2.reshape(bp, m0, _LANES)

    wr, wi = _twiddle_table(n, inverse)
    nstages = wr.shape[0]
    kernel = _dif_kernel(m0, int(math.log2(m0)), 7)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((tile, m0, _LANES), lambda i: (i, 0, 0)),
                  pl.BlockSpec((tile, m0, _LANES), lambda i: (i, 0, 0)),
                  pl.BlockSpec((nstages, m0, _LANES), lambda i: (0, 0, 0)),
                  pl.BlockSpec((nstages, m0, _LANES), lambda i: (0, 0, 0))],
        out_specs=[pl.BlockSpec((tile, m0, _LANES), lambda i: (i, 0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((bp, m0, _LANES), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret_mode(),
    )(xr3, xi3, jnp.asarray(wr), jnp.asarray(wi))
    yr = yr.reshape(bp, n)[:b]
    yi = yi.reshape(bp, n)[:b]
    if reorder:
        perm = jnp.asarray(_bitrev_perm(n))
        yr = yr[:, perm]
        yi = yi[:, perm]
    return (yr.reshape(batch_shape + (n,)), yi.reshape(batch_shape + (n,)))

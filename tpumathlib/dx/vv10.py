"""Fused VV10 pairwise kernel — the nonlocal-XC hotspot as ONE Pallas
program (≙ the cuEST nonlocal-XC device kernels feeding
cuestNonlocalXCPotentialRKSCompute, and the MathDx pattern of fusing a
produce→transform→contract chain inside one kernel).

The XLA formulation (apps/vv10.py) materializes each (chunk, G) Φ tile in
HBM between the distance matmul and the Σ_j contraction. Here the whole
chain — pair distances, g-factors, Φ, and the weighted j-contraction —
runs tile-by-tile in VMEM: per grid step an i-chunk (BM points) sweeps
all j in BJ-wide tiles, so HBM traffic is just the per-point channel
vectors (O(G)) instead of O(G²/chunk) tile spills.

The energy core carries a HAND-DERIVED custom VJP (Pallas kernels have
no autodiff): by the symmetry of Φ,

    E        = β Σ wr_i + ½ Σ_ij wr_i wr_j Φ_ij
    ∂E/∂wr_k = β + inner_k                     (forward's own output)
    ∂E/∂w0_k = wr_k Σ_j wr_j Φ'ᵍ(k,j) r²_kj
    ∂E/∂κ_k  = wr_k Σ_j wr_j Φ'ᵍ(k,j)
    ∂E/∂x_k  = 2 wr_k Σ_j wr_j [Φ'ᵍ(k,j) w0_k + Φ'ᵍ'(k,j) w0_j](x_k−x_j)

with Φ'ᵍ = −Φ(1/gᵢ + 1/(gᵢ+gⱼ)) and Φ'ᵍ' its gⱼ counterpart — one more
pairwise sweep, fused in a second kernel. The ρ→(wr, w0, κ) chain stays
in JAX autodiff, so `jax.grad` through `vv10_pair_energy_pallas` gives
the same potential matrices as the XLA path.

STATUS (chip-verified, round 4): at G=1500 energies match the XLA path
bit-exactly and all four gradients agree to ≤7.5e-7 rel-max (and to
1.5e-7 of a CPU-f64 oracle — the diagnosis that found the XLA path's
own MXU DEFAULT-precision bug, see apps/vv10.py). A/B at G=40960 on the
v5e: forward 145.4 Gpairs/s vs 66.5 XLA (2.2x), value_and_grad 41.8 ms
vs 92.4 XLA (2.2x). The grid is 2-D (i_blocks, j_tiles) with the
outputs revisited/accumulated across j steps, so VMEM stays (BM, BJ)
regardless of G (a full-row j BlockSpec OOMed scoped VMEM at G=40960);
BJ=2048 measured best of {1024: 119.7, 2048: 145.4} Gpairs/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tpumathlib.dx.pallas_utils import interpret_mode

_BM = 128          # i-rows per grid step
_BJ = 2048         # j-lane tile width inside the kernel


def _fwd_kernel(wr_i, w0_i, k_i, px_i, py_i, pz_i,
                wr_j, w0_j, k_j, px_j, py_j, pz_j, out):
    # grid = (i_blocks, j_tiles): j is the minor grid dim, so `out` is
    # revisited across j steps and accumulates — VMEM use is (BM, BJ)
    # regardless of G (a full-row j spec OOMed scoped VMEM at G=40960).
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out[...] = jnp.zeros(out.shape, jnp.float32)

    dx = px_i[...] - px_j[...]
    dy = py_i[...] - py_j[...]
    dz = pz_i[...] - pz_j[...]
    r2 = dx * dx + dy * dy + dz * dz
    gi = w0_i[...] * r2 + k_i[...]
    gj = w0_j[...] * r2 + k_j[...]
    phi = -1.5 / (gi * gj * (gi + gj))
    out[...] += jnp.sum(phi * wr_j[...], axis=1, keepdims=True)


def _bwd_kernel(wr_i, w0_i, k_i, px_i, py_i, pz_i,
                wr_j, w0_j, k_j, px_j, py_j, pz_j,
                s1, s2, sx, sy, sz):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        for o in (s1, s2, sx, sy, sz):
            o[...] = jnp.zeros(o.shape, jnp.float32)

    dx = px_i[...] - px_j[...]
    dy = py_i[...] - py_j[...]
    dz = pz_i[...] - pz_j[...]
    r2 = dx * dx + dy * dy + dz * dz
    w0j = w0_j[...]
    gi_w = w0_i[...]
    gi = gi_w * r2 + k_i[...]
    gj = w0j * r2 + k_j[...]
    gij = gi + gj
    phi = -1.5 / (gi * gj * gij)
    pgi = -phi * (1.0 / gi + 1.0 / gij)
    pgj = -phi * (1.0 / gj + 1.0 / gij)
    wrj = wr_j[...]
    s1[...] += jnp.sum(wrj * pgi * r2, axis=1, keepdims=True)
    s2[...] += jnp.sum(wrj * pgi, axis=1, keepdims=True)
    tij = wrj * (pgi * gi_w + pgj * w0j)
    sx[...] += 2.0 * jnp.sum(tij * dx, axis=1, keepdims=True)
    sy[...] += 2.0 * jnp.sum(tij * dy, axis=1, keepdims=True)
    sz[...] += 2.0 * jnp.sum(tij * dz, axis=1, keepdims=True)


def _pad_channels(wr, w0, kappa, pts):
    """Pad G to a _BJ multiple; padded slots carry wr=0 and SAFE g-factors
    (w0=κ=1) so Φ stays finite and contributes nothing."""
    g = wr.shape[0]
    pad = (-g) % _BJ
    wr = jnp.pad(wr, (0, pad))
    w0 = jnp.pad(w0, (0, pad), constant_values=1.0)
    kappa = jnp.pad(kappa, (0, pad), constant_values=1.0)
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    return wr, w0, kappa, pts, g + pad


def _call(kernel, nout, wr, w0, kappa, pts):
    gp = wr.shape[0]
    cols = [wr, w0, kappa, pts[:, 0], pts[:, 1], pts[:, 2]]
    i_side = [c.reshape(gp, 1) for c in cols]
    j_side = [c.reshape(1, gp) for c in cols]
    i_spec = pl.BlockSpec((_BM, 1), lambda i, j: (i, 0))
    j_spec = pl.BlockSpec((1, _BJ), lambda i, j: (0, j))
    o_spec = pl.BlockSpec((_BM, 1), lambda i, j: (i, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(gp // _BM, gp // _BJ),
        in_specs=[i_spec] * 6 + [j_spec] * 6,
        out_specs=[o_spec] * nout,
        out_shape=[jax.ShapeDtypeStruct((gp, 1), jnp.float32)] * nout,
        interpret=interpret_mode(),
    )(*i_side, *j_side)
    return [o.reshape(gp) for o in outs]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pair_core(wr, w0, kappa, pts, beta):
    """E = β Σ wr + ½ Σ wr_i wr_j Φ_ij over padded channel vectors."""
    wr_p, w0_p, k_p, pts_p, _ = _pad_channels(wr, w0, kappa, pts)
    (inner,) = _call(_fwd_kernel, 1, wr_p, w0_p, k_p, pts_p)
    inner = inner[:wr.shape[0]]
    return beta * jnp.sum(wr) + 0.5 * jnp.sum(wr * inner)


def _pair_fwd(wr, w0, kappa, pts, beta):
    wr_p, w0_p, k_p, pts_p, _ = _pad_channels(wr, w0, kappa, pts)
    (inner,) = _call(_fwd_kernel, 1, wr_p, w0_p, k_p, pts_p)
    inner = inner[:wr.shape[0]]
    e = beta * jnp.sum(wr) + 0.5 * jnp.sum(wr * inner)
    return e, (wr, w0, kappa, pts, inner)


def _pair_bwd(beta, res, g):
    wr, w0, kappa, pts, inner = res
    wr_p, w0_p, k_p, pts_p, _ = _pad_channels(wr, w0, kappa, pts)
    s1, s2, sx, sy, sz = _call(_bwd_kernel, 5, wr_p, w0_p, k_p, pts_p)
    n = wr.shape[0]
    dwr = g * (beta + inner)
    dw0 = g * wr * s1[:n]
    dk = g * wr * s2[:n]
    dpts = g * (wr[:, None] * jnp.stack([sx[:n], sy[:n], sz[:n]], axis=1))
    return dwr, dw0, dk, dpts


_pair_core.defvjp(_pair_fwd, _pair_bwd)


def vv10_pair_energy_pallas(rho, s2, pts, w, b: float, c: float):
    """Drop-in for `apps.vv10.vv10_pair_energy` running the pairwise
    sweep as the fused Pallas kernel. Differentiable in (rho, s2, pts, w)
    — the channel chain is JAX autodiff, the pairwise core a custom VJP."""
    from tpumathlib.apps.vv10 import vv10_beta

    good = rho > 1e-9
    rs = jnp.where(good, rho, 1.0)
    wg2 = c * (s2 / (rs * rs)) ** 2
    wp2 = (4.0 * np.pi) * rs
    w0 = jnp.sqrt(wg2 + wp2 / 3.0)
    kappa = b * (1.5 * np.pi) * (rs / (9.0 * np.pi)) ** (1.0 / 6.0)
    wr = jnp.where(good, w * rho, 0.0)
    return _pair_core(wr.astype(jnp.float32), w0.astype(jnp.float32),
                      kappa.astype(jnp.float32), pts.astype(jnp.float32),
                      vv10_beta(b))

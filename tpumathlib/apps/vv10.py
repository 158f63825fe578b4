"""VV10 nonlocal correlation — the cuEST "nonlocal XC" compute area.

Reference parity: cuestNonlocalXCPotentialRKSCompute /
...UKSCompute with the VV10_B / VV10_C knobs
(/root/reference/cuEST/python_examples/4_exchange_correlation/
nonlocal_xc_potential/run.py:374-407, c_examples .../nonlocal_xc_potential,
nonlocal_xc_gradient) — the Vydrov–Van Voorhis VV10 kernel
[JCP 133, 244103 (2010)]:

    E_nl = ∫ dr ρ(r) [ β + ½ ∫ dr' ρ(r') Φ(r, r') ]
    Φ    = −3 / (2 g g' (g + g'))
    g    = ω₀(r) R² + κ(r),            R = |r − r'|
    ω₀   = sqrt( C (|∇ρ|²/ρ²)² + 4πρ/3 )
    κ    = b (3π/2) (ρ/(9π))^{1/6}
    β    = (1/32) (3/b²)^{3/4}

TPU-native design: the double integral over the molecular quadrature grid
is an O(G²) PAIRWISE kernel — the pair distances, g-factors and the
Σ_j w_j ρ_j Φ_ij contraction are dense row-block operations that run on
the MXU/VPU, processed in fixed-size chunks under lax.map so G can grow
without materializing the G×G matrix. The potential matrices
V_σ = ∂E_nl/∂D_σ come from jax.grad through the whole pairwise sum
(exactly like the local functionals in apps/xc.py), and the nuclear
gradient differentiates through the grid itself (apps/xcgrad.py
machinery) — no hand-derived kernel derivatives anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.apps.scf import Molecule
from tpumathlib.apps.xc import XCIntegrator, eval_aos, molecular_grid

_PI = float(np.pi)


def vv10_beta(b: float) -> float:
    """β = (1/32)(3/b²)^{3/4} — makes E_nl vanish for the uniform gas."""
    return (1.0 / 32.0) * (3.0 / (b * b)) ** 0.75


def vv10_pair_energy(rho, s2, pts, w, b: float, C: float,
                     chunk: int = 512):
    """E_nl from per-point densities ρ, |∇ρ|², positions (G,3), weights.

    Differentiable in (rho, s2); the ρ→0 guard uses the double-where
    pattern so autodiff never meets the ρ^(1/6)/ρ⁻⁴ singularities."""
    g = rho.shape[0]
    good = rho > 1e-9
    rs = jnp.where(good, rho, 1.0)
    wg2 = C * (s2 / (rs * rs)) ** 2
    wp2 = (4.0 * _PI) * rs
    w0 = jnp.sqrt(wg2 + wp2 / 3.0)
    kappa = b * (1.5 * _PI) * (rs / (9.0 * _PI)) ** (1.0 / 6.0)
    wr = jnp.where(good, w * rho, 0.0)

    pad = (-g) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    w0_p = jnp.pad(w0, (0, pad), constant_values=1.0)
    k_p = jnp.pad(kappa, (0, pad), constant_values=1.0)
    wr_p = jnp.pad(wr, (0, pad))
    nrm = jnp.sum(pts_p * pts_p, axis=1)

    # remat: under autodiff, lax.map (a scan) would otherwise stash every
    # chunk's (chunk, G) Φ/g intermediates for the backward pass — O(G²)
    # residual memory that OOMs production-size grids (measured: G=40960
    # value_and_grad exhausted HBM on chip). Recomputing the pairwise
    # block in the backward sweep keeps residuals O(G).
    @jax.checkpoint
    def block(args):
        pi, w0i, ki, wri, ni = args
        # R² via the Gram identity — the MXU does the heavy (chunk, G)
        # part. HIGHEST precision is mandatory on chip: at DEFAULT the
        # MXU demotes the f32 coordinates to bf16 (NOTES_r2) which was
        # measured to put 2.2e-4 rel error into grad[rho] vs an f64
        # oracle, while the elementwise Pallas engine sat at 2.5e-7
        # (round-4 chip diagnosis). k=3, so the extra passes are free.
        r2 = jnp.maximum(
            ni[:, None] + nrm[None, :]
            - 2.0 * jnp.dot(pi, pts_p.T,
                            precision=jax.lax.Precision.HIGHEST), 0.0)
        gi = w0i[:, None] * r2 + ki[:, None]
        gj = w0_p[None, :] * r2 + k_p[None, :]
        phi = -1.5 / (gi * gj * (gi + gj))
        return wri * jnp.dot(phi, wr_p,
                             precision=jax.lax.Precision.HIGHEST)

    inner = jax.lax.map(
        block,
        (pts_p.reshape(-1, chunk, 3), w0_p.reshape(-1, chunk),
         k_p.reshape(-1, chunk), wr_p.reshape(-1, chunk),
         nrm.reshape(-1, chunk)))
    return vv10_beta(b) * jnp.sum(wr) + 0.5 * jnp.sum(inner)


@functools.partial(jax.jit, static_argnames=("b", "c", "chunk"))
def _vv10_eval(ao, grad, w, pts, da, db, b, c, chunk):
    def enl(da, db):
        dt = da + db
        rho = jnp.einsum("gm,mn,gn->g", ao, dt, ao)
        gr = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad, dt, ao)
        s2 = jnp.einsum("xg,xg->g", gr, gr)
        if chunk == 0:        # fused Pallas pairwise core
            from tpumathlib.dx.vv10 import vv10_pair_energy_pallas

            return vv10_pair_energy_pallas(rho, s2, pts, w, b, c)
        return vv10_pair_energy(rho, s2, pts, w, b, c, chunk)

    e, (va, vb) = jax.value_and_grad(enl, argnums=(0, 1))(da, db)
    # symmetrize: ∂/∂D of ρ(D) built from a symmetric quadratic form
    return e, 0.5 * (va + va.T), 0.5 * (vb + vb.T)


class VV10Integrator:
    """Grid + AO tensors resident; per-density (E_nl, V_a, V_b) with the
    potential from autodiff (≙ cuestNonlocalXCPotentialRKS/UKSCompute).
    VV10 is a total-density functional, so V_a == V_b."""

    def __init__(self, shells, mol: Molecule, b: float = 5.9,
                 C: float = 0.0093, n_rad: int = 40, n_theta: int = 10,
                 n_phi: int = 20, chunk: int = 512,
                 engine: str = "xla"):
        if engine not in ("xla", "pallas"):
            raise ValueError(f"engine must be 'xla' or 'pallas': {engine}")
        self.engine = engine
        self.b, self.c, self.chunk = float(b), float(C), int(chunk)
        pts, w = molecular_grid(mol, n_rad, n_theta, n_phi)
        ao, grad = eval_aos(shells, pts, deriv=1)
        from tpumathlib.apps.basis import sph_transform

        c_t = sph_transform(shells)
        if c_t is not None:
            ao = ao @ c_t.T
            grad = grad @ c_t.T
        self.ao = jnp.asarray(ao, jnp.float32)
        self.grad = jnp.asarray(grad, jnp.float32)
        self.w = jnp.asarray(w, jnp.float32)
        self.pts = jnp.asarray(pts, jnp.float32)

    def evaluate(self, da, db):
        # grid tensors thread as jit ARGUMENTS (embedding them as jaxpr
        # constants trips the axon remote-compile size limit — CLAUDE.md)
        # chunk=0 selects the fused Pallas pairwise core (dx/vv10.py)
        return _vv10_eval(self.ao, self.grad, self.w, self.pts,
                          jnp.asarray(da, self.ao.dtype),
                          jnp.asarray(db, self.ao.dtype),
                          self.b, self.c,
                          0 if self.engine == "pallas" else self.chunk)


def vv10_gradient(mol: Molecule, da, db, shells=None, b: float = 5.9,
                  C: float = 0.0093, n_rad: int = 24, n_theta: int = 6,
                  n_phi: int = 12, chunk: int = 256) -> np.ndarray:
    """Nuclear gradient of E_nl at fixed density (≙ the reference's
    nonlocal_xc_gradient sample): the grid (points, Becke weights) and
    the AO values are built as differentiable functions of the atomic
    coordinates (apps/xcgrad.py machinery) and the whole pairwise VV10
    energy is jax.grad'ed — grid-motion and weight terms exact."""
    from tpumathlib.apps.est import sto3g_shells
    from tpumathlib.apps.scf import _Z
    from tpumathlib.apps.xcgrad import _eval_aos_jax, _grid_jax, _shell_meta

    shells = shells if shells is not None else sto3g_shells(mol)
    coords0 = jnp.asarray(mol.coords, jnp.float64)
    zs = [_Z[s] for s in mol.symbols]
    meta = _shell_meta(shells, np.asarray(mol.coords))
    daj = jnp.asarray(da, jnp.float64)
    dbj = jnp.asarray(db, jnp.float64)

    def e_nl(coords):
        pts, w = _grid_jax(coords, zs, n_rad, n_theta, n_phi, jnp.float64)
        ao, grad = _eval_aos_jax(meta, coords, pts, True, jnp.float64)
        dt = daj + dbj
        rho = jnp.einsum("gm,mn,gn->g", ao, dt, ao)
        gr = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad, dt, ao)
        s2 = jnp.einsum("xg,xg->g", gr, gr)
        return vv10_pair_energy(rho, s2, pts, w, b, C, chunk)

    return np.asarray(jax.grad(e_nl)(coords0))

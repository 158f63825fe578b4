"""cuEST step 4b: XC nuclear gradients by autodiff through the grid.

≙ cuEST/python_examples/4_exchange_correlation/local_xc_gradient/run.py:1
and nonlocal_xc_gradient/run.py:1 (the reference evaluates hand-derived
gradient kernels of the XC energy w.r.t. nuclear positions on the GPU).

TPU-native design: instead of hand-derived derivative kernels, the WHOLE
grid energy — atom-centered radial×angular product grid, Becke fuzzy-cell
weights, AO values (and AO gradients for GGA), the functional — is built
as one differentiable JAX function of the atomic coordinates, and the
nuclear gradient is jax.grad of it. Grid-point motion and Becke-weight
derivatives (the terms most implementations approximate away) are exact by
construction. The computation is einsum-dominated → MXU work under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.apps.est import sto3g_shells
from tpumathlib.apps.scf import Molecule, _Z
from tpumathlib.apps.xc import (
    _BRAGG_BOHR,
    _FUNCTIONALS,
    _angular_product,
    _radial_gc,
)


def _shell_meta(shells, coords):
    """Static shell metadata: (l, lmns, exps, coefs, atom_index)."""
    meta = []
    for s in shells:
        d = np.linalg.norm(coords - s.center[None], axis=1)
        meta.append((s.l, tuple(s.lmns), np.asarray(s.exps, float),
                     np.asarray(s.coefs, float), int(np.argmin(d))))
    return meta


def _becke_step_j(mu):
    for _ in range(3):
        mu = 1.5 * mu - 0.5 * mu ** 3
    return 0.5 * (1.0 - mu)


def _grid_jax(coords, zs, n_rad, n_theta, n_phi, dtype):
    """Differentiable molecular grid: points (G,3) and weights (G,) as
    functions of coords. Radial/angular node tables are static."""
    sph, wsph = _angular_product(n_theta, n_phi)
    sph = jnp.asarray(sph, dtype)
    wsph = jnp.asarray(wsph, dtype)
    natom = len(zs)
    pts_all, w_all = [], []
    for a in range(natom):
        rscale = _BRAGG_BOHR.get(zs[a], 1.0)
        r, wr = _radial_gc(n_rad, rscale)
        r = jnp.asarray(r, dtype)
        wr = jnp.asarray(wr, dtype)
        pts = (r[:, None, None] * sph[None, :, :]
               + coords[a][None, None, :]).reshape(-1, 3)
        w = (wr[:, None] * wsph[None, :]).ravel()
        if natom > 1:
            d_at = jnp.linalg.norm(pts[:, None, :] - coords[None, :, :],
                                   axis=2)
            # diagonal guard goes UNDER the sqrt: norm()'s backward pass at
            # the zero vector is 0/0 = NaN even though the value is fixed up
            diff = coords[:, None, :] - coords[None, :, :]
            rab = jnp.sqrt(jnp.sum(diff * diff, axis=2)
                           + jnp.eye(natom, dtype=dtype))
            p = jnp.ones((pts.shape[0], natom), dtype)
            for i in range(natom):
                cell = jnp.ones(pts.shape[0], dtype)
                for j in range(natom):
                    if i == j:
                        continue
                    mu = (d_at[:, i] - d_at[:, j]) / rab[i, j]
                    cell = cell * _becke_step_j(mu)
                p = p.at[:, i].set(cell)
            w = w * p[:, a] / jnp.maximum(jnp.sum(p, 1), 1e-300)
        pts_all.append(pts)
        w_all.append(w)
    return jnp.concatenate(pts_all), jnp.concatenate(w_all)


def _pow(x, p: int):
    """x**p with static integer p, NaN-safe under jax.grad: jnp.power's
    backward pass forms p·x**(p-1) → 0·x⁻¹ = NaN at x = 0 for p ∈ {0, 1}
    (grid points axis-aligned with an AO center hit x = 0 exactly)."""
    if p == 0:
        return jnp.ones_like(x)
    if p == 1:
        return x
    return x ** p


def _eval_aos_jax(meta, coords, pts, deriv: bool, dtype):
    """AO values (G, nbf) [+ (3, G, nbf)] as differentiable functions of
    coords (shell centers = coords[atom_index])."""
    cols, gcols = [], []
    for l, lmns, exps, coefs, ia in meta:
        ctr = coords[ia]
        dx = pts - ctr[None, :]
        r2 = jnp.sum(dx * dx, axis=1)
        rad = jnp.zeros_like(r2)
        drad = jnp.zeros_like(r2)
        for c, alpha in zip(coefs, exps):
            e = c * jnp.exp(-alpha * r2)
            rad = rad + e
            drad = drad - 2.0 * alpha * e
        for lmn in lmns:
            poly = _pow(dx[:, 0], lmn[0]) * _pow(dx[:, 1], lmn[1]) \
                * _pow(dx[:, 2], lmn[2])
            cols.append(poly * rad)
            if deriv:
                g = []
                for ax in range(3):
                    pw = lmn[ax]
                    o1, o2 = (ax + 1) % 3, (ax + 2) % 3
                    dpoly = (pw * _pow(dx[:, ax], pw - 1)
                             * _pow(dx[:, o1], lmn[o1])
                             * _pow(dx[:, o2], lmn[o2])
                             ) if pw > 0 else jnp.zeros_like(r2)
                    g.append(dpoly * rad + poly * dx[:, ax] * drad)
                gcols.append(jnp.stack(g))
    ao = jnp.stack(cols, axis=1)
    if deriv:
        return ao, jnp.stack(gcols, axis=2)  # (3, G, nbf)
    return ao, None


def xc_energy_fn(mol: Molecule, shells=None, xc: str = "svwn",
                 n_rad: int = 60, n_theta: int = 12, n_phi: int = 24,
                 dtype=jnp.float64):
    # grid defaults MATCH XCIntegrator's (apps/xc.py) so this gradient is
    # exactly the derivative of the SCF's XC energy
    """Returns e_xc(coords, da, db): a jit-able, jax.grad-able XC energy.

    dtype=jnp.float64 requires x64 (host/CPU verification); pass
    jnp.float32 on the chip."""
    coords0 = np.asarray(mol.coords, float)
    shells = shells if shells is not None else sto3g_shells(mol)
    meta = _shell_meta(shells, coords0)
    zs = [_Z[s] for s in mol.symbols]
    kind, f = _FUNCTIONALS[xc.lower()]

    def e_xc(coords, da, db):
        coords = jnp.asarray(coords, dtype)
        da = jnp.asarray(da, dtype)
        db = jnp.asarray(db, dtype)
        pts, w = _grid_jax(coords, zs, n_rad, n_theta, n_phi, dtype)
        ao, grad = _eval_aos_jax(meta, coords, pts,
                                 kind in ("gga", "mgga"), dtype)
        ra = jnp.einsum("gm,mn,gn->g", ao, da, ao)
        rb = jnp.einsum("gm,mn,gn->g", ao, db, ao)
        if kind in ("gga", "mgga"):
            gra = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad, da, ao)
            grb = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad, db, ao)
            dens = (ra, rb, jnp.einsum("xg,xg->g", gra, gra),
                    jnp.einsum("xg,xg->g", gra, grb),
                    jnp.einsum("xg,xg->g", grb, grb))
            if kind == "mgga":
                dens = dens + (
                    0.5 * jnp.einsum("xgm,mn,xgn->g", grad, da, grad),
                    0.5 * jnp.einsum("xgm,mn,xgn->g", grad, db, grad))
        else:
            dens = (ra, rb)
        good = dens[0] + dens[1] > 1e-10
        safe = tuple(jnp.where(good, x, 1.0) for x in dens)
        return jnp.sum(jnp.where(good, w * f(*safe, xp=jnp), 0.0))

    return e_xc


def xc_gradient(mol: Molecule, da, db, shells=None, xc: str = "svwn",
                grid_kw: dict | None = None, dtype=jnp.float64):
    """∂E_xc/∂R (natom, 3) at fixed density matrices — jax.grad through
    grid construction, Becke weights, and AO evaluation (all exact)."""
    fn = xc_energy_fn(mol, shells, xc, dtype=dtype, **(grid_kw or {}))
    g = jax.grad(fn, argnums=0)(jnp.asarray(mol.coords), da, db)
    return np.asarray(g, float)


def uks_gradient(mol: Molecule, spin: int = 0, xc: str = "svwn",
                 shells=None, uhf_out=None,
                 grid_kw: dict | None = None) -> np.ndarray:
    """Analytic UKS nuclear gradient: Coulomb/hcore/overlap terms from
    the McMurchie–Davidson derivative integrals (apps/deriv.py) + the
    autodiff XC term; hybrids add the exact-exchange derivative per spin
    with the functional's full (α, β, ω) range-separation mix — global
    hybrids (B3LYP/PBE0) via α·gx, RSH (cam-b3lyp/ωB97X/LC/HSE) adding
    β times the erf-attenuated ERI derivative.

    ≙ local_xc_gradient/run.py as the XC piece of a full KS gradient
    (and test/b3lyp1_grad_1 for the hybrid assembly)."""
    from tpumathlib.apps import est
    from tpumathlib.apps.deriv import (
        grad_eri,
        grad_kinetic,
        grad_nuclear,
        grad_nuclear_repulsion,
        grad_overlap,
    )
    from tpumathlib.apps.xc import uhf

    shells = shells if shells is not None else est.sto3g_shells(mol)
    gkw = dict(grid_kw or {})
    if uhf_out is None:
        uhf_out = uhf(mol, spin=spin, xc=xc,
                      grid_kw={k: v for k, v in gkw.items()})
    _, (ca, cb), (epsa, epsb), _ = uhf_out
    ne = mol.nelec
    na = (ne + spin) // 2
    nb = ne - na
    pa = ca[:, :na] @ ca[:, :na].T
    pb = cb[:, :nb] @ cb[:, :nb].T if nb else np.zeros_like(pa)
    wa = (ca[:, :na] * epsa[:na][None, :]) @ ca[:, :na].T
    wb = (cb[:, :nb] * epsb[:nb][None, :]) @ cb[:, :nb].T if nb \
        else np.zeros_like(pa)
    pt = pa + pb
    hx = grad_kinetic(shells, mol) + grad_nuclear(shells, mol)
    sx = grad_overlap(shells, mol)
    gx = grad_eri(shells, mol)
    grad = np.einsum("mn,axmn->ax", pt, hx)
    grad += 0.5 * np.einsum("mn,ls,axmnls->ax", pt, pt, gx)
    grad -= np.einsum("mn,axmn->ax", wa + wb, sx)
    grad += grad_nuclear_repulsion(mol)
    grad += xc_gradient(mol, pa, pb, shells, xc, grid_kw=gkw)
    from tpumathlib.apps.xc import rs_params

    # exact-exchange derivative: K_eff = α·K + β·K_LR(ω) (rs_params),
    # so the force carries the SAME mix — the β term contracts the
    # erf-attenuated ERI derivative (grad_eri(omega=)). Covers global
    # hybrids (β=0), LC (α=0, e.g. lc-wpbe), and screened hybrids
    # (β<0, e.g. hse06 = SR exchange).
    a0, beta, omega = rs_params(xc)
    if a0:
        grad -= 0.5 * a0 * np.einsum("ml,ns,axmnls->ax", pa, pa, gx)
        grad -= 0.5 * a0 * np.einsum("ml,ns,axmnls->ax", pb, pb, gx)
    if beta:
        gx_lr = grad_eri(shells, mol, omega=omega)
        grad -= 0.5 * beta * np.einsum("ml,ns,axmnls->ax", pa, pa, gx_lr)
        grad -= 0.5 * beta * np.einsum("ml,ns,axmnls->ax", pb, pb, gx_lr)
    return grad

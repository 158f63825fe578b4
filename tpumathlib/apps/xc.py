"""cuEST step 3: molecular grids, exchange–correlation, UHF/UKS.

≙ cuEST/python_examples/4_exchange_correlation/local_xc_potential/run.py
(XC potential on a molecular grid), cuest_molecular_grid.py (atom-centered
Becke grids), and cuest_scf/uhf.py (unrestricted SCF).

TPU-first design:

- the molecular grid is an atom-centered product quadrature — radial
  Gauss–Chebyshev under the Becke map × angular Gauss–Legendre(θ) ×
  uniform(φ) product (exact for spherical harmonics like Lebedev, built
  from closed forms instead of tabulated magic points) — with Becke
  fuzzy-cell partition weights;
- densities/potentials on the grid are einsum contractions over the
  (grid, nbf) AO value matrix — MXU work;
- functional POTENTIALS come from jax.grad of the energy density: no
  hand-derived vsigma expressions to get wrong. Functionals: Slater
  exchange + VWN5 correlation (spin-interpolated) and PBE (exchange +
  correlation), closed and open shell.

Final energies are re-evaluated in host f64 (same hybrid-precision policy
as est.rhf — the SCF fixed point is variational).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.apps.est import GShell, _ao_list, nbf, overlap, kinetic, \
    nuclear, sto3g_shells, DFTensors, eri_tensor
from tpumathlib.apps.scf import Molecule, _Z

# Bragg–Slater radii (Å→bohr done by caller; these are in bohr) for the
# Becke radial scale; 1.0 fallback
_BRAGG_BOHR = {1: 0.661, 2: 0.661, 6: 1.322, 7: 1.228, 8: 1.133, 9: 0.944,
               16: 1.889, 17: 1.889}


# ---------------- atomic product grid ----------------

def _radial_gc(n: int, rscale: float):
    """Gauss–Chebyshev(2nd) radial grid under Becke's r = R(1+x)/(1-x) map.
    Returns (r, w) with w including r² dr (the 4π lives in the angular
    weights)."""
    i = np.arange(1, n + 1)
    theta = i * np.pi / (n + 1)
    x = np.cos(theta)
    w_gc = np.pi / (n + 1) * np.sin(theta) ** 2
    # strip the Chebyshev weight function 1/sqrt(1-x^2)
    w_x = w_gc / np.sqrt(1.0 - x**2)
    r = rscale * (1.0 + x) / (1.0 - x)
    drdx = 2.0 * rscale / (1.0 - x) ** 2
    return r, w_x * drdx * r**2


def _angular_product(n_theta: int, n_phi: int):
    """Spherical product quadrature: Gauss–Legendre in cosθ × uniform φ.
    Exact for spherical harmonics of degree ≤ min(2n_theta-1, n_phi-1)
    (the same guarantee class as Lebedev grids, from closed forms)."""
    xt, wt = np.polynomial.legendre.leggauss(n_theta)
    phi = 2.0 * np.pi * np.arange(n_phi) / n_phi
    wphi = 2.0 * np.pi / n_phi
    st = np.sqrt(1.0 - xt**2)
    pts = np.stack([
        np.outer(st, np.cos(phi)).ravel(),
        np.outer(st, np.sin(phi)).ravel(),
        np.outer(xt, np.ones(n_phi)).ravel()], axis=1)
    w = (wt[:, None] * wphi * np.ones(n_phi)[None, :]).ravel()
    return pts, w


def _becke_step(mu):
    for _ in range(3):
        mu = 1.5 * mu - 0.5 * mu**3
    return 0.5 * (1.0 - mu)


def molecular_grid(mol: Molecule, n_rad: int = 60, n_theta: int = 12,
                   n_phi: int = 24):
    """Atom-centered Becke grid (≙ cuest_molecular_grid.py): per-atom
    radial×angular product grids glued with Becke fuzzy-cell weights.
    Returns (points (G,3), weights (G,))."""
    coords = np.asarray(mol.coords, float)
    zs = [_Z[s] for s in mol.symbols]
    sph, wsph = _angular_product(n_theta, n_phi)
    pts_all, w_all = [], []
    for a, (za, ra_) in enumerate(zip(zs, coords)):
        rscale = _BRAGG_BOHR.get(za, 1.0)
        r, wr = _radial_gc(n_rad, rscale)
        pts = (r[:, None, None] * sph[None, :, :] + ra_[None, None, :]
               ).reshape(-1, 3)
        w = (wr[:, None] * wsph[None, :]).ravel()
        # Becke partition: P_a / sum_b P_b on this atom's points
        if len(coords) > 1:
            d_at = np.linalg.norm(pts[:, None, :] - coords[None, :, :],
                                  axis=2)                       # (G, nat)
            rab = np.linalg.norm(coords[:, None, :] - coords[None, :, :],
                                 axis=2) + np.eye(len(coords))
            p = np.ones((len(pts), len(coords)))
            for i in range(len(coords)):
                for j in range(len(coords)):
                    if i == j:
                        continue
                    mu = (d_at[:, i] - d_at[:, j]) / rab[i, j]
                    p[:, i] *= _becke_step(mu)
            w = w * p[:, a] / np.maximum(p.sum(1), 1e-300)
        pts_all.append(pts)
        w_all.append(w)
    return np.concatenate(pts_all), np.concatenate(w_all)


# ---------------- AO values on the grid ----------------

def eval_aos(shells, points, deriv: int = 0):
    """AO values (G, nbf) [+ gradients (3, G, nbf) when deriv=1] — host
    f64 construction; callers move them to device once per SCF."""
    aos = _ao_list(shells)
    g = len(points)
    vals = np.zeros((g, len(aos)))
    grads = np.zeros((3, g, len(aos))) if deriv else None
    pts = np.asarray(points, float)
    for k, (sh, (l, m, n_)) in enumerate(aos):
        dx = pts - sh.center[None, :]
        r2 = np.sum(dx * dx, axis=1)
        poly = dx[:, 0] ** l * dx[:, 1] ** m * dx[:, 2] ** n_
        for c, alpha in zip(sh.coefs, sh.exps):
            e = c * np.exp(-alpha * r2)
            vals[:, k] += poly * e
            if deriv:
                for ax, pw in enumerate((l, m, n_)):
                    dpoly = (pw * np.where(pw > 0,
                                           dx[:, ax] ** max(pw - 1, 0), 0.0)
                             * (dx[:, (ax + 1) % 3] ** ((m, n_, l)[ax]))
                             * (dx[:, (ax + 2) % 3] ** ((n_, l, m)[ax])))
                    grads[ax, :, k] += (dpoly - 2.0 * alpha * dx[:, ax]
                                        * poly) * e
    return (vals, grads) if deriv else vals


# ---------------- functionals (energy density per volume) ----------------
#
# All take SPIN densities; closed shell passes ra = rb = rho/2. ``xp``
# selects the array module: jnp for device/autodiff, np(float64) for the
# final host energy pass.

_CX = (3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0)


def f_slater_x(ra, rb, xp=jnp):
    """Slater LDA exchange: spin-scaled -Cx 2^{1/3} Σ_σ ρ_σ^{4/3}."""
    c = _CX * 2.0 ** (1.0 / 3.0)
    return -c * (xp.maximum(ra, 0.0) ** (4.0 / 3.0)
                 + xp.maximum(rb, 0.0) ** (4.0 / 3.0))


def _vwn_eps(rs, a, b, c, x0, xp):
    x = xp.sqrt(rs)
    xf = lambda t: t * t + b * t + c  # noqa: E731
    q = np.sqrt(4.0 * c - b * b)
    return a * (xp.log(x * x / xf(x))
                + 2.0 * b / q * xp.arctan(q / (2.0 * x + b))
                - b * x0 / xf(x0) * (
                    xp.log((x - x0) ** 2 / xf(x))
                    + 2.0 * (b + 2.0 * x0) / q * xp.arctan(q / (2.0 * x + b))))


def f_vwn5_c(ra, rb, xp=jnp):
    """VWN5 correlation (spin-interpolated, the LDA,VWN formula IV)."""
    rho = xp.maximum(ra + rb, 1e-30)
    zeta = xp.clip((ra - rb) / rho, -1.0 + 1e-15, 1.0 - 1e-15)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    e_p = _vwn_eps(rs, 0.0310907, 3.72744, 12.9352, -0.10498, xp)
    e_f = _vwn_eps(rs, 0.01554535, 7.06042, 18.0578, -0.32500, xp)
    e_a = _vwn_eps(rs, -1.0 / (6.0 * np.pi ** 2), 1.13107, 13.0045,
                   -0.00475840, xp)
    fz = (((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0) - 2.0)
          / (2.0 ** (4.0 / 3.0) - 2.0))
    d2f0 = 4.0 / (9.0 * (2.0 ** (1.0 / 3.0) - 1.0))
    eps = e_p + e_a * fz / d2f0 * (1.0 - zeta ** 4) \
        + (e_f - e_p) * fz * zeta ** 4
    return rho * eps


def f_vwn1rpa_c(ra, rb, xp=jnp):
    """VWN formula I with the RPA parameterization — the LDA correlation
    entering Gaussian-convention B3LYP (the reference's 'B3LYP1'
    functional id; 'B3LYP5' uses f_vwn5_c). VWN1 interpolates the para/
    ferro fits with f(ζ) directly (no spin-stiffness term)."""
    rho = xp.maximum(ra + rb, 1e-30)
    zeta = xp.clip((ra - rb) / rho, -1.0 + 1e-15, 1.0 - 1e-15)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    e_p = _vwn_eps(rs, 0.0310907, 13.0720, 42.7198, -0.409286, xp)
    e_f = _vwn_eps(rs, 0.01554535, 20.1231, 101.578, -0.743294, xp)
    fz = (((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0) - 2.0)
          / (2.0 ** (4.0 / 3.0) - 2.0))
    return rho * (e_p + (e_f - e_p) * fz)


def f_b88_x_corr(ra, rb, saa, sab, sbb, xp=jnp):
    """Becke 88 gradient CORRECTION to LSDA exchange [PRA 38, 3098]:
    ΔE_x = −β Σ_σ ∫ ρ_σ^{4/3} x_σ² / (1 + 6β x_σ asinh x_σ),
    x_σ = |∇ρ_σ|/ρ_σ^{4/3}. Kept separate from the LDA part because
    B3LYP scales the correction (0.72) and the LDA term (0.80)
    differently."""
    beta = 0.0042

    def one(r, s):
        r = xp.maximum(r, 1e-30)
        r43 = r ** (4.0 / 3.0)
        x = xp.sqrt(xp.maximum(s, 1e-35)) / r43
        return -beta * r43 * x * x / (1.0 + 6.0 * beta * x
                                      * xp.arcsinh(x))

    return one(ra, saa) + one(rb, sbb)


def f_b88_x(ra, rb, saa, sab, sbb, xp=jnp):
    """Full B88 exchange = Slater LSDA + the B88 gradient correction."""
    return f_slater_x(ra, rb, xp) + f_b88_x_corr(ra, rb, saa, sab, sbb, xp)


_LYP_CF = 0.3 * (3.0 * np.pi ** 2) ** (2.0 / 3.0)


def f_lyp_c(ra, rb, saa, sab, sbb, xp=jnp):
    """Lee–Yang–Parr correlation in the Laplacian-free Miehlich form
    [CPL 157, 200 (1989) Eq. 2] — the form every production code
    integrates (the original LYP ∇²ρ terms removed by parts):

    E_c = −a ∫ 4/(1+dρ^{-1/3}) ρ_α ρ_β / ρ
          −a b ∫ ω [ ρ_α ρ_β (2^{11/3} C_F (ρ_α^{8/3}+ρ_β^{8/3})
              + (47/18 − 7δ/18) σ − (5/2 − δ/18)(σ_αα+σ_ββ)
              − (δ−11)/9 (ρ_α σ_αα + ρ_β σ_ββ)/ρ )
              − (2/3)ρ² σ + ((2/3)ρ² − ρ_α²) σ_ββ
              + ((2/3)ρ² − ρ_β²) σ_αα ]
    ω = e^{−cρ^{-1/3}} ρ^{-11/3}/(1+dρ^{-1/3}),
    δ = cρ^{-1/3} + dρ^{-1/3}/(1+dρ^{-1/3})."""
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    rho = xp.maximum(ra + rb, 1e-30)
    sig = saa + 2.0 * sab + sbb
    t = rho ** (-1.0 / 3.0)          # ρ^{-1/3}
    den = 1.0 / (1.0 + d * t)
    omega = xp.exp(-c * t) * den * t ** 11
    delta = c * t + d * t * den
    rab = ra * rb
    term_lda = -4.0 * a * den * rab / rho
    bracket = (rab * (2.0 ** (11.0 / 3.0) * _LYP_CF
                      * (xp.maximum(ra, 0.0) ** (8.0 / 3.0)
                         + xp.maximum(rb, 0.0) ** (8.0 / 3.0))
                      + (47.0 / 18.0 - 7.0 * delta / 18.0) * sig
                      - (2.5 - delta / 18.0) * (saa + sbb)
                      - (delta - 11.0) / 9.0
                      * (ra * saa + rb * sbb) / rho)
               - (2.0 / 3.0) * rho * rho * sig
               + ((2.0 / 3.0) * rho * rho - ra * ra) * sbb
               + ((2.0 / 3.0) * rho * rho - rb * rb) * saa)
    return term_lda - a * b * omega * bracket


def _pbe_x_spin(rho, sigma, xp):
    """PBE exchange for one spin channel's (2ρ_σ, 4σ_σσ) via the
    spin-scaling relation E_x[ra,rb] = (Ex[2ra] + Ex[2rb])/2."""
    rho = xp.maximum(rho, 1e-30)
    kappa, mu = 0.804, 0.2195149727645171
    kf = (3.0 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    ex_lda = -3.0 * kf / (4.0 * np.pi) * rho
    # stepwise-scaled s = |∇ρ|/(2 kf ρ): the naive σ/(4kf²ρ²) quotient has
    # an f32-UNDERFLOWING denominator square in its autodiff at tail
    # densities (1/u² with u ~ 1e-21 → inf)
    s = xp.sqrt(xp.maximum(sigma, 1e-35)) / rho / (2.0 * kf)
    s2 = s * s
    fx = 1.0 + kappa - kappa / (1.0 + mu * s2 / kappa)
    return ex_lda * fx


def f_pbe_x(ra, rb, saa, sab, sbb, xp=jnp):
    return 0.5 * (_pbe_x_spin(2.0 * ra, 4.0 * saa, xp)
                  + _pbe_x_spin(2.0 * rb, 4.0 * sbb, xp))


def _pw92_eps(rs, zeta, xp):
    """Perdew–Wang 92 LDA correlation energy per particle (PBE's base)."""
    def g(rs, a, a1, b1, b2, b3, b4, p):
        q0 = -2.0 * a * (1.0 + a1 * rs)
        q1 = 2.0 * a * (b1 * xp.sqrt(rs) + b2 * rs
                        + b3 * rs ** 1.5 + b4 * rs ** (p + 1.0))
        return q0 * xp.log(1.0 + 1.0 / q1)

    e_p = g(rs, 0.031091, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294, 1.0)
    e_f = g(rs, 0.015545, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517, 1.0)
    alp = -g(rs, 0.016887, 0.11125, 10.357, 3.6231, 0.88026, 0.49671, 1.0)
    fz = (((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0) - 2.0)
          / (2.0 ** (4.0 / 3.0) - 2.0))
    d2f0 = 1.709920934161365
    return e_p + alp * fz / d2f0 * (1.0 - zeta ** 4) \
        + (e_f - e_p) * fz * zeta ** 4


def f_pbe_c(ra, rb, saa, sab, sbb, xp=jnp):
    rho = xp.maximum(ra + rb, 1e-30)
    zeta = xp.clip((ra - rb) / rho, -1.0 + 1e-15, 1.0 - 1e-15)
    sigma = xp.maximum(saa + 2.0 * sab + sbb, 0.0)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    eps = _pw92_eps(rs, zeta, xp)
    beta = 0.06672455060314922
    gamma = (1.0 - np.log(2.0)) / np.pi ** 2
    phi = 0.5 * ((1.0 + zeta) ** (2.0 / 3.0) + (1.0 - zeta) ** (2.0 / 3.0))
    kf = (3.0 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = xp.sqrt(4.0 * kf / np.pi)
    # stepwise-scaled t (same f32 autodiff-underflow story as in pbe_x)
    t = xp.sqrt(xp.maximum(sigma, 1e-35)) / rho / (2.0 * phi * ks)
    t2 = t * t
    expo = xp.exp(-eps / (gamma * phi ** 3))
    a_ = beta / gamma / xp.maximum(expo - 1.0, 1e-30)
    # clamp A·t² (it diverges in density tails and overflows f32 when
    # squared; H saturates there anyway — the clamp is inert numerics)
    at2 = xp.minimum(a_ * t2, 1e12)
    num = 1.0 + at2
    den = 1.0 + at2 + at2 ** 2
    h = gamma * phi ** 3 * xp.log(1.0 + beta / gamma * t2 * num / den)
    return rho * (eps + h)


def _f_b3lyp(vwn):
    """B3LYP energy density, hybrid exact-exchange part excluded:
    0.80 E_x^LSDA + 0.72 ΔE_x^B88 + 0.19 E_c^VWN + 0.81 E_c^LYP
    (a0=0.20, ax=0.72, ac=0.81 — Becke's 3-parameter mix with LYP).
    ``vwn`` selects the LDA-correlation parameterization: the reference
    exposes both 'B3LYP1' (VWN1-RPA, the Gaussian convention) and
    'B3LYP5' (VWN5)."""
    fc = f_vwn1rpa_c if vwn == 1 else f_vwn5_c

    def f(ra, rb, saa, sab, sbb, xp=jnp):
        return (0.80 * f_slater_x(ra, rb, xp)
                + 0.72 * f_b88_x_corr(ra, rb, saa, sab, sbb, xp)
                + 0.19 * fc(ra, rb, xp)
                + 0.81 * f_lyp_c(ra, rb, saa, sab, sbb, xp))

    return f


_FUNCTIONALS = {
    "svwn": ("lda", lambda ra, rb, xp=jnp: f_slater_x(ra, rb, xp)
             + f_vwn5_c(ra, rb, xp)),
    "lda_x": ("lda", f_slater_x),
    "pbe": ("gga", lambda ra, rb, saa, sab, sbb, xp=jnp:
            f_pbe_x(ra, rb, saa, sab, sbb, xp)
            + f_pbe_c(ra, rb, saa, sab, sbb, xp)),
    "blyp": ("gga", lambda ra, rb, saa, sab, sbb, xp=jnp:
             f_b88_x(ra, rb, saa, sab, sbb, xp)
             + f_lyp_c(ra, rb, saa, sab, sbb, xp)),
    "b3lyp": ("gga", _f_b3lyp(1)),       # ≙ reference 'B3LYP1'
    "b3lyp5": ("gga", _f_b3lyp(5)),      # ≙ reference 'B3LYP5'
    # PBE0: 0.25 exact + 0.75 PBE exchange, full PBE correlation
    "pbe0": ("gga", lambda ra, rb, saa, sab, sbb, xp=jnp:
             0.75 * f_pbe_x(ra, rb, saa, sab, sbb, xp)
             + f_pbe_c(ra, rb, saa, sab, sbb, xp)),
}

# exact-exchange (HF) fraction mixed into the Kohn–Sham Fock matrix for
# hybrid functionals (uhf/rks apply −a0·K_σ and the matching energy term)
_HYBRID_EXX = {"b3lyp": 0.20, "b3lyp5": 0.20, "pbe0": 0.25}


def hybrid_exx(xc: str | None) -> float:
    """Exact-exchange fraction of a registered functional (0 for pure)."""
    return _HYBRID_EXX.get(xc, 0.0) if xc else 0.0


# ---------------- XC integration on device ----------------

def xc_local_eval(kind, f, ao, grad, w, da, db):
    """One quadrature block → (E_xc, V_a, V_b). Pure in (ao, grad, w, da,
    db), so it serves both the single-device `XCIntegrator.evaluate` and
    the grid-sharded `apps.distributed` path (each device evaluates its
    own grid points; the contributions are additive over points)."""
    if kind == "lda":
        dens = (jnp.einsum("gm,mn,gn->g", ao, da, ao),
                jnp.einsum("gm,mn,gn->g", ao, db, ao))
        gra = grb = None
    else:
        ra = jnp.einsum("gm,mn,gn->g", ao, da, ao)
        rb = jnp.einsum("gm,mn,gn->g", ao, db, ao)
        gra = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad, da, ao)
        grb = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad, db, ao)
        dens = (ra, rb,
                jnp.einsum("xg,xg->g", gra, gra),
                jnp.einsum("xg,xg->g", gra, grb),
                jnp.einsum("xg,xg->g", grb, grb))

    def etot(*d):
        # double-where guard: clamp the functional's inputs BEFORE
        # evaluating it so autodiff never sees the rho→0 singularities
        # (0·∞ = NaN otherwise; the masked value path alone does not
        # protect the gradient)
        good = d[0] + d[1] > 1e-8
        safe = tuple(jnp.where(good, x, 1.0) for x in d)
        return jnp.sum(jnp.where(good, w * f(*safe, xp=jnp), 0.0))

    exc = etot(*dens)
    derivs = jax.grad(etot, argnums=tuple(range(len(dens))))(*dens)
    vra, vrb = derivs[0], derivs[1]
    va = jnp.einsum("g,gm,gn->mn", vra, ao, ao)
    vb = jnp.einsum("g,gm,gn->mn", vrb, ao, ao)
    if kind == "gga":
        vsaa, vsab, vsbb = derivs[2], derivs[3], derivs[4]
        # dE/dD_a via chain rule on σ terms: 2 vsaa ∇ρa + vsab ∇ρb
        # (gra/grb reused from the density build above)
        ta = 2.0 * vsaa[None] * gra + vsab[None] * grb
        tb = 2.0 * vsbb[None] * grb + vsab[None] * gra
        cross = jnp.einsum("xg,xgm,gn->mn", ta, grad, ao)
        va = va + cross + cross.T
        crossb = jnp.einsum("xg,xgm,gn->mn", tb, grad, ao)
        vb = vb + crossb + crossb.T
    return exc, va, vb


class XCIntegrator:
    """Grid + AO matrices held on device; per-iteration density → (E_xc,
    V_a, V_b) as einsum contractions + autodiff functional derivatives
    (≙ local_xc_potential/run.py's xc-potential-on-grid flow)."""

    def __init__(self, shells, mol: Molecule, xc: str = "svwn",
                 n_rad: int = 60, n_theta: int = 12, n_phi: int = 24):
        self.kind, self.f = _FUNCTIONALS[xc]
        self.hyb = hybrid_exx(xc)
        pts, w = molecular_grid(mol, n_rad, n_theta, n_phi)
        self.w_np = w
        if self.kind == "gga":
            ao, grad = eval_aos(shells, pts, deriv=1)
            self.grad_np = grad
            self.grad = jnp.asarray(grad, jnp.float32)
        else:
            ao = eval_aos(shells, pts)
            self.grad = None
        # spherical (pure) shells: project the Cartesian AO values onto
        # the public real-solid-harmonic functions (apps/basis.py)
        from tpumathlib.apps.basis import sph_transform

        c_t = sph_transform(shells)
        if c_t is not None:
            ao = ao @ c_t.T
            if self.kind == "gga":
                self.grad_np = self.grad_np @ c_t.T
                self.grad = jnp.asarray(self.grad_np, jnp.float32)
        self.ao_np = ao
        self.ao = jnp.asarray(ao, jnp.float32)
        self.w = jnp.asarray(w, jnp.float32)

    def _densities(self, ao, grad, da, db, xp):
        ra = xp.einsum("gm,mn,gn->g", ao, da, ao)
        rb = xp.einsum("gm,mn,gn->g", ao, db, ao)
        if self.kind == "lda":
            return (ra, rb)
        gra = 2.0 * xp.einsum("xgm,mn,gn->xg", grad, da, ao)
        grb = 2.0 * xp.einsum("xgm,mn,gn->xg", grad, db, ao)
        saa = xp.einsum("xg,xg->g", gra, gra)
        sab = xp.einsum("xg,xg->g", gra, grb)
        sbb = xp.einsum("xg,xg->g", grb, grb)
        return (ra, rb, saa, sab, sbb)

    def exc_only(self, da, db, f64: bool = True) -> float:
        """Host-f64 E_xc for the final energy pass."""
        dens = self._densities(self.ao_np, getattr(self, "grad_np", None),
                               np.asarray(da, float), np.asarray(db, float),
                               np)
        good = dens[0] + dens[1] > 1e-12
        safe = tuple(np.where(good, x, 1.0) for x in dens)
        return float(np.sum(np.where(good,
                                     self.w_np * self.f(*safe, xp=np), 0.0)))

    @functools.partial(jax.jit, static_argnums=0)
    def evaluate(self, da, db):
        """Device pass: E_xc and the V_xc matrices for both spins.

        V_σ[m,n] = ∫ [∂f/∂ρ_σ φm φn + GGA: 2∂f/∂σab-terms ∇(φmφn)·∇ρ]."""
        return xc_local_eval(self.kind, self.f, self.ao, self.grad, self.w,
                             da, db)


# ---------------- SCF drivers: UHF / RKS / UKS ----------------

def _diis_update(errs, focks, f):
    if len(errs) > 1:
        m = len(errs)
        bmat = -np.ones((m + 1, m + 1))
        bmat[m, m] = 0.0
        for a in range(m):
            for b in range(m):
                bmat[a, b] = np.sum(errs[a] * errs[b])
        rhs = np.zeros(m + 1)
        rhs[m] = -1.0
        try:
            wts = np.linalg.solve(bmat, rhs)[:m]
            return np.einsum("i,i...->...", wts, np.stack(focks))
        except np.linalg.LinAlgError:
            pass
    return f


def uhf(mol: Molecule, spin: int = 0, max_iters: int = 120,
        conv: float = 1e-9, density_fit: bool = False,
        xc: str | None = None, grid_kw: dict | None = None,
        shells=None, basis: str | None = None,
        aux_basis: str | None = None, guess: str = "core",
        nlc=None, nlc_grid_kw: dict | None = None):
    """Unrestricted HF (xc=None) or unrestricted Kohn–Sham with DIIS.
    Pure functionals (svwn/pbe/blyp) build J + V_xc; global hybrids
    (b3lyp/b3lyp5/pbe0) additionally mix −a0·K_σ exact exchange into
    the Fock matrices (a0 from xc.hybrid_exx).

    ≙ cuEST/cuest_scf_examples/cuest_scf/uhf.py:1 (UHF driver) and
    python_examples/4_exchange_correlation (UKS XC build).
    spin = nα − nβ. Returns (E, (Ca, Cb), (epsa, epsb), S²).
    ``basis``/``aux_basis`` name packaged production sets (e.g.
    "def2-svp" / "def2-universal-jkfit", apps/basis.py) — spherical
    shells are projected through basis.sph_transform everywhere.
    guess="sad" seeds both spins from the superposition-of-atomic-
    densities block guess solved in the run's own basis, with traces
    rescaled to nα/nβ (≙ cuest_scf/sad_guess.py applied to UHF).
    ``nlc`` adds VV10 nonlocal correlation to the Fock build and energy
    (True → the paper's b=5.9, C=0.0093, or an explicit (b, C) pair —
    ≙ cuestNonlocalXCPotentialUKSCompute with the VV10_B/VV10_C knobs);
    ``nlc_grid_kw`` sizes its quadrature grid (the O(G²) kernel usually
    wants a coarser grid than the local functional's).
    """
    from tpumathlib.apps.basis import basis_shells, sph_transform

    if shells is None:
        shells = (basis_shells(mol, basis) if basis is not None
                  else sto3g_shells(mol))
    c_t = sph_transform(shells)
    s = overlap(shells)
    hcore = kinetic(shells) + nuclear(shells, mol)
    if c_t is not None:
        s = c_t @ s @ c_t.T
        hcore = c_t @ hcore @ c_t.T
    check_ne = mol.nelec
    na = (check_ne + spin) // 2
    nb = check_ne - na
    assert na - nb == spin and na >= nb >= 0, "bad spin for electron count"

    if density_fit:
        aux = (basis_shells(mol, aux_basis) if aux_basis is not None
               else None)
        df = DFTensors(shells, aux=aux)
        eri_np = None
    else:
        eri_np = eri_tensor(shells)
        if c_t is not None:
            eri_np = np.einsum("im,jn,mnls->ijls", c_t, c_t, eri_np)
            eri_np = np.einsum("kl,hs,ijls->ijkh", c_t, c_t, eri_np)
        eri = jnp.asarray(eri_np)
    xci = XCIntegrator(shells, mol, xc, **(grid_kw or {})) if xc else None
    vvi = None
    if nlc:
        if not xc:
            raise ValueError("nlc (VV10) requires an xc functional — "
                             "pass e.g. xc='pbe'")
        from tpumathlib.apps.vv10 import VV10Integrator

        bc = (5.9, 0.0093) if nlc is True else tuple(nlc)
        vvi = VV10Integrator(shells, mol, b=bc[0], C=bc[1],
                             **(nlc_grid_kw or {}))

    def build_jk(d, exchange=True):
        dj = jnp.asarray(d)
        if density_fit:
            j = np.asarray(df.coulomb(dj), np.float64)
            k = np.asarray(df.exchange(dj), np.float64) if exchange else 0.0
        else:
            j = np.asarray(jnp.einsum("mnls,ls->mn", eri, dj), np.float64)
            k = np.asarray(jnp.einsum("mlns,ls->mn", eri, dj),
                           np.float64) if exchange else 0.0
        return j, k

    lmat = np.linalg.cholesky(s)
    linv = np.linalg.inv(lmat)

    def density(f, nocc):
        w, y = np.linalg.eigh(linv @ f @ linv.T)
        c = linv.T @ y
        cocc = c[:, :nocc]
        return cocc @ cocc.T, c, w

    da, ca, epsa = density(hcore, na)
    db, cb, epsb = density(hcore, nb) if nb else (np.zeros_like(da),
                                                  ca, epsa)
    if guess == "sad":
        from tpumathlib.apps.sad import sad_half_density

        d_half = sad_half_density(mol, basis)
        if d_half.shape == s.shape:    # table covers this basis/shells
            half = mol.nelec / 2.0
            da = d_half * (na / half)
            db = d_half * (nb / half) if nb else db
    # break α/β symmetry for open shells (uhf.py does the same via guess
    # mixing); without it, symmetric guesses stay spin-restricted
    e_old, e = 0.0, 0.0
    errs, focks = [], []
    best_de, stall = float("inf"), 0
    for it in range(max_iters):
        jt, _ = build_jk(da + db, exchange=False)
        if xc is None:
            _, ka = build_jk(da)
            _, kb = build_jk(db)
            fa = hcore + jt - ka
            fb = hcore + jt - kb
            e = 0.5 * float(np.sum(da * (hcore + fa))
                            + np.sum(db * (hcore + fb)))
        else:
            exc, va, vb = xci.evaluate(jnp.asarray(da, jnp.float32),
                                       jnp.asarray(db, jnp.float32))
            fa = hcore + jt + np.asarray(va, np.float64)
            fb = hcore + jt + np.asarray(vb, np.float64)
            e = (float(np.sum((da + db) * hcore))
                 + 0.5 * float(np.sum((da + db) * jt)) + float(exc))
            if xci.hyb:
                # hybrid functional: −a0·K_σ in the Fock, −a0/2·Tr(DK)
                # in the energy (B3LYP/PBE0-class global hybrids)
                _, ka = build_jk(da)
                _, kb = build_jk(db)
                fa -= xci.hyb * ka
                fb -= xci.hyb * kb
                e -= 0.5 * xci.hyb * float(np.sum(da * ka)
                                           + np.sum(db * kb))
            if vvi is not None:
                enl, vna, vnb = vvi.evaluate(jnp.asarray(da, jnp.float32),
                                             jnp.asarray(db, jnp.float32))
                fa += np.asarray(vna, np.float64)
                fb += np.asarray(vnb, np.float64)
                e += float(enl)
        e += mol.nuclear_repulsion()
        err = np.stack([fa @ da @ s - s @ da @ fa,
                        fb @ db @ s - s @ db @ fb])
        errs.append(err)
        focks.append(np.stack([fa, fb]))
        if len(errs) > 8:
            errs.pop(0)
            focks.pop(0)
        fab = _diis_update(errs, focks, np.stack([fa, fb]))
        da, ca, epsa = density(fab[0], na)
        if nb:
            db, cb, epsb = density(fab[1], nb)
        else:
            db = np.zeros_like(da)
        de = abs(e - e_old)
        if de < conv and it > 3:
            break
        # f32-device plateau detection (see est.rhf / NOTES_r4)
        if it > 3 and de < 1e-5:
            stall = stall + 1 if de >= best_de else 0
            best_de = min(best_de, de)
            if stall >= 8:
                break
        e_old = e

    # final host-f64 energy
    if xc is None:
        if eri_np is None:
            jt = np.asarray(df.coulomb(jnp.asarray(da + db)), np.float64)
            ka = np.asarray(df.exchange(jnp.asarray(da)), np.float64)
            kb = np.asarray(df.exchange(jnp.asarray(db)), np.float64)
        else:
            jt = np.einsum("mnls,ls->mn", eri_np, da + db)
            ka = np.einsum("mlns,ls->mn", eri_np, da)
            kb = np.einsum("mlns,ls->mn", eri_np, db)
        e = (float(np.sum((da + db) * hcore))
             + 0.5 * float(np.sum((da + db) * jt))
             - 0.5 * float(np.sum(da * ka) + np.sum(db * kb))
             + mol.nuclear_repulsion())
    else:
        if eri_np is None:
            jt = np.asarray(df.coulomb(jnp.asarray(da + db)), np.float64)
        else:
            jt = np.einsum("mnls,ls->mn", eri_np, da + db)
        e = (float(np.sum((da + db) * hcore))
             + 0.5 * float(np.sum((da + db) * jt))
             + xci.exc_only(da, db) + mol.nuclear_repulsion())
        if xci.hyb:
            if eri_np is None:
                ka = np.asarray(df.exchange(jnp.asarray(da)), np.float64)
                kb = np.asarray(df.exchange(jnp.asarray(db)), np.float64)
            else:
                ka = np.einsum("mlns,ls->mn", eri_np, da)
                kb = np.einsum("mlns,ls->mn", eri_np, db)
            e -= 0.5 * xci.hyb * float(np.sum(da * ka) + np.sum(db * kb))
        if vvi is not None:
            e += float(vvi.evaluate(jnp.asarray(da, jnp.float32),
                                    jnp.asarray(db, jnp.float32))[0])

    # S² = Sz(Sz+1) + nβ − Σ_ij |⟨φ_i^α|S|φ_j^β⟩|²
    sz = 0.5 * spin
    smo = ca[:, :na].T @ s @ cb[:, :nb] if nb else np.zeros((na, 0))
    s2 = sz * (sz + 1.0) + nb - float(np.sum(smo * smo))
    return e, (ca, cb), (epsa, epsb), s2


def rks(mol: Molecule, xc: str = "svwn", **kw):
    """Restricted Kohn–Sham (closed shell) — UKS with nα = nβ.

    ≙ cuEST python_examples/4_exchange_correlation driving an SCF."""
    e, (ca, _), (epsa, _), _ = uhf(mol, spin=0, xc=xc, **kw)
    return e, ca, epsa

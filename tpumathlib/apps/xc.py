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


# ---------------- range-separated (erf-split) exchange ----------------
#
# The reference exposes CAM-B3LYP / HSE06 / LC-wPBE(h) / the wB97 family
# through the XC plan's (exchange_scale, lrc_exchange_scale, lrc_omega)
# knobs (cuest_scf/rhf.py:260-262, xc_functionals.py:50-107). The DFT
# side needs the SHORT-RANGE part of a GGA exchange under the
# 1/r = erf(ωr)/r + erfc(ωr)/r split; the exact-exchange side needs
# K matrices built from erf-attenuated ERIs (apps/est.py eri_tensor /
# DFTensors with omega=).


def _erf(x, xp):
    if xp is np:
        from scipy.special import erf as _serf
        return _serf(x)
    return jax.scipy.special.erf(x)


def _sr_lda_factor(a, xp=jnp):
    """Exact erfc-kernel attenuation of the LDA exchange hole:

    F(a) = 1 − (8/3)a[√π erf(1/2a) − 3a + 4a³ + (2a − 4a³)e^{−1/4a²}],
    a_σ = ω/(2 k_F,σ)

    [Gill/Adamson; Savin's erf split]. This suite validates F against a
    direct numerical integral of the uniform-gas exchange hole
    −(9ρ/2)(j₁(k_F u)/k_F u)² × erfc(ωu)/u (tests/test_rsh_xc.py) — an
    oracle independent of the closed form. Large-a branch: the exact
    expression cancels catastrophically in f32 (4a³ terms vs F ~ 1/36a²),
    so a > 3/2 switches to the asymptotic series
    1/(36a²) − 1/(960a⁴) + 1/(26880a⁶), whose leading term is pinned by
    the on-top hole sum rule E_x^SR → −πρ_σ²/2ω² (rel. err ~1e-6 at the
    switch point)."""
    a_lo = xp.minimum(a, 1.5)
    exact = 1.0 - (8.0 / 3.0) * a_lo * (
        np.sqrt(np.pi) * _erf(1.0 / (2.0 * a_lo), xp)
        - 3.0 * a_lo + 4.0 * a_lo ** 3
        + (2.0 * a_lo - 4.0 * a_lo ** 3) * xp.exp(-1.0 / (4.0 * a_lo ** 2)))
    a_hi = xp.maximum(a, 1.5)
    ia2 = 1.0 / (a_hi * a_hi)
    asym = ia2 * (1.0 / 36.0 + ia2 * (-1.0 / 960.0 + ia2 / 26880.0))
    return xp.where(a > 1.5, asym, exact)


def _x_spin_b88(r, s, xp):
    """B88 exchange energy density of ONE spin channel (ρ_σ, σ_σσ)."""
    r = xp.maximum(r, 1e-30)
    r43 = r ** (4.0 / 3.0)
    beta = 0.0042
    x = xp.sqrt(xp.maximum(s, 1e-35)) / r43
    return (-_CX * 2.0 ** (1.0 / 3.0) * r43
            - beta * r43 * x * x / (1.0 + 6.0 * beta * x * xp.arcsinh(x)))


def _x_spin_pbe(r, s, xp):
    """PBE exchange energy density of ONE spin channel (spin-scaled)."""
    return 0.5 * _pbe_x_spin(2.0 * r, 4.0 * s, xp)


def f_gga_sr_x(x_spin, omega):
    """Short-range (erfc-kernel) part of a GGA exchange via the ITYH
    μ-dependent attenuation [Iikura–Tsuneda–Yanai–Hirao, JCP 115, 3540
    (2001)]: write e_xσ = −½ρ_σ^{4/3}K_σ, then attenuate with the exact
    LDA-hole factor evaluated at the GGA-modified momentum

        a_σ = ω√K_σ / (6√π ρ_σ^{1/3})

    (for K_Slater this reduces exactly to a = ω/2k_F). This is the SR
    model libxc/Gaussian use for CAM-B3LYP's B88 complement; LC-wPBE/
    HSE06 use the Henderson–Janesko–Scuseria ωPBE hole (f_wpbe_sr_x
    below) as the reference does."""

    def f(ra, rb, saa, sab, sbb, xp=jnp):
        def one(r, s):
            e = x_spin(r, s, xp)
            r_c = xp.maximum(r, 1e-30)
            k = xp.maximum(-2.0 * e / r_c ** (4.0 / 3.0), 1e-12)
            a = omega * xp.sqrt(k) / (6.0 * np.sqrt(np.pi)
                                      * r_c ** (1.0 / 3.0))
            return e * _sr_lda_factor(a, xp)

        return one(ra, saa) + one(rb, sbb)

    return f


# -------- HJS ωPBE short-range exchange (the wPBE hole) --------
#
# Henderson–Janesko–Scuseria, JCP 128, 194105 (2008): model exchange
# hole  J(s,y) = [−A/y²·1/(1+(4/9)Ay²) + (A/y² + B + C·f(s)·y²
# + E·g(s)·y⁴)e^{−Dy²}]e^{−s²H(s)y²},  y = k_F u, whose erfc(νy)-
# attenuated moment integrates in closed form.  This is the SR-GGA
# exchange libxc/Gaussian/Psi4 use for HSE06 and LC-wPBE
# (≙ cuEST cuest_scf_examples xc_functionals 'hse06'/'lc-wpbe').
#
# COEFFICIENT PROVENANCE (zero-egress image — no libxc oracle): every
# constant below is VALIDATED against the model's own defining
# constraints rather than trusted as a transcription
# (tests/test_rsh_xc.py::test_hjs_*):
#   · A…D + the closed form reproduce F(0,0) = 1 to 2e-7 (hole
#     normalization at ζ=0) with the y⁴ coefficient `eg` ELIMINATED
#     analytically by the normalization sum rule (so the paper's E is
#     not even needed as an input);
#   · the ν-structure at s=0 matches the exact erfc-attenuated LDA
#     factor (_sr_lda_factor) to the model's own fit grade: 2e-7
#     relative as ν→0, 6e-9 as ν→∞ (both limits are exact
#     constraints), ≤3.2e-3 absolute in between (the intrinsic
#     accuracy of the A…E LDA-hole fit, present in every HJS
#     implementation);
#   · H(s) is DEFINED by F(s, ν=0) ≡ F_x^PBE(s); solving that scalar
#     equation for ζ = s²H on a dense s-grid and comparing shows the
#     Padé below tracks the exact solution to ≤1.9e-4 in F_x over
#     s ∈ [0, 8.5] — i.e. the [7/9] rational fit of the paper's
#     Table, reproduced to its published fit quality; its small-s
#     limit carries F″(0)/2 = 0.21953 ≈ μ_PBE = 0.219515.

_HJS_A, _HJS_B, _HJS_C, _HJS_D = 0.757211, -0.106364, -0.118649, 0.609650
_HJS_P = (0.0159941, 0.0852995, -0.160368, 0.152645, -0.0971263,
          0.0422061)
_HJS_Q = (5.33319, -12.4780, 11.0988, -5.11013, 1.71468, -0.610380,
          0.307555, -0.0770547, 0.0334840)


def _hjs_fx(s, nu, xp):
    """SR enhancement factor F^{HJS}(s, ν) of the ωPBE hole; ν = ω/k_F.

    Autodiff-safe: P, Q > 0 on all of [0, ∞) (checked to s = 1e4), so
    √ζ is computed as s²√(P/Q) (no 1/√0 cotangents at s → 0), s is
    saturated at 1e3 (ζ, and hence F, is constant there) to keep the
    s⁹ polynomial inside f32 range, and the log arguments are bounded
    below by ν > 0."""
    s = xp.minimum(s, 1e3)
    s2 = s * s
    p = _HJS_P[-1]
    for c in reversed(_HJS_P[:-1]):
        p = p * s + c
    q = _HJS_Q[-1]
    for c in reversed(_HJS_Q[:-1]):
        q = q * s + c
    q = 1.0 + s * q
    h = p / q
    zeta = s2 * s2 * h                 # ζ = s²H(s) ≥ 0
    sqz = s2 * xp.sqrt(h)              # √ζ without a √0 autodiff wall
    eta = _HJS_A + zeta
    lam = _HJS_D + zeta
    cf = _HJS_C - s2 / (27.0 * (1.0 + 0.25 * s2)) - 0.5 * zeta
    # y⁴ coefficient from the hole-normalization sum rule (exact):
    eg = (-0.4 * cf * lam - (4.0 / 15.0) * _HJS_B * lam * lam
          - 1.2 * _HJS_A * lam ** 3
          - 0.8 * np.sqrt(np.pi) * lam ** 3.5
          - 2.4 * lam ** 3.5 * (sqz - xp.sqrt(eta)))
    nu2 = nu * nu
    chi = nu / xp.sqrt(lam + nu2)
    chi3 = chi * chi * chi
    chi5 = chi3 * chi * chi
    szn = xp.sqrt(zeta + nu2)
    sen = xp.sqrt(eta + nu2)
    sln = xp.sqrt(lam + nu2)
    return (_HJS_A
            - (4.0 / 9.0) * _HJS_B / lam * (1.0 - chi)
            - (4.0 / 9.0) * cf / (lam * lam)
            * (1.0 - 1.5 * chi + 0.5 * chi3)
            - (8.0 / 9.0) * eg / lam ** 3
            * (1.0 - 1.875 * chi + 1.25 * chi3 - 0.375 * chi5)
            + 2.0 * nu * (szn - sen)
            + 2.0 * zeta * xp.log((nu + szn) / (nu + sln))
            - 2.0 * eta * xp.log((nu + sen) / (nu + sln)))


def f_wpbe_sr_x(omega):
    """Short-range ωPBE exchange through the HJS hole (the functional
    Gaussian/Psi4 call 'wPBE' / libxc GGA_X_HJS_PBE): per spin channel,
    e_xσ^{SR} = ½ e_x^{LDA}(2ρ_σ) F^{HJS}(s_σ, ω/k_F(2ρ_σ)).
    ≙ the reference DFT table's hse06 / lc-wpbe / lc-wpbeh SR parts
    (cuEST cuest_scf_examples/cuest_scf/xc_functionals.py)."""

    def f(ra, rb, saa, sab, sbb, xp=jnp):
        def one(r, s):
            # double-where tail guard (same channel _x2_safe documents):
            # d(sred)/dρ ∝ ρ^{-7/3} overflows f32 reverse-mode at the
            # 1e-30 clamp floor, and the s-cap's zeroed cotangent turns
            # it into 0·∞ = NaN. ρ < 1e-7 contributes nothing at f32.
            good = r > 1e-7
            rr = xp.where(good, r, 1.0)
            ss = xp.where(good, s, 0.0)
            r2 = 2.0 * rr
            kf = (3.0 * np.pi ** 2 * r2) ** (1.0 / 3.0)
            e_lda = -3.0 * kf / (8.0 * np.pi) * r2   # ½·e_x^LDA(2ρσ)
            sred = xp.sqrt(xp.maximum(4.0 * ss, 1e-35)) / r2 / (2.0 * kf)
            return xp.where(good, e_lda * _hjs_fx(sred, omega / kf, xp),
                            0.0)

        return one(ra, saa) + one(rb, sbb)

    return f


# ---------------- B97 power-series functionals ----------------

def _b97_series(x2, gamma, coeffs, xp):
    """Becke-97 inhomogeneity expansion g(u) = Σ_i c_i u^i with
    u = γx²/(1+γx²) [Becke, JCP 107, 8554 (1997)]."""
    u = gamma * x2 / (1.0 + gamma * x2)
    out = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        out = out * u + c
    return out


def _x2_safe(r, s, xp):
    """x_σ² = σ_σσ/ρ_σ^{8/3}, f32-autodiff-safe.

    The raw quotient NaNs under f32 reverse-mode at clamped tail
    densities: dx²/dρ = −(8/3)σ/ρ^{11/3} overflows to ∞ exactly where
    du/dx² = γ/(1+γx²)² underflows to 0, and 0·∞ = NaN poisons the whole
    V_xc matrix (observed as eigh nonconvergence in wB97X SCF). Cure =
    the same double-where pattern as xc_local_eval (benign inputs inside
    the dead region) plus a cap.

    Note the cap alone is NOT enough: min()'s select zeroes the
    cotangent but the division VJP still multiplies it by −σ/ρ^{16/3},
    and 0·∞ = NaN. Every PARTIAL has to stay finite: go through
    x = √σ/ρ^{4/3} (partials ≤ √σ/ρ^{8/3}, bounded for ρ > 1e-7 at any
    physical σ) and square the capped x."""
    good = r > 1e-7
    r43 = xp.where(good, r, 1.0) ** (4.0 / 3.0)
    q = xp.sqrt(xp.maximum(xp.where(good, s, 0.0), 1e-35))
    x = xp.minimum(q / r43, 1e6)
    return xp.where(good, x * x, 0.0)


def _ec_pw92_stoll(ra, rb, xp):
    """Stoll partition of PW92 correlation into same-spin and
    opposite-spin energy densities: e_σσ = ρ_σ ε(ρ_σ, ζ=1),
    e_αβ = ρ ε(ρ, ζ) − e_αα − e_ββ."""
    def e_pol(r):
        # double-where tail guard: the global xc_local_eval clamp only
        # bounds the TOTAL density; a spin channel can sit at the 1e-30
        # floor where drs/dρ = O(ρ^{-4/3}) overflows f32 reverse-mode
        good = r > 1e-10
        r_s = xp.where(good, r, 1.0)
        rs = (3.0 / (4.0 * np.pi * r_s)) ** (1.0 / 3.0)
        return xp.where(good, r_s * _pw92_eps(rs, 1.0 - 1e-15, xp), 0.0)

    rho = xp.maximum(ra + rb, 1e-30)
    zeta = xp.clip((ra - rb) / rho, -1.0 + 1e-15, 1.0 - 1e-15)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    e_aa = e_pol(ra)
    e_bb = e_pol(rb)
    e_ab = rho * _pw92_eps(rs, zeta, xp) - e_aa - e_bb
    return e_aa, e_bb, e_ab


def _f_b97_c(css, cos_, xp, ra, rb, saa, sbb):
    """B97-family correlation: series-modulated Stoll-partitioned PW92
    (γ_ss = 0.2, γ_os = 0.006, Becke 1997 Eqs. 5–8)."""
    xa2 = _x2_safe(ra, saa, xp)
    xb2 = _x2_safe(rb, sbb, xp)
    e_aa, e_bb, e_ab = _ec_pw92_stoll(ra, rb, xp)
    return (e_aa * _b97_series(xa2, 0.2, css, xp)
            + e_bb * _b97_series(xb2, 0.2, css, xp)
            + e_ab * _b97_series(0.5 * (xa2 + xb2), 0.006, cos_, xp))


def _f_b97_x(cx, omega, xp, ra, rb, saa, sbb):
    """B97-family exchange: per-spin LSDA (short-range LSDA when ω>0,
    via the exact erfc-hole factor — the wB97 construction of Chai &
    Head-Gordon, JCP 128, 084106 (2008)) × the g_x series (γ_x = 0.004)."""
    def one(r, s):
        x2 = _x2_safe(r, s, xp)
        r = xp.maximum(r, 1e-30)
        g = _b97_series(x2, 0.004, cx, xp)
        e_lda = -0.5 * (3.0 / 2.0) * (6.0 / np.pi) ** (1.0 / 3.0) \
            * r ** (4.0 / 3.0)
        if omega:
            kf = (6.0 * np.pi ** 2 * r) ** (1.0 / 3.0)
            e_lda = e_lda * _sr_lda_factor(omega / (2.0 * kf), xp)
        return e_lda * g

    return one(ra, saa) + one(rb, sbb)


# Parameter provenance: B97 from Becke JCP 107, 8554 (1997) Table I
# (transcribed; classic values, also the reference's 'B97' id); wB97X
# from Chai & Head-Gordon JCP 128, 084106 (2008) Table 1 (transcribed —
# zero-egress environment, validated structurally: c_x0 + c_HF,SR = 1 by
# the paper's exactness constraint, u→0 LDA limits in tests).
_B97_PARAMS = {
    "b97": dict(cx=(0.8094, 0.5073, 0.7481), omega=0.0,
                css=(0.1737, 2.3487, -2.4868),
                cos=(0.9454, 0.7471, -4.5961)),
    "wb97x": dict(cx=(0.842294, 0.726479, 1.04760, -5.70635, 13.2794),
                  omega=0.3,
                  css=(1.000000, -4.33879, 18.2308, -31.7430, 17.2901),
                  cos=(1.000000, -2.37031, 14.3055, -30.4251, 15.9042)),
    # wB97X-V [Mardirossian & Head-Gordon, PCCP 16, 9904 (2014)]: the
    # 10-parameter GGA + VV10 member of the -V family (NOT a meta-GGA);
    # SR-HF α = 0.167 (UEG: c_x0 + α = 1 exactly), LR-HF 1.0, ω = 0.3,
    # VV10 b = 6.0, C = 0.01 (auto-enabled via _NLC_DEFAULTS).
    "wb97x-v": dict(cx=(0.833, 0.603, 1.194), omega=0.3,
                    css=(0.556, -0.257),
                    cos=(1.219, -1.850)),
}


def _f_b97(name):
    p = _B97_PARAMS[name]

    def f(ra, rb, saa, sab, sbb, xp=jnp):
        return (_f_b97_x(p["cx"], p["omega"], xp, ra, rb, saa, sbb)
                + _f_b97_c(p["css"], p["cos"], xp, ra, rb, saa, sbb))

    return f


def _f_cam_b3lyp(ra, rb, saa, sab, sbb, xp=jnp):
    """CAM-B3LYP DFT part [Yanai–Tew–Handy, CPL 393, 51 (2004)]:
    exchange complement (1−α−β)·B88 + β·B88^{SR-ITYH}(μ=0.33) with
    α = 0.19, β = 0.46, plus B3LYP's 0.19 VWN5 + 0.81 LYP correlation.
    The Fock side adds −[0.19 K + 0.46 K_LR(0.33)] (rs_params)."""
    return (0.35 * f_b88_x(ra, rb, saa, sab, sbb, xp)
            + 0.46 * _F_B88_SR_CAM(ra, rb, saa, sab, sbb, xp)
            + 0.19 * f_vwn5_c(ra, rb, xp)
            + 0.81 * f_lyp_c(ra, rb, saa, sab, sbb, xp))


_F_B88_SR_CAM = f_gga_sr_x(_x_spin_b88, 0.33)
_F_PBE_SR_HSE = f_wpbe_sr_x(0.11)
_F_PBE_SR_LCW = f_wpbe_sr_x(0.40)
_F_PBE_SR_LCWH = f_wpbe_sr_x(0.20)


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
    # dtype-aware polarization clip: 1−1e-15 rounds to EXACTLY 1.0 in
    # f32, and PBE's spin-scaling factor has dφ/dζ ~ (1∓ζ)^{-1/3} → ∞
    # there — fully-polarized grid points NaN'd the f32 V_xc under UKS.
    # 3e-7 stays representable in f32 (spacing 1.2e-7 at 1.0); the f64
    # host energy path keeps the tight clip.
    zeps = 1e-15 if getattr(ra, "dtype", None) == np.float64 else 3e-7
    zeta = xp.clip((ra - rb) / rho, -1.0 + zeps, 1.0 - zeps)
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
    # ---- range-separated hybrids (DFT complement; HF side in rs_params)
    # generic complement rule: E_x^DFT = (1−α−β)·E_x + β·E_x^{SR}(ω)
    "cam-b3lyp": ("gga", _f_cam_b3lyp),
    # HSE06: PBE − 0.25·wPBE^{SR}(0.11) exchange + full PBE correlation
    # (≙ 0.75 ωPBE-SR + PBE-LR), screened exchange α=0.25 SR-only.
    # The SR-GGA hole for hse06 / lc-wpbe / lc-wpbeh is the true
    # Henderson-Janesko-Scuseria wPBE hole (f_wpbe_sr_x above) —
    # every coefficient validated against the model's own defining
    # constraints (see the provenance note at _HJS_A).
    "hse06": ("gga", lambda ra, rb, saa, sab, sbb, xp=jnp:
              f_pbe_x(ra, rb, saa, sab, sbb, xp)
              - 0.25 * _F_PBE_SR_HSE(ra, rb, saa, sab, sbb, xp)
              + f_pbe_c(ra, rb, saa, sab, sbb, xp)),
    # LC-wPBE: 100% SR-DFT / 100% LR-HF at ω=0.4
    "lc-wpbe": ("gga", lambda ra, rb, saa, sab, sbb, xp=jnp:
                _F_PBE_SR_LCW(ra, rb, saa, sab, sbb, xp)
                + f_pbe_c(ra, rb, saa, sab, sbb, xp)),
    # LC-wPBEh: 20% global HF + 80% SR-DFT, full LR-HF at ω=0.2
    # [Rohrdanz–Martin–Herbert, JCP 130, 054112 (2009)]
    "lc-wpbeh": ("gga", lambda ra, rb, saa, sab, sbb, xp=jnp:
                 0.8 * _F_PBE_SR_LCWH(ra, rb, saa, sab, sbb, xp)
                 + f_pbe_c(ra, rb, saa, sab, sbb, xp)),
    "b97": ("gga", _f_b97("b97")),
    "wb97x": ("gga", _f_b97("wb97x")),
    "wb97x-v": ("gga", _f_b97("wb97x-v")),
}

# meta-GGA (τ-dependent) tier — apps/mgga.py evaluates the kinetic
# density channel; registered here so every driver (XCIntegrator,
# exc_only, xcgrad, apps.distributed) dispatches on kind="mgga".
# ≙ the reference ids r2SCAN / M06-L / M06 / M06-2X / B97M-V / wB97M-V
# (test_dft_energies.py:76-117).
from tpumathlib.apps import mgga as _mgga  # noqa: E402 (needs the defs above)

_FUNCTIONALS.update({
    "r2scan": ("mgga", _mgga.f_r2scan),
    "m06-l": ("mgga", _mgga.f_m06l),
    "m06": ("mgga", _mgga.f_m06),
    "m06-2x": ("mgga", _mgga.f_m062x),
    "b97m-v": ("mgga", _mgga.f_b97mv),
    "wb97m-v": ("mgga", _mgga.f_wb97mv),
})

# -V functionals carry VV10 nonlocal correlation BY DEFINITION: the SCF
# drivers auto-enable it with these (b, C) unless the caller overrides
# nlc explicitly (nlc=False disables).
_NLC_DEFAULTS = {
    "b97m-v": (6.0, 0.01),
    "wb97m-v": (6.0, 0.01),
    "wb97x-v": (6.0, 0.01),
}

# exact-exchange (HF) fraction mixed into the Kohn–Sham Fock matrix for
# hybrid functionals (uhf/rks apply −a0·K_σ and the matching energy term)
_HYBRID_EXX = {"b3lyp": 0.20, "b3lyp5": 0.20, "pbe0": 0.25, "b97": 0.1943,
               "m06": 0.27, "m06-2x": 0.54}

# range-separated hybrids: K_eff = α·K_full + β·K_LR(ω) with K_LR built
# from erf(ωr₁₂)/r₁₂ ERIs (est.eri_tensor(omega=) / DFTensors(omega=)).
# ≙ the reference XC plan's (exchange_scale, lrc_exchange_scale,
# lrc_omega) triple (cuest_scf/rhf.py:260-262). Screened hybrids use
# β<0 (SR-HF = full − LR); LC hybrids β>0.
_RS_HYBRIDS = {
    "cam-b3lyp": (0.19, 0.46, 0.33),     # Yanai–Tew–Handy 2004
    "hse06": (0.25, -0.25, 0.11),        # 0.25·K_SR, ω=0.11
    "lc-wpbe": (0.0, 1.0, 0.40),         # Vydrov–Scuseria 2006
    "lc-wpbeh": (0.2, 0.8, 0.20),        # 0.2·K_SR + 1.0·K_LR
    "wb97x": (0.157706, 0.842294, 0.3),  # α·K_SR + 1.0·K_LR, Chai–HG
    "wb97x-v": (0.167, 0.833, 0.3),      # Mardirossian–HG 2014
    "wb97m-v": (0.15, 0.85, 0.3),        # Mardirossian–HG 2016
}


def hybrid_exx(xc: str | None) -> float:
    """Full-range exact-exchange fraction of a registered functional
    (0 for pure functionals; the α of rs_params for RSH)."""
    return rs_params(xc)[0]


def rs_params(xc: str | None):
    """(α, β, ω) of the exchange mix K_eff = α·K + β·K_LR(ω).

    ≙ the reference's exchange_scale / lrc_exchange_scale / lrc_omega
    XC-plan parameters consumed by its DF plan
    (cuest_scf/rhf.py:255-263, cuest_df_int_plan.py)."""
    xc = xc.lower() if xc else xc
    if xc in _RS_HYBRIDS:
        return _RS_HYBRIDS[xc]
    return (_HYBRID_EXX.get(xc, 0.0) if xc else 0.0, 0.0, 0.0)


# ---------------- XC integration on device ----------------

def xc_local_eval(kind, f, ao, grad, w, da, db):
    """One quadrature block → (E_xc, V_a, V_b). Pure in (ao, grad, w, da,
    db), so it serves both the single-device `XCIntegrator.evaluate` and
    the grid-sharded `apps.distributed` path (each device evaluates its
    own grid points; the contributions are additive over points).

    All density/potential contractions pin precision=HIGHEST: at MXU
    DEFAULT the f32 operands are demoted to bf16, and τ-dependent
    functionals amplify the resulting ~1e-3 density error far beyond
    the f32 SCF budget (measured on chip: r2SCAN He drifted 1.3e-3
    rel at DEFAULT, clean at HIGHEST; grid einsums are a negligible
    fraction of the Fock-build FLOPs so HIGHEST is free here)."""
    _HI = jax.lax.Precision.HIGHEST
    if kind == "lda":
        dens = (jnp.einsum("gm,mn,gn->g", ao, da, ao, precision=_HI),
                jnp.einsum("gm,mn,gn->g", ao, db, ao, precision=_HI))
        gra = grb = None
    else:
        ra = jnp.einsum("gm,mn,gn->g", ao, da, ao, precision=_HI)
        rb = jnp.einsum("gm,mn,gn->g", ao, db, ao, precision=_HI)
        gra = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad, da, ao, precision=_HI)
        grb = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad, db, ao, precision=_HI)
        dens = (ra, rb,
                jnp.einsum("xg,xg->g", gra, gra, precision=_HI),
                jnp.einsum("xg,xg->g", gra, grb, precision=_HI),
                jnp.einsum("xg,xg->g", grb, grb, precision=_HI))
        if kind == "mgga":
            # kinetic-energy density τ_σ = ½ Σ_x ∇φ·D_σ·∇φ
            dens = dens + (
                0.5 * jnp.einsum("xgm,mn,xgn->g", grad, da, grad,
                                 precision=_HI),
                0.5 * jnp.einsum("xgm,mn,xgn->g", grad, db, grad,
                                 precision=_HI))

    def etot(*d):
        # double-where guard: clamp the functional's inputs BEFORE
        # evaluating it so autodiff never sees the rho→0 singularities
        # (0·∞ = NaN otherwise; the masked value path alone does not
        # protect the gradient)
        good = d[0] + d[1] > 1e-8
        safe = list(jnp.where(good, x, 1.0) for x in d)
        # per-spin floor: the total-density guard still lets ONE spin
        # channel sit at ~0 next to a large other spin (any radical),
        # where ρ_σ^{-4/3}-type partials overflow f32 and poison V_xc
        # with 0·∞ = NaN (bit us for every GGA under UKS). The floor
        # changes the energy by O(1e-13)·grid but bounds every partial.
        safe[0] = jnp.maximum(safe[0], 1e-10)
        safe[1] = jnp.maximum(safe[1], 1e-10)
        return jnp.sum(jnp.where(good, w * f(*safe, xp=jnp), 0.0))

    exc = etot(*dens)
    derivs = jax.grad(etot, argnums=tuple(range(len(dens))))(*dens)
    vra, vrb = derivs[0], derivs[1]
    va = jnp.einsum("g,gm,gn->mn", vra, ao, ao, precision=_HI)
    vb = jnp.einsum("g,gm,gn->mn", vrb, ao, ao, precision=_HI)
    if kind in ("gga", "mgga"):
        vsaa, vsab, vsbb = derivs[2], derivs[3], derivs[4]
        # dE/dD_a via chain rule on σ terms: 2 vsaa ∇ρa + vsab ∇ρb
        # (gra/grb reused from the density build above)
        ta = 2.0 * vsaa[None] * gra + vsab[None] * grb
        tb = 2.0 * vsbb[None] * grb + vsab[None] * gra
        cross = jnp.einsum("xg,xgm,gn->mn", ta, grad, ao, precision=_HI)
        va = va + cross + cross.T
        crossb = jnp.einsum("xg,xgm,gn->mn", tb, grad, ao, precision=_HI)
        vb = vb + crossb + crossb.T
    if kind == "mgga":
        # τ channel: ∂τ_σ/∂D_mn = ½ Σ_x ∇φm·∇φn
        vta, vtb = derivs[5], derivs[6]
        va = va + 0.5 * jnp.einsum("g,xgm,xgn->mn", vta, grad, grad,
                                   precision=_HI)
        vb = vb + 0.5 * jnp.einsum("g,xgm,xgn->mn", vtb, grad, grad,
                                   precision=_HI)
    return exc, va, vb


class XCIntegrator:
    """Grid + AO matrices held on device; per-iteration density → (E_xc,
    V_a, V_b) as einsum contractions + autodiff functional derivatives
    (≙ local_xc_potential/run.py's xc-potential-on-grid flow)."""

    def __init__(self, shells, mol: Molecule, xc: str = "svwn",
                 n_rad: int = 60, n_theta: int = 12, n_phi: int = 24):
        xc = xc.lower()
        self.kind, self.f = _FUNCTIONALS[xc]
        self.hyb, self.lr_beta, self.lr_omega = rs_params(xc)
        pts, w = molecular_grid(mol, n_rad, n_theta, n_phi)
        self.w_np = w
        if self.kind in ("gga", "mgga"):
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
            if self.kind in ("gga", "mgga"):
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
        if self.kind == "mgga":
            ta = 0.5 * xp.einsum("xgm,mn,xgn->g", grad, da, grad)
            tb = 0.5 * xp.einsum("xgm,mn,xgn->g", grad, db, grad)
            return (ra, rb, saa, sab, sbb, ta, tb)
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
    # range-separated hybrids: a second ERI/DF set for the long-range
    # erf(ωr₁₂)/r₁₂ kernel feeds β·K_LR (≙ the reference DF plan's
    # lrc_exchange_scale/lrc_omega channel, cuest_df_int_plan.py)
    df_lr = eri_lr = None
    if xci is not None and xci.lr_beta:
        if density_fit:
            df_lr = DFTensors(shells, aux=aux, omega=xci.lr_omega)
        else:
            eri_lr_np = eri_tensor(shells, omega=xci.lr_omega)
            if c_t is not None:
                eri_lr_np = np.einsum("im,jn,mnls->ijls", c_t, c_t,
                                      eri_lr_np)
                eri_lr_np = np.einsum("kl,hs,ijls->ijkh", c_t, c_t,
                                      eri_lr_np)
            eri_lr = jnp.asarray(eri_lr_np)
    # -V functionals (B97M-V/wB97M-V/wB97X-V) carry VV10 by definition:
    # auto-enable with the published (b, C) unless the caller overrides
    # (nlc=False runs the local part only, nlc=(b, C) re-parameterizes)
    if nlc is None and xc and xc.lower() in _NLC_DEFAULTS:
        nlc = _NLC_DEFAULTS[xc.lower()]
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

    def build_kx(d):
        """Hybrid exact-exchange matrix α·K + β·K_LR(ω) for one spin."""
        dj = jnp.asarray(d)
        k = np.zeros_like(hcore)
        if xci.hyb:
            k_full = (df.exchange(dj) if density_fit
                      else jnp.einsum("mlns,ls->mn", eri, dj))
            k = k + xci.hyb * np.asarray(k_full, np.float64)
        if xci.lr_beta:
            k_lr = (df_lr.exchange(dj) if density_fit
                    else jnp.einsum("mlns,ls->mn", eri_lr, dj))
            k = k + xci.lr_beta * np.asarray(k_lr, np.float64)
        return k

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
            if xci.hyb or xci.lr_beta:
                # hybrid functional: −K_x,σ in the Fock, −½Tr(D·K_x) in
                # the energy, K_x = α·K + β·K_LR (global hybrids have
                # β=0; RSH/screened hybrids add the erf-kernel term)
                ka = build_kx(da)
                kb = build_kx(db)
                fa -= ka
                fb -= kb
                e -= 0.5 * float(np.sum(da * ka) + np.sum(db * kb))
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
        if xci.lr_beta:
            if eri_lr is None:
                ka = np.asarray(df_lr.exchange(jnp.asarray(da)), np.float64)
                kb = np.asarray(df_lr.exchange(jnp.asarray(db)), np.float64)
            else:
                ka = np.einsum("mlns,ls->mn", eri_lr_np, da)
                kb = np.einsum("mlns,ls->mn", eri_lr_np, db)
            e -= 0.5 * xci.lr_beta * float(np.sum(da * ka) + np.sum(db * kb))
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

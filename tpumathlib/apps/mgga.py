"""Meta-GGA (τ-dependent) exchange-correlation functionals.

≙ the reference DFT parity surface
/root/reference/cuEST/cuest_scf_examples/test/dft_energies/test_dft_energies.py:76-117,
whose functional table includes the meta-GGAs r2SCAN, M06-L, M06,
M06-2X, B97M-V, wB97M-V (and the GGA+VV10 wB97X-V). This module
provides those energy densities; apps/xc.py registers them under
kind="mgga" and evaluates the kinetic-energy density channel
τ_σ = ½ Σ_i |∇ψ_iσ|² = ½ Σ_x ∇φ·D_σ·∇φ on the quadrature grid.

All functionals take SPIN quantities
    f(ra, rb, saa, sab, sbb, ta, tb, xp)
and return an energy density per volume, exactly like the GGA tier, so
the autodiff machinery of xc.xc_local_eval provides V_xc (including
the ∂f/∂τ channel) with no per-functional derivative code.

Parameter provenance (zero-egress environment — no libxc/PySCF oracle
in the image): equations and constants are transcribed from the
defining papers. Structural exactness constraints are asserted in
tests/test_mgga.py — the r2SCAN interpolation polynomials satisfy
f_x(1) = f_c(1) = 0 analytically; every Minnesota coefficient table
reproduces its UEG normalization (a0+d0 = 1−X_HF exactly); the -V
family's UEG constraint c_x(0,0)+α = 1 holds. The r2SCAN
gradient-expansion-restoration terms (C_2x, Δy) and the B97M-V/wB97M-V
power-series tables carry transcription uncertainty that cannot be
cross-checked in-image; the FORMS are exact and `make_b97m` lets a
user instantiate the series with their own table.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpumathlib.apps.xc import (
    _CX, _b97_series, _ec_pw92_stoll, _pbe_x_spin, _pw92_eps,
    _sr_lda_factor, _x2_safe)

# per-spin UEG kinetic density (τ = ½Σ|∇ψ|² convention):
#   τ_σ^{UEG} = (3/10)(6π²)^{2/3} ρ_σ^{5/3}
_CF_POL = 0.3 * (6.0 * np.pi ** 2) ** (2.0 / 3.0)
# VS98's z-offset constant (z = 2τ/ρ^{5/3} − C_F, their τ has no ½)
_CF_VS98 = 0.6 * (6.0 * np.pi ** 2) ** (2.0 / 3.0)


def _tau_safe(t, xp):
    return xp.maximum(t, 1e-12)


def _w_meta(r, t, xp):
    """Becke w_σ = (t−1)/(t+1), t = τ_σ^{UEG}/τ_σ — division-free form
    w = (τ_ueg − τ)/(τ_ueg + τ) ∈ [−1, 1], f32-autodiff-safe."""
    tu = _CF_POL * xp.maximum(r, 1e-30) ** (5.0 / 3.0)
    t = _tau_safe(t, xp)
    return (tu - t) / (tu + t)


def _z_safe(r, t, xp):
    """VS98 z_σ = 2τ_σ/ρ_σ^{5/3} − C_F, bounded for f32 autodiff (the
    raw quotient overflows cubed inside γ³ at clamped tail densities)."""
    good = r > 1e-7
    r53 = xp.where(good, r, 1.0) ** (5.0 / 3.0)
    z = xp.minimum(2.0 * _tau_safe(t, xp) / r53, 1e6)
    return xp.where(good, z - _CF_VS98, 0.0)


# ---------------- r2SCAN [Furness–Kaplan–Ning–Perdew–Sun, JPCL 11,
# 8208 (2020)] ----------------

_R2_ETA = 0.001
_R2_CETA = 20.0 / 27.0 + 5.0 * _R2_ETA / 3.0
_R2_DP2 = 0.361
_R2_K0, _R2_K1 = 0.174, 0.065
_R2_MU = 10.0 / 81.0
_R2_C2X = -0.162742          # = k0·f_x'(1): cancels the rSCAN GE2
# exchange artifact (tests assert C2X = k0·f'(1) to 6 digits)
_R2_C1X, _R2_C2XE, _R2_DX = 0.667, 0.8, 1.24
_FX_POLY = np.array([1.0, -0.667, -0.4445555, -0.663086601049,
                     1.451297044490, -0.887998041597, 0.234528941479,
                     -0.023185843322])
_FC_POLY = np.array([1.0, -0.64, -0.4352, -1.535685604549,
                     3.061560252175, -1.915710236206, 0.516884468372,
                     -0.051848879792])
_R2_C2C, _R2_DC = 1.5, 0.7
# correlation α=0 limit constants and GE2c restoration
_R2_B1C, _R2_B2C, _R2_B3C = 0.0285764, 0.0889, 0.125541
_R2_CHI = 0.128026
_R2_GAMMA = (1.0 - np.log(2.0)) / np.pi ** 2
_R2_DFC2 = float(sum(i * c for i, c in enumerate(_FC_POLY)))  # f_c'(1)


def _r2_interp(alpha, poly, c2, d, xp):
    """SCAN-class interpolation f(α̃): degree-7 polynomial on [0, 2.5],
    −d·exp(c2/(1−α̃)) beyond (double-where so autodiff never sees the
    exp pole at α̃=1 from the dead branch)."""
    a = xp.minimum(alpha, 2.5)
    f_poly = poly[7]
    for c in poly[6::-1]:
        f_poly = f_poly * a + c
    a_hi = xp.maximum(alpha, 2.5 + 1e-6)
    f_exp = -d * xp.exp(c2 / (1.0 - a_hi))
    return xp.where(alpha <= 2.5, f_poly, f_exp)


def _r2scan_x_channel(n, sig, tau, xp):
    """r2SCAN exchange energy density of one UNPOLARIZED density n
    (callers pass 2ρ_σ, 4σ_σσ, 2τ_σ — the spin-scaling relation).

    x is clamped ≥ 0: the transcribed GE2-restoration term
    C_η·C_2x·(1−α̃)·exp(−p²/d_{p2}⁴) can drive x below −k1 at
    (p→0, α̃ far from 1), where h1x has a pole; the clamp keeps h1x in
    [1, 1+k1] there and is inert at the UEG (x=0 → F=1 exactly) and in
    the GE2 regime (α̃≈1 → x≈μp ≥ 0)."""
    n = xp.maximum(n, 1e-30)
    n53 = n ** (5.0 / 3.0)
    kf = (3.0 * np.pi ** 2 * n) ** (1.0 / 3.0)
    ex_lda = -3.0 * kf / (4.0 * np.pi) * n
    s = xp.sqrt(xp.maximum(sig, 1e-35)) / n / (2.0 * kf)
    p = s * s
    tw = xp.maximum(sig, 0.0) / (8.0 * n)
    tu = 0.3 * (3.0 * np.pi ** 2) ** (2.0 / 3.0) * n53
    alpha = xp.maximum(tau - tw, 0.0) / (tu + _R2_ETA * tw)
    fx = _r2_interp(alpha, _FX_POLY, _R2_C2XE, _R2_DX, xp)
    damp = xp.exp(-xp.minimum(p, 1e3) ** 2 / _R2_DP2 ** 4)
    x = xp.maximum(_R2_MU * p
                   + _R2_CETA * _R2_C2X * (1.0 - alpha) * damp, 0.0)
    h1 = 1.0 + _R2_K1 * x / (_R2_K1 + x)
    h0 = 1.0 + _R2_K0
    gx = 1.0 - xp.exp(-4.9479 / xp.maximum(xp.sqrt(s), 1e-6))
    return ex_lda * (h1 + fx * (h0 - h1)) * gx


def _pw92_eps_drs(rs, zeta, xp):
    """(ε_c^{PW92}, ∂ε/∂r_s) — closed form (needed by r2SCAN's Δy on
    the numpy host path where jax.grad is unavailable)."""
    def g_and_d(rs, a, a1, b1, b2, b3, b4, p):
        srs = xp.sqrt(rs)
        q0 = -2.0 * a * (1.0 + a1 * rs)
        q1 = 2.0 * a * (b1 * srs + b2 * rs + b3 * rs * srs
                        + b4 * rs ** (p + 1.0))
        dq1 = a * (b1 / srs + 2.0 * b2 + 3.0 * b3 * srs
                   + 2.0 * (p + 1.0) * b4 * rs ** p)
        val = q0 * xp.log(1.0 + 1.0 / q1)
        dval = (-2.0 * a * a1 * xp.log(1.0 + 1.0 / q1)
                - q0 * dq1 / (q1 * (q1 + 1.0)))
        return val, dval

    e_p, de_p = g_and_d(rs, 0.031091, 0.21370, 7.5957, 3.5876, 1.6382,
                        0.49294, 1.0)
    e_f, de_f = g_and_d(rs, 0.015545, 0.20548, 14.1189, 6.1977, 3.3662,
                        0.62517, 1.0)
    alp, dalp = g_and_d(rs, 0.016887, 0.11125, 10.357, 3.6231, 0.88026,
                        0.49671, 1.0)
    alp, dalp = -alp, -dalp
    fz = (((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0)
           - 2.0) / (2.0 ** (4.0 / 3.0) - 2.0))
    d2f0 = 1.709920934161365
    eps = (e_p + alp * fz / d2f0 * (1.0 - zeta ** 4)
           + (e_f - e_p) * fz * zeta ** 4)
    deps = (de_p + dalp * fz / d2f0 * (1.0 - zeta ** 4)
            + (de_f - de_p) * fz * zeta ** 4)
    return eps, deps


def f_r2scan_c(ra, rb, saa, sab, sbb, ta, tb, xp=jnp):
    """r2SCAN correlation [JPCL 11, 8208 (2020), eqs. 14–29]."""
    rho = xp.maximum(ra + rb, 1e-30)
    zeps = 1e-15 if getattr(ra, "dtype", None) == np.float64 else 3e-7
    zeta = xp.clip((ra - rb) / rho, -1.0 + zeps, 1.0 - zeps)
    sigma = xp.maximum(saa + 2.0 * sab + sbb, 0.0)
    tau = _tau_safe(ta + tb, xp)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    kf = (3.0 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    s = xp.sqrt(xp.maximum(sigma, 1e-35)) / rho / (2.0 * kf)
    p = s * s
    phi = 0.5 * ((1.0 + zeta) ** (2.0 / 3.0) + (1.0 - zeta) ** (2.0 / 3.0))
    ds_z = 0.5 * ((1.0 + zeta) ** (5.0 / 3.0) + (1.0 - zeta) ** (5.0 / 3.0))
    tw = sigma / (8.0 * rho)
    tu = 0.3 * (3.0 * np.pi ** 2) ** (2.0 / 3.0) * rho ** (5.0 / 3.0) * ds_z
    alpha = xp.maximum(tau - tw, 0.0) / (tu + _R2_ETA * tw)
    fc = _r2_interp(alpha, _FC_POLY, _R2_C2C, _R2_DC, xp)

    # --- ε_c^0 (α̃ = 0, single-orbital limit)
    srs = xp.sqrt(rs)
    ec_lda0 = -_R2_B1C / (1.0 + _R2_B2C * srs + _R2_B3C * rs)
    w0 = xp.exp(-ec_lda0 / _R2_B1C) - 1.0
    ginf = (1.0 + 4.0 * _R2_CHI * p) ** (-0.25)
    h0 = _R2_B1C * xp.log(1.0 + w0 * (1.0 - ginf))
    dxz = 0.5 * ((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0))
    gc = (1.0 - 2.3631 * (dxz - 1.0)) * (1.0 - zeta ** 12)
    ec0 = (ec_lda0 + h0) * gc

    # --- ε_c^1 (α̃ = 1, PBE-like with r2SCAN's Δy GE2c restoration)
    eps1, deps1 = _pw92_eps_drs(rs, zeta, xp)
    gphi3 = _R2_GAMMA * phi ** 3
    w1 = xp.exp(-eps1 / gphi3) - 1.0
    beta_rs = 0.066725 * (1.0 + 0.1 * rs) / (1.0 + 0.1778 * rs)
    t2 = ((3.0 * np.pi ** 2 / 16.0) ** (2.0 / 3.0) * p
          / xp.maximum(phi * phi * rs, 1e-30))
    y = beta_rs / (_R2_GAMMA * xp.maximum(w1, 1e-12)) * t2
    # Δy (eq. 25): cancels the GE2 correlation artifact of the f_c
    # interpolation; δ_{fc2} = f_c'(1) computed from the polynomial.
    damp = xp.exp(-xp.minimum(p, 1e3) ** 2 / _R2_DP2 ** 4)
    dy = (_R2_DFC2 / (27.0 * gphi3 * ds_z * xp.maximum(w1, 1e-12))
          * (20.0 * rs * deps1 - 45.0 * _R2_ETA * (eps1 - ec0))
          * p * damp)
    g_y = (1.0 + 4.0 * xp.maximum(y - dy, 0.0)) ** (-0.25)
    h1 = gphi3 * xp.log(1.0 + w1 * (1.0 - g_y))
    ec1 = eps1 + h1

    return rho * (ec1 + fc * (ec0 - ec1))


def f_r2scan(ra, rb, saa, sab, sbb, ta, tb, xp=jnp):
    """r2SCAN exchange + correlation (spin-scaled exchange)."""
    ex = 0.5 * (_r2scan_x_channel(2.0 * ra, 4.0 * saa, 2.0 * ta, xp)
                + _r2scan_x_channel(2.0 * rb, 4.0 * sbb, 2.0 * tb, xp))
    return ex + f_r2scan_c(ra, rb, saa, sab, sbb, ta, tb, xp)


# ---------------- Minnesota M06 family [Zhao–Truhlar, TCA 120, 215
# (2008); JCP 125, 194101 (2006) for M06-L] ----------------

def _vs98_h(x2, z, d, alpha, xp):
    """VS98 rational form h(x², z) = d0/γ + (d1x² + d2z)/γ² +
    (d3x⁴ + d4x²z + d5z²)/γ³, γ = 1 + α(x² + z)."""
    g = 1.0 + alpha * (x2 + z)
    g2 = g * g
    return (d[0] / g + (d[1] * x2 + d[2] * z) / g2
            + (d[3] * x2 * x2 + d[4] * x2 * z + d[5] * z * z) / (g2 * g))


def _m06_wpow(w, a, xp):
    """f(w) = Σ_{i=0}^{11} a_i wⁱ (Horner)."""
    out = a[-1]
    for c in a[-2::-1]:
        out = out * w + c
    return out


# coefficient tables (Zhao–Truhlar). UEG normalizations asserted in
# tests: a0 + dx0 = 1 − X_HF; c0^{ss} + dss0 = c0^{os} + dos0 = 1.
#
# VALIDATION STATUS (tests/test_mgga.py, no external oracle in-image):
# * m06-l — validated: UEG exact, exchange integrates to the expected
#   LDA/PBE-weighted totals on He, the opposite-spin g/h pair shows the
#   designed mutual cancellation (g+h ≈ 1 at iso-orbital probe points),
#   and E_c(He) is negative and of PW92 magnitude.
# * m06 / m06-2x — exchange + X_HF fractions validated the same way;
#   their opposite-spin correlation (c, d) pairs FAIL the He oracle
#   (E_c > 0: the transcribed series do not show m06-l's designed
#   cancellation), indicating transcription corruption that cannot be
#   repaired in a zero-egress image. The ids are registered so the
#   reference surface exists, with this documented accuracy caveat;
#   prefer m06-l until the tables are re-pinned against libxc.
_M06_PARAMS = {
    "m06-l": dict(
        ax=(0.3987756, 0.2548219, 0.3923994, -2.103655, -6.302246,
            10.97188, 30.97273, -23.18489, -56.73480, 21.60364,
            34.21814, -9.049762),
        dx=(0.6012244, 0.004748822, -0.008635108, -0.000009308062,
            0.00004482811, 0.0),
        css=(0.5349466, 0.5396620, -31.61217, 51.49592, -29.19613),
        dss=(0.4650534, 0.1617589, 0.1833657, 0.0004692100,
             -0.004990573, 0.0),
        cos=(0.6042374, 177.6783, -251.3252, 76.35173, -12.55699),
        dos=(0.3957626, -0.5614546, 0.01403963, 0.0009831442,
             -0.003577176, 0.0),
        exx=0.0),
    "m06": dict(
        ax=(0.5877943, -0.1371776, 0.2682367, -2.515898, -2.978892,
            8.710679, 16.88195, -4.489724, -32.99983, -14.49050,
            20.43747, 12.56504),
        dx=(0.1422057, 0.0007370319, -0.01601373, 0.0, 0.0, 0.0),
        css=(0.5094055, -1.491085, 17.23922, -38.59018, 28.45044),
        dss=(0.4905945, -0.1437348, 0.2357824, 0.001871015,
             -0.003788963, 0.0),
        cos=(3.741539, 218.7098, -453.1252, 293.4770, -62.87666),
        dos=(-2.741539, -0.6720113, -0.009323202, 0.0,
             0.00004915276, 0.0),
        exx=0.27),
    "m06-2x": dict(
        ax=(0.46, -0.2206052, -0.09431788, 2.164494, -2.556466,
            -14.22133, 15.55044, 35.98078, -27.22754, -39.24093,
            15.22808, 15.22227),
        dx=(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   # no VS98 exchange part
        css=(0.3097855, -5.528642, 13.47420, -32.13623, 28.46742),
        dss=(0.6902145, 0.09847204, 0.2214797, -0.001968264,
             -0.006775479, 0.0),
        cos=(0.8833596, 3.357972, -70.43548, 74.13438, 28.60723),
        dos=(0.1166404, -0.09120847, -0.006726189, 0.00006720580,
             0.0008448011, 0.0),
        exx=0.54),
}
_ALPHA_X = 0.00186726
_ALPHA_CSS = 0.00515088
_ALPHA_COS = 0.00304966
_GAM_CSS = 0.06      # γ in g(x²) = Σ c_i [γx²/(1+γx²)]^i, same-spin
_GAM_COS = 0.0031    # opposite-spin


def _m06_x_channel(r, s, t, prm, xp):
    x2 = _x2_safe(r, s, xp)
    z = _z_safe(r, t, xp)
    w = _w_meta(r, t, xp)
    e_pbe = 0.5 * _pbe_x_spin(2.0 * r, 4.0 * s, xp)
    e_lda = -_CX * 2.0 ** (1.0 / 3.0) * xp.maximum(r, 0.0) ** (4.0 / 3.0)
    return (e_pbe * _m06_wpow(w, prm["ax"], xp)
            + e_lda * _vs98_h(x2, z, prm["dx"], _ALPHA_X, xp))


def _d_sic(r, s, t, xp):
    """Self-interaction factor D_σ = 1 − τ_W/τ ∈ [0, 1] (zero for any
    one-electron density — kills same-spin self-correlation)."""
    tw = xp.maximum(s, 0.0) / (8.0 * xp.maximum(r, 1e-30))
    return xp.clip(1.0 - tw / _tau_safe(t, xp), 0.0, 1.0)


def _m06_f(name):
    prm = _M06_PARAMS[name]

    def f(ra, rb, saa, sab, sbb, ta, tb, xp=jnp):
        ex = (_m06_x_channel(ra, saa, ta, prm, xp)
              + _m06_x_channel(rb, sbb, tb, prm, xp))
        xa2 = _x2_safe(ra, saa, xp)
        xb2 = _x2_safe(rb, sbb, xp)
        za = _z_safe(ra, ta, xp)
        zb = _z_safe(rb, tb, xp)
        e_aa, e_bb, e_ab = _ec_pw92_stoll(ra, rb, xp)
        g_aa = (_b97_series(xa2, _GAM_CSS, prm["css"], xp)
                + _vs98_h(xa2, za, prm["dss"], _ALPHA_CSS, xp))
        g_bb = (_b97_series(xb2, _GAM_CSS, prm["css"], xp)
                + _vs98_h(xb2, zb, prm["dss"], _ALPHA_CSS, xp))
        x2t = xa2 + xb2
        g_ab = (_b97_series(x2t, _GAM_COS, prm["cos"], xp)
                + _vs98_h(x2t, za + zb, prm["dos"], _ALPHA_COS, xp))
        ec = (e_aa * g_aa * _d_sic(ra, saa, ta, xp)
              + e_bb * g_bb * _d_sic(rb, sbb, tb, xp)
              + e_ab * g_ab)
        return ex + ec

    return f


f_m06l = _m06_f("m06-l")
f_m06 = _m06_f("m06")
f_m062x = _m06_f("m06-2x")


# ---------------- B97M-class (w, u) power series [Mardirossian &
# Head-Gordon, JCP 142, 074111 (2015); JCP 144, 214110 (2016)] -------

def _wu_series(w, u, terms, xp):
    """g(w, u) = Σ c_{ij} wⁱ uʲ over a sparse term list
    [((i, j), c), ...]."""
    out = 0.0
    for (i, j), c in terms:
        out = out + c * (w ** i if i else 1.0) * (u ** j if j else 1.0)
    return out


def _u_of(x2, gamma, xp):
    return gamma * x2 / (1.0 + gamma * x2)


def make_b97m(x_terms, css_terms, cos_terms, omega=0.0):
    """Build a B97M-class meta-GGA: per-spin LSDA exchange (short-range
    when ω > 0, via the exact erfc-hole factor) × g_x(w, u_x) +
    Stoll-partitioned PW92 correlation × g_ss(w, u_ss) / g_os(w̄, u_os).
    γ_x = 0.004, γ_ss = 0.2, γ_os = 0.006 (the fixed B97 values)."""

    def f(ra, rb, saa, sab, sbb, ta, tb, xp=jnp):
        def ex_one(r, s, t):
            x2 = _x2_safe(r, s, xp)
            w = _w_meta(r, t, xp)
            e_lda = (-0.5 * 1.5 * (6.0 / np.pi) ** (1.0 / 3.0)
                     * xp.maximum(r, 0.0) ** (4.0 / 3.0))
            if omega:
                kf = (6.0 * np.pi ** 2 * xp.maximum(r, 1e-30)) \
                    ** (1.0 / 3.0)
                e_lda = e_lda * _sr_lda_factor(omega / (2.0 * kf), xp)
            return e_lda * _wu_series(w, _u_of(x2, 0.004, xp),
                                      x_terms, xp)

        ex = ex_one(ra, saa, ta) + ex_one(rb, sbb, tb)
        xa2 = _x2_safe(ra, saa, xp)
        xb2 = _x2_safe(rb, sbb, xp)
        wa = _w_meta(ra, ta, xp)
        wb = _w_meta(rb, tb, xp)
        e_aa, e_bb, e_ab = _ec_pw92_stoll(ra, rb, xp)
        # opposite-spin w̄ from the summed channels (τ^{UEG}_α+τ^{UEG}_β
        # vs τ_α+τ_β), division-free as in _w_meta
        tu_ab = (_CF_POL * (xp.maximum(ra, 1e-30) ** (5.0 / 3.0)
                            + xp.maximum(rb, 1e-30) ** (5.0 / 3.0)))
        t_ab = _tau_safe(ta + tb, xp)
        w_ab = (tu_ab - t_ab) / (tu_ab + t_ab)
        ec = (e_aa * _wu_series(wa, _u_of(xa2, 0.2, xp), css_terms, xp)
              + e_bb * _wu_series(wb, _u_of(xb2, 0.2, xp), css_terms, xp)
              + e_ab * _wu_series(w_ab,
                                  _u_of(0.5 * (xa2 + xb2), 0.006, xp),
                                  cos_terms, xp))
        return ex + ec

    return f


# Final published term selections (sparse (i=w-power, j=u-power) → c).
# Transcribed from the defining papers' tables in a zero-egress
# environment; the UEG rows ((0,0) terms; c_x(0,0)+X_HF = 1) are
# verified by constraint in tests, the remainder carries transcription
# uncertainty — `make_b97m` accepts replacement tables directly.
_B97MV_X = [((0, 0), 1.000), ((0, 1), 1.308), ((0, 2), 1.901),
            ((1, 0), 0.416), ((1, 1), 3.070)]
_B97MV_CSS = [((0, 0), 1.000), ((0, 2), -1.855), ((1, 0), -5.668),
              ((3, 2), -20.497), ((4, 2), -20.364)]
_B97MV_COS = [((0, 0), 1.000), ((1, 0), 1.573), ((0, 1), -6.298),
              ((3, 2), -8.812)]

_WB97MV_X = [((0, 0), 0.85), ((0, 1), 1.007), ((1, 0), 0.259)]
# UEG exactness is enforced BY CONSTRUCTION in the -V family (the
# papers fix the (0,0) coefficients): c_ss(0,0) = c_os(0,0) = 1.
_WB97MV_CSS = [((0, 0), 1.000), ((0, 4), -1.437), ((1, 0), -4.535),
               ((2, 0), -3.390), ((4, 3), 4.278)]
_WB97MV_COS = [((0, 0), 1.000), ((1, 0), 1.358), ((2, 0), 2.924),
               ((6, 0), -8.812), ((2, 1), -1.390), ((6, 1), 9.142)]

f_b97mv = make_b97m(_B97MV_X, _B97MV_CSS, _B97MV_COS)
f_wb97mv = make_b97m(_WB97MV_X, _WB97MV_CSS, _WB97MV_COS, omega=0.3)

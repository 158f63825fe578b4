"""Range-separated hybrid functionals (CAM-B3LYP / HSE06 / LC-wPBE(h) /
wB97X / B97) — parity with the reference's RSH functional table and its
(exchange_scale, lrc_exchange_scale, lrc_omega) DF-plan channel
(cuEST/cuest_scf_examples/cuest_scf/xc_functionals.py:50-107,
rhf.py:255-263, cuest_df_int_plan.py).

Oracles (no external QC package in this environment):
- the erf-split LDA attenuation factor F(a) vs a direct numerical
  integral of the uniform-gas exchange hole (scipy) — independent of
  the closed form;
- exact ω→0 / ω→∞ functional limits;
- an end-to-end SCF closure: an RSH with ω→∞ must reproduce the
  corresponding GLOBAL hybrid (α+β exact exchange, (1−α−β) B88) built
  through the completely separate global-hybrid code path;
- DF (erf-metric RI) vs full erf-ERI exchange inside the same SCF.
"""

import numpy as np
import pytest

from tpumathlib.apps.scf import Molecule
from tpumathlib.apps import xc
from tpumathlib.apps.xc import (
    _sr_lda_factor,
    _x_spin_b88,
    f_b88_x,
    f_gga_sr_x,
    f_lyp_c,
    f_pbe_x,
    f_vwn5_c,
    rks,
    rs_params,
    uhf,
)

_H2O = Molecule(["O", "H", "H"], np.array([
    [0.0, 0.0, 0.2217],
    [0.0, 1.4309, -0.8867],
    [0.0, -1.4309, -0.8867]]))

_GRID = dict(n_rad=40, n_theta=10, n_phi=20)


def test_sr_lda_factor_vs_hole_integral():
    """F(a) against ∫ u²·n_x(u)·erfc(2au)/u du with the exact uniform-gas
    exchange hole n_x(u) = −(9ρ/2)(j₁(k_F u)/k_F u)², k_F = 1."""
    from scipy import integrate

    def f_hole(a):
        mu = 2.0 * a

        def j1(x):
            return np.sin(x) / x ** 2 - np.cos(x) / x

        def hole(u):
            return -4.5 * (j1(u) / u) ** 2

        from scipy.special import erfc
        num = integrate.quad(lambda u: u * hole(u) * erfc(mu * u),
                             1e-8, 200, limit=500)[0]
        den = integrate.quad(lambda u: u * hole(u), 1e-8, 200, limit=500)[0]
        return num / den

    for a in [0.05, 0.3, 0.5, 1.0, 1.4, 1.6, 2.0, 5.0]:
        ref = f_hole(a)
        got = float(_sr_lda_factor(np.asarray(a), xp=np))
        assert abs(got - ref) < 3e-4 * max(ref, 1e-3), (a, got, ref)


def test_sr_factor_branch_continuity_and_largea():
    """The f32-safe asymptotic branch matches the exact form at the
    switch and obeys the on-top-hole sum rule F → 1/(36a²)."""
    lo = float(_sr_lda_factor(np.asarray(1.499999), xp=np))
    hi = float(_sr_lda_factor(np.asarray(1.500001), xp=np))
    assert abs(lo - hi) < 5e-7
    a = 30.0
    assert abs(float(_sr_lda_factor(np.asarray(a), xp=np))
               / (1.0 / (36 * a * a)) - 1.0) < 1e-3


def test_ityh_lda_consistency():
    """ITYH's a_σ = ω√K/(6√π ρ^{1/3}) must reduce to a = ω/(2k_F) for the
    Slater kernel: attenuated-Slater via f_gga_sr_x == e_lda·F(ω/2k_F)."""
    def slater_spin(r, s, xp):
        return -xc._CX * 2.0 ** (1.0 / 3.0) * xp.maximum(r, 1e-30) ** (4 / 3)

    rng = np.random.default_rng(1)
    r = rng.uniform(1e-3, 3.0, 128)
    z = np.zeros_like(r)
    w = 0.37
    got = f_gga_sr_x(slater_spin, w)(r, z, z, z, z, xp=np)
    kf = (6.0 * np.pi ** 2 * r) ** (1.0 / 3.0)
    want = slater_spin(r, None, np) * _sr_lda_factor(w / (2 * kf), xp=np)
    assert np.allclose(got, want, rtol=1e-10)


def test_sr_gga_limits_and_monotonicity():
    rng = np.random.default_rng(2)
    ra, rb = rng.uniform(1e-3, 2.0, 64), rng.uniform(1e-3, 2.0, 64)
    saa, sbb = rng.uniform(0, 4.0, 64), rng.uniform(0, 4.0, 64)
    sab = np.zeros(64)
    full = f_b88_x(ra, rb, saa, sab, sbb, xp=np)
    prev = full
    for w in [1e-7, 0.1, 0.3, 1.0, 10.0, 1e5]:
        sr = f_gga_sr_x(_x_spin_b88, w)(ra, rb, saa, sab, sbb, xp=np)
        # SR exchange is negative, weaker than full, monotone in ω
        assert np.all(sr <= 1e-12)
        assert np.all(sr >= full - 1e-9)
        assert np.all(sr >= prev - 1e-9)
        prev = sr
    assert np.allclose(f_gga_sr_x(_x_spin_b88, 1e-7)(
        ra, rb, saa, sab, sbb, xp=np), full, rtol=1e-5)
    assert np.max(np.abs(prev)) < 1e-6


def test_rs_params_table():
    """The (α, β, ω) triples ≙ exchange_scale/lrc_exchange_scale/
    lrc_omega; structural identities: wB97X's c_x0 + α_SR = 1 (the
    paper's exactness constraint), LC totals reach 100% at long range."""
    assert rs_params("cam-b3lyp") == (0.19, 0.46, 0.33)
    a, b, w = rs_params("wb97x")
    assert abs(a + b - 1.0) < 1e-12 and w == 0.3
    assert abs(xc._B97_PARAMS["wb97x"]["cx"][0] - b) < 1e-12
    for name in ["lc-wpbe", "lc-wpbeh", "wb97x"]:
        a, b, _ = rs_params(name)
        assert abs(a + b - 1.0) < 1e-12          # full LR exchange
    a, b, w = rs_params("hse06")
    assert a + b == 0.0 and a == 0.25            # screened: no LR HF
    assert rs_params("b3lyp") == (0.20, 0.0, 0.0)
    assert rs_params(None) == (0.0, 0.0, 0.0)


def test_rsh_omega_inf_reduces_to_global_hybrid():
    """SCF closure: a CAM-like RSH with ω→large equals a global hybrid
    with α+β exact exchange over (1−α−β)·B88 + CAM's correlation — two
    different code paths (erf-ERI K_LR vs plain K) must meet."""
    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))
    alpha, beta, big_w = 0.19, 0.46, 60.0

    def f_dft(ra, rb, saa, sab, sbb, xp=np):
        # at ω→∞ the SR term vanishes: DFT part = (1−α−β) B88 + corr
        return ((1.0 - alpha - beta) * f_b88_x(ra, rb, saa, sab, sbb, xp)
                + 0.19 * f_vwn5_c(ra, rb, xp)
                + 0.81 * f_lyp_c(ra, rb, saa, sab, sbb, xp))

    xc._FUNCTIONALS["_caminf"] = ("gga", f_dft)
    xc._FUNCTIONALS["_camglob"] = ("gga", f_dft)
    xc._RS_HYBRIDS["_caminf"] = (alpha, beta, big_w)
    xc._HYBRID_EXX["_camglob"] = alpha + beta
    try:
        e_rsh, _, _ = rks(mol, xc="_caminf", grid_kw=_GRID, conv=1e-9)
        e_glob, _, _ = rks(mol, xc="_camglob", grid_kw=_GRID, conv=1e-9)
    finally:
        for d, k in [(xc._FUNCTIONALS, "_caminf"), (xc._FUNCTIONALS,
                     "_camglob"), (xc._RS_HYBRIDS, "_caminf"),
                     (xc._HYBRID_EXX, "_camglob")]:
            d.pop(k, None)
    # erf(60·r) ≈ 1 beyond r ~ 0.03 bohr: K_LR ≈ K to the ERI tail
    assert abs(e_rsh - e_glob) < 5e-5, (e_rsh, e_glob)


@pytest.mark.parametrize("name", ["cam-b3lyp", "hse06", "lc-wpbe",
                                  "lc-wpbeh", "wb97x", "b97"])
def test_rsh_scf_converges(name):
    e, c, eps = rks(_H2O, xc=name, grid_kw=_GRID, max_iters=80, conv=1e-8)
    # sanity: bound total energy for water/STO-3G-class results and an
    # occupied/virtual gap
    assert -76.5 < e < -73.0, (name, e)
    assert eps[4] < eps[5], name


def test_hse06_near_pbe0():
    """HSE06 is PBE0 with ω=0.11 screening: the screened total sits
    within tens of mHa of PBE0 at water scale."""
    e_hse, _, _ = rks(_H2O, xc="hse06", grid_kw=_GRID, conv=1e-8)
    e_pbe0, _, _ = rks(_H2O, xc="pbe0", grid_kw=_GRID, conv=1e-8)
    assert abs(e_hse - e_pbe0) < 0.05


def test_hse_omega_limits():
    """Screened-hybrid closure at both ends: HSE(ω→0) ≡ PBE0 (the SR
    kernel becomes the full kernel on both the ERI and the functional
    side) and HSE(ω→huge) ≡ pure PBE (all screening terms vanish).
    Exercises the β<0 branch of the RSH Fock machinery end to end."""
    from tpumathlib.apps.xc import f_pbe_c, f_pbe_x, f_gga_sr_x, _x_spin_pbe

    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))

    def make_hse(w):
        sr = f_gga_sr_x(_x_spin_pbe, w)

        def f(ra, rb, saa, sab, sbb, xp=np):
            return (f_pbe_x(ra, rb, saa, sab, sbb, xp)
                    - 0.25 * sr(ra, rb, saa, sab, sbb, xp)
                    + f_pbe_c(ra, rb, saa, sab, sbb, xp))

        return f

    for key, w in [("_hse_w0", 1e-5), ("_hse_winf", 80.0)]:
        xc._FUNCTIONALS[key] = ("gga", make_hse(w))
        xc._RS_HYBRIDS[key] = (0.25, -0.25, w)
    try:
        e_w0, _, _ = rks(mol, xc="_hse_w0", grid_kw=_GRID, conv=1e-9)
        e_winf, _, _ = rks(mol, xc="_hse_winf", grid_kw=_GRID, conv=1e-9)
        e_pbe0, _, _ = rks(mol, xc="pbe0", grid_kw=_GRID, conv=1e-9)
        e_pbe, _, _ = rks(mol, xc="pbe", grid_kw=_GRID, conv=1e-9)
    finally:
        for key in ["_hse_w0", "_hse_winf"]:
            xc._FUNCTIONALS.pop(key, None)
            xc._RS_HYBRIDS.pop(key, None)
    assert abs(e_w0 - e_pbe0) < 5e-6, (e_w0, e_pbe0)
    assert abs(e_winf - e_pbe) < 5e-5, (e_winf, e_pbe)


def test_cam_b3lyp_df_vs_full_eri():
    """The erf-metric RI (DFTensors(omega=)) inside SCF vs the full
    erf-ERI path: standard DF-grade agreement cross-validates the
    attenuated three-center integrals and metric."""
    e_full, _, _ = rks(_H2O, xc="cam-b3lyp", grid_kw=_GRID, conv=1e-8)
    e_df, _, _ = rks(_H2O, xc="cam-b3lyp", grid_kw=_GRID, conv=1e-8,
                     density_fit=True)
    assert abs(e_full - e_df) < 2e-3, (e_full, e_df)


def test_rsh_uks_open_shell():
    """UKS doublet (OH radical) through the same RSH Fock path."""
    oh = Molecule(["O", "H"], np.array([[0., 0., 0.], [0., 0., 1.832]]))
    e, _, eps, s2 = uhf(oh, spin=1, xc="cam-b3lyp", grid_kw=_GRID,
                        max_iters=80, conv=1e-7)
    assert -76.0 < e < -72.0
    assert abs(s2 - 0.75) < 0.05


@pytest.mark.parametrize("name", ["cam-b3lyp", "lc-wpbe", "hse06"])
def test_rsh_gradient_fd(name):
    """RSH analytic nuclear gradient vs central finite differences of
    the SCF energy: exercises the β·K_LR(ω) exchange-derivative term
    (erf-attenuated grad_eri) — for lc-wpbe (α=0) the ENTIRE exchange
    force is long-range, for hse06 (β<0) the screened subtraction must
    carry the attenuated (not full-range) derivative.

    ≙ the reference's RSH gradient rows in
    cuEST/cuest_scf_examples/test/dft_energies (uks gradient assembly).
    """
    from tpumathlib.apps.xc import uhf
    from tpumathlib.apps.xcgrad import uks_gradient

    gkw = dict(n_rad=30, n_theta=8, n_phi=16)
    z0 = 1.5
    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., z0]]))
    g = uks_gradient(mol, xc=name, grid_kw=gkw)

    def e_at(z):
        m = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., z]]))
        e, *_ = uhf(m, xc=name, grid_kw=gkw, conv=1e-11)
        return e

    h = 2e-4
    fd = (e_at(z0 + h) - e_at(z0 - h)) / (2 * h)
    assert abs(g[1, 2] - fd) < 5e-5, (name, g[1, 2], fd)
    assert np.allclose(g[0], -g[1], atol=1e-6)


# ---------------- HJS wPBE hole (f_wpbe_sr_x) ----------------

def test_hjs_nu0_recovers_pbe():
    """The HJS hole's DEFINING constraint: at ν = 0 the SR enhancement
    equals the full-range PBE enhancement factor [HJS, JCP 128, 194105
    (2008), construction of H(s)]. This pins the H(s) Padé table AND
    the ζ-framework simultaneously — a transcription error in any
    coefficient shows up as O(1) deviation (verified: flipping the sign
    of the last numerator coefficient gives max err 0.73)."""
    from tpumathlib.apps.xc import _hjs_fx

    kappa, mu = 0.804, 0.2195149727645171
    s = np.linspace(1e-4, 8.0, 400)
    fx_pbe = 1.0 + kappa - kappa / (1.0 + mu * s * s / kappa)
    fx_hjs = _hjs_fx(s, 1e-14, np)
    err = np.abs(fx_hjs - fx_pbe).max()
    assert err < 5e-4, err
    # small-s curvature carries mu_PBE (difference out the 1.6e-7
    # normalization residual of the A..D hole constants)
    f0 = _hjs_fx(np.array([1e-6]), 1e-14, np)[0]
    d2 = (_hjs_fx(np.array([1e-3]), 1e-14, np)[0] - f0) / 1e-6
    assert abs(d2 - mu) < 2e-3, d2


def test_hjs_s0_vs_exact_sr_lda():
    """At s = 0 the HJS hole reduces to its LSDA-hole model, whose two
    ω-limits are EXACT constraints (small-ν: hole normalization;
    large-ν: on-top sum rule E_x^SR → −πρ²/2ω²); in between the A…E
    model deviates from the true oscillatory LDA hole by ≤3.2e-3
    absolute (intrinsic to HJS, identical in libxc)."""
    from tpumathlib.apps.xc import _hjs_fx

    s0 = np.full(1, 1e-14)
    for nu, tol in [(0.01, 1e-6), (0.05, 1e-5), (0.2, 1e-3),
                    (0.5, 4e-3), (1.0, 2e-3), (2.0, 1e-4),
                    (5.0, 1e-6), (10.0, 1e-7)]:
        got = float(_hjs_fx(s0, nu, np)[0])
        want = float(_sr_lda_factor(np.full(1, nu / 2.0), np)[0])
        assert abs(got - want) < tol, (nu, got, want)


def test_hjs_monotone_and_bounded():
    """F^{HJS}(s, ν) decays monotonically in ν, stays within (0, F_PBE],
    and saturates (finite) at extreme s — the f32 tail-safety contract
    of the registry entry."""
    from tpumathlib.apps.xc import _hjs_fx

    for s in [0.0, 0.5, 1.5, 3.0, 8.0, 50.0, 1e6]:
        vals = [float(_hjs_fx(np.full(1, s), nu, np)[0])
                for nu in [1e-3, 0.1, 0.3, 1.0, 3.0, 10.0]]
        assert all(np.isfinite(vals)), (s, vals)
        assert all(a > b > 0 for a, b in zip(vals, vals[1:])), (s, vals)


def test_hjs_autodiff_tail_safe():
    """V_xc of the wPBE-SR functional must stay finite under f32
    reverse-mode at clamped tail densities (σ = 0 exactly, ρ → 1e-30) —
    the same NaN channel _x2_safe documents."""
    import jax
    import jax.numpy as jnp
    from tpumathlib.apps.xc import f_wpbe_sr_x

    f = f_wpbe_sr_x(0.4)

    def e(r, s):
        return f(r, r, s, s, s, jnp).sum()

    r = jnp.asarray(np.array([1e-30, 1e-12, 1e-3, 0.2, 5.0], np.float32))
    s = jnp.asarray(np.array([0.0, 0.0, 1e-8, 0.3, 40.0], np.float32))
    gr, gs = jax.grad(e, argnums=(0, 1))(r, s)
    assert np.isfinite(np.asarray(gr)).all(), gr
    assert np.isfinite(np.asarray(gs)).all(), gs


def test_hse06_hjs_scf_shift_vs_ityh_is_small():
    """Documents the magnitude of the ITYH-on-PBE → true-HJS swap:
    the two SR models agree at s=0 and in both ω limits but differ
    ~10% in the SR energy density at intermediate s (HJS deeper),
    which integrates to ~22 mHa on the water/STO-3G HSE06 total —
    exactly the external-oracle deviation the round-4 advisor flagged
    for the ITYH substitution. Bounded both ways as a regression
    pin."""
    from tpumathlib.apps.xc import _x_spin_pbe, f_pbe_c

    sr_ityh = f_gga_sr_x(_x_spin_pbe, 0.11)

    def f_ityh(ra, rb, saa, sab, sbb, xp=np):
        return (f_pbe_x(ra, rb, saa, sab, sbb, xp)
                - 0.25 * sr_ityh(ra, rb, saa, sab, sbb, xp)
                + f_pbe_c(ra, rb, saa, sab, sbb, xp))

    xc._FUNCTIONALS["_hse_ityh"] = ("gga", f_ityh)
    xc._RS_HYBRIDS["_hse_ityh"] = xc._RS_HYBRIDS["hse06"]
    try:
        e_hjs, _, _ = rks(_H2O, xc="hse06", grid_kw=_GRID, conv=1e-8)
        e_ityh, _, _ = rks(_H2O, xc="_hse_ityh", grid_kw=_GRID, conv=1e-8)
    finally:
        xc._FUNCTIONALS.pop("_hse_ityh", None)
        xc._RS_HYBRIDS.pop("_hse_ityh", None)
    assert 5e-3 < abs(e_hjs - e_ityh) < 5e-2, (e_hjs, e_ityh)

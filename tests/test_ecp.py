"""ECP (effective core potential) oracles.

≙ cuEST/python_examples/5_effective_core_potentials/{ecp_integrals,
ecp_gradients}/run.py. Oracles: spherical-harmonic quadrature
orthonormality, the Coulomb limit of the local channel vs the analytic
multi-center integrals, same-center closed forms, projector selection
rules, quadrature convergence, and FD gradients.
"""

import math

import numpy as np

from tpumathlib.apps import est
from tpumathlib.apps.ecp import (
    ECPAtom,
    ECPIntPlan,
    ECPShell,
    _real_sph_harm,
    ecp_gradient,
    ecp_matrix,
    parse_ecp,
    rhf_ecp,
)
from tpumathlib.apps.scf import Molecule
from tpumathlib.apps.xc import _angular_product


def test_sph_harm_orthonormal():
    sph, wsph = _angular_product(18, 36)
    y = _real_sph_harm(4, sph)          # 25 functions
    gram = np.einsum("kj,j,lj->kl", y, wsph, y)
    np.testing.assert_allclose(gram, np.eye(25), atol=1e-12)


HH = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))


def test_local_channel_coulomb_limit():
    """U_local = c·r⁻¹·e^(−αr²) with α→0 is c/r: the ECP quadrature must
    reproduce the analytic ⟨μ|1/|r−C||ν⟩ integrals (apps/deriv.py)."""
    from tpumathlib.apps.deriv import potential_integrals

    shells = est.sto3g_shells(HH)
    ecp = ECPAtom(0, ECPShell(1, np.array([1]), np.array([1e-6]),
                              np.array([2.5])), [])
    mat = ecp_matrix(HH, {0: ecp}, shells)
    ref = 2.5 * potential_integrals(shells, HH.coords[0][None])[0]
    np.testing.assert_allclose(mat, ref, atol=2e-5)


def test_same_center_closed_form():
    """Concentric s-Gaussians: ⟨s|r^(n−2)e^(−αr²)|s⟩ = 4π Σ_ab c_a c_b
    ∫ r^n e^(−(a+b+α)r²) dr, closed form for n = 0, 1, 2."""
    mol = Molecule(["H"], np.zeros((1, 3)))
    shells = est.sto3g_shells(mol)
    s = shells[0]
    alpha = 0.8

    def radint(n, beta):
        if n == 0:
            return 0.5 * math.sqrt(math.pi / beta)
        if n == 1:
            return 0.5 / beta
        return 0.25 * math.sqrt(math.pi) * beta ** -1.5

    for n_pow, coef in [(0, 1.3), (1, -0.7), (2, 2.1)]:
        ecp = ECPAtom(0, ECPShell(1, np.array([n_pow]), np.array([alpha]),
                                  np.array([coef])), [])
        mat = ecp_matrix(mol, {0: ecp}, shells)
        want = 4.0 * math.pi * coef * sum(
            ca * cb * radint(n_pow, aa + ab + alpha)
            for ca, aa in zip(s.coefs, s.exps)
            for cb, ab in zip(s.coefs, s.exps))
        np.testing.assert_allclose(mat[0, 0], want, rtol=1e-9)


def test_projector_selection_rule():
    """A concentric s-AO has only Y₀₀ content on every shell: an l=1
    semi-local channel must contribute exactly zero, while the l=0
    channel reproduces the same radial value as a local channel."""
    mol = Molecule(["H"], np.zeros((1, 3)))
    shells = est.sto3g_shells(mol)
    chan = ECPShell(0, np.array([2]), np.array([1.1]), np.array([3.0]))
    zero_top = ECPShell(2, np.array([2]), np.array([1.0]), np.array([0.0]))
    p_chan = ECPShell(1, np.array([2]), np.array([1.1]), np.array([3.0]))
    m_p = ecp_matrix(mol, {0: ECPAtom(0, zero_top, [p_chan])}, shells)
    np.testing.assert_allclose(m_p[0, 0], 0.0, atol=1e-12)
    m_s = ecp_matrix(mol, {0: ECPAtom(0, zero_top, [chan])}, shells)
    m_loc = ecp_matrix(mol, {0: ECPAtom(0, ECPShell(
        2, np.array([2]), np.array([1.1]), np.array([3.0])), [])}, shells)
    np.testing.assert_allclose(m_s[0, 0], m_loc[0, 0], rtol=1e-10)


def test_quadrature_convergence_off_center():
    ecp = ECPAtom(0, ECPShell(
        2, np.array([2, 1]), np.array([1.5, 2.0]), np.array([4.0, -1.0])),
        [ECPShell(0, np.array([2]), np.array([2.5]), np.array([10.0])),
         ECPShell(1, np.array([2]), np.array([1.8]), np.array([5.0]))])
    m1 = ecp_matrix(HH, {0: ecp}, n_rad=80, n_theta=18, n_phi=36)
    m2 = ecp_matrix(HH, {0: ecp}, n_rad=110, n_theta=26, n_phi=52)
    np.testing.assert_allclose(m1, m2, atol=1e-8)
    np.testing.assert_allclose(m1, m1.T, atol=1e-12)


_NA_ECP_TEXT = """
! LANL2-style sodium large-core ECP (format fixture)
NA     0
NA-ECP     2     10
d potential
  1
1      175.5502590            -10.0000000
s-d potential
  2
0      243.3605846             10.0000000
2      125.8616830            135.8406420
p-d potential
  2
0       83.2018100              5.0000000
2       80.6684660            135.9280950
"""


def test_parse_ecp():
    d = parse_ecp(_NA_ECP_TEXT)
    assert set(d) == {"NA"}
    atom = d["NA"]
    assert atom.nelectron == 10
    assert atom.top.l == 2 and len(atom.top.exps) == 1
    assert [s.l for s in atom.shells] == [0, 1]
    assert len(atom.shells[0].exps) == 2
    np.testing.assert_allclose(atom.shells[1].coefs[1], 135.9280950)


def test_ecp_gradient_fd():
    ecp = ECPAtom(0, ECPShell(
        2, np.array([2]), np.array([1.5]), np.array([4.0])),
        [ECPShell(0, np.array([2]), np.array([2.5]), np.array([10.0]))])
    rng = np.random.default_rng(0)
    n = est.nbf(est.sto3g_shells(HH))
    d = rng.standard_normal((n, n))
    d = 0.5 * (d + d.T)
    g = ecp_gradient(HH, d, {0: ecp})
    np.testing.assert_allclose(g.sum(0), 0.0, atol=1e-10)
    h = 1e-5
    for a, ax in [(0, 2), (1, 2), (1, 0)]:
        cp = np.array(HH.coords)
        cp[a, ax] += h
        cm = np.array(HH.coords)
        cm[a, ax] -= h
        fp = np.sum(d * ecp_matrix(Molecule(HH.symbols, cp), {0: ecp}))
        fm = np.sum(d * ecp_matrix(Molecule(HH.symbols, cm), {0: ecp}))
        np.testing.assert_allclose(g[a, ax], (fp - fm) / (2 * h),
                                   atol=1e-7)


def test_rhf_ecp_null_limit():
    """A zero ECP replacing zero electrons must reproduce the all-electron
    RHF energy exactly."""
    null = ECPAtom(0, ECPShell(1, np.array([2]), np.array([1.0]),
                               np.array([0.0])), [])
    e_ecp, _, _ = rhf_ecp(HH, {0: null})
    e_ref, _, _ = est.rhf(HH)
    np.testing.assert_allclose(e_ecp, e_ref, atol=1e-8)


def test_cuest_api_handles():
    """C-API-style lifecycle for the ECP/PCM/gradient plans."""
    from tpumathlib.apps.cuest_api import (
        Context,
        ECPIntPlanHandle,
        GradientPlan,
        PCMIntPlanHandle,
    )

    ecp = ECPAtom(0, ECPShell(1, np.array([2]), np.array([1.0]),
                              np.array([2.0])), [])
    with Context() as ctx:
        p = ECPIntPlanHandle(ctx, HH, {0: ecp})
        m = p.compute()
        assert m.shape == (2, 2)
        np.testing.assert_allclose(m, m.T, atol=1e-12)
        pcm = PCMIntPlanHandle(ctx, HH)
        assert pcm.npoints > 0
        q, v, res = pcm.compute(np.zeros((2, 2)))
        assert res.converged
        g = GradientPlan(ctx, HH, "rhf").compute()
        np.testing.assert_allclose(g.sum(0), 0.0, atol=1e-8)


def test_rhf_ecp_gradient_fd():
    """Full ECP-SCF nuclear gradient (Pulay + U-term + core-screened
    V_ne/V_NN) against central differences of the rhf_ecp total energy
    (≙ ecp_gradients/run.py carried through the full SCF gradient)."""
    from tpumathlib.apps.deriv import rhf_ecp_gradient

    mol = Molecule(["O", "H", "H"], np.array([
        [0.0, 0.0, 0.2217],
        [0.0, 1.4309, -0.8867],
        [0.0, -1.4309, -0.8867]]))
    ecp = {0: ECPAtom(2, ECPShell(1, np.array([2]), np.array([10.0]),
                                  np.array([-3.0])),
                      [ECPShell(0, np.array([2]), np.array([8.0]),
                                np.array([20.0]))])}
    kw = dict(max_iters=500, conv=1e-12)
    g = rhf_ecp_gradient(mol, ecp, scf=rhf_ecp(mol, ecp, **kw))
    h = 1e-3
    for ia, ax in ((0, 2), (1, 1)):
        cp = mol.coords.copy()
        cp[ia, ax] += h
        cm = mol.coords.copy()
        cm[ia, ax] -= h
        ep = rhf_ecp(Molecule(mol.symbols, cp), ecp, **kw)[0]
        em = rhf_ecp(Molecule(mol.symbols, cm), ecp, **kw)[0]
        np.testing.assert_allclose(g[ia, ax], (ep - em) / (2 * h),
                                   atol=5e-5)

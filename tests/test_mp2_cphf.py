"""RI-MP2 and CPHF polarizability — parity with the reference's
cuest_scf_examples/examples/{mp2-1,cphf-1} samples. Oracles: the exact
full-ERI MO transform (an independent integral path), an analytic
2-orbital MP2 closed form, and finite-field SCF dipole differencing.
"""

import numpy as np

from tpumathlib.apps.cphf import dipole_matrices, polarizability
from tpumathlib.apps.est import rhf, sto3g_shells
from tpumathlib.apps.mp2 import mp2
from tpumathlib.apps.scf import Molecule

_H2O = Molecule(["O", "H", "H"], np.array([
    [0.0, 0.0, 0.2217],
    [0.0, 1.4309, -0.8867],
    [0.0, -1.4309, -0.8867]]))


def test_mp2_h2_analytic():
    """H2/STO-3G has one occupied and one virtual orbital: the MP2
    energy collapses to E = (ia|ia)² / (2ε_i − 2ε_a), all same-spin
    contributions cancelling — checked against a by-hand MO transform."""
    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))
    r = mp2(mol, density_fit=False)
    from tpumathlib.apps.est import eri_tensor

    shells = sto3g_shells(mol)
    _, c, eps = rhf(mol, shells=shells)
    eri = eri_tensor(shells)
    ci, ca = c[:, 0], c[:, 1]
    iaia = np.einsum("m,n,l,s,mnls->", ci, ca, ci, ca, eri)
    expect = iaia ** 2 / (2 * eps[0] - 2 * eps[1])
    assert abs(r["e_ss"]) < 1e-12
    assert abs(r["e_os"] - expect) < 1e-10
    assert r["e_corr"] < 0


def test_mp2_df_vs_exact_sto3g():
    """DF-MP2 (def2-svp-rifit auxiliary) vs the exact full-ERI MO
    transform — two independent integral paths (≙ the sample's Psi4
    cross-check, scaled to this suite's in-repo oracles)."""
    r_exact = mp2(_H2O, density_fit=False)
    r_df = mp2(_H2O, density_fit=True)
    assert r_exact["e_corr"] < -0.01
    assert r_exact["e_os"] < 0 and r_exact["e_ss"] < 0
    assert abs(r_df["e_corr"] - r_exact["e_corr"]) < 5e-5
    assert abs(r_df["e_scf"] - r_exact["e_scf"]) < 1e-10


def test_mp2_def2svp_frozen_core():
    """def2-SVP water with spherical d functions through the DF MO
    transform; freezing the O 1s core removes correlation energy but
    keeps the total finite and the OS/SS split negative."""
    r = mp2(_H2O, basis="def2-svp", density_fit=True)
    rf = mp2(_H2O, basis="def2-svp", density_fit=True, frozen_core=1)
    assert r["e_corr"] < rf["e_corr"] < 0
    # def2-SVP water MP2 correlation is ~-0.20 Ha (textbook scale)
    assert -0.30 < r["e_corr"] < -0.10


def test_cphf_polarizability_fd():
    """CPHF α vs the finite-field oracle: d_y(F) = 2 Tr(D μ_y) with
    H(F) = H_core + F·μ re-solved at ±h (the observable the reference's
    cphf-1 sample computes). α must also be symmetric PSD."""
    shells = sto3g_shells(_H2O)
    alpha = polarizability(_H2O, shells=shells)
    assert np.allclose(alpha, alpha.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(alpha) > 0)

    mu = dipole_matrices(shells)
    nocc = _H2O.nelec // 2
    h = 2e-4

    def dip(fvec):
        extra = np.einsum("c,cij->ij", fvec, mu)
        _, c, _ = rhf(_H2O, shells=shells, hcore_extra=extra, conv=1e-11)
        d = c[:, :nocc] @ c[:, :nocc].T
        return 2.0 * np.einsum("cij,ij->c", mu, d)

    fd = np.zeros((3, 3))
    for x in range(3):
        f = np.zeros(3)
        f[x] = h
        fd[x] = -(dip(f) - dip(-f)) / (2 * h)
    # residual is the DF(auto-aux) Hessian vs full-ERI SCF mismatch
    assert np.abs(alpha - fd).max() < 5e-3

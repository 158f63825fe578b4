"""cuEST step 4: nuclear-gradient oracles.

Finite-difference checks of the analytic derivative integrals
(tpumathlib/apps/deriv.py) and SCF nuclear gradients, plus the
autodiff XC gradient (tpumathlib/apps/xcgrad.py).
≙ cuEST/python_examples/4_exchange_correlation/local_xc_gradient/run.py:1
and the gradient machinery behind cuest_scf (Pulay forces).
"""

import numpy as np
import pytest

from tpumathlib.apps import deriv, est
from tpumathlib.apps.scf import Molecule

H2 = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))
HEH = Molecule(["He", "H"], np.array([[0., 0., 0.], [0., 0., 1.5]]),
               charge=1)


def _displaced(mol, a, ax, h):
    c = np.asarray(mol.coords, float).copy()
    c[a, ax] += h
    return Molecule(mol.symbols, c, mol.charge)


def _fd_matrix(fn, mol, h=1e-5):
    """(natom, 3, ...) central finite difference of a matrix-valued fn."""
    base = np.asarray(fn(mol))
    natom = len(mol.symbols)
    out = np.zeros((natom, 3) + base.shape)
    for a in range(natom):
        for ax in range(3):
            fp = np.asarray(fn(_displaced(mol, a, ax, h)))
            fm = np.asarray(fn(_displaced(mol, a, ax, -h)))
            out[a, ax] = (fp - fm) / (2 * h)
    return out


def test_grad_overlap_kinetic_fd():
    mol = HEH
    shells = est.sto3g_shells(mol)
    gs = deriv.grad_overlap(shells, mol)
    gt = deriv.grad_kinetic(shells, mol)
    fs = _fd_matrix(lambda m: est.overlap(est.sto3g_shells(m)), mol)
    ft = _fd_matrix(lambda m: est.kinetic(est.sto3g_shells(m)), mol)
    np.testing.assert_allclose(gs, fs, atol=5e-8)
    np.testing.assert_allclose(gt, ft, atol=5e-8)


def test_grad_nuclear_fd():
    mol = HEH
    shells = est.sto3g_shells(mol)
    gv = deriv.grad_nuclear(shells, mol)
    fv = _fd_matrix(lambda m: est.nuclear(est.sto3g_shells(m), m), mol)
    np.testing.assert_allclose(gv, fv, atol=5e-8)


def test_grad_eri_fd():
    mol = H2
    shells = est.sto3g_shells(mol)
    ge = deriv.grad_eri(shells, mol)
    fe = _fd_matrix(lambda m: est.eri_tensor(est.sto3g_shells(m)), mol)
    np.testing.assert_allclose(ge, fe, atol=5e-8)


def test_potential_integrals_vs_nuclear():
    """V_nuc = -Σ_c Z_c ⟨μ|1/|r-R_c||ν⟩ ties the multi-center potential
    workhorse to the independently-tested nuclear-attraction matrix."""
    from tpumathlib.apps.scf import _Z

    mol = HEH
    shells = est.sto3g_shells(mol)
    pots = deriv.potential_integrals(shells, np.asarray(mol.coords))
    zs = np.array([_Z[s] for s in mol.symbols])
    v = -(zs[:, None, None] * pots).sum(0)
    np.testing.assert_allclose(v, est.nuclear(shells, mol), atol=1e-12)


def test_grad_potential_integrals_fd():
    mol = H2
    centers = np.array([[0.3, -0.2, 0.5], [1.0, 0.4, 0.9]])
    shells = est.sto3g_shells(mol)
    datom, dcen = deriv.grad_potential_integrals(shells, centers, mol)
    fa = _fd_matrix(
        lambda m: deriv.potential_integrals(est.sto3g_shells(m), centers),
        mol)
    np.testing.assert_allclose(datom, fa, atol=5e-8)
    # operator-center derivative by displacing the centers themselves
    for g in range(len(centers)):
        for ax in range(3):
            h = 1e-5
            cp = centers.copy()
            cp[g, ax] += h
            cm = centers.copy()
            cm[g, ax] -= h
            fd = (deriv.potential_integrals(shells, cp)[g]
                  - deriv.potential_integrals(shells, cm)[g]) / (2 * h)
            np.testing.assert_allclose(dcen[g, ax], fd, atol=5e-8)


def test_rhf_gradient_fd():
    mol = HEH
    # tight SCF convergence: FD error is ~conv/h, so 1e-12 keeps the
    # comparison below the 1e-7 truncation floor
    g = deriv.rhf_gradient(mol, scf=est.rhf(mol, conv=1e-12))
    # translational invariance
    np.testing.assert_allclose(g.sum(0), 0.0, atol=1e-9)
    h = 1e-4
    for a in range(2):
        ax = 2
        ep = est.rhf(_displaced(mol, a, ax, h), conv=1e-12)[0]
        em = est.rhf(_displaced(mol, a, ax, -h), conv=1e-12)[0]
        np.testing.assert_allclose(g[a, ax], (ep - em) / (2 * h), atol=3e-6)


def test_uhf_gradient_triplet_fd():
    from tpumathlib.apps.xc import uhf

    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 2.0]]))
    g = deriv.uhf_gradient(mol, spin=2)
    np.testing.assert_allclose(g.sum(0), 0.0, atol=1e-9)
    h = 1e-4
    ep = uhf(_displaced(mol, 0, 2, h), spin=2)[0]
    em = uhf(_displaced(mol, 0, 2, -h), spin=2)[0]
    np.testing.assert_allclose(g[0, 2], (ep - em) / (2 * h), atol=3e-6)


def test_uhf_gradient_matches_rhf_closed_shell():
    g_u = deriv.uhf_gradient(H2, spin=0)
    g_r = deriv.rhf_gradient(H2)
    np.testing.assert_allclose(g_u, g_r, atol=1e-6)


def test_xc_gradient_fd():
    """jax.grad XC gradient vs finite differences of the SAME discretized
    grid energy (grid + Becke weights + AOs all move with the atoms)."""
    from tpumathlib.apps.xcgrad import xc_energy_fn, xc_gradient

    mol = H2
    rng = np.random.default_rng(0)
    n = est.nbf(est.sto3g_shells(mol))
    da = rng.standard_normal((n, n))
    da = 0.1 * (da + da.T) + np.eye(n)
    db = 0.5 * da
    gkw = dict(n_rad=30, n_theta=8, n_phi=16)
    g = xc_gradient(mol, da, db, xc="pbe", grid_kw=gkw)
    fn = xc_energy_fn(mol, xc="pbe", **gkw)
    h = 1e-5
    for a in range(2):
        cp = np.asarray(mol.coords, float).copy()
        cp[a, 2] += h
        cm = np.asarray(mol.coords, float).copy()
        cm[a, 2] -= h
        fd = (float(fn(cp, da, db)) - float(fn(cm, da, db))) / (2 * h)
        np.testing.assert_allclose(g[a, 2], fd, atol=1e-7)


def test_uks_gradient_fd():
    from tpumathlib.apps.xc import uhf
    from tpumathlib.apps.xcgrad import uks_gradient

    mol = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.6]]))
    gkw = dict(n_rad=30, n_theta=8, n_phi=16)
    g = uks_gradient(mol, spin=0, xc="svwn", grid_kw=gkw)
    h = 1e-3
    ep = uhf(_displaced(mol, 0, 2, h), spin=0, xc="svwn", grid_kw=gkw)[0]
    em = uhf(_displaced(mol, 0, 2, -h), spin=0, xc="svwn", grid_kw=gkw)[0]
    np.testing.assert_allclose(g[0, 2], (ep - em) / (2 * h), atol=5e-5)


def test_sad_guess():
    """SAD guess (≙ cuest_scf/sad_guess.py): correct electron count,
    same converged energy, fewer SCF iterations than the core guess."""
    from tpumathlib.apps.est import overlap, sto3g_shells
    from tpumathlib.apps.sad import atomic_half_density, sad_half_density

    d_o = atomic_half_density("O")
    s_o = overlap(sto3g_shells(Molecule(["O"], np.zeros((1, 3)))))
    np.testing.assert_allclose(np.sum(d_o * s_o), 4.0, atol=1e-6)

    mol = Molecule(["O", "H", "H"], np.array([
        [0.0, 0.0, 0.2217],
        [0.0, 1.4309, -0.8867],
        [0.0, -1.4309, -0.8867]]))
    d = sad_half_density(mol)
    s = overlap(sto3g_shells(mol))
    # block-diagonal guess traces each atom against its own overlap block
    np.testing.assert_allclose(np.trace(d @ s), mol.nelec / 2.0, atol=0.2)
    e_core, _, _, it_core = est.rhf(mol, return_iters=True)
    e_sad, _, _, it_sad = est.rhf(mol, guess="sad", return_iters=True)
    np.testing.assert_allclose(e_sad, e_core, atol=1e-8)
    assert it_sad < it_core


def test_sad_guess_basis_general():
    """Basis-general SAD (≙ sad_guess_atom.py solving each atom in the
    run's own basis): the per-atom blocks line up with the molecular
    spherical-AO dimension and trace to Z/2 against each atomic overlap."""
    from tpumathlib.apps.basis import basis_shells, sph_transform
    from tpumathlib.apps.est import overlap
    from tpumathlib.apps.sad import atomic_half_density, sad_half_density

    for sym, z in (("O", 8.0), ("H", 1.0)):
        d_a = atomic_half_density(sym, "def2-svp")
        amol = Molecule([sym], np.zeros((1, 3)))
        sh = basis_shells(amol, "def2-svp")
        c_t = sph_transform(sh)
        s_a = overlap(sh)
        if c_t is not None:
            s_a = c_t @ s_a @ c_t.T
        assert d_a.shape == s_a.shape
        np.testing.assert_allclose(np.sum(d_a * s_a), z / 2.0, atol=1e-6)

    mol = Molecule(["O", "H", "H"], np.array([
        [0.0, 0.0, 0.2217],
        [0.0, 1.4309, -0.8867],
        [0.0, -1.4309, -0.8867]]))
    d = sad_half_density(mol, "def2-svp")
    sh = basis_shells(mol, "def2-svp")
    c_t = sph_transform(sh)
    s = overlap(sh)
    if c_t is not None:
        s = c_t @ s @ c_t.T
    assert d.shape == s.shape          # spherical-AO dimension match
    np.testing.assert_allclose(np.trace(d @ s), mol.nelec / 2.0, atol=0.2)


def test_uhf_sad_guess():
    """guess="sad" through the UHF driver (spin-rescaled block guess):
    same converged energy as the core guess on an open-shell radical."""
    from tpumathlib.apps.xc import uhf

    mol = Molecule(["O", "H"], np.array([[0.0, 0.0, 0.0],
                                         [0.0, 0.0, 1.8324]]))
    e_core, _, _, _ = uhf(mol, spin=1)
    e_sad, _, _, _ = uhf(mol, spin=1, guess="sad")
    np.testing.assert_allclose(e_sad, e_core, atol=1e-7)


def test_rhf_d_polarized_basis():
    """d shells through the full SCF stack (the general-l integral path):
    a d-polarized H2 basis lowers the variational energy and the total is
    invariant under rigid rotation."""
    from tpumathlib.apps.est import GShell, _normalize, rhf, sto3g_shells

    def shells_for(mol):
        base = sto3g_shells(mol)
        for xyz in np.asarray(mol.coords, float):
            base.append(_normalize(GShell(
                2, np.array([0.8]), np.array([1.0]), xyz)))
        return base

    mol = H2
    e0, _, _ = rhf(mol)
    ed, _, _ = rhf(mol, shells=shells_for(mol))
    assert ed < e0 - 1e-4            # variational gain from polarization
    # rotational invariance of the Cartesian d block
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    mol2 = Molecule(mol.symbols, np.asarray(mol.coords) @ rot.T)
    ed2, _, _ = rhf(mol2, shells=shells_for(mol2))
    np.testing.assert_allclose(ed2, ed, atol=1e-8)


def test_property_gradients():
    """≙ python_examples/2_one_electron_integrals/property_gradients:
    density-contracted derivative integrals (incl. the fixed-origin
    multipole operator) vs central finite differences, with a
    NON-symmetric pseudo-density (the sample's configuration)."""
    from tpumathlib.apps.deriv import (grad_multipole, multipole_matrix,
                                       property_gradient)

    mol = HEH
    shells = est.sto3g_shells(mol)
    n = est.nbf(shells)
    rng = np.random.default_rng(3)
    d = rng.normal(size=(n, n))                  # non-symmetric

    order, origin = (1, 0, 0), (0.1, -0.2, 0.3)
    g = grad_multipole(shells, mol, order, origin)
    fd = _fd_matrix(lambda m: multipole_matrix(
        est.sto3g_shells(m), order, origin), mol)
    np.testing.assert_allclose(g, fd, atol=1e-6)

    for kind in ("overlap", "kinetic", "potential", "multipole"):
        pg = property_gradient(kind, shells, mol, d, order, origin)
        assert pg.shape == (2, 3)
        if kind == "multipole":
            np.testing.assert_allclose(
                pg, np.einsum("axij,ij->ax", fd, d), atol=1e-6)
    # quadrupole-order operator exercises the m=2 binomial path
    q = multipole_matrix(shells, (0, 2, 0), origin)
    s = est.overlap(shells)
    assert q.shape == s.shape and np.abs(q).max() > 0


def test_df_mo_integrals():
    """≙ python_examples/3_density_fitting/df_mo_integrals: the DF MO
    transformation's A_ij/A_ia/A_ab blocks reproduce exact MO-basis ERIs
    at the DF fitting error."""
    mol = HEH
    shells = est.sto3g_shells(mol)
    n = est.nbf(shells)
    e, c, _ = est.rhf(mol)
    nocc = mol.nelec // 2
    cocc, cvir = c[:, :nocc].T, c[:, nocc:].T
    df = est.DFTensors(shells)
    a_ij, a_ia, a_ab = df.mo_blocks([cocc, cocc, cvir],
                                    [cocc, cvir, cvir])
    naux = df.b.shape[-1]
    assert a_ij.shape == (naux, nocc, nocc)
    assert a_ia.shape == (naux, nocc, n - nocc)
    # (ij|ab) via DF = sum_P A_ij^P A_ab^P vs exact 4-center MO ERI
    eri = est.eri_tensor(shells)
    mo = np.einsum("im,jn,ka,lb,mnab->ijkl", cocc, cocc, cvir, cvir, eri)
    got = np.einsum("pij,pab->ijab", np.asarray(a_ij), np.asarray(a_ab))
    # tolerance = the auto_aux product-basis fitting error (measured
    # 2.5e-3 for HeH+), not a transform error: with identity coefficients
    # the blocks reproduce B exactly (below)
    np.testing.assert_allclose(got, mo, atol=5e-3)
    eye = np.eye(n)
    (a_full,) = df.mo_blocks([eye], [eye])
    np.testing.assert_allclose(np.asarray(a_full),
                               np.moveaxis(np.asarray(df.b), -1, 0),
                               atol=1e-6)

"""Production basis-set machinery (apps/basis.py).

≙ the reference's AO-basis infrastructure: .gbs parsing
(cuEST/cuest_scf_examples/cuest_scf/ao_basis.py:220-366), the shipped
def2-SVP / def2-universal-JKFIT / def2-SVP-ECP fixtures
(cuEST/data/basis_set/), and SCF at production-basis scale
(cuest_scf/rhf.py driven with basis='def2-svp').

Oracles: exactness invariants (spherical overlap identity, parse/format
round-trip, rotation invariance of the SCF energy) plus two-path
cross-validation — the full 4-center ERI path and the DF path with the
independent def2-universal-JKFIT auxiliary basis must agree at the
textbook DF error (~1e-4 Ha); a shared parser/transform bug cannot
cancel between them. The H2O number is additionally pinned as a
regression value.
"""

import os

import numpy as np
import pytest

from tpumathlib.apps.basis import (
    basis_shells,
    cart2sph,
    cart_components,
    format_gbs,
    load_basis,
    load_ecp,
    nfunc,
    parse_gbs,
    sph_transform,
)
from tpumathlib.apps.est import GShell, _normalize, overlap, rhf
from tpumathlib.apps.scf import Molecule

# r(OH) = 0.957 A, HOH = 104.5 deg (bohr)
WATER = Molecule(["O", "H", "H"],
                 np.array([[0.0, 0.0, 0.2217],
                           [0.0, 1.4309, -0.8867],
                           [0.0, -1.4309, -0.8867]]), 0)


def test_cart_components_order():
    assert cart_components(1) == ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    assert cart_components(2) == ((2, 0, 0), (1, 1, 0), (1, 0, 1),
                                  (0, 2, 0), (0, 1, 1), (0, 0, 2))
    assert len(cart_components(3)) == 10 and len(cart_components(4)) == 15


@pytest.mark.parametrize("l", [2, 3, 4])
def test_cart2sph_orthonormal(l):
    """A single-primitive pure shell's spherical overlap is the identity
    (real solid harmonics are orthonormal on the sphere)."""
    sh = _normalize(GShell(l, np.array([1.3]), np.array([1.0]),
                           np.zeros(3), pure=True))
    s = overlap([sh])
    t = cart2sph(l)
    np.testing.assert_allclose(t @ s @ t.T, np.eye(2 * l + 1), atol=1e-12)


def test_gbs_parse_structure():
    """def2-SVP shell structure: H = [2s1p] (5 fn), C/N/O = [3s2p1d]
    (14 fn) — the published basis composition."""
    b = load_basis("def2-svp")
    for sym in ("H", "C", "N", "O", "S", "Fe"):
        assert sym in b
    assert [l for l, _, _ in b["H"]] == [0, 0, 1]
    assert [l for l, _, _ in b["C"]] == [0, 0, 0, 1, 1, 2]
    shells = basis_shells(WATER, "def2-svp")
    assert nfunc(shells) == 14 + 5 + 5
    assert all(s.pure for s in shells)
    # the JKFIT auxiliary reaches g functions on heavy centers
    jk = load_basis("def2-universal-jkfit")
    assert max(l for l, _, _ in jk["O"]) >= 3


def test_gbs_round_trip():
    """format_gbs → parse_gbs reproduces exponents/coefficients."""
    b = load_basis("def2-svp")
    sub = {sym: b[sym] for sym in ("H", "O")}
    back, pure = parse_gbs(format_gbs(sub, pure=True))
    assert pure
    for sym in sub:
        assert len(back[sym]) == len(sub[sym])
        for (l1, e1, c1), (l2, e2, c2) in zip(sub[sym], back[sym]):
            assert l1 == l2
            np.testing.assert_allclose(e1, e2, rtol=1e-9)
            np.testing.assert_allclose(c1, c2, rtol=1e-9)


def test_gbs_fortran_d_and_sp():
    text = """spherical
****
H     0
SP   2   1.00
      1.30D+01     0.2000D+00   0.10
      2.00d-01     0.8000       0.90
****
"""
    els, pure = parse_gbs(text)
    assert pure and [l for l, _, _ in els["H"]] == [0, 1]
    np.testing.assert_allclose(els["H"][0][1], [13.0, 0.2])
    np.testing.assert_allclose(els["H"][0][2], [0.2, 0.8])
    np.testing.assert_allclose(els["H"][1][2], [0.1, 0.9])


def test_water_def2svp_rhf():
    """RHF/def2-SVP on H2O: full-ERI vs DF-JKFIT cross-validation at the
    DF error scale, plus the pinned regression energy."""
    e, _, _ = rhf(WATER, basis="def2-svp")
    edf, _, _ = rhf(WATER, basis="def2-svp", density_fit=True,
                    aux_basis="def2-universal-jkfit")
    assert abs(e - edf) < 2e-4, (e, edf)
    # regression value (this geometry), cross-validated by the two
    # independent ERI paths above; def2-SVP RHF water literature range
    # is -75.96 Ha
    assert abs(e - (-75.96098263)) < 1e-6, e


def test_rotation_invariance_def2svp():
    """Rigid rotation leaves the def2-SVP RHF energy invariant — a strong
    joint test of d-shell integrals + the spherical transform (any
    mis-scaled solid-harmonic row breaks it)."""
    e0, _, _ = rhf(WATER, basis="def2-svp", density_fit=True,
                   aux_basis="def2-universal-jkfit")
    th = 0.7
    rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    rx = np.array([[1.0, 0, 0], [0, np.cos(0.3), -np.sin(0.3)],
                   [0, np.sin(0.3), np.cos(0.3)]])
    rot = Molecule(WATER.symbols,
                   np.asarray(WATER.coords, float) @ (rz @ rx).T, 0)
    e1, _, _ = rhf(rot, basis="def2-svp", density_fit=True,
                   aux_basis="def2-universal-jkfit")
    assert abs(e0 - e1) < 1e-8, (e0, e1)


def test_methanol_def2svp_df_rhf():
    """Mid-size production run: methanol (6 atoms, 48 spherical fn)
    RHF/def2-SVP with the JKFIT auxiliary — the
    cuest_scf(basis='def2-svp', jk_basis='def2-universal-jkfit')
    configuration at molecule scale."""
    # CH3OH geometry (bohr)
    mol = Molecule(
        ["C", "O", "H", "H", "H", "H"],
        np.array([[-0.0503, 1.2847, 0.0],
                  [-0.0503, -1.4055, 0.0],
                  [1.9203, 1.9763, 0.0],
                  [-1.0003, 2.0299, 1.6693],
                  [-1.0003, 2.0299, -1.6693],
                  [1.7025, -1.9837, 0.0]]), 0)
    shells = basis_shells(mol, "def2-svp")
    assert nfunc(shells) == 2 * 14 + 4 * 5
    e, _, _, it = rhf(mol, basis="def2-svp", density_fit=True,
                      aux_basis="def2-universal-jkfit", return_iters=True)
    # SCF must actually converge, below the atomic-fragment energy sum
    assert it < 60
    assert -116.0 < e < -114.9, e


@pytest.mark.skipif(not os.environ.get("TPUMATHLIB_TEST_SLOW"),
                    reason="glycine/def2-SVP takes minutes (host integrals)")
def test_glycine_def2svp_df_rhf():
    """10-atom production-scale SCF (set TPUMATHLIB_TEST_SLOW=1)."""
    mol = Molecule(
        ["N", "C", "C", "O", "O", "H", "H", "H", "H", "H"],
        np.array([[3.597, -0.306, -0.543], [1.573, 1.029, 0.287],
                  [-1.082, -0.204, -0.163], [-1.356, -2.240, -1.165],
                  [-2.994, 1.056, 0.709], [3.524, -2.176, -0.064],
                  [5.229, 0.449, 0.207], [1.639, 2.989, -0.374],
                  [1.657, 1.065, 2.333], [-4.594, 0.141, 0.496]]), 0)
    e, _, _ = rhf(mol, basis="def2-svp", density_fit=True,
                  aux_basis="def2-universal-jkfit")
    assert -283.5 < e < -282.0, e


def test_uks_def2svp():
    """UKS(SVWN)/def2-SVP through the spherical-projected XC grid."""
    from tpumathlib.apps.xc import rks

    e, _, _ = rks(WATER, xc="svwn", basis="def2-svp", density_fit=True,
                  aux_basis="def2-universal-jkfit",
                  grid_kw=dict(n_rad=40, n_theta=10, n_phi=20))
    assert -76.2 < e < -75.5, e


def test_ecp_fixture_loading():
    """def2-SVP-ECP: 50 post-Kr elements with (lmax, ncore) channels
    feeding apps.ecp.ECPAtom (≙ cuEST data/basis_set/def2-svp-ecp.gbs)."""
    ecps = load_ecp("def2-svp-ecp")
    assert len(ecps) >= 50
    ag = ecps["AG"]
    assert ag.nelectron == 28
    assert ag.top.l == 3 and len(ag.shells) == 3
    # valence basis for the same elements ships in the basis table
    b = load_basis("def2-svp-ecp")
    assert "Ag" in b

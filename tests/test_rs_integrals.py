"""Range-separated (erf-attenuated) integral oracles.

The long-range ERI kernel erf(ω·r₁₂)/r₁₂ backs the exact-exchange split
of the reference's range-separated functionals (LC-wPBE / wB97X /
CAM-B3LYP / HSE06 ids, cuest_scf/xc_functionals.py:48-65). Oracles here
are fully independent of the Boys-function machinery under test:

1. the Gauss transform erf(ωr)/r = (2/√π)∫₀^ω e^{−t²r²} dt turns the
   s-primitive ERI into a 1-D quadrature over ANALYTIC Gaussian-overlap
   convolutions (scipy.integrate.quad);
2. the ω→0 kernel limit erf(ωr)/r → 2ω/√π makes the attenuated ERI
   tensor collapse to (2ω/√π)·S⊗S for EVERY angular momentum;
3. ω→∞ recovers the full-Coulomb tensor.
"""

import math

import numpy as np
import pytest
from scipy.integrate import quad

from tpumathlib.apps.est import (
    DFTensors,
    eri_tensor,
    overlap,
    sto3g_shells,
)
from tpumathlib.apps.integrals import eri_shell_prim, nuclear_prim, \
    overlap_prim
from tpumathlib.apps.scf import Molecule


def _gauss_conv(p, q, d2, t):
    """∫∫ e^{−p|r1−P|²} e^{−q|r2−Q|²} e^{−t²|r1−r2|²} d³r1 d³r2 with
    |P−Q|² = d2 — two nested 3-D Gaussian integrals in closed form."""
    c = t * t
    kappa = c * p / (p + c)
    return ((math.pi / (p + c)) ** 1.5 * (math.pi / (q + kappa)) ** 1.5
            * math.exp(-(q * kappa / (q + kappa)) * d2))


@pytest.mark.parametrize("p,q,dz,omega", [
    (1.0, 1.0, 0.0, 0.5),
    (0.8, 2.3, 1.7, 0.33),
    (5.0, 0.4, 0.9, 0.11),
    (1.2, 1.2, 3.1, 4.0),
])
def test_erf_eri_s_primitive_vs_gauss_transform(p, q, dz, omega):
    ra = rb = np.zeros(3)
    rc = rd = np.array([0.0, 0.0, dz])
    got = eri_shell_prim(p / 2, [(0, 0, 0)], ra, p / 2, [(0, 0, 0)], rb,
                         q / 2, [(0, 0, 0)], rc, q / 2, [(0, 0, 0)], rd,
                         omega=omega)[0, 0, 0, 0]
    # bra/ket product Gaussians carry no displacement prefactor here
    # (both primitives of each pair share a center)
    want = (2.0 / math.sqrt(math.pi)
            * quad(lambda t: _gauss_conv(p, q, dz * dz, t), 0.0, omega,
                   epsabs=1e-13, epsrel=1e-12)[0])
    assert abs(got - want) < 1e-10 * max(1.0, abs(want))


def _o_atom_def2svp():
    from tpumathlib.apps.basis import basis_shells

    return basis_shells(Molecule(["O"], np.zeros((1, 3))), "def2-svp")


def test_erf_eri_small_omega_collapses_to_overlap_product():
    """ω→0: erf(ωr)/r → 2ω/√π (a constant kernel), so
    (μν|g|λσ) → (2ω/√π) S_μν S_λσ — exercises s/p/d shells and every
    branch of the attenuated R-table at once."""
    shells = _o_atom_def2svp()          # s, p AND d shells on one center
    omega = 1e-5
    got = eri_tensor(shells, omega=omega) / (2.0 * omega / math.sqrt(math.pi))
    s = overlap(shells)
    want = np.einsum("mn,ls->mnls", s, s)
    assert np.max(np.abs(got - want)) < 1e-7


def test_erf_eri_large_omega_recovers_coulomb():
    shells = _o_atom_def2svp()
    full = eri_tensor(shells)
    lr = eri_tensor(shells, omega=1e5)
    assert np.max(np.abs(full - lr)) < 1e-7 * np.max(np.abs(full))


def test_erf_eri_monotone_in_omega():
    """Diagonal elements grow monotonically toward the Coulomb value
    (the erf kernel is pointwise increasing in ω)."""
    shells = sto3g_shells(Molecule(
        ["O", "H", "H"],
        np.array([[0.0, 0.0, 0.0], [0.0, -1.43, 1.11], [0.0, 1.43, 1.11]])))
    full = eri_tensor(shells)
    prev = None
    for omega in (0.2, 0.5, 1.0, 3.0):
        lr = eri_tensor(shells, omega=omega)
        diag = np.einsum("mnmn->mn", lr)
        if prev is not None:
            assert np.all(diag >= prev - 1e-12)
        assert np.all(diag <= np.einsum("mnmn->mn", full) + 1e-12)
        prev = diag


def test_erf_nuclear_small_omega_is_overlap():
    """Attenuated nuclear attraction: V_erf(ω→0) → (2ω/√π)·S."""
    a, b = 1.1, 0.7
    ra = np.array([0.1, -0.2, 0.3])
    rb = np.array([-0.4, 0.5, 0.0])
    rc = np.array([1.0, 0.2, -0.8])
    omega = 1e-5
    for lmn1 in [(0, 0, 0), (1, 0, 0), (0, 1, 1)]:
        for lmn2 in [(0, 0, 0), (0, 0, 1)]:
            v = nuclear_prim(a, lmn1, ra, b, lmn2, rb, rc, omega=omega)
            s = overlap_prim(a, lmn1, ra, b, lmn2, rb)
            assert abs(v / (2.0 * omega / math.sqrt(math.pi)) - s) < 1e-7


def test_df_lr_reconstruction_quality():
    """The g-metric RI of the erf kernel reconstructs the dense
    attenuated ERI about as well as the Coulomb-metric RI reconstructs
    the Coulomb ERI (same auto-aux basis)."""
    mol = Molecule(
        ["O", "H", "H"],
        np.array([[0.0, 0.0, 0.0], [0.0, -1.43, 1.11], [0.0, 1.43, 1.11]]))
    shells = sto3g_shells(mol)
    full = eri_tensor(shells)
    lr = eri_tensor(shells, omega=0.4)
    df = DFTensors(shells)
    df_lr = DFTensors(shells, omega=0.4)
    err_full = np.max(np.abs(
        np.einsum("mnp,lsp->mnls", df.b_np, df.b_np) - full))
    err_lr = np.max(np.abs(
        np.einsum("mnp,lsp->mnls", df_lr.b_np, df_lr.b_np) - lr))
    assert err_lr < 2.0 * err_full + 1e-4

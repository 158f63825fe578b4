"""Restricted Hartree–Fock SCF with DIIS — the cuEST-class showcase app.

Parity map (cuEST, SURVEY.md §2.13):
  Molecule / AOBasis            → Molecule / sto3g_basis (s-type contracted
                                  Gaussians: H, He — the survey's v1 scope)
  one-electron integral plans   → overlap / kinetic / nuclear (closed-form
                                  s-primitive formulas + Boys F₀)
  ERI (two-electron)            → eri_tensor ((ss|ss) closed form)
  coulomb/exchange builds       → einsum contractions (tensor tier, MXU)
  SCF driver with DIIS          → rhf() — density build, Fock, DIIS
                                  extrapolation, generalized eigensolve via
                                  solver.xsygvd (the suite's own syevd path)
  SADGuess                      → core-Hamiltonian guess

Energies verified against the Szabo–Ostlund STO-3G H₂ value (−1.1167 Ha at
R = 1.4 a₀) — the standard benchmark for this minimal basis.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from tpumathlib.solver.dense import xsygvd
from tpumathlib.tensor import einsum

# STO-3G s-shell exponents/coefficients (published basis-set data)
_STO3G = {
    "H": (np.array([3.42525091, 0.62391373, 0.16885540]),
          np.array([0.15432897, 0.53532814, 0.44463454])),
    "He": (np.array([6.36242139, 1.15892300, 0.31364979]),
           np.array([0.15432897, 0.53532814, 0.44463454])),
}
_Z = {"H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
      "F": 9, "Ne": 10}


@dataclasses.dataclass
class Molecule:
    """≙ cuest Molecule: symbols + coordinates (bohr) + charge."""

    symbols: Sequence[str]
    coords: np.ndarray  # (natom, 3), bohr
    charge: int = 0

    @property
    def nelec(self) -> int:
        return sum(_Z[s] for s in self.symbols) - self.charge

    def nuclear_repulsion(self) -> float:
        e = 0.0
        for i in range(len(self.symbols)):
            for j in range(i):
                r = np.linalg.norm(self.coords[i] - self.coords[j])
                e += _Z[self.symbols[i]] * _Z[self.symbols[j]] / r
        return e


@dataclasses.dataclass
class Shell:
    exps: np.ndarray
    coefs: np.ndarray  # contraction coefficients incl. primitive norms
    center: np.ndarray


def sto3g_basis(mol: Molecule) -> list[Shell]:
    """≙ cuest AOBasis: one contracted s shell per H/He atom."""
    shells = []
    for sym, xyz in zip(mol.symbols, mol.coords):
        exps, coefs = _STO3G[sym]
        norms = (2.0 * exps / np.pi) ** 0.75  # s-primitive normalization
        shells.append(Shell(exps, coefs * norms, np.asarray(xyz, float)))
    return shells


def _boys0(x):
    x = np.maximum(x, 1e-14)
    return np.where(x < 1e-10, 1.0,
                    0.5 * np.sqrt(np.pi / x) * np.vectorize(math.erf)(np.sqrt(x)))


def overlap(basis: list[Shell]) -> np.ndarray:
    """S_{μν} (≙ cuest compute_overlap)."""
    n = len(basis)
    s = np.zeros((n, n))
    for i, bi in enumerate(basis):
        for j, bj in enumerate(basis):
            r2 = np.sum((bi.center - bj.center) ** 2)
            a = bi.exps[:, None]
            b = bj.exps[None, :]
            p = a + b
            pref = (np.pi / p) ** 1.5 * np.exp(-a * b / p * r2)
            s[i, j] = np.sum(bi.coefs[:, None] * bj.coefs[None, :] * pref)
    return s


def kinetic(basis: list[Shell]) -> np.ndarray:
    """T_{μν} (≙ compute_kinetic)."""
    n = len(basis)
    t = np.zeros((n, n))
    for i, bi in enumerate(basis):
        for j, bj in enumerate(basis):
            r2 = np.sum((bi.center - bj.center) ** 2)
            a = bi.exps[:, None]
            b = bj.exps[None, :]
            p = a + b
            mu = a * b / p
            s_ab = (np.pi / p) ** 1.5 * np.exp(-mu * r2)
            t_ab = mu * (3.0 - 2.0 * mu * r2) * s_ab
            t[i, j] = np.sum(bi.coefs[:, None] * bj.coefs[None, :] * t_ab)
    return t


def nuclear(basis: list[Shell], mol: Molecule) -> np.ndarray:
    """V_{μν} nuclear attraction (≙ compute_potential)."""
    n = len(basis)
    v = np.zeros((n, n))
    for i, bi in enumerate(basis):
        for j, bj in enumerate(basis):
            r2 = np.sum((bi.center - bj.center) ** 2)
            a = bi.exps[:, None]
            b = bj.exps[None, :]
            p = a + b
            # Gaussian product center P = (a·A + b·B)/p, per primitive pair
            px = (a * bi.center[0] + b * bj.center[0]) / p
            py = (a * bi.center[1] + b * bj.center[1]) / p
            pz = (a * bi.center[2] + b * bj.center[2]) / p
            kab = np.exp(-a * b / p * r2)
            for sym, c in zip(mol.symbols, mol.coords):
                pc2 = (px - c[0]) ** 2 + (py - c[1]) ** 2 + (pz - c[2]) ** 2
                term = -_Z[sym] * 2.0 * np.pi / p * kab * _boys0(p * pc2)
                v[i, j] += np.sum(bi.coefs[:, None] * bj.coefs[None, :] * term)
    return v


def eri_tensor(basis: list[Shell]) -> np.ndarray:
    """(μν|λσ) two-electron repulsion integrals, (ss|ss) closed form
    (≙ the density-fitting J/K integral plans; full DF pipeline is a later
    round — the SCF consumes the exact 4-index tensor here)."""
    n = len(basis)
    eri = np.zeros((n, n, n, n))
    for i, bi in enumerate(basis):
        for j, bj in enumerate(basis):
            rab2 = np.sum((bi.center - bj.center) ** 2)
            for k, bk in enumerate(basis):
                for l, bl in enumerate(basis):
                    rcd2 = np.sum((bk.center - bl.center) ** 2)
                    val = 0.0
                    for ai, ci in zip(bi.exps, bi.coefs):
                        for aj, cj in zip(bj.exps, bj.coefs):
                            p = ai + aj
                            pc = (ai * bi.center + aj * bj.center) / p
                            kab = np.exp(-ai * aj / p * rab2)
                            for ak, ck in zip(bk.exps, bk.coefs):
                                for al, cl in zip(bl.exps, bl.coefs):
                                    q = ak + al
                                    qc = (ak * bk.center + al * bl.center) / q
                                    kcd = np.exp(-ak * al / q * rcd2)
                                    pq2 = np.sum((pc - qc) ** 2)
                                    f0 = float(_boys0(np.array(p * q / (p + q) * pq2)))
                                    val += (ci * cj * ck * cl * 2.0 * np.pi**2.5
                                            / (p * q * np.sqrt(p + q)) * kab * kcd * f0)
                    eri[i, j, k, l] = val
    return eri


def rhf(mol: Molecule, max_iters: int = 64, conv: float = 1e-8,
        diis_size: int = 6) -> dict:
    """RHF SCF with DIIS (≙ cuest_scf rhf.py:17-47 driver + DIIS class).

    Returns {"energy", "orbital_energies", "mo_coeff", "density",
    "iterations", "converged"}."""
    basis = sto3g_basis(mol)
    s = overlap(basis)
    hcore = kinetic(basis) + nuclear(basis, mol)
    eri = eri_tensor(basis)
    nocc = mol.nelec // 2
    assert mol.nelec % 2 == 0, "RHF needs a closed shell"

    sj = jnp.asarray(s)
    hj = jnp.asarray(hcore)
    gj = jnp.asarray(eri)

    def fock(d):
        # J/K builds as einsum contractions (tensor tier → MXU)
        jmat = einsum("uvls,ls->uv", gj, d)
        kmat = einsum("ulvs,ls->uv", gj, d)
        return hj + 2.0 * jmat - kmat

    def density(f):
        w, c, _ = xsygvd(f, sj)  # generalized eigensolve (our solver tier)
        cocc = c[:, :nocc]
        return cocc @ cocc.T, w, c

    # core guess (≙ SADGuess's role for these tiny systems)
    d, w, c = density(hj)
    energy = 0.0
    errs: list = []
    focks: list = []
    converged = False
    for it in range(1, max_iters + 1):
        f = fock(d)
        # DIIS (Pulay): error = F D S − S D F in the S-orthonormal metric
        err = f @ d @ sj - sj @ d @ f
        errs.append(np.asarray(err).ravel())
        focks.append(np.asarray(f))
        if len(errs) > diis_size:
            errs.pop(0)
            focks.pop(0)
        if len(errs) > 1:
            m = len(errs)
            bmat = -np.ones((m + 1, m + 1))
            bmat[-1, -1] = 0.0
            for a in range(m):
                for b in range(m):
                    bmat[a, b] = errs[a] @ errs[b]
            rhs = np.zeros(m + 1)
            rhs[-1] = -1.0
            try:
                coef = np.linalg.solve(bmat, rhs)[:m]
                f = jnp.asarray(np.einsum("k,kuv->uv", coef, np.asarray(focks)))
            except np.linalg.LinAlgError:
                pass
        d_new, w, c = density(f)
        e_new = float(jnp.sum((hj + fock(d_new)) * d_new)) + mol.nuclear_repulsion()
        if abs(e_new - energy) < conv and float(jnp.abs(d_new - d).max()) < np.sqrt(conv):
            d, energy = d_new, e_new
            converged = True
            break
        d, energy = d_new, e_new
    return {
        "energy": energy,
        "orbital_energies": np.asarray(w),
        "mo_coeff": np.asarray(c),
        "density": np.asarray(d),
        "iterations": it,
        "converged": converged,
    }

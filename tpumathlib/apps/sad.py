"""SAD (superposition of atomic densities) SCF initial guess.

≙ cuEST/cuest_scf_examples/cuest_scf/sad_guess.py:1 /
sad_guess_atom.py:1 / sad_atom_structure.py:1 — the reference solves
spherically-averaged fractional-occupation atomic problems once per
element and assembles a block-diagonal guess density.

Here each element's atom is solved by a fractional-occupation restricted
SCF in its own basis: degenerate eigenlevels (the p shells of a
spherically symmetric atom) share electrons equally, which IS the
spherical average — no solid-harmonic rotation machinery needed. Atomic
densities are cached per element.
"""

from __future__ import annotations

import functools

import numpy as np

from tpumathlib.apps.scf import Molecule, _Z


@functools.lru_cache(maxsize=None)
def atomic_half_density(symbol: str, basis: str | None = None) -> np.ndarray:
    """Spherically-averaged α-spin atomic density (nbf_atom², host f64):
    d = C·diag(n)·Cᵀ with Σn = Z/2, degenerate levels equally filled.
    ``basis`` names any packaged/parsed set (e.g. "def2-svp"): the
    atomic problem is solved in that basis (spherical transform applied)
    so the assembled guess matches the molecular AO dimension — the
    basis-general form of the reference's per-element SAD table
    (sad_guess_atom.py solves in the run's own basis)."""
    from tpumathlib.apps import est

    mol = Molecule([symbol], np.zeros((1, 3)))
    if basis is None:
        shells = est.sto3g_shells(mol)
        c_t = None
    else:
        from tpumathlib.apps.basis import basis_shells, sph_transform

        shells = basis_shells(mol, basis)
        c_t = sph_transform(shells)
    s = est.overlap(shells)
    hcore = est.kinetic(shells) + est.nuclear(shells, mol)
    eri = est.eri_tensor(shells)
    if c_t is not None:
        s = c_t @ s @ c_t.T
        hcore = c_t @ hcore @ c_t.T
        eri = np.einsum("im,jn,mnls->ijls", c_t, c_t, eri)
        eri = np.einsum("kl,hs,ijls->ijkh", c_t, c_t, eri)
    n = s.shape[0]
    half = _Z[symbol] / 2.0
    linv = np.linalg.inv(np.linalg.cholesky(s))

    def occupations(eps):
        """Aufbau with equal filling inside degenerate groups."""
        occ = np.zeros(n)
        remaining = half
        i = 0
        while remaining > 1e-12 and i < n:
            j = i
            while j + 1 < n and eps[j + 1] - eps[i] < 1e-6:
                j += 1
            g = j - i + 1
            fill = min(remaining, float(g))
            occ[i:j + 1] = fill / g
            remaining -= fill
            i = j + 1
        return occ

    def density(f):
        w, y = np.linalg.eigh(linv @ f @ linv.T)
        c = linv.T @ y
        occ = occupations(w)
        return (c * occ[None, :]) @ c.T

    d = density(hcore)
    for _ in range(60):
        j = np.einsum("mnls,ls->mn", eri, d)
        k = np.einsum("mlns,ls->mn", eri, d)
        f = hcore + 2.0 * j - k
        d_new = density(f)
        if np.max(np.abs(d_new - d)) < 1e-8:
            d = d_new
            break
        d = 0.5 * d + 0.5 * d_new          # damped: fractional-occ SCF
    return d


def sad_half_density(mol: Molecule, basis: str | None = None) -> np.ndarray:
    """Block-diagonal α-density guess over the molecule's AO ordering
    (≙ SADGuess.compute_Cocc's assembled density). ``basis`` selects the
    per-atom solve basis; shells are emitted atom-by-atom by
    basis_shells, so the atomic blocks line up with the molecular AO
    (and spherical-AO) ordering."""
    blocks = [atomic_half_density(s, basis) for s in mol.symbols]
    nbfs = [b.shape[0] for b in blocks]
    n = sum(nbfs)
    out = np.zeros((n, n))
    o = 0
    for b, nb in zip(blocks, nbfs):
        out[o:o + nb, o:o + nb] = b
        o += nb
    return out

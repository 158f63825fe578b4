"""cuEST step 2: p-orbital bases, general RHF, and density-fitted J/K.

≙ cuEST/c_examples/examples/2_one_electron_integrals (general-ℓ integral
plans), 3_density_fitting (B-tensor J/K builds), and the cuest_scf RHF
driver (cuest_scf/rhf.py:415-460 compute_coulomb/compute_exchange).

The integral engine is apps/integrals.py (McMurchie–Davidson, host);
everything O(N³)+ — the J/K contractions, DIIS, and the generalized
eigensolve — runs on device through the tensor and solver tiers."""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from tpumathlib.apps.integrals import (
    eri_shell_prim,
    kinetic_prim,
    norm_prim,
    nuclear_prim,
    overlap_prim,
)
from tpumathlib.apps.scf import Molecule, _Z
from tpumathlib.solver.dense import xsygvd
from tpumathlib.tensor import einsum

# STO-3G exponents; contraction coefficients are element-independent
_STO3G_1S_COEF = np.array([0.15432897, 0.53532814, 0.44463454])
_STO3G_2S_COEF = np.array([-0.09996723, 0.39951283, 0.70115470])
_STO3G_2P_COEF = np.array([0.15591627, 0.60768372, 0.39195739])
_STO3G_EXP = {
    "H": {"1s": np.array([3.42525091, 0.62391373, 0.16885540])},
    "He": {"1s": np.array([6.36242139, 1.15892300, 0.31364979])},
    "C": {"1s": np.array([71.6168370, 13.0450960, 3.5305122]),
          "2sp": np.array([2.9412494, 0.6834831, 0.2222899])},
    "N": {"1s": np.array([99.1061690, 18.0523120, 4.8856602]),
          "2sp": np.array([3.7804559, 0.8784966, 0.2857144])},
    "O": {"1s": np.array([130.7093200, 23.8088610, 6.4436083]),
          "2sp": np.array([5.0331513, 1.1695961, 0.3803890])},
}

def _cart(l):
    """General Cartesian components, CCA order (apps/basis.py)."""
    from tpumathlib.apps.basis import cart_components

    return cart_components(l)


@dataclasses.dataclass
class GShell:
    """Contracted Cartesian shell: angular momentum l, primitives, center.

    ``pure`` marks a spherical (real solid harmonic) shell: the integral
    engine still works in Cartesian components; the public functions are
    obtained through basis.sph_transform (applied by the drivers)."""

    l: int
    exps: np.ndarray
    coefs: np.ndarray  # contraction coefficients (pre-normalized primitives)
    center: np.ndarray
    pure: bool = False

    @property
    def lmns(self):
        return _cart(self.l)


def _normalize(shell: GShell) -> GShell:
    """Scale contraction coefficients by primitive norms + contracted norm
    (one representative lmn — Cartesian p components share the norm)."""
    lmn = shell.lmns[0]
    cs = shell.coefs * np.array(
        [norm_prim(a, lmn) for a in shell.exps])
    # contracted self-overlap → 1
    s = 0.0
    for ca, aa in zip(cs, shell.exps):
        for cb, ab in zip(cs, shell.exps):
            s += ca * cb * overlap_prim(aa, lmn, shell.center,
                                        ab, lmn, shell.center)
    return GShell(shell.l, shell.exps, cs / math.sqrt(s), shell.center,
                  pure=getattr(shell, "pure", False))


def sto3g_shells(mol: Molecule) -> list[GShell]:
    """STO-3G shell list with p functions for second-row atoms."""
    shells = []
    for sym, xyz in zip(mol.symbols, np.asarray(mol.coords, float)):
        tabs = _STO3G_EXP[sym]
        shells.append(_normalize(GShell(0, tabs["1s"], _STO3G_1S_COEF, xyz)))
        if "2sp" in tabs:
            shells.append(_normalize(
                GShell(0, tabs["2sp"], _STO3G_2S_COEF, xyz)))
            shells.append(_normalize(
                GShell(1, tabs["2sp"], _STO3G_2P_COEF, xyz)))
    return shells


def nbf(shells: Sequence[GShell]) -> int:
    return sum(len(s.lmns) for s in shells)


def _ao_list(shells):
    aos = []
    for s in shells:
        for lmn in s.lmns:
            aos.append((s, lmn))
    return aos


def _one_electron(shells, prim_fn) -> np.ndarray:
    aos = _ao_list(shells)
    n = len(aos)
    out = np.zeros((n, n))
    for i, (si, li) in enumerate(aos):
        for j, (sj, lj) in enumerate(aos):
            if j > i:
                continue
            v = 0.0
            for ca, aa in zip(si.coefs, si.exps):
                for cb, ab in zip(sj.coefs, sj.exps):
                    v += ca * cb * prim_fn(aa, li, si.center,
                                           ab, lj, sj.center)
            out[i, j] = out[j, i] = v
    return out


def overlap(shells) -> np.ndarray:
    """≙ cuest compute_overlap for general ℓ."""
    return _one_electron(shells, overlap_prim)


def kinetic(shells) -> np.ndarray:
    """≙ cuest compute_kinetic."""
    return _one_electron(shells, kinetic_prim)


def nuclear(shells, mol: Molecule) -> np.ndarray:
    """≙ cuest compute_potential (nuclear attraction)."""
    coords = np.asarray(mol.coords, float)

    def v(aa, li, ra, ab, lj, rb):
        s = 0.0
        for sym, rc in zip(mol.symbols, coords):
            s -= _Z[sym] * nuclear_prim(aa, li, ra, ab, lj, rb, rc)
        return s

    return _one_electron(shells, v)


def _shell_eri_block(s1, s2, s3, s4, omega=None) -> np.ndarray:
    out = np.zeros((len(s1.lmns), len(s2.lmns), len(s3.lmns), len(s4.lmns)))
    for c1, a1 in zip(s1.coefs, s1.exps):
        for c2, a2 in zip(s2.coefs, s2.exps):
            for c3, a3 in zip(s3.coefs, s3.exps):
                for c4, a4 in zip(s4.coefs, s4.exps):
                    out += (c1 * c2 * c3 * c4) * eri_shell_prim(
                        a1, s1.lmns, s1.center, a2, s2.lmns, s2.center,
                        a3, s3.lmns, s3.center, a4, s4.lmns, s4.center,
                        omega=omega)
    return out


def eri_tensor(shells, omega=None) -> np.ndarray:
    """Full (μν|λσ) tensor with 8-fold shell-quartet symmetry
    (≙ the cuEST ERI plan feeding compute_coulomb/exchange).
    ``omega``: long-range erf(ω·r₁₂)/r₁₂ kernel — the exact-exchange
    operator of range-separated hybrids (LC-wPBE/wB97X/CAM-B3LYP ids in
    cuest_scf/xc_functionals.py:48-65)."""
    offs = np.cumsum([0] + [len(s.lmns) for s in shells])
    n = offs[-1]
    out = np.zeros((n, n, n, n))
    ns = len(shells)
    for i in range(ns):
        for j in range(i + 1):
            for k in range(ns):
                for l in range(k + 1):
                    if (i * (i + 1) // 2 + j) < (k * (k + 1) // 2 + l):
                        continue
                    blk = _shell_eri_block(shells[i], shells[j],
                                           shells[k], shells[l], omega=omega)
                    si, sj = slice(offs[i], offs[i + 1]), slice(offs[j], offs[j + 1])
                    sk, sl = slice(offs[k], offs[k + 1]), slice(offs[l], offs[l + 1])
                    out[si, sj, sk, sl] = blk
                    out[sj, si, sk, sl] = blk.transpose(1, 0, 2, 3)
                    out[si, sj, sl, sk] = blk.transpose(0, 1, 3, 2)
                    out[sj, si, sl, sk] = blk.transpose(1, 0, 3, 2)
                    out[sk, sl, si, sj] = blk.transpose(2, 3, 0, 1)
                    out[sl, sk, si, sj] = blk.transpose(3, 2, 0, 1)
                    out[sk, sl, sj, si] = blk.transpose(2, 3, 1, 0)
                    out[sl, sk, sj, si] = blk.transpose(3, 2, 1, 0)
    return out


# ---------------- density fitting (≙ cuEST 3_density_fitting) ----------------

def auto_aux(shells) -> list[GShell]:
    """Product auxiliary basis (the automatic-auxiliary recipe): per
    center, uncompressed s/p/d functions at the pairwise sums of the
    orbital primitives' exponents — exponents deduplicated geometrically.
    A product of two orbital Gaussians on one center IS a Gaussian at the
    summed exponent with angular momentum ≤ l1+l2, so this basis spans the
    same-center densities that dominate the fit."""
    percenter: dict = {}
    for s in shells:
        key = tuple(np.round(s.center, 10))
        ent = percenter.setdefault(key, {"exps": {0: set(), 1: set()},
                                         "center": s.center})
        ent["exps"].setdefault(s.l, set()).update(float(a) for a in s.exps)
    aux = []
    for ent in percenter.values():
        pairs: dict[int, list[float]] = {0: [], 1: [], 2: []}
        ls = ent["exps"]
        all_prims = [(l, a) for l, es in ls.items() for a in es]
        for l1, a1 in all_prims:
            for l2, a2 in all_prims:
                lmax = min(l1 + l2, 2)
                pairs[lmax].append(a1 + a2)
        for l, exps in pairs.items():
            if not exps:
                continue
            exps = sorted(set(exps), reverse=True)
            kept: list[float] = []
            for a in exps:  # geometric dedupe at 20%
                if not kept or a < kept[-1] / 1.2:
                    kept.append(a)
            for a in kept:
                aux.append(_normalize(GShell(
                    l, np.array([a]), np.array([1.0]), ent["center"])))
    return aux


_ZERO_SHELL_EXP = 1e-16


def three_center(shells, aux, omega=None) -> np.ndarray:
    """(μν|P): 4-center ERIs with a unit s-Gaussian as the 4th index.
    ``omega``: erf-attenuated kernel (range-separated DF exchange)."""
    offs = np.cumsum([0] + [len(s.lmns) for s in shells])
    aoffs = np.cumsum([0] + [len(s.lmns) for s in aux])
    n, na = offs[-1], aoffs[-1]
    out = np.zeros((n, n, na))
    origin = np.zeros(3)
    for i, s1 in enumerate(shells):
        for j, s2 in enumerate(shells):
            if j > i:
                continue
            for k, sp in enumerate(aux):
                blk = np.zeros((len(s1.lmns), len(s2.lmns), len(sp.lmns)))
                for c1, a1 in zip(s1.coefs, s1.exps):
                    for c2, a2 in zip(s2.coefs, s2.exps):
                        for c3, a3 in zip(sp.coefs, sp.exps):
                            blk += (c1 * c2 * c3) * eri_shell_prim(
                                a1, s1.lmns, s1.center,
                                a2, s2.lmns, s2.center,
                                a3, sp.lmns, sp.center,
                                _ZERO_SHELL_EXP, [(0, 0, 0)], sp.center,
                                omega=omega,
                            )[:, :, :, 0]
                si = slice(offs[i], offs[i + 1])
                sj = slice(offs[j], offs[j + 1])
                sk = slice(aoffs[k], aoffs[k + 1])
                out[si, sj, sk] = blk
                out[sj, si, sk] = blk.transpose(1, 0, 2)
    return out


def metric_2c(aux, omega=None) -> np.ndarray:
    """(P|Q) Coulomb metric of the auxiliary basis (erf-attenuated when
    ``omega`` is given — the erf kernel is positive definite, so the
    attenuated metric stays a valid RI metric)."""
    aoffs = np.cumsum([0] + [len(s.lmns) for s in aux])
    na = aoffs[-1]
    out = np.zeros((na, na))
    for i, sp in enumerate(aux):
        for j, sq in enumerate(aux):
            if j > i:
                continue
            blk = np.zeros((len(sp.lmns), len(sq.lmns)))
            for c1, a1 in zip(sp.coefs, sp.exps):
                for c2, a2 in zip(sq.coefs, sq.exps):
                    blk += (c1 * c2) * eri_shell_prim(
                        a1, sp.lmns, sp.center,
                        _ZERO_SHELL_EXP, [(0, 0, 0)], sp.center,
                        a2, sq.lmns, sq.center,
                        _ZERO_SHELL_EXP, [(0, 0, 0)], sq.center,
                        omega=omega,
                    )[:, 0, :, 0]
            out[aoffs[i]:aoffs[i + 1], aoffs[j]:aoffs[j + 1]] = blk
            out[aoffs[j]:aoffs[j + 1], aoffs[i]:aoffs[i + 1]] = blk.T
    return out


class DFTensors:
    """B_P^{μν} fit tensor: (μν|P)(P|Q)^{-1/2} — J/K become einsum
    contractions on the MXU (≙ cuest compute_coulomb/compute_exchange with
    density fitting).

    Spherical (pure) shells — in the orbital basis AND/OR the auxiliary
    basis (e.g. def2-SVP + def2-universal-jkfit) — are handled by
    transforming the Cartesian integral blocks with basis.sph_transform,
    so B lives in the public function space.

    ``omega``: builds the RI factorization of the LONG-RANGE operator
    erf(ω·r₁₂)/r₁₂ in its own (attenuated) metric — B̃ = (μν|g|P)
    (P|g|Q)^{−1/2}, exact in the complete-aux limit because the erf
    kernel is positive definite (its Fourier transform (4π/k²)e^{−k²/4ω²}
    is positive). This feeds the −β·K_LR exact-exchange term of
    range-separated hybrid SCF (apps/xc.py rs_params)."""

    def __init__(self, shells, aux=None, omega=None):
        from tpumathlib.apps.basis import sph_transform

        aux = aux if aux is not None else auto_aux(shells)
        v = metric_2c(aux, omega=omega)
        t3 = three_center(shells, aux, omega=omega)
        c_ao = sph_transform(shells)
        c_aux = sph_transform(aux)
        if c_aux is not None:
            v = c_aux @ v @ c_aux.T
            t3 = np.einsum("mnp,qp->mnq", t3, c_aux)
        if c_ao is not None:
            t3 = np.einsum("im,jn,mnp->ijp", c_ao, c_ao, t3)
        w, u = np.linalg.eigh(v)
        keep = w > 1e-10 * w.max()
        vinvh = (u[:, keep] / np.sqrt(w[keep])) @ u[:, keep].T
        self.b_np = np.einsum("mnp,pq->mnq", t3, vinvh)
        self.b = jnp.asarray(self.b_np)

    def coulomb(self, d):
        """J_{μν} = Σ_P B_P^{μν} (Σ_{λσ} B_P^{λσ} D_{λσ})."""
        g = einsum("mnp,mn->p", self.b, jnp.asarray(d))
        return einsum("mnp,p->mn", self.b, g)

    def exchange(self, d):
        """K_{μν} = Σ_P Σ_{λσ} B_P^{μλ} D_{λσ} B_P^{νσ}."""
        bd = einsum("mlp,ls->msp", self.b, jnp.asarray(d))
        return einsum("msp,nsp->mn", bd, self.b)

    def mo_blocks(self, c_lefts, c_rights):
        """DF MO integral transformation (≙ cuestDFMOIntegralsCompute,
        python_examples/3_density_fitting/df_mo_integrals/run.py:31-39):
        for each (C_left (nl, nao), C_right (nr, nao)) pair, return
        A^P_{pq} = Σ_{μν} C_left[p,μ] B^{μν}_P C_right[q,ν] as a
        (naux, nl, nr) device tensor — the sample's A_ij/A_ia/A_ab
        blocks are (C_occ, C_occ), (C_occ, C_vir), (C_vir, C_vir)."""
        out = []
        for cl, cr in zip(c_lefts, c_rights):
            clj = jnp.asarray(cl, self.b.dtype)
            crj = jnp.asarray(cr, self.b.dtype)
            out.append(einsum("mnp,im,jn->pij", self.b, clj, crj))
        return out


def rhf(mol: Molecule, max_iters: int = 80, conv: float = 1e-9,
        density_fit: bool = False, guess: str = "core",
        return_iters: bool = False, shells=None, basis: str | None = None,
        aux_basis: str | None = None, hcore_extra=None):
    """General-ℓ restricted Hartree–Fock with DIIS. Returns
    (E_total, C, eps) — plus the iteration count when return_iters.
    density_fit=True builds J/K from DF tensors. guess: "core" (Hcore
    eigenvectors) or "sad" (superposition of atomic densities,
    ≙ cuest_scf/sad_guess.py:1).

    Hybrid precision split: the O(N⁴) J/K contractions run on device
    (MXU einsums — f32 on TPU, f64 under x64), while the small-matrix
    algebra (DIIS extrapolation, generalized eigensolve, energy
    accumulation) stays in host f64. The SCF fixed point is variational,
    so an O(1e-5) f32 Fock perturbation enters the final f64 energy only
    at second order — reference-accuracy totals on an f32-only chip.

    ``shells`` overrides the basis directly; ``basis`` names a packaged
    production set ("def2-svp" — spherical d/f functions handled through
    basis.sph_transform) and ``aux_basis`` the DF auxiliary
    ("def2-universal-jkfit"), ≙ the reference's
    cuest_scf(molecule, basis='def2-svp', jk_basis='def2-universal-jkfit')
    flow (cuest_scf/rhf.py + data/basis_set fixtures)."""
    from tpumathlib.apps.basis import basis_shells, sph_transform

    if shells is None:
        shells = (basis_shells(mol, basis) if basis is not None
                  else sto3g_shells(mol))
    c_t = sph_transform(shells)
    s = overlap(shells)
    hcore = kinetic(shells) + nuclear(shells, mol)
    if c_t is not None:
        s = c_t @ s @ c_t.T
        hcore = c_t @ hcore @ c_t.T
    if hcore_extra is not None:
        # finite-field / external-potential hook (already in the
        # SPHERICAL function space): H_core += extra. Used by the CPHF
        # finite-field oracle (apps/cphf.py) and general embedding.
        hcore = hcore + np.asarray(hcore_extra, float)
    nocc = mol.nelec // 2
    if density_fit:
        eri_np = None
        aux = (basis_shells(mol, aux_basis) if aux_basis is not None
               else None)
        df = DFTensors(shells, aux=aux)
    else:
        eri_np = eri_tensor(shells)
        if c_t is not None:
            eri_np = np.einsum("im,jn,mnls->ijls", c_t, c_t, eri_np)
            eri_np = np.einsum("kl,hs,ijls->ijkh", c_t, c_t, eri_np)
        eri = jnp.asarray(eri_np)

    def jk_device(d):
        dj = jnp.asarray(d)
        if density_fit:
            return (np.asarray(df.coulomb(dj), np.float64),
                    np.asarray(df.exchange(dj), np.float64))
        return (np.asarray(einsum("mnls,ls->mn", eri, dj), np.float64),
                np.asarray(einsum("mlns,ls->mn", eri, dj), np.float64))

    def fock(d):
        j, k = jk_device(d)
        return hcore + 2.0 * j - k

    # host f64 generalized eigensolve via Cholesky reduction
    lmat = np.linalg.cholesky(s)
    linv = np.linalg.inv(lmat)

    def density(f):
        w, y = np.linalg.eigh(linv @ f @ linv.T)
        c = linv.T @ y
        cocc = c[:, :nocc]
        return cocc @ cocc.T, c, w

    if guess == "sad":
        from tpumathlib.apps.sad import sad_half_density

        # basis-general: atoms are solved in the run's own basis
        d = sad_half_density(mol, basis)
        if d.shape != s.shape:      # custom `shells` override: no table
            d, c, eps = density(hcore)
        else:
            _, c, eps = density(hcore)
    else:
        d, c, eps = density(hcore)
    e_old = 0.0
    errs, focks = [], []
    e = 0.0
    best_de, stall = float("inf"), 0
    for it in range(max_iters):
        f = fock(d)
        e = float(np.sum(d * (hcore + f))) + mol.nuclear_repulsion()
        # DIIS (host f64)
        err = f @ d @ s - s @ d @ f
        errs.append(err)
        focks.append(f)
        if len(errs) > 8:
            errs.pop(0)
            focks.pop(0)
        if len(errs) > 1:
            m = len(errs)
            bmat = -np.ones((m + 1, m + 1))
            bmat[m, m] = 0.0
            for a in range(m):
                for bidx in range(m):
                    bmat[a, bidx] = np.sum(errs[a] * errs[bidx])
            rhs = np.zeros(m + 1)
            rhs[m] = -1.0
            try:
                wts = np.linalg.solve(bmat, rhs)[:m]
                f = np.einsum("i,imn->mn", wts, np.stack(focks))
            except np.linalg.LinAlgError:
                pass
        d, c, eps = density(f)
        de = abs(e - e_old)
        if de < conv and it > 1:
            break
        # f32-device noise floor (measured on chip, NOTES_r4): with f32
        # J/K the energy plateaus around 1e-5..1e-6 Ha — stop once the
        # plateau stops improving instead of burning max_iters
        if it > 1 and de < 1e-5:
            stall = stall + 1 if de >= best_de else 0
            best_de = min(best_de, de)
            if stall >= 8:
                break
        e_old = e
    # final energy at full host f64 (variational: density error enters at
    # second order, so the f32 device iterations don't touch the total)
    if eri_np is not None:
        j = np.einsum("mnls,ls->mn", eri_np, d)
        k = np.einsum("mlns,ls->mn", eri_np, d)
    else:
        g = np.einsum("mnp,mn->p", df.b_np, d)
        j = np.einsum("mnp,p->mn", df.b_np, g)
        bd = np.einsum("mlp,ls->msp", df.b_np, d)
        k = np.einsum("msp,nsp->mn", bd, df.b_np)
    e = float(np.sum(d * (2 * hcore + 2 * j - k))) + mol.nuclear_repulsion()
    if return_iters:
        return e, c, eps, it + 1
    return e, c, eps

"""cuEST step 6: effective core potentials (ECP).

≙ cuEST/python_examples/5_effective_core_potentials/ecp_integrals/run.py:1
(ECPShell/ECPAtom/ECPIntPlan lifecycle → the ⟨μ|U_ECP|ν⟩ matrix) and
ecp_gradients/run.py:1 (density-contracted nuclear gradients), plus the
Gaussian-format .ecp parser the reference's helpers provide
(helpers/parsers.py simple_ecp_parser).

Semi-local pseudopotential
    U = U_L(r) + Σ_{l<L} Σ_m |Y_lm⟩ [U_l(r) − U_L(r)] ⟨Y_lm|,
    U_l(r) = Σ_k c_k r^{n_k−2} exp(−α_k r²)   (channels centered on the
    ECP atom).

TPU-native design: instead of the reference's analytic type-1/type-2
angular integral kernels, both terms are evaluated by spherical-shell
quadrature around the ECP center — radial Gauss–Chebyshev × the suite's
product angular grid. The real-spherical-harmonic table lives on STATIC
unit vectors, so the whole evaluation is three einsums over
(nrad, nang, nao) AO-value tensors: MXU work under jit, and exactly
differentiable w.r.t. atomic coordinates (the gradient sample's
requirement) because only AO/center positions carry coordinate
dependence. Angular quadrature is exact through degree
min(2·n_theta−1, n_phi−1) ≥ the AO×AO×Y_l band limit used in tests.
"""

from __future__ import annotations

import dataclasses
import math
import re

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.apps.est import sto3g_shells
from tpumathlib.apps.scf import Molecule
from tpumathlib.apps.xc import _angular_product


def _radial_gl(n: int, rscale: float):
    """Gauss–Legendre radial grid under the Becke map r = R(1+x)/(1−x),
    weights including r²·dr. Unlike the XC tier's Gauss–Chebyshev rule
    (whose sin² weight assumes the integrand vanishes at both endpoints),
    GL converges fast for the r⁻² ECP channels whose mapped integrand is
    finite at r = 0."""
    x, w = np.polynomial.legendre.leggauss(n)
    r = rscale * (1.0 + x) / (1.0 - x)
    drdx = 2.0 * rscale / (1.0 - x) ** 2
    return r, w * drdx * r ** 2


# ---------------- data model (≙ cuestECPShell / cuestECPAtom) ------------

@dataclasses.dataclass
class ECPShell:
    """One radial channel: U(r) = Σ_k coefs·r^(powers−2)·exp(−exps·r²).
    ≙ cuestECPShellCreate(L, numPrimitive, rExponents, exponents,
    coefficients)."""

    l: int                  # angular momentum; the top shell carries l = L
    powers: np.ndarray      # r-exponents n_k (Gaussian-format convention)
    exps: np.ndarray
    coefs: np.ndarray

    def radial(self, r, xp=np):
        r = xp.asarray(r)
        out = xp.zeros_like(r)
        for n, a, c in zip(self.powers, self.exps, self.coefs):
            out = out + c * r ** (int(n) - 2) * xp.exp(-a * r * r)
        return out


@dataclasses.dataclass
class ECPAtom:
    """≙ cuestECPAtomCreate(numElectrons, shells, topShell)."""

    nelectron: int          # core electrons replaced
    top: ECPShell           # the local channel U_L
    shells: list            # semi-local channels, l = 0..L−1


def parse_ecp(text: str) -> dict:
    """Parse Gaussian-format ECP blocks (the format simple_ecp_parser
    reads):

        NA     0
        NA-ECP     2     10
        d potential
          1
        1      175.5502590            -10.0000000
        s-d potential
          2
        0      243.3605846             10.0000000
        2      125.8616830            135.8406420
        ...

    Returns {SYMBOL: ECPAtom}. Channel headers are '<x> potential' (the
    first is the local/top channel); per-primitive lines are
    'power exponent coefficient'."""
    lines = [ln for ln in (l.strip() for l in text.splitlines())
             if ln and not ln.startswith("!")]
    out = {}
    i = 0
    head = re.compile(r"^(\S+?)-ECP\s+(\d+)\s+(\d+)$", re.I)
    while i < len(lines):
        m = head.match(lines[i])
        if not m:
            i += 1
            continue
        sym, lmax, ncore = m.group(1).upper(), int(m.group(2)), int(m.group(3))
        i += 1
        channels = []
        while i < len(lines) and "potential" in lines[i].lower():
            i += 1
            nprim = int(lines[i])
            i += 1
            rows = []
            for _ in range(nprim):
                rows.append([float(x) for x in lines[i].split()[:3]])
                i += 1
            rows = np.asarray(rows)
            channels.append(ECPShell(0, rows[:, 0].astype(int), rows[:, 1],
                                     rows[:, 2]))
        top = channels[0]
        top.l = lmax
        semis = channels[1:]
        for l, sh in enumerate(semis):
            sh.l = l
        out[sym] = ECPAtom(ncore, top, semis)
    return out


# ---------------- static angular machinery ----------------

def _real_sph_harm(lmax: int, pts: np.ndarray) -> np.ndarray:
    """Real spherical harmonics table Y[(l,m) flattened, nang] on static
    unit vectors (associated-Legendre recursion, Condon–Shortley absorbed;
    orthonormal under the product-grid quadrature — asserted in tests)."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    ct = z
    st = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    phi = np.arctan2(y, x)
    # associated Legendre P_l^m(cosθ) by standard recursion
    p = {}
    p[(0, 0)] = np.ones_like(ct)
    for m in range(1, lmax + 1):
        p[(m, m)] = -(2 * m - 1) * st * p[(m - 1, m - 1)]
    for m in range(0, lmax):
        p[(m + 1, m)] = (2 * m + 1) * ct * p[(m, m)]
    for l in range(2, lmax + 1):
        for m in range(0, l - 1):
            p[(l, m)] = ((2 * l - 1) * ct * p[(l - 1, m)]
                         - (l + m - 1) * p[(l - 2, m)]) / (l - m)
    rows = []
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            nrm = math.sqrt((2 * l + 1) / (4 * math.pi)
                            * math.factorial(l - am)
                            / math.factorial(l + am))
            if m == 0:
                rows.append(nrm * p[(l, 0)])
            elif m > 0:
                rows.append(math.sqrt(2.0) * nrm * p[(l, am)]
                            * np.cos(am * phi))
            else:
                rows.append(math.sqrt(2.0) * nrm * p[(l, am)]
                            * np.sin(am * phi))
    return np.stack(rows)


def _ao_values_jax(meta, coords, pts):
    """AO values (npts, nao) differentiable in coords; meta from
    xcgrad._shell_meta (static exps/coefs/lmns, centers = coords[ia])."""
    from tpumathlib.apps.xcgrad import _pow

    cols = []
    for l, lmns, exps, coefs, ia in meta:
        ctr = coords[ia]
        dx = pts - ctr[None, :]
        r2 = jnp.sum(dx * dx, axis=1)
        rad = jnp.zeros_like(r2)
        for c, alpha in zip(coefs, exps):
            rad = rad + c * jnp.exp(-alpha * r2)
        for lmn in lmns:
            cols.append(_pow(dx[:, 0], lmn[0]) * _pow(dx[:, 1], lmn[1])
                        * _pow(dx[:, 2], lmn[2]) * rad)
    return jnp.stack(cols, axis=1)


# ---------------- the integral plan (≙ cuestECPIntPlan) ----------------

@dataclasses.dataclass
class ECPIntPlan:
    """Plan: static quadrature + Y tables per ECP atom → one jitted
    evaluation (≙ cuestECPIntPlanCreate + cuestECPIntCompute)."""

    mol: Molecule
    ecp_atoms: dict          # {atom_index: ECPAtom}
    shells: list | None = None
    n_rad: int = 80
    n_theta: int = 18
    n_phi: int = 36
    rscale: float = 1.0

    def __post_init__(self):
        from tpumathlib.apps.xcgrad import _shell_meta

        mol = self.mol
        self.shells = (self.shells if self.shells is not None
                       else sto3g_shells(mol))
        coords = np.asarray(mol.coords, float)
        self._meta = _shell_meta(self.shells, coords)
        sph, wsph = _angular_product(self.n_theta, self.n_phi)
        r, wr = _radial_gl(self.n_rad, self.rscale)  # wr includes r²·dr
        self._ang = (jnp.asarray(sph), jnp.asarray(wsph))
        self._rad = (jnp.asarray(r), jnp.asarray(wr))
        self._r_np = r
        # per-ECP-atom static tables
        self._per_atom = []
        for ia, ecp in sorted(self.ecp_atoms.items()):
            lmax_semi = max((s.l for s in ecp.shells), default=-1)
            y = (_real_sph_harm(lmax_semi, sph) if lmax_semi >= 0
                 else np.zeros((0, len(sph))))
            # radial channel values on the grid (static)
            u_top = ecp.top.radial(r)
            du = np.zeros((len(ecp.shells), len(r)))
            lslices = []
            for s in ecp.shells:
                du[len(lslices)] = s.radial(r) - u_top
                lslices.append((s.l ** 2, (s.l + 1) ** 2))
            self._per_atom.append(
                (ia, jnp.asarray(u_top), jnp.asarray(du),
                 jnp.asarray(y), lslices))

    def matrix(self, coords=None) -> jnp.ndarray:
        """⟨μ|U_ECP|ν⟩ (nao, nao); pass coords to evaluate at displaced
        geometries (jax.grad-able)."""
        coords = (jnp.asarray(np.asarray(self.mol.coords, float))
                  if coords is None else jnp.asarray(coords))
        sph, wsph = self._ang
        r, wr = self._rad
        nao = sum(len(m[1]) for m in self._meta)
        out = jnp.zeros((nao, nao))
        for ia, u_top, du, y, lslices in self._per_atom:
            ctr = coords[ia]
            # all shell points at once: (nrad, nang, 3)
            pts = (ctr[None, None, :] + r[:, None, None] * sph[None, :, :])
            phi = _ao_values_jax(self._meta, coords,
                                 pts.reshape(-1, 3)).reshape(
                len(self._r_np), -1, nao)            # (nrad, nang, nao)
            # local channel: Σ_i wr_i U_L(r_i) Σ_j wsph_j φμ φν
            out = out + jnp.einsum("i,i,j,ijm,ijn->mn", wr, u_top, wsph,
                                   phi, phi, optimize=True)
            # semi-local: projections P[lm, i, m] = Σ_j wsph Y φ
            if y.shape[0]:
                proj = jnp.einsum("kj,j,ijm->kim", y, wsph, phi,
                                  optimize=True)
                for c, (k0, k1) in enumerate(lslices):
                    out = out + jnp.einsum("i,i,kim,kin->mn", wr, du[c],
                                           proj[k0:k1], proj[k0:k1],
                                           optimize=True)
        return out


def ecp_matrix(mol: Molecule, ecp_atoms: dict, shells=None,
               **kw) -> np.ndarray:
    """One-shot ⟨μ|U_ECP|ν⟩ (≙ ecp_integrals/run.py's single compute)."""
    return np.asarray(ECPIntPlan(mol, ecp_atoms, shells, **kw).matrix(),
                      float)


def ecp_gradient(mol: Molecule, density, ecp_atoms: dict, shells=None,
                 **kw) -> np.ndarray:
    """∂(Σ_μν D_μν ⟨μ|U_ECP|ν⟩)/∂R (natom, 3) — jax.grad through the
    quadrature: grid shells ride the ECP center, AOs ride their atoms, so
    the derivative of the discretized integral is exact.
    ≙ 5_effective_core_potentials/ecp_gradients/run.py:1."""
    plan = ECPIntPlan(mol, ecp_atoms, shells, **kw)
    d = jnp.asarray(np.asarray(density, float))

    def e(coords):
        return jnp.sum(d * plan.matrix(coords))

    return np.array(jax.grad(e)(jnp.asarray(np.asarray(mol.coords, float))))


def rhf_ecp(mol: Molecule, ecp_atoms: dict, max_iters: int = 80,
            conv: float = 1e-9):
    """Valence-only RHF: hcore += U_ECP, electron count reduced by the
    replaced cores, nuclear charges screened by nelectron in V_NN and
    V_ne. Returns (E_total, C, eps)."""
    from tpumathlib.apps import est
    from tpumathlib.apps.scf import _Z

    shells = sto3g_shells(mol)
    s = est.overlap(shells)
    zeff = {ia: ecp.nelectron for ia, ecp in ecp_atoms.items()}
    # screened nuclear attraction: subtract the core charge's point term
    hcore = est.kinetic(shells) + est.nuclear(shells, mol)
    from tpumathlib.apps.deriv import potential_integrals
    coords = np.asarray(mol.coords, float)
    for ia, ncore in zeff.items():
        hcore += ncore * potential_integrals(shells, coords[ia][None])[0]
    hcore += ecp_matrix(mol, ecp_atoms, shells)
    eri = jnp.asarray(est.eri_tensor(shells))
    nelec = mol.nelec - sum(zeff.values())
    nocc = nelec // 2
    zs = [_Z[sym] for sym in mol.symbols]
    e_nn = 0.0
    for i in range(len(zs)):
        for j in range(i):
            zi = zs[i] - zeff.get(i, 0)
            zj = zs[j] - zeff.get(j, 0)
            e_nn += zi * zj / np.linalg.norm(coords[i] - coords[j])
    linv = np.linalg.inv(np.linalg.cholesky(s))

    def geig(f):
        w, y = np.linalg.eigh(linv @ f @ linv.T)
        return w, linv.T @ y

    eps, c = geig(hcore)
    e_old = 0.0
    for it in range(max_iters):
        p = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        j = np.asarray(jnp.einsum("mnls,ls->mn", eri, jnp.asarray(p)),
                       np.float64)
        k = np.asarray(jnp.einsum("mlns,ls->mn", eri, jnp.asarray(p)),
                       np.float64)
        f = hcore + j - 0.5 * k
        e = 0.5 * np.sum(p * (hcore + f)) + e_nn
        eps, c = geig(f)
        if abs(e - e_old) < conv and it > 1:
            break
        e_old = e
    return e, c, eps

"""cuEST step 4a: analytic derivative integrals + nuclear gradients.

≙ cuEST gradient plans: python_examples/4_exchange_correlation/
local_xc_gradient/run.py:1 (XC gradient on the grid),
5_effective_core_potentials/ecp_gradients/run.py:1 (handled in apps/ecp.py)
and the gradient machinery behind cuest_scf (Pulay forces, energy-weighted
density term).

Design:

* one-/two-electron derivative integrals use the primitive-Gaussian
  derivative identity d/dAx |l⟩ = 2a|l+1x⟩ − lx|l−1x⟩ evaluated inside the
  McMurchie–Davidson tables (apps/integrals.py), sharing E/R tables between
  the value and all 12 derivative slots — host analysis-stage work;
* the XC gradient is jax.grad of a fully differentiable grid energy
  (JAX twins of molecular_grid/eval_aos in apps/xc.py) — grid points,
  Becke weights and AO centers all move with the atoms, so weight
  derivatives are exact by construction (TPU-native: autodiff replaces
  the reference's hand-derived CUDA gradient kernels);
* multi-center potential integrals ⟨μ|1/|r−c_g||ν⟩ are vectorized over
  centers (one Boys table per primitive pair for ALL centers) — shared by
  the PCM tier (apps/pcm.py) and the Hellmann–Feynman term here.
"""

from __future__ import annotations

import math

import numpy as np

from tpumathlib.apps.est import GShell, _ao_list
from tpumathlib.apps.integrals import (
    _e_table,
    _r_table,
    kinetic_prim,
    nuclear_prim,
    overlap_prim,
)
from tpumathlib.apps.scf import Molecule, _Z


# ---------------- primitive derivative helper ----------------

def _dprim(prim_fn, a, lmn1, ra, *rest, axis: int):
    """d/dA_axis of a primitive integral via the shifted-ℓ identity."""
    up = list(lmn1)
    up[axis] += 1
    val = 2.0 * a * prim_fn(a, tuple(up), ra, *rest)
    if lmn1[axis] > 0:
        dn = list(lmn1)
        dn[axis] -= 1
        val -= lmn1[axis] * prim_fn(a, tuple(dn), ra, *rest)
    return val


def _shell_atom_map(shells, mol: Molecule) -> list[int]:
    coords = np.asarray(mol.coords, float)
    out = []
    for s in shells:
        d = np.linalg.norm(coords - s.center[None], axis=1)
        out.append(int(np.argmin(d)))
    return out


def _grad_one_electron(shells, mol, prim_fn, extra_op_grad=None):
    """(natom, 3, n, n) derivative of a one-electron matrix whose operator
    does not depend on nuclei (overlap/kinetic); bra/ket center derivatives
    only. ``extra_op_grad`` adds operator-center terms (nuclear)."""
    aos = _ao_list(shells)
    atom_of = _shell_atom_map(shells, mol)
    shell_idx = []
    for si, s in enumerate(shells):
        shell_idx.extend([si] * len(s.lmns))
    n = len(aos)
    natom = len(mol.symbols)
    out = np.zeros((natom, 3, n, n))
    for i, (si_, li) in enumerate(aos):
        ai_at = atom_of[shell_idx[i]]
        for j, (sj_, lj) in enumerate(aos):
            aj_at = atom_of[shell_idx[j]]
            for ax in range(3):
                di = dj = 0.0
                for ca, aa in zip(si_.coefs, si_.exps):
                    for cb, ab in zip(sj_.coefs, sj_.exps):
                        di += ca * cb * _dprim(
                            prim_fn, aa, li, si_.center, ab, lj, sj_.center,
                            axis=ax)
                        dj += ca * cb * _dprim(
                            lambda b, l2, rb, a, l1, ra: prim_fn(
                                a, l1, ra, b, l2, rb),
                            ab, lj, sj_.center, aa, li, si_.center, axis=ax)
                out[ai_at, ax, i, j] += di
                out[aj_at, ax, i, j] += dj
    if extra_op_grad is not None:
        out += extra_op_grad
    return out


def grad_overlap(shells, mol: Molecule) -> np.ndarray:
    """dS/dR (natom, 3, n, n)."""
    return _grad_one_electron(shells, mol, overlap_prim)


def grad_kinetic(shells, mol: Molecule) -> np.ndarray:
    """dT/dR (natom, 3, n, n)."""
    return _grad_one_electron(shells, mol, kinetic_prim)


def multipole_prim(a, lmn1, ra, b, lmn2, rb, order, origin):
    """⟨g1| Π_c (x_c − o_c)^{m_c} |g2⟩ via the binomial expansion around
    the ket center: (x−o)^m = Σ_k C(m,k)(x−Bx)^k (Bx−o)^{m−k} — each term
    an overlap with raised ket angular momentum (exact for any m)."""
    from math import comb

    val = 0.0
    mx, my, mz = order
    for kx in range(mx + 1):
        cx = comb(mx, kx) * (rb[0] - origin[0]) ** (mx - kx)
        for ky in range(my + 1):
            cy = comb(my, ky) * (rb[1] - origin[1]) ** (my - ky)
            for kz in range(mz + 1):
                cz = comb(mz, kz) * (rb[2] - origin[2]) ** (mz - kz)
                l2 = (lmn2[0] + kx, lmn2[1] + ky, lmn2[2] + kz)
                val += cx * cy * cz * overlap_prim(a, lmn1, ra, b, l2, rb)
    return val


def multipole_matrix(shells, order=(1, 0, 0), origin=(0.0, 0.0, 0.0)):
    """⟨μ| Π (x−o)^m |ν⟩ (n, n) for a Cartesian multipole ``order``
    (≙ cuestMultipoleCompute; (1,0,0)/(0,1,0)/(0,0,1) are the dipole
    components)."""
    from tpumathlib.apps.est import _one_electron

    origin = np.asarray(origin, float)
    return _one_electron(
        shells, lambda aa, li, rai, ab, lj, rbj:
        multipole_prim(aa, li, rai, ab, lj, rbj, order, origin))


def grad_multipole(shells, mol: Molecule, order=(1, 0, 0),
                   origin=(0.0, 0.0, 0.0)) -> np.ndarray:
    """d⟨μ|Π(x−o)^m|ν⟩/dR (natom, 3, n, n) — the operator origin is FIXED
    (does not move with nuclei), so only bra/ket center derivatives
    contribute (≙ cuestMultipoleDerivativeCompute)."""
    origin = np.asarray(origin, float)
    return _grad_one_electron(
        shells, mol, lambda aa, li, rai, ab, lj, rbj:
        multipole_prim(aa, li, rai, ab, lj, rbj, order, origin))


def property_gradient(kind: str, shells, mol: Molecule, density,
                      order=(1, 0, 0), origin=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Density-contracted one-electron derivative integrals → (natom, 3)
    (≙ python_examples/2_one_electron_integrals/property_gradients/
    run.py:1 — cuEST's derivative routines always contract with a
    (pseudo-)density matrix, which may be NON-symmetric).

    kind: "overlap" | "kinetic" | "potential" | "multipole"."""
    density = np.asarray(density, float)
    if kind == "overlap":
        g = grad_overlap(shells, mol)
    elif kind == "kinetic":
        g = grad_kinetic(shells, mol)
    elif kind == "potential":
        g = grad_nuclear(shells, mol)
    elif kind == "multipole":
        g = grad_multipole(shells, mol, order, origin)
    else:
        raise ValueError(f"unknown property kind {kind!r}")
    return np.einsum("axij,ij->ax", g, density)


def grad_nuclear(shells, mol: Molecule) -> np.ndarray:
    """d/dR of the nuclear-attraction matrix, including the
    Hellmann–Feynman operator term: for the nucleus-C term,
    dV_C/dC = −(dV_C/dA + dV_C/dB) by translational invariance."""
    aos = _ao_list(shells)
    atom_of = _shell_atom_map(shells, mol)
    shell_idx = []
    for si, s in enumerate(shells):
        shell_idx.extend([si] * len(s.lmns))
    coords = np.asarray(mol.coords, float)
    zs = [_Z[s] for s in mol.symbols]
    n = len(aos)
    natom = len(mol.symbols)
    out = np.zeros((natom, 3, n, n))
    for i, (si_, li) in enumerate(aos):
        ai_at = atom_of[shell_idx[i]]
        for j, (sj_, lj) in enumerate(aos):
            aj_at = atom_of[shell_idx[j]]
            for catom, (zc, rc) in enumerate(zip(zs, coords)):
                for ax in range(3):
                    da_ = db_ = 0.0
                    for ca, aa in zip(si_.coefs, si_.exps):
                        for cb, ab in zip(sj_.coefs, sj_.exps):
                            da_ += ca * cb * _dprim(
                                lambda a, l1, ra, b, l2, rb, rc=rc:
                                nuclear_prim(a, l1, ra, b, l2, rb, rc),
                                aa, li, si_.center, ab, lj, sj_.center,
                                axis=ax)
                            db_ += ca * cb * _dprim(
                                lambda b, l2, rb, a, l1, ra, rc=rc:
                                nuclear_prim(a, l1, ra, b, l2, rb, rc),
                                ab, lj, sj_.center, aa, li, si_.center,
                                axis=ax)
                    out[ai_at, ax, i, j] += -zc * da_
                    out[aj_at, ax, i, j] += -zc * db_
                    out[catom, ax, i, j] += zc * (da_ + db_)
    return out


# ---------------- vectorized ERI block with all-slot gradients -----------

def _boys_vec(mmax: int, t: np.ndarray) -> np.ndarray:
    """F_m(t) for m = 0..mmax, vectorized over t: series at the top order
    + stable downward recursion (same scheme as integrals.boys)."""
    t = np.asarray(t, float)
    out = np.zeros((mmax + 1,) + t.shape)
    small = t < 1e-12
    big = t > 35.0
    mid = ~(small | big)
    # small-t limit
    for m in range(mmax + 1):
        out[m][small] = 1.0 / (2 * m + 1)
    # large-t asymptotics
    tb = np.maximum(t, 1e-30)
    f0 = 0.5 * np.sqrt(np.pi / tb)
    acc = f0.copy()
    out[0][big] = f0[big]
    for m in range(1, mmax + 1):
        acc = acc * (2 * m - 1) / (2 * tb)
        out[m][big] = acc[big]
    # mid range: 60-term series for F_mmax, then downward
    tm = np.where(mid, t, 1.0)
    s = np.zeros_like(tm)
    term = np.full_like(tm, 1.0 / (2 * mmax + 1))
    for k in range(1, 120):
        s += term
        term = term * (2.0 * tm) / (2 * mmax + 2 * k + 1)
    et = np.exp(-tm)
    top = s * et
    fs = [top]
    for m in range(mmax - 1, -1, -1):
        fs.append((2.0 * tm * fs[-1] + et) / (2 * m + 1))
    fs = fs[::-1]
    for m in range(mmax + 1):
        out[m][mid] = fs[m][mid]
    return out


def _r_table_vec(lmax: int, p, pc: np.ndarray) -> np.ndarray:
    """Hermite Coulomb R_tuv vectorized over centers: pc (..., 3), p scalar
    or (...,). Returns (lmax+1, lmax+1, lmax+1, ...)."""
    t2 = p * np.sum(pc * pc, axis=-1)
    f = _boys_vec(lmax, t2)
    base = np.asarray(p)
    shape = t2.shape
    rn = {}
    for nn in range(lmax + 1):
        rn[(0, 0, 0, nn)] = ((-2.0 * base) ** nn) * f[nn]

    def get(t, u, v, nn):
        if t < 0 or u < 0 or v < 0:
            return 0.0
        key = (t, u, v, nn)
        if key in rn:
            return rn[key]
        if t > 0:
            val = (t - 1) * get(t - 2, u, v, nn + 1) \
                + pc[..., 0] * get(t - 1, u, v, nn + 1)
        elif u > 0:
            val = (u - 1) * get(t, u - 2, v, nn + 1) \
                + pc[..., 1] * get(t, u - 1, v, nn + 1)
        else:
            val = (v - 1) * get(t, u, v - 2, nn + 1) \
                + pc[..., 2] * get(t, u, v - 1, nn + 1)
        rn[key] = val
        return val

    out = np.zeros((lmax + 1, lmax + 1, lmax + 1) + shape)
    for t in range(lmax + 1):
        for u in range(lmax + 1 - t):
            for v in range(lmax + 1 - t - u):
                out[t, u, v] = get(t, u, v, 0)
    return out


def potential_integrals(shells, centers: np.ndarray) -> np.ndarray:
    """⟨μ| 1/|r−c_g| |ν⟩ for many centers at once: (ncen, n, n).

    Vectorized over centers (one Boys/R table per primitive pair covers
    every center) — the workhorse for PCM surface potentials
    (≙ cuestPCMPotentialCompute) and ESP-style analyses."""
    centers = np.atleast_2d(np.asarray(centers, float))
    aos = _ao_list(shells)
    n = len(aos)
    ncen = len(centers)
    out = np.zeros((ncen, n, n))
    for i, (si_, li) in enumerate(aos):
        for j, (sj_, lj) in enumerate(aos):
            if j > i:
                continue
            acc = np.zeros(ncen)
            q = si_.center - sj_.center
            for ca, aa in zip(si_.coefs, si_.exps):
                for cb, ab in zip(sj_.coefs, sj_.exps):
                    p = aa + ab
                    rp = (aa * si_.center + ab * sj_.center) / p
                    ltot = sum(li) + sum(lj)
                    e = [_e_table(li[d], lj[d], q[d], aa, ab)
                         for d in range(3)]
                    rt = _r_table_vec(ltot, p, rp[None, :] - centers)
                    val = np.zeros(ncen)
                    for t in range(li[0] + lj[0] + 1):
                        ex = e[0][li[0], lj[0], t]
                        if ex == 0.0:
                            continue
                        for u in range(li[1] + lj[1] + 1):
                            ey = e[1][li[1], lj[1], u]
                            if ey == 0.0:
                                continue
                            for v in range(li[2] + lj[2] + 1):
                                ez = e[2][li[2], lj[2], v]
                                if ez == 0.0:
                                    continue
                                val += ex * ey * ez * rt[t, u, v]
                    acc += (2.0 * math.pi / p) * ca * cb * val
            out[:, i, j] = acc
            out[:, j, i] = acc
    return out


def grad_potential_integrals(shells, centers: np.ndarray, mol: Molecule):
    """Derivatives of ⟨μ|1/|r−c_g||ν⟩: returns (datom, dcen) with
    datom (natom, 3, ncen, n, n) — AO-center terms accumulated per atom —
    and dcen (ncen, 3, n, n) — the operator-center derivative, obtained by
    translational invariance dcen = −(dA + dB)."""
    centers = np.atleast_2d(np.asarray(centers, float))
    aos = _ao_list(shells)
    atom_of = _shell_atom_map(shells, mol)
    shell_idx = []
    for si, s in enumerate(shells):
        shell_idx.extend([si] * len(s.lmns))
    n = len(aos)
    ncen = len(centers)
    natom = len(mol.symbols)
    datom = np.zeros((natom, 3, ncen, n, n))
    dcen = np.zeros((ncen, 3, n, n))

    def block(li, lj, si_, sj_):
        """contracted (ncen,) potential integral for one component pair."""
        q = si_.center - sj_.center
        acc = np.zeros(ncen)
        for ca, aa in zip(si_.coefs, si_.exps):
            for cb, ab in zip(sj_.coefs, sj_.exps):
                p = aa + ab
                rp = (aa * si_.center + ab * sj_.center) / p
                ltot = sum(li) + sum(lj)
                e = [_e_table(li[d], lj[d], q[d], aa, ab) for d in range(3)]
                rt = _r_table_vec(ltot, p, rp[None, :] - centers)
                val = np.zeros(ncen)
                for t in range(li[0] + lj[0] + 1):
                    ex = e[0][li[0], lj[0], t]
                    if ex == 0.0:
                        continue
                    for u in range(li[1] + lj[1] + 1):
                        ey = e[1][li[1], lj[1], u]
                        if ey == 0.0:
                            continue
                        for v in range(li[2] + lj[2] + 1):
                            ez = e[2][li[2], lj[2], v]
                            if ez == 0.0:
                                continue
                            val += ex * ey * ez * rt[t, u, v]
                acc += (2.0 * math.pi / p) * ca * cb * val
        return acc

    def dblock(li, lj, si_, sj_, ax, bra: bool):
        l_ = list(li if bra else lj)
        shell = si_ if bra else sj_
        up = list(l_)
        up[ax] += 1
        # scale each primitive term by 2a: fold into coefficients
        s_up = GShell(shell.l, shell.exps, 2.0 * shell.exps * shell.coefs,
                      shell.center)
        if bra:
            val = block(tuple(up), lj, s_up, sj_)
        else:
            val = block(li, tuple(up), si_, s_up)
        if l_[ax] > 0:
            dn = list(l_)
            dn[ax] -= 1
            if bra:
                val = val - l_[ax] * block(tuple(dn), lj, si_, sj_)
            else:
                val = val - l_[ax] * block(li, tuple(dn), si_, sj_)
        return val

    for i, (si_, li) in enumerate(aos):
        ai_at = atom_of[shell_idx[i]]
        for j, (sj_, lj) in enumerate(aos):
            aj_at = atom_of[shell_idx[j]]
            for ax in range(3):
                da_ = dblock(li, lj, si_, sj_, ax, bra=True)
                db_ = dblock(li, lj, si_, sj_, ax, bra=False)
                datom[ai_at, ax, :, i, j] += da_
                datom[aj_at, ax, :, i, j] += db_
                dcen[:, ax, i, j] += -(da_ + db_)
    return datom, dcen


def _e_prod(e, l1, l2):
    """E1x⊗E1y⊗E1z Hermite product tensor (t, u, v) for one component
    pair."""
    ex = e[0][l1[0], l2[0], :l1[0] + l2[0] + 1]
    ey = e[1][l1[1], l2[1], :l1[1] + l2[1] + 1]
    ez = e[2][l1[2], l2[2], :l1[2] + l2[2] + 1]
    return np.einsum("t,u,v->tuv", ex, ey, ez)


def _e_prod_pad(e, l1, l2, tb, ub, vb, scale=1.0):
    """Zero-padded E-product tensor (tb, ub, vb); None if any l < 0."""
    if min(l1) < 0 or min(l2) < 0:
        return np.zeros((tb, ub, vb))
    out = np.zeros((tb, ub, vb))
    blk = _e_prod(e, l1, l2)
    s = blk.shape
    out[:s[0], :s[1], :s[2]] = scale * blk
    return out


def eri_block_grad(s1: GShell, s2: GShell, s3: GShell, s4: GShell,
                   omega: float | None = None):
    """(value, dA, dB, dC, dD) for a contracted shell quartet.

    ``omega``: erf(ω·r₁₂)/r₁₂ long-range kernel instead of 1/r₁₂ —
    the attenuation only reshapes the Boys/Hermite R-table
    (integrals._r_table), so the derivative machinery is unchanged.

    value: (c1,c2,c3,c4); each gradient: (3,c1,c2,c3,c4). Per primitive
    quartet the shifted-ℓ raised/lowered Hermite E-products for ALL
    components and all three axes are stacked into one operand (with the
    2a/−l coefficients folded in), the (−1)^{t'+u'+v'} R_{t+t'} pairing
    tensor is gathered once, and the whole derivative block reduces to two
    einsums. dD = −(dA+dB+dC) by translational invariance."""
    l1s, l2s, l3s, l4s = s1.lmns, s2.lmns, s3.lmns, s4.lmns
    n1, n2, n3, n4 = len(l1s), len(l2s), len(l3s), len(l4s)
    lmax = s1.l + s2.l + s3.l + s4.l
    qab = s1.center - s2.center
    qcd = s3.center - s4.center
    # padded Hermite orders (value + one raise)
    tb = s1.l + s2.l + 2
    tk = s3.l + s4.l + 2
    nb_ = n1 * n2
    nk = n3 * n4
    # bra stack rows: [base | A+x A+y A+z A-x A-y A-z | B+... B-...]
    acc_bra = np.zeros((13 * nb_, nk))
    acc_ket = np.zeros((nb_, 6 * nk))
    sgn = (-1.0) ** (np.arange(tk)[:, None, None]
                     + np.arange(tk)[None, :, None]
                     + np.arange(tk)[None, None, :])
    it = np.arange(tb)[:, None] + np.arange(tk)[None, :]
    for a1, c1 in zip(s1.exps, s1.coefs):
        for a2, c2 in zip(s2.exps, s2.coefs):
            p = a1 + a2
            rp = (a1 * s1.center + a2 * s2.center) / p
            e1 = [_e_table(s1.l + 1, s2.l + 1, qab[d], a1, a2)
                  for d in range(3)]
            bra = np.empty((13 * nb_, tb, tb, tb))
            for i1, l1 in enumerate(l1s):
                for i2, l2 in enumerate(l2s):
                    r = i1 * n2 + i2
                    bra[r] = _e_prod_pad(e1, l1, l2, tb, tb, tb)
                    for ax in range(3):
                        up1 = list(l1)
                        up1[ax] += 1
                        bra[(1 + ax) * nb_ + r] = _e_prod_pad(
                            e1, tuple(up1), l2, tb, tb, tb, 2.0 * a1)
                        dn1 = list(l1)
                        dn1[ax] -= 1
                        bra[(4 + ax) * nb_ + r] = _e_prod_pad(
                            e1, tuple(dn1), l2, tb, tb, tb, -l1[ax])
                        up2 = list(l2)
                        up2[ax] += 1
                        bra[(7 + ax) * nb_ + r] = _e_prod_pad(
                            e1, l1, tuple(up2), tb, tb, tb, 2.0 * a2)
                        dn2 = list(l2)
                        dn2[ax] -= 1
                        bra[(10 + ax) * nb_ + r] = _e_prod_pad(
                            e1, l1, tuple(dn2), tb, tb, tb, -l2[ax])
            brav = bra.reshape(13 * nb_, -1)
            for a3, c3 in zip(s3.exps, s3.coefs):
                for a4, c4 in zip(s4.exps, s4.coefs):
                    q = a3 + a4
                    rq = (a3 * s3.center + a4 * s4.center) / q
                    alpha = p * q / (p + q)
                    e2 = [_e_table(s3.l + 1, s4.l + 1, qcd[d], a3, a4)
                          for d in range(3)]
                    # one order beyond lmax+1: the pairing gather touches
                    # (raised-bra × raised-ket) cells at t = lmax+2 whose
                    # E-products are zero but which must still be in range
                    rt = _r_table(lmax + 2, alpha, rp - rq, omega)
                    pref = (c1 * c2 * c3 * c4) * 2.0 * math.pi ** 2.5 / (
                        p * q * math.sqrt(p + q))
                    ket = np.empty((7 * nk, tk, tk, tk))
                    for i3, l3 in enumerate(l3s):
                        for i4, l4 in enumerate(l4s):
                            r = i3 * n4 + i4
                            ket[r] = _e_prod_pad(e2, l3, l4, tk, tk, tk)
                            for ax in range(3):
                                up3 = list(l3)
                                up3[ax] += 1
                                ket[(1 + ax) * nk + r] = _e_prod_pad(
                                    e2, tuple(up3), l4, tk, tk, tk,
                                    2.0 * a3)
                                dn3 = list(l3)
                                dn3[ax] -= 1
                                ket[(4 + ax) * nk + r] = _e_prod_pad(
                                    e2, tuple(dn3), l4, tk, tk, tk, -l3[ax])
                    ket *= sgn[None]
                    # pairing tensor R4[tuv, TUV] gathered once
                    r4 = rt[it[:, None, None, :, None, None],
                            it[None, :, None, None, :, None],
                            it[None, None, :, None, None, :]]
                    r4v = r4.reshape(tb ** 3, tk ** 3)
                    ketv = ket.reshape(7 * nk, -1)
                    mid = brav @ r4v  # (13 nb, tk^3)
                    acc_bra += pref * (mid @ ketv[:nk].T)
                    acc_ket += pref * (mid[:nb_] @ ketv[nk:].T).reshape(
                        nb_, 6 * nk)
    shape4 = (n1, n2, n3, n4)
    val = acc_bra[:nb_].reshape(shape4)
    da = np.stack([
        (acc_bra[(1 + ax) * nb_:(2 + ax) * nb_]
         + acc_bra[(4 + ax) * nb_:(5 + ax) * nb_]).reshape(shape4)
        for ax in range(3)])
    db = np.stack([
        (acc_bra[(7 + ax) * nb_:(8 + ax) * nb_]
         + acc_bra[(10 + ax) * nb_:(11 + ax) * nb_]).reshape(shape4)
        for ax in range(3)])
    ak = acc_ket.reshape(nb_, 6, nk)
    dc = np.stack([
        (ak[:, ax, :] + ak[:, 3 + ax, :]).reshape(shape4)
        for ax in range(3)])
    dd = -(da + db + dc)
    return val, da, db, dc, dd


def grad_eri(shells, mol: Molecule,
             omega: float | None = None) -> np.ndarray:
    """d(μν|λσ)/dR: (natom, 3, n, n, n, n) — assembled per atom from the
    four slot derivatives (host analysis stage; fine at showcase scale).
    ``omega``: long-range erf(ω·r₁₂)/r₁₂ kernel (RSH exchange grads)."""
    atom_of = _shell_atom_map(shells, mol)
    offs = np.cumsum([0] + [len(s.lmns) for s in shells])
    n = offs[-1]
    natom = len(mol.symbols)
    out = np.zeros((natom, 3, n, n, n, n))
    ns = len(shells)
    for i in range(ns):
        for j in range(ns):
            for k in range(ns):
                for l_ in range(ns):
                    _, da, db, dc, dd = eri_block_grad(
                        shells[i], shells[j], shells[k], shells[l_],
                        omega=omega)
                    sl = (slice(offs[i], offs[i + 1]),
                          slice(offs[j], offs[j + 1]),
                          slice(offs[k], offs[k + 1]),
                          slice(offs[l_], offs[l_ + 1]))
                    for slot, blk in ((i, da), (j, db), (k, dc), (l_, dd)):
                        out[(atom_of[slot],) + (slice(None),) + sl] += blk
    return out


def grad_nuclear_repulsion(mol: Molecule) -> np.ndarray:
    coords = np.asarray(mol.coords, float)
    zs = np.array([_Z[s] for s in mol.symbols], float)
    out = np.zeros((len(zs), 3))
    for i in range(len(zs)):
        for j in range(len(zs)):
            if i == j:
                continue
            d = coords[i] - coords[j]
            out[i] += -zs[i] * zs[j] * d / np.linalg.norm(d) ** 3
    return out


# ---------------- SCF nuclear gradients ----------------

def rhf_gradient(mol: Molecule, shells=None, scf=None) -> np.ndarray:
    """Analytic RHF nuclear gradient (natom, 3).

    dE/dR = Σ P h^x + ½ Σ PP[(μν|λσ)^x − ½(μλ|νσ)^x] − Σ W S^x + V_NN^x
    with W the energy-weighted density (≙ the gradient assembly the cuEST
    SCF family performs on device; here the O(N⁴) contraction is a host
    einsum at showcase scale, the SCF itself runs through est.rhf)."""
    from tpumathlib.apps import est

    shells = shells if shells is not None else est.sto3g_shells(mol)
    if scf is None:
        e, c, eps = est.rhf(mol)
    else:
        e, c, eps = scf
    nocc = mol.nelec // 2
    cocc = c[:, :nocc]
    p = 2.0 * cocc @ cocc.T
    w = 2.0 * (cocc * eps[:nocc][None, :]) @ cocc.T
    hx = grad_kinetic(shells, mol) + grad_nuclear(shells, mol)
    sx = grad_overlap(shells, mol)
    gx = grad_eri(shells, mol)
    grad = np.einsum("mn,axmn->ax", p, hx)
    grad += 0.5 * np.einsum("mn,ls,axmnls->ax", p, p, gx)
    grad -= 0.25 * np.einsum("ml,ns,axmnls->ax", p, p, gx)
    grad -= np.einsum("mn,axmn->ax", w, sx)
    grad += grad_nuclear_repulsion(mol)
    return grad


def rhf_ecp_gradient(mol: Molecule, ecp_atoms: dict, scf=None) -> np.ndarray:
    """Analytic nuclear gradient of the valence-only ECP-RHF energy
    (natom, 3): the full Pulay assembly of rhf_gradient plus the three
    ECP channels — the ∂⟨μ|U_ECP|ν⟩ operator term (differentiable
    quadrature, apps/ecp.py), the core-screened nuclear attraction
    (+n_core·∂⟨μ|1/|r−R_ECP||ν⟩ with its operator-center term), and the
    screened V_NN. ≙ cuEST 5_effective_core_potentials/ecp_gradients/
    run.py:1 carried through the full SCF gradient.
    """
    from tpumathlib.apps import est
    from tpumathlib.apps.ecp import ecp_gradient, rhf_ecp

    shells = est.sto3g_shells(mol)
    if scf is None:
        scf = rhf_ecp(mol, ecp_atoms)
    _, c, eps = scf
    zeff = {ia: ecp.nelectron for ia, ecp in ecp_atoms.items()}
    nocc = (mol.nelec - sum(zeff.values())) // 2
    cocc = c[:, :nocc]
    p = 2.0 * cocc @ cocc.T
    w = 2.0 * (cocc * eps[:nocc][None, :]) @ cocc.T
    coords = np.asarray(mol.coords, float)

    hx = grad_kinetic(shells, mol) + grad_nuclear(shells, mol)
    sx = grad_overlap(shells, mol)
    gx = grad_eri(shells, mol)
    grad = np.einsum("mn,axmn->ax", p, hx)
    grad += 0.5 * np.einsum("mn,ls,axmnls->ax", p, p, gx)
    grad -= 0.25 * np.einsum("ml,ns,axmnls->ax", p, p, gx)
    grad -= np.einsum("mn,axmn->ax", w, sx)
    # core screening of the nuclear attraction at each ECP center
    ecp_ias = sorted(zeff)
    if ecp_ias:
        datom, dcen = grad_potential_integrals(shells, coords[ecp_ias],
                                               mol)
        for g, ia in enumerate(ecp_ias):
            nc = zeff[ia]
            grad += nc * np.einsum("mn,axmn->ax", p, datom[:, :, g])
            grad[ia] += nc * np.einsum("mn,xmn->x", p, dcen[g])
    # the ECP operator term tr(P ∂U)
    grad += ecp_gradient(mol, p, ecp_atoms, shells)
    # screened nuclear repulsion
    zs = np.array([_Z[s] for s in mol.symbols], float)
    for ia, nc in zeff.items():
        zs[ia] -= nc
    for i in range(len(zs)):
        for j in range(len(zs)):
            if i != j:
                d = coords[i] - coords[j]
                grad[i] += -zs[i] * zs[j] * d / np.linalg.norm(d) ** 3
    return grad


def rhf_pcm_gradient(mol: Molecule, epsilon: float = 80.0, scf=None,
                     plan=None) -> np.ndarray:
    """Analytic nuclear gradient of the solvated (PCM) RHF energy
    (natom, 3): the full Pulay assembly plus the dielectric geometry
    derivative at the coupled converged state. The surface-charge
    response needs no explicit term — E is stationary in q at the
    solved charges and in P at the SCF fixed point of the v_pcm-
    augmented Fock, so fixed-(P, q) partial derivatives are the total
    derivative (the same variational identity pcm_gradient documents).
    ≙ cuEST 6_pcm/pcm_gradients/run.py:1 carried through the full SCF
    gradient."""
    from tpumathlib.apps.pcm import PCMPlan, pcm_gradient, rhf_pcm

    plan = plan if plan is not None else PCMPlan(mol, epsilon=epsilon)
    shells = plan.shells
    if scf is None:
        scf = rhf_pcm(mol, epsilon=epsilon, plan=plan)
    _, c, eps, _ = scf
    nocc = mol.nelec // 2
    cocc = c[:, :nocc]
    p = 2.0 * cocc @ cocc.T
    w = 2.0 * (cocc * eps[:nocc][None, :]) @ cocc.T
    hx = grad_kinetic(shells, mol) + grad_nuclear(shells, mol)
    sx = grad_overlap(shells, mol)
    gx = grad_eri(shells, mol)
    grad = np.einsum("mn,axmn->ax", p, hx)
    grad += 0.5 * np.einsum("mn,ls,axmnls->ax", p, p, gx)
    grad -= 0.25 * np.einsum("ml,ns,axmnls->ax", p, p, gx)
    grad -= np.einsum("mn,axmn->ax", w, sx)
    grad += grad_nuclear_repulsion(mol)
    grad += pcm_gradient(mol, p, plan=plan, epsilon=epsilon)
    return grad


def uhf_gradient(mol: Molecule, spin: int = 0, shells=None,
                 uhf_out=None) -> np.ndarray:
    """Analytic UHF nuclear gradient (natom, 3).

    dE = Σ (Pa+Pb) h^x + ½ΣΣ PP J-terms − K-terms per spin − Σ W S^x
    + V_NN^x (≙ cuest_scf/uhf.py's gradient counterpart)."""
    from tpumathlib.apps import est
    from tpumathlib.apps.xc import uhf

    shells = shells if shells is not None else est.sto3g_shells(mol)
    if uhf_out is None:
        uhf_out = uhf(mol, spin=spin)
    _, (ca, cb), (epsa, epsb), _ = uhf_out
    ne = mol.nelec
    na = (ne + spin) // 2
    nb = ne - na
    pa = ca[:, :na] @ ca[:, :na].T
    pb = cb[:, :nb] @ cb[:, :nb].T if nb else np.zeros_like(pa)
    wa = (ca[:, :na] * epsa[:na][None, :]) @ ca[:, :na].T
    wb = (cb[:, :nb] * epsb[:nb][None, :]) @ cb[:, :nb].T if nb \
        else np.zeros_like(pa)
    pt = pa + pb
    hx = grad_kinetic(shells, mol) + grad_nuclear(shells, mol)
    sx = grad_overlap(shells, mol)
    gx = grad_eri(shells, mol)
    grad = np.einsum("mn,axmn->ax", pt, hx)
    grad += 0.5 * np.einsum("mn,ls,axmnls->ax", pt, pt, gx)
    grad -= 0.5 * np.einsum("ml,ns,axmnls->ax", pa, pa, gx)
    grad -= 0.5 * np.einsum("ml,ns,axmnls->ax", pb, pb, gx)
    grad -= np.einsum("mn,axmn->ax", wa + wb, sx)
    grad += grad_nuclear_repulsion(mol)
    return grad

"""General-angular-momentum Gaussian integrals (McMurchie–Davidson).

≙ cuEST's integral plans beyond s-orbitals
(cuEST/c_examples/examples/2_one_electron_integrals and the ERI engine
behind 3_density_fitting): overlap, kinetic, nuclear attraction and
two-electron repulsion integrals for contracted Cartesian Gaussians of any
angular momentum (s, p, d, ...), via Hermite-Gaussian expansion
(McMurchie–Davidson E-coefficients + Hermite Coulomb R-table — the same
recursion family as Obara–Saika, organized around the Gaussian product
theorem).

Host NumPy code: integral generation is the host analysis stage (cuEST
wraps a CPU/GPU C library); the J/K contractions consume the resulting
tensors on the MXU through the tensor tier (see apps/scf.py)."""

from __future__ import annotations

import math

import numpy as np

_SQ_PI3 = math.pi ** 1.5


def _e_table(l1: int, l2: int, qx: float, a: float, b: float) -> np.ndarray:
    """E[i, j, t]: Hermite expansion coefficients for a 1D Gaussian pair
    with exponents (a, b) separated by qx = Ax - Bx."""
    p = a + b
    mu = a * b / p
    e = np.zeros((l1 + 1, l2 + 1, l1 + l2 + 1))
    e[0, 0, 0] = math.exp(-mu * qx * qx)
    for i in range(1, l1 + 1):
        for t in range(i + 1):
            val = 0.0
            if t - 1 >= 0:
                val += e[i - 1, 0, t - 1] / (2 * p)
            val += -(b / p) * qx * e[i - 1, 0, t]
            if t + 1 <= i - 1:
                val += (t + 1) * e[i - 1, 0, t + 1]
            e[i, 0, t] = val
    for j in range(1, l2 + 1):
        for i in range(l1 + 1):
            for t in range(i + j + 1):
                val = 0.0
                if t - 1 >= 0:
                    val += e[i, j - 1, t - 1] / (2 * p)
                val += (a / p) * qx * e[i, j - 1, t]
                if t + 1 <= i + j - 1:
                    val += (t + 1) * e[i, j - 1, t + 1]
                e[i, j, t] = val
    return e


def boys(mmax: int, t: float) -> np.ndarray:
    """F_m(t) for m = 0..mmax (downward recursion; series for small t)."""
    out = np.zeros(mmax + 1)
    if t < 1e-12:
        for m in range(mmax + 1):
            out[m] = 1.0 / (2 * m + 1)
        return out
    if t > 35.0:
        # asymptotic: F_m = (2m-1)!! / 2^{m+1} * sqrt(pi / t^{2m+1})
        out[0] = 0.5 * math.sqrt(math.pi / t)
        for m in range(1, mmax + 1):
            out[m] = out[m - 1] * (2 * m - 1) / (2 * t)
        return out
    # convergent series F_m(t) = e^-t Σ_k (2t)^k / (2m+1)(2m+3)...(2m+2k+1)
    # for the highest m, then stable downward recursion
    s = 0.0
    term = 1.0 / (2 * mmax + 1)
    k = 0
    while True:
        s += term
        k += 1
        term = term * (2 * t) / (2 * mmax + 2 * k + 1)
        if term < 1e-17 * s or k > 300:
            break
    out[mmax] = s * math.exp(-t)
    for m in range(mmax - 1, -1, -1):
        out[m] = (2 * t * out[m + 1] + math.exp(-t)) / (2 * m + 1)
    return out


def _r_table(lmax: int, p: float, pc: np.ndarray,
             omega: float | None = None) -> np.ndarray:
    """Hermite Coulomb integrals R^0_{tuv} for t+u+v ≤ lmax via the
    auxiliary R^n recursion, tabulated as R[t, u, v].

    ``omega`` switches the kernel from 1/r to the long-range erf(ω·r)/r
    operator (range-separated hybrids ≙ the reference's LC-wPBE/wB97X/
    CAM-B3LYP/HSE06 functional ids, cuest_scf/xc_functionals.py:48-65):
    F_m(T) → s^{2m+1} F_m(s²T) with s² = ω²/(p+ω²). The substituted
    sequence G_m = s^{2m+1}F_m(s²T) satisfies the same derivative chain
    dG_m/dT = −G_{m+1} the R-recursion is built on, so only the seed row
    changes."""
    t2 = p * float(pc @ pc)
    if omega is None:
        f = boys(lmax, t2)
    else:
        s2 = omega * omega / (p + omega * omega)
        f = boys(lmax, s2 * t2) * s2 ** (np.arange(lmax + 1) + 0.5)
    # R^n_{000} = (-2p)^n F_n
    rn = {(0, 0, 0, n): ((-2.0 * p) ** n) * f[n] for n in range(lmax + 1)}

    def get(t, u, v, n):
        if t < 0 or u < 0 or v < 0:
            return 0.0
        key = (t, u, v, n)
        if key in rn:
            return rn[key]
        if t > 0:
            val = (t - 1) * get(t - 2, u, v, n + 1) + pc[0] * get(t - 1, u, v, n + 1)
        elif u > 0:
            val = (u - 1) * get(t, u - 2, v, n + 1) + pc[1] * get(t, u - 1, v, n + 1)
        else:
            val = (v - 1) * get(t, u, v - 2, n + 1) + pc[2] * get(t, u, v - 1, n + 1)
        rn[key] = val
        return val

    out = np.zeros((lmax + 1, lmax + 1, lmax + 1))
    for t in range(lmax + 1):
        for u in range(lmax + 1 - t):
            for v in range(lmax + 1 - t - u):
                out[t, u, v] = get(t, u, v, 0)
    return out


def norm_prim(alpha: float, lmn) -> float:
    l, m, n = lmn
    f = (math.factorial(2 * l) * math.factorial(2 * m) * math.factorial(2 * n)
         / (math.factorial(l) * math.factorial(m) * math.factorial(n)))
    df = f / (4.0 ** (l + m + n))
    return ((2 * alpha / math.pi) ** 0.75
            * (4 * alpha) ** ((l + m + n) / 2.0) / math.sqrt(df))


def overlap_prim(a, lmn1, ra, b, lmn2, rb) -> float:
    p = a + b
    q = np.asarray(ra) - np.asarray(rb)
    s = 1.0
    for d in range(3):
        e = _e_table(lmn1[d], lmn2[d], q[d], a, b)
        s *= e[lmn1[d], lmn2[d], 0]
    return s * (math.pi / p) ** 1.5


def kinetic_prim(a, lmn1, ra, b, lmn2, rb) -> float:
    l2, m2, n2 = lmn2

    def s(lmn2_):
        if min(lmn2_) < 0:
            return 0.0
        return overlap_prim(a, lmn1, ra, b, lmn2_, rb)

    term0 = b * (2 * (l2 + m2 + n2) + 3) * s((l2, m2, n2))
    term1 = -2 * b * b * (s((l2 + 2, m2, n2)) + s((l2, m2 + 2, n2))
                          + s((l2, m2, n2 + 2)))
    term2 = -0.5 * (l2 * (l2 - 1) * s((l2 - 2, m2, n2))
                    + m2 * (m2 - 1) * s((l2, m2 - 2, n2))
                    + n2 * (n2 - 1) * s((l2, m2, n2 - 2)))
    return term0 + term1 + term2


def nuclear_prim(a, lmn1, ra, b, lmn2, rb, rc, omega=None) -> float:
    p = a + b
    rp = (a * np.asarray(ra) + b * np.asarray(rb)) / p
    q = np.asarray(ra) - np.asarray(rb)
    ltot = sum(lmn1) + sum(lmn2)
    etabs = [_e_table(lmn1[d], lmn2[d], q[d], a, b) for d in range(3)]
    rt = _r_table(ltot, p, rp - np.asarray(rc), omega)
    val = 0.0
    for t in range(lmn1[0] + lmn2[0] + 1):
        for u in range(lmn1[1] + lmn2[1] + 1):
            for v in range(lmn1[2] + lmn2[2] + 1):
                val += (etabs[0][lmn1[0], lmn2[0], t]
                        * etabs[1][lmn1[1], lmn2[1], u]
                        * etabs[2][lmn1[2], lmn2[2], v] * rt[t, u, v])
    return 2.0 * math.pi / p * val


def _hermite_coefs(la, lb, q, a, b):
    return [_e_table(la[d], lb[d], q[d], a, b) for d in range(3)]


def eri_shell_prim(a, la_list, ra, b, lb_list, rb,
                   c, lc_list, rc, d, ld_list, rd, omega=None) -> np.ndarray:
    """Primitive ERIs for all Cartesian components of a shell quartet:
    returns (len(la_list), len(lb_list), len(lc_list), len(ld_list)).
    ``omega``: erf(ω·r₁₂)/r₁₂ long-range kernel instead of 1/r₁₂."""
    p = a + b
    qq = c + d
    rp = (a * np.asarray(ra) + b * np.asarray(rb)) / p
    rq = (c * np.asarray(rc) + d * np.asarray(rd)) / qq
    alpha = p * qq / (p + qq)
    lmax = (max(sum(l) for l in la_list) + max(sum(l) for l in lb_list)
            + max(sum(l) for l in lc_list) + max(sum(l) for l in ld_list))
    rt = _r_table(lmax, alpha, rp - rq, omega)
    qab = np.asarray(ra) - np.asarray(rb)
    qcd = np.asarray(rc) - np.asarray(rd)
    # E tables at shell level (max l per dim)
    e1 = [_e_table(max(l[dd] for l in la_list), max(l[dd] for l in lb_list),
                   qab[dd], a, b) for dd in range(3)]
    e2 = [_e_table(max(l[dd] for l in lc_list), max(l[dd] for l in ld_list),
                   qcd[dd], c, d) for dd in range(3)]
    pref = 2.0 * _SQ_PI3 * math.pi / (p * qq * math.sqrt(p + qq))
    out = np.zeros((len(la_list), len(lb_list), len(lc_list), len(ld_list)))
    for i1, l1 in enumerate(la_list):
        for i2, l2 in enumerate(lb_list):
            for i3, l3 in enumerate(lc_list):
                for i4, l4 in enumerate(ld_list):
                    val = 0.0
                    for t in range(l1[0] + l2[0] + 1):
                        e1x = e1[0][l1[0], l2[0], t]
                        if e1x == 0.0:
                            continue
                        for u in range(l1[1] + l2[1] + 1):
                            e1y = e1[1][l1[1], l2[1], u]
                            if e1y == 0.0:
                                continue
                            for v in range(l1[2] + l2[2] + 1):
                                e1z = e1[2][l1[2], l2[2], v]
                                if e1z == 0.0:
                                    continue
                                for tt in range(l3[0] + l4[0] + 1):
                                    e2x = e2[0][l3[0], l4[0], tt]
                                    if e2x == 0.0:
                                        continue
                                    for uu in range(l3[1] + l4[1] + 1):
                                        e2y = e2[1][l3[1], l4[1], uu]
                                        if e2y == 0.0:
                                            continue
                                        for vv in range(l3[2] + l4[2] + 1):
                                            e2z = e2[2][l3[2], l4[2], vv]
                                            if e2z == 0.0:
                                                continue
                                            sign = (-1.0) ** (tt + uu + vv)
                                            val += (e1x * e1y * e1z * e2x
                                                    * e2y * e2z * sign
                                                    * rt[t + tt, u + uu,
                                                         v + vv])
                    out[i1, i2, i3, i4] = val
    return pref * out

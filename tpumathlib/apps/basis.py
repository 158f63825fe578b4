"""Gaussian basis-set infrastructure: .gbs parsing, packaged production
basis sets, general Cartesian shells, and spherical-harmonic transforms.

≙ the reference's AO-basis machinery
(cuEST/cuest_scf_examples/cuest_scf/ao_basis.py:220-366 — the Gaussian-
format .gbs parser — and the shipped fixtures
cuEST/data/basis_set/{def2-svp,def2-universal-jkfit,def2-svp-ecp}.gbs).
The basis data itself is public Basis Set Exchange data (each file header
cites basissetexchange.org); the packaged ``data/basis_sets.npz`` holds
the same published exponent/coefficient tables re-serialized, so the
suite ships production def2-SVP (+ JKFIT auxiliary, + ECP) machinery
without a runtime dependency on the reference tree.

Conventions:

- Cartesian components of a shell are ordered lx-descending then
  ly-descending — (200,110,101,020,011,002) for d — matching the CCA
  ordering the integral engine (apps/integrals.py) indexes by.
- A contracted shell's coefficients are normalized against its AXIAL
  component (l,0,0) (apps/est.py _normalize): every component is the same
  radial contraction times a raw monomial.
- Spherical (pure) functions are real solid harmonics, m = -l..+l. The
  (2l+1, ncart) transform is derived NUMERICALLY per l: raw solid
  harmonics r^l·Y_lm (scipy real spherical harmonics) are fitted exactly
  in the monomial basis, then rescaled so unit-normalized axial Cartesian
  components map to unit-normalized spherical functions — no hand-copied
  coefficient tables to get wrong.
"""

from __future__ import annotations

import functools
import os
import re

import numpy as np

_L_SYMBOLS = {"S": 0, "P": 1, "D": 2, "F": 3, "G": 4, "H": 5, "I": 6}
_L_NAMES = {v: k for k, v in _L_SYMBOLS.items()}
_DATA = os.path.join(os.path.dirname(__file__), "data")


@functools.lru_cache(maxsize=None)
def cart_components(l: int) -> tuple[tuple[int, int, int], ...]:
    """Cartesian (lx, ly, lz) components of angular momentum l in CCA
    order (lx descending, then ly descending)."""
    return tuple((lx, ly, l - lx - ly)
                 for lx in range(l, -1, -1)
                 for ly in range(l - lx, -1, -1))


def _monomial_overlap(l: int) -> np.ndarray:
    """S[c, c'] = ∫ mono_c mono_c' e^{-2r²} over raw monomials of
    degree l (α = 1 primitives, unnormalized)."""
    from tpumathlib.apps.integrals import overlap_prim

    comps = cart_components(l)
    z = np.zeros(3)
    s = np.zeros((len(comps), len(comps)))
    for i, ci in enumerate(comps):
        for j, cj in enumerate(comps):
            s[i, j] = overlap_prim(1.0, ci, z, 1.0, cj, z)
    return s


@functools.lru_cache(maxsize=None)
def cart2sph(l: int) -> np.ndarray:
    """(2l+1, ncart) transform from axial-normalized Cartesian AOs to
    unit-normalized real solid harmonics, m = -l..+l.

    Derived numerically: fit r^l·Y_lm(θ,φ) (real form) exactly in the
    degree-l monomial basis (polynomial identity ⇒ the least-squares fit
    is exact), then scale each row so ⟨χ_m|χ_m⟩ equals the axial
    Cartesian component's self-overlap (both share the radial factor, so
    the ratio is contraction-independent)."""
    comps = cart_components(l)
    nc = len(comps)
    if l == 0:
        return np.ones((1, 1))
    if l == 1:
        # real Y_1m order m=-1,0,+1 ↔ (y, z, x); cart order (x, y, z)
        return np.array([[0.0, 1.0, 0.0],
                         [0.0, 0.0, 1.0],
                         [1.0, 0.0, 0.0]])
    from scipy.special import sph_harm_y

    rng = np.random.default_rng(7)
    npts = 4 * nc
    v = rng.normal(size=(npts, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    theta = np.arccos(np.clip(v[:, 2], -1, 1))        # polar
    phi = np.arctan2(v[:, 1], v[:, 0])                # azimuth
    mono = np.stack([v[:, 0] ** cx * v[:, 1] ** cy * v[:, 2] ** cz
                     for (cx, cy, cz) in comps], axis=1)
    rows = []
    for m in range(-l, l + 1):
        ylm = sph_harm_y(l, abs(m), theta, phi)
        if m == 0:
            y = ylm.real
        elif m > 0:
            y = np.sqrt(2.0) * (-1.0) ** m * ylm.real
        else:
            y = np.sqrt(2.0) * (-1.0) ** m * ylm.imag
        coef, res, _, _ = np.linalg.lstsq(mono, y, rcond=None)
        rows.append(coef)
    t = np.stack(rows)
    t[np.abs(t) < 1e-12] = 0.0
    # rescale: unit spherical norm in the axial-normalized convention
    smono = _monomial_overlap(l)
    ax = 0                                # (l, 0, 0) is first in CCA order
    n_ax = np.sqrt(smono[ax, ax])
    for m in range(2 * l + 1):
        n_m = np.sqrt(t[m] @ smono @ t[m])
        t[m] *= n_ax / n_m
    return t


# ---------------------------- .gbs parsing ----------------------------

_RE_ATOM = re.compile(r"^\s*(\S+)\s+(\d+)\s*$")
_RE_SHELL = re.compile(r"^\s*([A-Za-z]+)\s+(\d+)\s+(\S+)\s*$")


def parse_gbs(text: str):
    """Parse a Gaussian-format basis file (mirrors the reference parser's
    accepted grammar, ao_basis.py:220-366): 'spherical'/'cartesian' tag,
    ****-separated element blocks, shell headers ``L  nprim  scale``,
    Fortran D-exponent primitive lines, SP combined shells.

    Returns (elements, pure) with elements = {symbol: [(l, exps, coefs),
    ...]} (SP shells expanded into separate s and p entries)."""
    lines = [ln for ln in text.splitlines()
             if ln.strip() and not ln.lstrip().startswith("!")]
    if not lines:
        raise ValueError("empty .gbs input")
    tag = lines[0].strip().lower()
    if tag not in ("spherical", "cartesian"):
        raise ValueError(f"first line must be spherical/cartesian: {tag!r}")
    pure = tag == "spherical"
    lines = lines[1:]
    # trim to the LAST **** separator (the reference parser does the
    # same, ao_basis.py:258) — trailing content (e.g. ECP blocks in
    # def2-svp-ecp.gbs) is not part of the orbital basis grammar
    seps = [k for k, ln in enumerate(lines) if ln.strip() == "****"]
    if not seps:
        raise ValueError("no **** separators present")
    lines = lines[:seps[-1] + 1]
    elements: dict[str, list] = {}
    i = 0
    n = len(lines)
    # blocks: **** SYM 0 <shells> **** SYM 0 ... ****
    while i < n and lines[i].strip() != "****":
        i += 1
    i += 1
    while i < n:
        m = _RE_ATOM.match(lines[i])
        if not m:
            break
        sym = m.group(1).capitalize()
        i += 1
        shells = []
        while i < n and lines[i].strip() != "****":
            ms = _RE_SHELL.match(lines[i])
            if not ms:
                raise ValueError(f"bad shell header: {lines[i]!r}")
            lsym = ms.group(1).upper()
            nprim = int(ms.group(2))
            i += 1
            prims = []
            for _ in range(nprim):
                parts = lines[i].replace("D", "E").replace("d", "e").split()
                prims.append([float(x) for x in parts])
                i += 1
            prims_arr = np.array(prims)
            if lsym == "SP":
                shells.append((0, prims_arr[:, 0], prims_arr[:, 1]))
                shells.append((1, prims_arr[:, 0], prims_arr[:, 2]))
            elif lsym in _L_SYMBOLS:
                shells.append((_L_SYMBOLS[lsym], prims_arr[:, 0],
                               prims_arr[:, 1]))
            else:
                raise ValueError(f"unknown angular momentum {lsym!r}")
        elements[sym] = shells
        i += 1  # skip ****
    return elements, pure


def format_gbs(elements: dict, pure: bool = True) -> str:
    """Write {symbol: [(l, exps, coefs), ...]} back to .gbs text (the
    suite's own writer; round-trips through parse_gbs)."""
    out = ["spherical" if pure else "cartesian", "", "****"]
    for sym, shells in elements.items():
        out.append(f"{sym}     0")
        for l, exps, coefs in shells:
            out.append(f"{_L_NAMES[l]}    {len(exps)}   1.00")
            for a, c in zip(exps, coefs):
                out.append(f"    {a:>18.10E}    {c: .10E}")
        out.append("****")
    return "\n".join(out) + "\n"


# ------------------------- packaged basis sets -------------------------

_ALIASES = {
    "def2-svp": "def2-svp",
    "def2svp": "def2-svp",
    "def2-universal-jkfit": "def2-universal-jkfit",
    "def2-jkfit": "def2-universal-jkfit",
    "def2-svp-ecp": "def2-svp-ecp",
    "def2-svp-rifit": "def2-svp-rifit",
    "def2-rifit": "def2-svp-rifit",
}


@functools.lru_cache(maxsize=None)
def load_basis(name: str):
    """Load a packaged basis set: {symbol: [(l, exps, coefs), ...]}.

    Available: def2-svp (orbital), def2-universal-jkfit (Coulomb/exchange
    fitting auxiliary), def2-svp-rifit (correlation RI auxiliary, for
    MP2-class MO integrals), def2-svp-ecp (valence basis for post-Kr
    elements; the matching ECP potentials load via load_ecp)."""
    key = _ALIASES.get(name.lower().replace("_", "-"))
    if key is None:
        raise ValueError(f"unknown basis {name!r}; have {sorted(set(_ALIASES.values()))}")
    path = os.path.join(_DATA, "basis_sets.npz")
    blob = np.load(path)
    elements: dict[str, list] = {}
    for full in blob.files:
        bname, sym, idx, l = full.split("|")
        if bname != key:
            continue
        arr = blob[full]
        elements.setdefault(sym, []).append((int(idx), int(l),
                                             arr[:, 0], arr[:, 1]))
    for sym in elements:
        elements[sym] = [(l, e, c) for _, l, e, c
                         in sorted(elements[sym], key=lambda t: t[0])]
    if not elements:
        raise ValueError(f"basis {key!r} missing from {path}")
    return elements


def basis_shells(mol, basis, pure: bool | None = None):
    """Shell list for a molecule from a packaged basis name, a parsed
    elements dict, or raw .gbs text. Returns list[GShell] with
    shell.pure set (spherical by default for the def2 sets — their .gbs
    headers say 'spherical')."""
    from tpumathlib.apps.est import GShell, _normalize

    if isinstance(basis, str):
        if "\n" in basis:
            elements, file_pure = parse_gbs(basis)
        else:
            elements, file_pure = load_basis(basis), True
    else:
        elements, file_pure = basis, True
    if pure is None:
        pure = file_pure
    shells = []
    for sym, xyz in zip(mol.symbols, np.asarray(mol.coords, float)):
        if sym not in elements:
            raise ValueError(f"element {sym} not in basis")
        for l, exps, coefs in elements[sym]:
            shells.append(_normalize(GShell(
                l, np.asarray(exps, float), np.asarray(coefs, float),
                np.asarray(xyz, float), pure=bool(pure))))
    return shells


def sph_transform(shells):
    """Block-diagonal (nfunc, ncart) matrix C mapping the Cartesian
    integral matrices to the shells' public functions: pure shells get
    their cart2sph block, Cartesian shells an identity block. Returns
    None when every shell is Cartesian (no transform needed)."""
    if not any(getattr(s, "pure", False) for s in shells):
        return None
    blocks = []
    for s in shells:
        nc = len(cart_components(s.l))
        blocks.append(cart2sph(s.l) if s.pure and s.l >= 2
                      else np.eye(nc))
    nf = sum(b.shape[0] for b in blocks)
    ncart = sum(b.shape[1] for b in blocks)
    c = np.zeros((nf, ncart))
    r0 = c0 = 0
    for b in blocks:
        c[r0:r0 + b.shape[0], c0:c0 + b.shape[1]] = b
        r0 += b.shape[0]
        c0 += b.shape[1]
    return c


def nfunc(shells) -> int:
    """Number of public basis functions (spherical counts for pure)."""
    return sum(2 * s.l + 1 if getattr(s, "pure", False)
               else len(cart_components(s.l)) for s in shells)


# ------------------------------- ECPs -------------------------------

@functools.lru_cache(maxsize=None)
def load_ecp(name: str = "def2-svp-ecp"):
    """Packaged effective core potentials: {SYMBOL: apps.ecp.ECPAtom}
    (the .gbs ECP block grammar: 'SYM-ECP lmax ncore' followed by
    per-channel sections; channel l = lmax is the local potential).
    Feed straight into apps.ecp.ECPIntPlan."""
    from tpumathlib.apps.ecp import ECPAtom, ECPShell

    path = os.path.join(_DATA, "ecp_sets.npz")
    blob = np.load(path)
    out: dict = {}
    for full in blob.files:
        bname, sym, field = full.split("|", 2)
        if bname != name.lower():
            continue
        ent = out.setdefault(sym, {"meta": None, "channels": {}})
        if field == "meta":
            ent["meta"] = blob[full]
        else:
            ent["channels"][int(field)] = blob[full]
    res = {}
    for sym, ent in out.items():
        ncore, lmax = int(ent["meta"][0]), int(ent["meta"][1])
        mk = lambda l, arr: ECPShell(l, arr[:, 0].astype(int),
                                     arr[:, 1], arr[:, 2])
        top = mk(lmax, ent["channels"][lmax])
        semis = [mk(l, ent["channels"][l])
                 for l in sorted(ent["channels"]) if l != lmax]
        res[sym] = ECPAtom(ncore, top, semis)
    return res

"""Coupled-perturbed Hartree–Fock (CPHF): RHF static polarizability.

Reference parity: the cuest_scf CPHF example
(/root/reference/cuEST/cuest_scf_examples/examples/cphf-1/test.py:1 —
nonsymmetric-exchange compute routines + multipole integrals feeding an
iterative CPHF solve for the gas-phase RHF polarizability).

TPU-native design: the CPHF left-hand side is applied MATRIX-FREE with
the density-fitting tensors —

    H[U]_ia = (ε_a − ε_i) U_ia
              + Σ_jb [4 (ia|jb) − (ib|ja) − (ij|ab)] U_jb

where each two-electron term is two MXU einsum contractions through the
DF factors B_ia/B_ij/B_ab (never materializing the (ia,jb) matrix), and
the solve is `jax.scipy.sparse.linalg.cg` — H is symmetric positive
definite at a stable RHF minimum (it is the electronic Hessian of the
energy in the real orbital-rotation parameters).

Validation: finite-field oracle — re-solve the SCF in a small uniform
field through ``rhf(hcore_extra=F·μ)`` and difference the dipole
expectations (tests/test_est.py::test_cphf_polarizability_fd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpumathlib.apps.deriv import multipole_matrix
from tpumathlib.apps.est import DFTensors, rhf
from tpumathlib.apps.scf import Molecule


def dipole_matrices(shells) -> np.ndarray:
    """(3, n, n) dipole-operator AO matrices ⟨μ|x_c|ν⟩ about the origin,
    in the basis's public (spherical) function space."""
    from tpumathlib.apps.basis import sph_transform

    orders = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    m = np.stack([multipole_matrix(shells, o) for o in orders])
    c_t = sph_transform(shells)
    if c_t is not None:
        m = np.einsum("im,jn,cmn->cij", c_t, c_t, m)
    return m


def cphf_response(b_ia, b_ij, b_ab, eps_occ, eps_vir, rhs,
                  tol: float = 1e-10, maxiter: int = 200):
    """Solve H[U] = −rhs for each right-hand side (matrix-free CG).

    ``rhs`` is (k, no, nv) (the MO-basis perturbation blocks h¹_ia);
    returns U (k, no, nv). All contractions run at HIGHEST MXU precision
    — response equations amplify the bf16-demotion error the same way
    the VV10 gradient did (apps/vv10.py).
    """
    b_ia = jnp.asarray(b_ia)
    b_ij = jnp.asarray(b_ij)
    b_ab = jnp.asarray(b_ab)
    eo = jnp.asarray(eps_occ, b_ia.dtype)
    ev = jnp.asarray(eps_vir, b_ia.dtype)
    d_ia = ev[None, :] - eo[:, None]
    hi = jax.lax.Precision.HIGHEST

    def hess(u):
        g = jnp.einsum("pia,ia->p", b_ia, u, precision=hi)
        r = d_ia * u + 4.0 * jnp.einsum("pia,p->ia", b_ia, g,
                                        precision=hi)
        t = jnp.einsum("pib,jb->pij", b_ia, u, precision=hi)
        r -= jnp.einsum("pij,pja->ia", t, b_ia, precision=hi)
        t2 = jnp.einsum("pab,jb->pja", b_ab, u, precision=hi)
        r -= jnp.einsum("pij,pja->ia", b_ij, t2, precision=hi)
        return r

    def solve_one(r):
        u, _ = jax.scipy.sparse.linalg.cg(hess, -r, tol=tol,
                                          maxiter=maxiter)
        return u

    return jax.vmap(solve_one)(jnp.asarray(rhs, b_ia.dtype))


def polarizability(mol: Molecule, basis: str | None = None,
                   jk_basis: str | None = None, shells=None,
                   scf_kwargs: dict | None = None) -> np.ndarray:
    """Static RHF dipole polarizability α (3, 3) via CPHF
    (≙ examples/cphf-1: rhf_dipole_rhs + iterative solve + dot with the
    dipole integrals).

    α_xy = −∂d_y/∂F_x = −4 Σ_ia U^x_ia μ^y_ia with the sign convention
    H(F) = H_core + Σ_x F_x ⟨μ|x|ν⟩ and d_y = 2 Tr(D μ_y); for a stable
    ground state α is symmetric positive definite.
    """
    from tpumathlib.apps.basis import basis_shells
    from tpumathlib.apps.est import sto3g_shells

    if shells is None:
        shells = (basis_shells(mol, basis) if basis is not None
                  else sto3g_shells(mol))
    kw = dict(scf_kwargs or {})
    _, c, eps = rhf(mol, shells=shells, density_fit=jk_basis is not None,
                    aux_basis=jk_basis, **kw)
    nocc = mol.nelec // 2
    c_occ, c_vir = c[:, :nocc], c[:, nocc:]
    mu = dipole_matrices(shells)
    mu_ia = np.einsum("mi,cmn,na->cia", c_occ, mu, c_vir)

    aux = basis_shells(mol, jk_basis) if jk_basis is not None else None
    df = DFTensors(shells, aux=aux)
    b_ia, b_ij, b_ab = df.mo_blocks(
        [c_occ.T, c_occ.T, c_vir.T], [c_vir.T, c_occ.T, c_vir.T])
    u = cphf_response(b_ia, b_ij, b_ab, eps[:nocc], eps[nocc:], mu_ia)
    return -4.0 * np.einsum("xia,yia->xy", np.asarray(u), mu_ia)

"""cuEST-style C/Python API surface over the SCF engine.

Parity (cuEST c_examples/examples/* and python_examples — SURVEY.md §2.13):
  0_context basic_usage (params → create → version → destroy,
  main.c:36-61)            → Context lifecycle (+ user-owned "resources")
  multi-stream / multi-GPU → no-ops on TPU (dataflow ordering; mesh arg
                             accepted for the sharded path)
  1_basic_data_structures  → Molecule / AOBasis (apps.scf) + GPUMatrix ≙
                             device arrays (jnp)
  2_one_electron_integrals → plan/compute pairs: overlap, kinetic,
                             potential, dipole
  3_density_fitting (J/K)  → compute_coulomb / compute_exchange (exact ERI
                             contraction + DF via the df_b plan)
  4_exchange_correlation   → GridPlan + XCPlan (molecular Becke grid, XC
                             energy/potential on device — apps.xc,
                             ≙ local_xc_potential/run.py:1 and
                             cuest_molecular_grid.py:1)
  5_ecp / 6_pcm            → ECPIntPlanHandle (ecp_integrals +
                             ecp_gradients) / PCMIntPlanHandle
                             (pcm_potential + pcm_gradients) over
                             apps.ecp / apps.pcm
  cuest_scf rhf driver     → apps.scf.rhf / apps.est.rhf; uhf/uks/rks →
                             apps.xc.uhf / apps.xc.rks (≙ uhf.py:1)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import NotSupportedError, check
from tpumathlib.apps.scf import (
    Molecule,
    Shell,
    eri_tensor,
    kinetic,
    nuclear,
    overlap,
    sto3g_basis,
)

VERSION = (0, 1, 0)


@dataclasses.dataclass
class ContextParams:
    """≙ cuestParams: creation-time knobs."""

    max_memory_mb: int = 4096
    screening_threshold: float = 1e-12


class Context:
    """≙ cuestContext: handle lifecycle (create → use → destroy)."""

    def __init__(self, params: ContextParams | None = None, mesh=None):
        self.params = params or ContextParams()
        self.mesh = mesh
        self._alive = True

    @staticmethod
    def version() -> tuple:
        return VERSION

    def destroy(self):
        self._alive = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.destroy()

    def _check(self):
        check(self._alive, "context destroyed", err=NotSupportedError)


class IntegralPlan:
    """≙ cuest integral plan/compute pairs: the plan captures (molecule,
    basis); compute executes (repeatable)."""

    def __init__(self, ctx: Context, mol: Molecule, kind: str,
                 general: bool | None = None):
        ctx._check()
        self.ctx = ctx
        self.mol = mol
        self.kind = kind
        # second-row atoms need the general-ℓ McMurchie–Davidson engine
        # (apps/est.py); pure H/He molecules keep the closed-form s path
        if general is None:
            general = any(s not in ("H", "He") for s in mol.symbols)
        self.general = general
        if general:
            from tpumathlib.apps import est

            self.shells = est.sto3g_shells(mol)
        else:
            self.basis = sto3g_basis(mol)

    def compute(self):
        self.ctx._check()
        if self.general:
            from tpumathlib.apps import est

            if self.kind == "overlap":
                return jnp.asarray(est.overlap(self.shells))
            if self.kind == "kinetic":
                return jnp.asarray(est.kinetic(self.shells))
            if self.kind == "potential":
                return jnp.asarray(est.nuclear(self.shells, self.mol))
            if self.kind == "eri":
                return jnp.asarray(est.eri_tensor(self.shells))
            if self.kind == "df_b":
                return est.DFTensors(self.shells).b
            raise NotSupportedError(f"integral kind {self.kind}")
        if self.kind == "overlap":
            return jnp.asarray(overlap(self.basis))
        if self.kind == "kinetic":
            return jnp.asarray(kinetic(self.basis))
        if self.kind == "potential":
            return jnp.asarray(nuclear(self.basis, self.mol))
        if self.kind == "dipole":
            return jnp.asarray(_dipole(self.basis))
        if self.kind == "eri":
            return jnp.asarray(eri_tensor(self.basis))
        raise NotSupportedError(
            f"integral kind {self.kind} (ecp/pcm live in ECPIntPlanHandle/"
            "PCMIntPlanHandle)")


class GridPlan:
    """≙ cuestCreateGrid/cuestComputeGrid (cuest_molecular_grid.py:1):
    plan captures (molecule, sizes); compute returns (points, weights)."""

    def __init__(self, ctx: Context, mol: Molecule, n_rad: int = 60,
                 n_theta: int = 12, n_phi: int = 24):
        ctx._check()
        self.ctx = ctx
        self.mol = mol
        self.kw = dict(n_rad=n_rad, n_theta=n_theta, n_phi=n_phi)

    def compute(self):
        self.ctx._check()
        from tpumathlib.apps.xc import molecular_grid

        return molecular_grid(self.mol, **self.kw)


class XCPlan:
    """≙ the 4_exchange_correlation local-XC-potential flow
    (local_xc_potential/run.py:1): plan captures (molecule, functional,
    grid); compute(density) returns (E_xc, V_xc) — spin-resolved when
    given (Da, Db)."""

    def __init__(self, ctx: Context, mol: Molecule, xc: str = "svwn",
                 **grid_kw):
        ctx._check()
        self.ctx = ctx
        from tpumathlib.apps import est
        from tpumathlib.apps.xc import XCIntegrator

        self.xci = XCIntegrator(est.sto3g_shells(mol), mol, xc, **grid_kw)

    def compute(self, density, density_b=None):
        self.ctx._check()
        da = jnp.asarray(density, jnp.float32)
        db = jnp.asarray(density_b, jnp.float32) if density_b is not None \
            else da
        if density_b is None:
            da = da * 0.5
            db = db * 0.5
        exc, va, vb = self.xci.evaluate(da, db)
        return (exc, va) if density_b is None else (exc, va, vb)


def _dipole(basis: list[Shell]) -> np.ndarray:
    """⟨μ|r|ν⟩ for s-Gaussians: the Gaussian product center times S_μν."""
    n = len(basis)
    s = overlap(basis)
    d = np.zeros((3, n, n))
    for i, bi in enumerate(basis):
        for j, bj in enumerate(basis):
            a = bi.exps[:, None]
            b = bj.exps[None, :]
            p = a + b
            r2 = np.sum((bi.center - bj.center) ** 2)
            sab = (np.pi / p) ** 1.5 * np.exp(-a * b / p * r2)
            cc = bi.coefs[:, None] * bj.coefs[None, :]
            for ax in range(3):
                pc = (a * bi.center[ax] + b * bj.center[ax]) / p
                d[ax, i, j] = np.sum(cc * pc * sab)
    return d


def compute_coulomb(eri, density):
    """J_{μν} = (μν|λσ) D_{λσ} (≙ cuest compute_coulomb — einsum on MXU)."""
    from tpumathlib.tensor import einsum

    return einsum("uvls,ls->uv", eri, density)


def compute_exchange(eri, density):
    """K_{μν} = (μλ|νσ) D_{λσ} (≙ cuest compute_exchange)."""
    from tpumathlib.tensor import einsum

    return einsum("ulvs,ls->uv", eri, density)


class ECPIntPlanHandle:
    """≙ cuestECPIntPlanCreate → cuestECPIntCompute
    (5_effective_core_potentials/ecp_integrals/run.py:1): plan captures
    (basis, geometry, active ECP atoms); compute returns ⟨μ|U_ECP|ν⟩."""

    def __init__(self, ctx: Context, mol: Molecule, ecp_atoms: dict,
                 **kw):
        ctx._check()
        self.ctx = ctx
        from tpumathlib.apps.ecp import ECPIntPlan

        self.plan = ECPIntPlan(mol, ecp_atoms, **kw)

    def compute(self):
        self.ctx._check()
        return np.asarray(self.plan.matrix(), float)

    def gradient(self, density):
        """≙ ecp_gradients/run.py:1 — density-contracted dU/dR."""
        self.ctx._check()
        from tpumathlib.apps.ecp import ecp_gradient

        return ecp_gradient(self.plan.mol, density, self.plan.ecp_atoms)


class PCMIntPlanHandle:
    """≙ cuestPCMIntPlanCreate → cuestPCMPotentialCompute
    (6_pcm/pcm_potential/run.py:1). `npoints` mirrors the
    CUEST_PCMINTPLAN_NUM_POINT query; compute(density, in_q) returns
    (out_q, V_pcm, results) with the dielectric energy / residual /
    iteration / convergence attributes on results."""

    def __init__(self, ctx: Context, mol: Molecule, epsilon: float = 80.0,
                 **kw):
        ctx._check()
        self.ctx = ctx
        from tpumathlib.apps.pcm import PCMPlan

        self.plan = PCMPlan(mol, epsilon=epsilon, **kw)
        self.npoints = self.plan.npoints

    def compute(self, density, in_q=None):
        self.ctx._check()
        return self.plan.potential_compute(density, in_q=in_q)

    def gradient(self, density):
        """≙ 6_pcm/pcm_gradients/run.py:1."""
        self.ctx._check()
        from tpumathlib.apps.pcm import pcm_gradient

        return pcm_gradient(self.plan.mol, density, self.plan)


class GradientPlan:
    """SCF nuclear-gradient plan (≙ the cuest_scf gradient machinery:
    Pulay forces + energy-weighted density).
    kind: 'rhf' | 'uhf' | 'uks' | 'rhf_ecp' | 'rhf_pcm'."""

    def __init__(self, ctx: Context, mol: Molecule, kind: str = "rhf",
                 **kw):
        ctx._check()
        self.ctx = ctx
        self.mol = mol
        self.kind = kind
        self.kw = kw

    def compute(self):
        self.ctx._check()
        from tpumathlib.apps import deriv
        from tpumathlib.apps.xcgrad import uks_gradient

        if self.kind == "rhf":
            return deriv.rhf_gradient(self.mol, **self.kw)
        if self.kind == "uhf":
            return deriv.uhf_gradient(self.mol, **self.kw)
        if self.kind == "uks":
            return uks_gradient(self.mol, **self.kw)
        if self.kind == "rhf_ecp":
            return deriv.rhf_ecp_gradient(self.mol, **self.kw)
        if self.kind == "rhf_pcm":
            return deriv.rhf_pcm_gradient(self.mol, **self.kw)
        raise ValueError(f"unknown gradient kind {self.kind!r}")

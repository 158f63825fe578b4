"""apps — L5 applications proving the layers compose (SURVEY.md §1).

- scf: restricted Hartree–Fock with DIIS (≙ cuEST cuest_scf/rhf.py) over
  the suite's einsum + generalized-eigensolver tiers, with its own Gaussian
  integral engine (s-type primitives).
- est: general-ℓ McMurchie–Davidson integrals, RHF, density fitting.
- xc: molecular Becke grids, SVWN/PBE exchange–correlation with autodiff
  potentials, UHF/UKS/RKS drivers (≙ cuest 4_exchange_correlation, uhf.py).
- distributed: mesh-sharded DF J/K (aux-dimension) + grid-sharded XC
  (≙ cuEST basic_multigpu_usage, re-expressed as SPMD over one Mesh).
- vv10: VV10 nonlocal correlation (≙ cuest nonlocal_xc_potential/
  nonlocal_xc_gradient) — pairwise O(G²) MXU kernel, autodiff potential
  and nuclear gradient, SCF coupling via uhf/rks(nlc=...).
- The CG / BiCGStab iterative solvers (≙ cuSPARSE/cg, bicgstab) live in
  tpumathlib.sparse.solvers.
"""

from tpumathlib.apps.scf import Molecule, sto3g_basis, rhf  # noqa: F401
from tpumathlib.apps.xc import molecular_grid, rks, uhf  # noqa: F401

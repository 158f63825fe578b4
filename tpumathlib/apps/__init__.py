"""apps — L5 applications proving the layers compose (SURVEY.md §1).

- scf: restricted Hartree–Fock with DIIS (≙ cuEST cuest_scf/rhf.py) over
  the suite's einsum + generalized-eigensolver tiers, with its own Gaussian
  integral engine (s-type primitives).
- The CG / BiCGStab iterative solvers (≙ cuSPARSE/cg, bicgstab) live in
  tpumathlib.sparse.solvers.
"""

from tpumathlib.apps.scf import Molecule, sto3g_basis, rhf  # noqa: F401

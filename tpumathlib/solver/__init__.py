"""solver — the cuSOLVER capability surface, TPU-native.

- dense:  64-bit "X-API" factorizations and eigen/SVD drivers (≙ cuSOLVER
          Xpotrf/Xgetrf/Xgeqrf/Xsyevd/Xsyevdx/Xgesvd/Xgesvdp/Xgesvdr/Xgeev/
          Xtrtri + legacy orgqr/ormqr/sygvd/potrfBatched)
- jacobi: one-sided (gesvdj) and two-sided (syevj/sygvj) Jacobi with
          round-robin parallel ordering — every rotation round is an MXU
          matmul (the TPU-native formulation), batched variants included
- irs:    mixed-precision iterative-refinement solvers (cusolverDnIRSXgesv)
          with classical and GMRES refinement

Oracles: SciPy/LAPACK at reference tolerances (SURVEY.md §4 tier 3/4).
"""

from tpumathlib.solver import dense, irs, jacobi  # noqa: F401
from tpumathlib.solver.dense import (  # noqa: F401
    xpotrf, xpotrs, xgetrf, xgetrs, xgeqrf, xorgqr, xormqr, xtrtri,
    xsyevd, xsyevdx, xsygvd, xgesvd, xgesvdp, xgesvdr, xgeev,
    potrf_batched,
)
from tpumathlib.solver.blocked import potrf_blocked  # noqa: F401
from tpumathlib.solver.onelaunch import (getrf_onelaunch,  # noqa: F401
                                         potrf_onelaunch)
from tpumathlib.solver.qr_onelaunch import (geqrf_onelaunch,  # noqa: F401
                                            orgqr_onelaunch, qr_onelaunch)
from tpumathlib.solver.jacobi import gesvdj, syevj, sygvj, gesvdj_batched, syevj_batched  # noqa: F401
from tpumathlib.solver.irs import irs_gesv  # noqa: F401
from tpumathlib.solver.tridiag_eig import (  # noqa: F401
    syevd_via_chain,
    xormtr,
    xstedc,
    xsytrd,
)

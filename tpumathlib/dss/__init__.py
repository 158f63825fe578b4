"""dss — the cuDSS capability surface: sparse DIRECT solver.

Parity (cuDSS/simple/simple.cpp:183-232 and the 22 sample variants):
  cudssConfig/cudssData objects        → Config / Data dataclasses
  cudssExecute(ANALYSIS)               → analysis phase: fill-reducing MD
                                          ordering + symbolic factorization
                                          (native C++, tpumathlib.native)
  cudssExecute(FACTORIZATION)          → native sparse Cholesky (SPD) or
                                          Gilbert–Peierls LU w/ threshold
                                          partial pivoting
  cudssExecute(SOLVE)                  → level-scheduled device SpSV pair
                                          (tpumathlib.sparse.spsv) or host
                                          solve (config.hybrid_execute)
  REORDERING-only phase                → Solver.reorder() (≙ the
                                          reordering-only sample)
  batch / uniform-batch                → Solver.solve on stacked RHS +
                                          BatchSolver over matrix lists
  matrix-market input                  → from_matrix_market (native parser)
  get/set knobs                        → Config fields; Data diagnostics
                                          (lu_nnz, perm, inertia, diag)
  Schur complement                     → schur_complement()
  high-precision (fp64x2) solve        → solve_hp(): double-double iterate
                                          + EFT-residual refinement
                                          (≙ simple_high_precision)
  MGMN distributed mode                → distributed row-partitioned input:
                                          gather → factor once → solve;
                                          comm rides the jax mesh (the
                                          pluggable-comm analogue)
  hybrid host/device memory+execute    → factors live host-side (numpy) and
                                          solves run host or device per
                                          config — the actual TPU situation:
                                          sequential factorization is host
                                          work, triangular solves are device
                                          level sweeps.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax.numpy as jnp
import numpy as np

from tpumathlib.core.errors import ExecutionError, check
from tpumathlib.sparse.containers import CSR
from tpumathlib.sparse.spsv import spsv_plan


class MatrixType(enum.Enum):
    GENERAL = "general"
    SYMMETRIC = "symmetric"
    SPD = "spd"


class Phase(enum.Enum):
    REORDERING = "reordering"
    ANALYSIS = "analysis"
    FACTORIZATION = "factorization"
    SOLVE = "solve"


@dataclasses.dataclass
class Config:
    """≙ cudssConfig (get/set knobs sample)."""

    matrix_type: MatrixType = MatrixType.GENERAL
    reordering: str = "md"          # "md" | "nd" | "natural"
                                    # ("nd" = nested dissection, the
                                    # METIS-class analysis ordering)
    pivot_tol: float = 0.1          # threshold partial pivoting (LU)
    threads: int = 1                # ≙ the cuDSS threading-layer knob:
                                    # supernode tasks fan over the
                                    # supernodal etree on a worker pool
    supernodal: bool = True         # SPD: amalgamated supernodal panels
                                    # (native/src/supernodal.cpp, 2-4x the
                                    # simplicial engine); False → spchol_ll
    hybrid_execute: bool = True     # host triangular solves (False → device
                                    # level-scheduled SpSV)
    hybrid_memory: bool = False     # ≙ cuDSS hybrid host/device memory
                                    # mode: factors stay in HOST memory and
                                    # stream to the device per solve (for
                                    # factor sizes beyond device HBM);
                                    # only meaningful with the device
                                    # solve path (hybrid_execute=False)


@dataclasses.dataclass
class Data:
    """≙ cudssData: analysis + factor state and diagnostics."""

    perm: np.ndarray | None = None
    parent: np.ndarray | None = None
    sym_nnz: int | None = None
    l_fac: Any = None               # scipy-like csr triples (host)
    u_fac: Any = None
    prow: np.ndarray | None = None
    lu_nnz: int | None = None       # ≙ CUDSS_DATA_LU_NNZ
    diag: np.ndarray | None = None  # ≙ CUDSS_DATA_DIAG
    inertia: tuple | None = None    # ≙ CUDSS_DATA_INERTIA


def _sym_pattern(indptr, indices, n):
    from tpumathlib.sparse import hostcsr

    return hostcsr.sym_pattern(indptr, indices, n)


class Solver:
    """≙ cudssHandle + the 3-phase execute flow."""

    def __init__(self, a: CSR, config: Config | None = None):
        self.a = a
        self.config = config or Config()
        self.data = Data()
        self._solve_fns = None

    # ---- phases ----

    def reorder(self) -> np.ndarray:
        """REORDERING-only phase (≙ cuDSS reordering sample)."""
        from tpumathlib import native

        n = self.a.shape[0]
        indptr = np.asarray(self.a.indptr, np.int64)
        indices = np.asarray(self.a.indices, np.int64)
        if self.config.reordering == "natural":
            self.data.perm = np.arange(n, dtype=np.int64)
        else:
            sp_, si_ = _sym_pattern(indptr, indices, n)
            order = (native.nd_ordering if self.config.reordering == "nd"
                     else native.md_ordering)
            self.data.perm = order(sp_, si_)
        return self.data.perm

    def analyze(self) -> "Solver":
        """ANALYSIS: ordering + symbolic factorization (workspace bound)."""
        from tpumathlib import native

        if self.data.perm is None:
            self.reorder()
        n = self.a.shape[0]
        sp_, si_ = _sym_pattern(np.asarray(self.a.indptr, np.int64),
                                np.asarray(self.a.indices, np.int64), n)
        # permuted symmetric pattern for the etree
        from tpumathlib.sparse import hostcsr

        p = self.data.perm
        pp_, pi_, _ = hostcsr.permute_sym(sp_, si_, np.ones(len(si_)), p)
        parent, col_nnz = native.symbolic_cholesky(pp_, pi_)
        self.data.parent = parent
        self.data.sym_nnz = int(col_nnz.sum())
        return self

    def _factorize_host(self) -> "Solver":
        """Host-side numeric factorization only (no device plan build) —
        the GIL-releasing native phase BatchSolver may thread-pool."""
        from tpumathlib import native
        from tpumathlib.sparse import hostcsr

        if self.data.perm is None:
            self.analyze()
        n = self.a.shape[0]
        p = self.data.perm
        app, api, apx = hostcsr.permute_sym(
            np.asarray(self.a.indptr, np.int64),
            np.asarray(self.a.indices, np.int64),
            np.asarray(self.a.data, np.float64), p)
        nnz_ap = int(app[-1])
        cap = max(16 * (self.data.sym_nnz or nnz_ap) + 64, 256)
        if self.config.matrix_type == MatrixType.SPD:
            rows = hostcsr.row_ids(app)
            keep = api <= rows
            lowp = np.zeros(n + 1, np.int64)
            np.add.at(lowp, rows[keep] + 1, 1)
            if self.config.supernodal:
                lp, li, lx = native.spchol_supernodal(
                    np.cumsum(lowp), api[keep], apx[keep], cap=cap,
                    threads=self.config.threads)
            else:
                lp, li, lx = native.spchol(np.cumsum(lowp), api[keep],
                                           apx[keep], cap=cap)
            self.data.l_fac = (lp, li, lx)
            self.data.u_fac = None
            self.data.prow = np.arange(n, dtype=np.int64)
            self.data.lu_nnz = int(2 * lp[n] - n)
            self.data.diag = lx[np.asarray(
                [lp[i + 1] - 1 for i in range(n)])] ** 2
            self.data.inertia = (n, 0, 0)
        else:
            (lt, ut, prow) = native.splu(app, api, apx,
                                         pivot_tol=self.config.pivot_tol,
                                         cap=cap)
            self.data.l_fac = lt
            self.data.u_fac = ut
            self.data.prow = prow
            self.data.lu_nnz = int(lt[0][n] + ut[0][n] - n)
            up, ui, ux = ut
            dg = np.zeros(n)
            for i in range(n):
                row = slice(up[i], up[i + 1])
                sel = np.nonzero(ui[row] == i)[0]
                dg[i] = ux[row][sel[0]] if len(sel) else 0.0
            self.data.diag = dg
            self.data.inertia = (int((dg > 0).sum()), int((dg < 0).sum()),
                                 int((dg == 0).sum()))
        return self

    def factorize(self) -> "Solver":
        """FACTORIZATION: native numeric factorization of PAPᵀ."""
        self._factorize_host()
        self._build_solve()
        return self

    def _build_solve(self):
        from tpumathlib.sparse import hostcsr

        n = self.a.shape[0]
        lp, li, lx = self.data.l_fac
        if self.data.u_fac is None:
            up, ui, ux = hostcsr.transpose(n, n, lp, li, lx)
        else:
            up, ui, ux = self.data.u_fac
        if self.config.hybrid_execute:
            from tpumathlib import native

            def solve(b):
                y = native.csr_trisolve(lp, li, lx, b, lower=True,
                                        unit=self.data.u_fac is not None)
                return native.csr_trisolve(up, ui, ux, y, lower=False)

            self._solve_fns = solve
        elif self.config.hybrid_memory:
            # hybrid host/device MEMORY mode (≙ the cuDSS hybrid-memory
            # sample): factor VALUES live host-side and stream to the
            # device per solve — but the ANALYSIS (level schedules,
            # diagonal positions, patterns) is built ONCE here and stays
            # resident, exactly like cuDSS keeps analysis data while
            # streaming factors. Per solve only the value arrays upload.
            lhost = np.asarray(lx)
            uhost = np.asarray(ux)
            unit = self.data.u_fac is not None
            lcsr0 = CSR(jnp.asarray(np.asarray(lp, np.int64)),
                        jnp.asarray(np.asarray(li, np.int64)),
                        jnp.asarray(lhost), (n, n))
            ucsr0 = CSR(jnp.asarray(np.asarray(up, np.int64)),
                        jnp.asarray(np.asarray(ui, np.int64)),
                        jnp.asarray(uhost), (n, n))
            lplan0 = spsv_plan(lcsr0, lower=True, unit_diag=unit)
            uplan0 = spsv_plan(ucsr0, lower=False)
            # release the resident device value buffers: keep pattern only
            empty = jnp.zeros(0, lcsr0.data.dtype)
            lplan0 = dataclasses.replace(
                lplan0, csr=CSR(lcsr0.indptr, lcsr0.indices, empty, (n, n)))
            uplan0 = dataclasses.replace(
                uplan0, csr=CSR(ucsr0.indptr, ucsr0.indices, empty, (n, n)))

            def solve(b):
                lplan = dataclasses.replace(
                    lplan0, csr=CSR(lplan0.csr.indptr, lplan0.csr.indices,
                                    jnp.asarray(lhost), (n, n)))
                uplan = dataclasses.replace(
                    uplan0, csr=CSR(uplan0.csr.indptr, uplan0.csr.indices,
                                    jnp.asarray(uhost), (n, n)))
                return np.asarray(uplan.solve(lplan.solve(jnp.asarray(b))))

            self._solve_fns = solve
        else:
            # device path: level-scheduled SpSV pair
            lcsr = CSR(jnp.asarray(lp), jnp.asarray(li), jnp.asarray(lx), (n, n))
            ucsr = CSR(jnp.asarray(np.asarray(up, np.int64)),
                       jnp.asarray(np.asarray(ui, np.int64)),
                       jnp.asarray(ux), (n, n))
            lplan = spsv_plan(lcsr, lower=True, unit_diag=self.data.u_fac is not None)
            uplan = spsv_plan(ucsr, lower=False)

            def solve(b):
                return np.asarray(uplan.solve(lplan.solve(jnp.asarray(b))))

            self._solve_fns = solve

    def solve(self, b) -> np.ndarray:
        """SOLVE phase: x with A x = b; b (n,) or (n, k) (uniform batch)."""
        check(self._solve_fns is not None, "factorize first",
              err=ExecutionError)
        b = np.asarray(b, np.float64)
        p = self.data.perm
        prow = self.data.prow
        bp = b[p][prow] if b.ndim == 1 else b[p][prow, :]
        x = self._solve_fns(bp)
        out = np.zeros_like(b)
        out[p] = x
        return out

    def execute(self, phase: Phase, b=None):
        """≙ cudssExecute(handle, phase, config, data, A, x, b)."""
        if phase == Phase.REORDERING:
            return self.reorder()
        if phase == Phase.ANALYSIS:
            return self.analyze()
        if phase == Phase.FACTORIZATION:
            return self.factorize()
        return self.solve(b)

    # ---- extras ----

    def residual(self, x, b) -> float:
        """≙ the cuDSS residual sample: ‖b − Ax‖∞/‖b‖∞."""
        from tpumathlib.sparse import hostcsr

        ax = hostcsr.spmv(np.asarray(self.a.indptr, np.int64),
                          np.asarray(self.a.indices, np.int64),
                          np.asarray(self.a.data, np.float64), np.asarray(x))
        r = np.abs(b - ax).max()
        return float(r / max(np.abs(b).max(), 1e-300))

    def solve_hp(self, b, max_refine: int = 4):
        """High-precision solve (≙ cuDSS/simple_high_precision/
        simple_high_precision.cpp:76-160's cudss_fp64mp2_t flow): the
        solution is maintained as an UNEVALUATED DOUBLE-DOUBLE pair
        (x_hi, x_lo) and polished by iterative refinement whose residual
        r = b − A·(x_hi + x_lo) is accumulated with error-free
        transformations (two-prod products, exactly-rounded per-row sums
        — the same compensated-arithmetic family as the sample's
        high_precision_add/sub/mul). Returns (x_hi, x_lo); x_hi + x_lo
        carries ~2×53-bit significance, and the dd-residual lands orders
        below what a plain f64 direct solve leaves."""
        check(self._solve_fns is not None, "factorize first",
              err=ExecutionError)
        b = np.asarray(b, np.float64)
        check(b.ndim == 1, "solve_hp expects a single RHS",
              err=ExecutionError)
        xhi = self.solve(b)
        xlo = np.zeros_like(xhi)
        indptr = np.asarray(self.a.indptr, np.int64)
        indices = np.asarray(self.a.indices, np.int64)
        vals = np.asarray(self.a.data, np.float64)
        best = np.inf
        for _ in range(max_refine):
            r = _dd_residual(indptr, indices, vals, xhi, xlo, b)
            rn = float(np.abs(r).max())
            if not rn < best:        # converged / stagnated (NaN-safe)
                break
            best = rn
            d = self.solve(r)
            # dd update x ← x + d (two_sum + renormalize)
            s, e = _two_sum(xhi, d)
            xlo = xlo + e
            xhi, xlo = _two_sum(s, xlo)
        return xhi, xlo

    def schur_complement(self, split: int) -> np.ndarray:
        """Schur complement S = A22 − A21 A11⁻¹ A12 for the 2×2 blocking at
        ``split`` (≙ cuDSS Schur sample)."""
        from tpumathlib.sparse import hostcsr

        a = hostcsr.to_dense(self.a.shape[0], self.a.shape[1],
                             np.asarray(self.a.indptr, np.int64),
                             np.asarray(self.a.indices, np.int64),
                             np.asarray(self.a.data, np.float64))
        a11 = a[:split, :split]
        a12 = a[:split, split:]
        a21 = a[split:, :split]
        a22 = a[split:, split:]
        sub = Solver(_dense_to_csr_np(a11), Config(self.config.matrix_type,
                                                   self.config.reordering,
                                                   self.config.pivot_tol))
        sub.factorize()
        y = np.stack([sub.solve(a12[:, j]) for j in range(a12.shape[1])], axis=1)
        return a22 - a21 @ y


def _two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly (vectorized)."""
    s = a + b
    ap = s - b
    bp = s - ap
    e = (a - ap) + (b - bp)
    return s, e


def _two_prod(a, b):
    """Dekker two-product via 26-bit splitting: p + e == a*b exactly
    (the FMA-free form; ≙ the sample's high_precision_mul)."""
    p = a * b
    split = 134217729.0  # 2^27 + 1
    ah = a * split
    ah = ah - (ah - a)
    al = a - ah
    bh = b * split
    bh = bh - (bh - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _dd_residual(indptr, indices, vals, xhi, xlo, b):
    """r = b − A·(xhi + xlo): every product error-free-transformed
    (two-prod) and each row accumulated in VECTORIZED double-double
    arithmetic — one two-sum cascade per padded column, so the host cost
    is ~3·max_nnz_per_row passes over n-vectors instead of a per-row
    Python loop (this host's Python loops are pathologically slow —
    CLAUDE.md). Accumulation error ~2⁻¹⁰⁶ per term: far below the f64
    representation of the returned residual."""
    import math

    n = len(indptr) - 1
    p, e = _two_prod(vals, xhi[indices])
    lo = vals * xlo[indices]
    counts = np.diff(indptr)
    k = int(counts.max()) if n else 0
    if 3 * k + 1 > 512:
        # a near-dense row would blow up the padded matrix — exact per-row
        # fsum fallback for pathological patterns
        r = np.empty(n)
        for i in range(n):
            s = slice(indptr[i], indptr[i + 1])
            r[i] = math.fsum([b[i]] + (-p[s]).tolist() + (-e[s]).tolist()
                             + (-lo[s]).tolist())
        return r
    rows = np.repeat(np.arange(n), counts)
    pos = np.arange(len(vals)) - np.asarray(indptr[:-1])[rows]
    terms = np.zeros((n, 3 * k + 1))
    terms[:, 0] = b
    terms[rows, 1 + 3 * pos] = -p
    terms[rows, 2 + 3 * pos] = -e
    terms[rows, 3 + 3 * pos] = -lo
    shi = np.zeros(n)
    slo = np.zeros(n)
    for j in range(terms.shape[1]):
        s, err = _two_sum(shi, terms[:, j])
        slo = slo + err
        shi, slo = _two_sum(s, slo)
    return shi + slo


def _dense_to_csr_np(a) -> CSR:
    from tpumathlib.sparse.convert import dense_to_csr

    return dense_to_csr(a)


class BatchSolver:
    """≙ cuDSS batch (non-uniform) sample: list of systems, one solver each
    (shapes/patterns may differ).

    ``threads`` ≙ the cuDSS threading-layer knob
    (cuDSS/test_threading_layer): the pooled region is restricted to the
    host-side native numeric factorization (GIL-releasing ctypes calls —
    real parallelism); device plan construction and jitted device solves
    are serialized, since JAX tracing/dispatch is not thread-safe
    (ADVICE r3 #5). Host solves (hybrid_execute=True, the default) do
    pool.
    """

    def __init__(self, mats: list[CSR], config: Config | None = None,
                 threads: int = 1):
        self.solvers = [Solver(m, config) for m in mats]
        self.threads = max(1, int(threads))

    def factorize(self):
        if self.threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.threads) as pool:
                list(pool.map(lambda s: s._factorize_host(), self.solvers))
            for s in self.solvers:       # device/plan build: serial
                s._build_solve()
        else:
            for s in self.solvers:
                s.factorize()
        return self

    def solve(self, bs: list) -> list:
        host_only = all(s.config.hybrid_execute for s in self.solvers)
        if self.threads > 1 and host_only:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.threads) as pool:
                return list(pool.map(lambda sb: sb[0].solve(sb[1]),
                                     zip(self.solvers, bs)))
        return [s.solve(b) for s, b in zip(self.solvers, bs)]


def from_matrix_market(path: str, config: Config | None = None):
    """≙ the cuDSS matrix-market sample — native parser. Complex-field
    files return a :class:`ComplexSolver` (≙ cuDSS/simple_complex)."""
    from tpumathlib import native
    from tpumathlib.sparse import hostcsr

    rows, cols, r, c, v = native.mm_read(path)
    if np.iscomplexobj(v) and np.abs(v.imag).max(initial=0.0) > 0:
        ipr, iir, dr = hostcsr.coo_to_csr(rows, cols, r, c, v.real.copy())
        ipi, iii, di = hostcsr.coo_to_csr(rows, cols, r, c, v.imag.copy())
        return ComplexSolver(
            CSR(jnp.asarray(ipr), jnp.asarray(iir), jnp.asarray(dr),
                (rows, cols)),
            CSR(jnp.asarray(ipi), jnp.asarray(iii), jnp.asarray(di),
                (rows, cols)), config)
    ip, ii, dx = hostcsr.coo_to_csr(rows, cols, r, c, np.real(v).copy())
    csr = CSR(jnp.asarray(ip), jnp.asarray(ii), jnp.asarray(dx),
              (rows, cols))
    return Solver(csr, config)


class ComplexSolver:
    """Complex sparse direct solve (≙ cuDSS/simple_complex/simple_complex.cpp).

    Complex dtypes are unsupported on this TPU backend, so A = Ar + i·Ai is
    stored planar and factored through the exact real block embedding
    K = [[Ar, -Ai], [Ai, Ar]]: K·[xr; xi] = [br; bi] ⇔ A·x = b. For
    Hermitian positive definite A the embedding K is symmetric positive
    definite, so the SPD Cholesky path carries over unchanged.
    """

    def __init__(self, a_re: CSR, a_im: CSR, config: Config | None = None):
        from tpumathlib.sparse import hostcsr

        n, m = a_re.shape
        check(a_im.shape == a_re.shape, "planar parts must share a shape")
        rr, cr = hostcsr.row_ids(np.asarray(a_re.indptr, np.int64)), \
            np.asarray(a_re.indices, np.int64)
        vr = np.asarray(a_re.data, np.float64)
        ri, ci = hostcsr.row_ids(np.asarray(a_im.indptr, np.int64)), \
            np.asarray(a_im.indices, np.int64)
        vi = np.asarray(a_im.data, np.float64)
        # block-row order: [[Ar, -Ai], [Ai, Ar]]
        rows2 = np.concatenate([rr, ri, rr + n, ri + n])
        cols2 = np.concatenate([cr, ci + m, cr + m, ci])
        vals2 = np.concatenate([vr, -vi, vr, vi])
        ip, ii, dx = hostcsr.coo_to_csr(2 * n, 2 * m, rows2, cols2, vals2)
        kcsr = CSR(jnp.asarray(ip), jnp.asarray(ii), jnp.asarray(dx),
                   (2 * n, 2 * m))
        self.shape = a_re.shape
        self.solver = Solver(kcsr, config)

    def factorize(self):
        self.solver.factorize()
        return self

    def solve(self, b) -> np.ndarray:
        """b complex (n,) or planar (b_re, b_im); returns complex host x."""
        n = self.shape[0]
        if isinstance(b, tuple):
            br, bi = (np.asarray(b[0], np.float64),
                      np.asarray(b[1], np.float64))
        else:
            b = np.asarray(b)
            br, bi = np.real(b).astype(np.float64), \
                np.imag(b).astype(np.float64)
        x = self.solver.solve(np.concatenate([br, bi]))
        return x[:n] + 1j * x[n:]


def _mgmn_analyze(a_parts: list[CSR]):
    """Pattern analysis for the MGMN decomposition: interface columns Γ are
    those referenced by a rank other than their owner (on the symmetrized
    pattern) — then every rank's interior elimination is provably local."""
    from tpumathlib.sparse import hostcsr

    nranks = len(a_parts)
    n = a_parts[0].shape[1]
    trips = []
    row_ranges = []
    off = 0
    touched = np.zeros((nranks, n), bool)
    for r, part in enumerate(a_parts):
        ip = np.asarray(part.indptr, np.int64)
        ii = np.asarray(part.indices, np.int64)
        dx = np.asarray(part.data, np.float64)
        trips.append((ip, ii, dx))
        row_ranges.append((off, off + part.shape[0]))
        touched[r, ii] = True
        touched[r, off:off + part.shape[0]] = True  # structural symmetry
        off += part.shape[0]
    check(off == n, "row partition must cover the square system")
    interface = touched.sum(0) >= 2
    gamma = np.nonzero(interface)[0]
    gpos = -np.ones(n, np.int64)
    gpos[gamma] = np.arange(len(gamma))
    return trips, row_ranges, interface, gamma, gpos, n


def _mgmn_rank_schur(r, trips, row_ranges, interface, gamma, gpos, b_full,
                     config):
    """Rank r's local elimination, fully SPARSE: factor its interior block
    with the native sparse LU (via a nested Solver: MD ordering + splu) and
    form its (ngam, ngam) Schur/RHS contribution. Interiors are never
    densified — only the n_int × (local boundary) solve block Y is dense.
    Returns (s_r, g_r, state-for-back-substitution)."""
    from tpumathlib.sparse import hostcsr

    ip, ii, dx = trips[r]
    lo, hi = row_ranges[r]
    ngam = len(gamma)
    rows_g = hostcsr.row_ids(ip) + lo                 # global row per entry
    row_int = ~interface[rows_g]
    col_gam = interface[ii]
    int_rows = np.arange(lo, hi)[~interface[lo:hi]]
    gam_rows = np.arange(lo, hi)[interface[lo:hi]]
    n_int = len(int_rows)
    nglob = row_ranges[-1][1]
    ipos = -np.ones(nglob, np.int64)
    ipos[int_rows] = np.arange(n_int)
    # local boundary: Γ columns rank r actually references
    loc = np.unique(np.concatenate([ii[col_gam], gam_rows]))
    lpos = -np.ones(nglob, np.int64)
    lpos[loc] = np.arange(len(loc))
    nloc = len(loc)

    s_r = np.zeros((ngam, ngam), np.float64)
    g_r = np.zeros(ngam, np.float64)
    b_i = b_full[int_rows]
    b_g = b_full[gam_rows]

    if n_int:
        # A_II sparse (interior rows × interior cols of rank r)
        sel = row_int & ~col_gam
        aip, aii_, adx = hostcsr.coo_to_csr(
            n_int, n_int, ipos[rows_g[sel]], ipos[ii[sel]], dx[sel])
        sub = Solver(CSR(jnp.asarray(aip), jnp.asarray(aii_),
                         jnp.asarray(adx), (n_int, n_int)),
                     Config(matrix_type=(config.matrix_type if config
                                         else MatrixType.GENERAL)))
        sub.factorize()
        # A_IΓ restricted to the local boundary, dense n_int × nloc
        sel_ig = row_int & col_gam
        a_ig = np.zeros((n_int, nloc))
        a_ig[ipos[rows_g[sel_ig]], lpos[ii[sel_ig]]] = dx[sel_ig]
        y = sub.solve(a_ig) if nloc else np.zeros((n_int, 0))
        g_i = sub.solve(b_i)
    else:
        sub, y, g_i = None, np.zeros((0, nloc)), np.zeros(0)

    # Γ-row blocks: A_ΓΓ entries scatter straight into S; the correction
    # A_ΓI @ [Y | g_i] runs as sparse·dense (CSR matvec per column)
    sel_gg = ~row_int & col_gam
    np.add.at(s_r, (gpos[rows_g[sel_gg]], gpos[ii[sel_gg]]), dx[sel_gg])
    np.add.at(g_r, gpos[gam_rows], b_g)
    if n_int and len(gam_rows):
        sel_gi = ~row_int & ~col_gam
        gip, gii, gdx = hostcsr.coo_to_csr(
            len(gam_rows), n_int,
            np.searchsorted(gam_rows, rows_g[sel_gi]),
            ipos[ii[sel_gi]], dx[sel_gi])
        corr = np.stack([hostcsr.spmv(gip, gii, gdx, y[:, j])
                         for j in range(nloc)], axis=1) \
            if nloc else np.zeros((len(gam_rows), 0))
        s_r[np.ix_(gpos[gam_rows], gpos[loc])] -= corr
        g_r[gpos[gam_rows]] -= hostcsr.spmv(gip, gii, gdx, g_i)
    return s_r, g_r, (int_rows, loc, sub, y, g_i)


def _split_f64(x):
    """Exact two-float split: x (f64) = hi + lo with f32 planes."""
    hi = np.asarray(x, np.float32)
    lo = (np.asarray(x, np.float64) - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def mgmn_solve(a_parts: list[CSR], b_parts: list[np.ndarray],
               config: Config | None = None, grid=None,
               comm: str = "all_gather") -> list[np.ndarray]:
    """MGMN distributed mode (≙ cuDSS/simple_mgmn_distributed_matrix.cpp:
    47-50,562-574): each rank contributes a row partition of A and b.

    Schur-complement domain decomposition over a jax device mesh:

    - per-rank sparse interior factorization (native MD ordering + sparse
      LU — no densification anywhere) runs INSIDE ``shard_map`` via
      ``pure_callback``, one callback per mesh device;
    - the interface system S·x_Γ = g is assembled over the mesh and solved
      at direct-solver (f64) accuracy: contributions travel as exact
      (hi, lo) f32 plane pairs (complex-planar convention, applied to
      precision) and the replicated solve reconstitutes f64;
    - every rank back-substitutes its interior locally in f64.

    Pass ``grid`` (tpumathlib.mp.Grid with one device per rank) for the
    mesh execution; without it the same sparse algorithm runs as a host
    loop (single-process fallback). ``comm`` selects the collective
    schedule for the interface reduce — the pluggable communication-layer
    knob (≙ cuDSS/test_communication_layer choosing the comm backend):

    - "all_gather" (default): plane pairs are gathered (exact data
      movement — no f32 rounding in the collective) and summed/solved in
      f64 → factorization-grade (~1e-15) interface accuracy;
    - "psum": hi/lo planes are all-reduced in f32 and solved on device —
      the low-latency path; the f32 reduce bounds interface accuracy at
      ~1e-7 relative (documented contract).

    Callback purity: the per-rank factorization state is a deterministic,
    idempotent memo keyed by rank — each callback recomputes it if absent,
    so no cross-callback ordering is assumed (JAX may re-execute either).
    """
    import jax

    nranks = len(a_parts)
    trips, row_ranges, interface, gamma, gpos, n = _mgmn_analyze(a_parts)
    ngam = len(gamma)
    b_full = np.concatenate([np.asarray(b, np.float64) for b in b_parts])
    x = np.zeros(n)

    if grid is not None and len(grid.mesh.devices.ravel()) == nranks \
            and ngam:
        from jax.sharding import PartitionSpec as P

        ax = grid.axes[0]
        # idempotent memo: _mgmn_rank_schur is a pure function of (r,
        # trips, b_full, …) — any callback may (re)compute any rank's
        # entry in any order and get identical values
        memo: dict[int, Any] = {}

        def rank_state(r):
            if r not in memo:
                memo[r] = _mgmn_rank_schur(r, trips, row_ranges, interface,
                                           gamma, gpos, b_full, config)
            return memo[r]

        def schur_cb(r_arr):
            r = int(np.asarray(r_arr).ravel()[0])
            s_r, g_r, _ = rank_state(r)
            s_hi, s_lo = _split_f64(s_r)
            g_hi, g_lo = _split_f64(g_r)
            return s_hi, s_lo, g_hi, g_lo

        maxrows = max(hi - lo for lo, hi in row_ranges)

        def solve_cb(s_hi, s_lo, g_hi, g_lo):
            # gathered (nranks, …) planes → exact f64 sum → f64 solve
            s = (np.asarray(s_hi, np.float64)
                 + np.asarray(s_lo, np.float64)).sum(axis=0)
            g = (np.asarray(g_hi, np.float64)
                 + np.asarray(g_lo, np.float64)).sum(axis=0)
            return _split_f64(np.linalg.solve(s, g))

        def back_cb(r_arr, xg_hi, xg_lo):
            r = int(np.asarray(r_arr).ravel()[0])
            lo, hi = row_ranges[r]
            _, _, (int_rows, loc, _sub, y, g_i) = rank_state(r)
            xl = np.zeros(maxrows)
            xfull = np.zeros(n)
            xfull[gamma] = (np.asarray(xg_hi, np.float64)
                            + np.asarray(xg_lo, np.float64))
            xl[:hi - lo][interface[lo:hi]] = xfull[lo:hi][interface[lo:hi]]
            if len(int_rows):
                xi = g_i - (y @ xfull[loc] if len(loc) else 0.0)
                xl[:hi - lo][~interface[lo:hi]] = xi
            return _split_f64(xl)

        sdt = jax.ShapeDtypeStruct

        def shard_fn(dummy):
            r = jax.lax.axis_index(ax)
            s_hi, s_lo, g_hi, g_lo = jax.pure_callback(
                schur_cb,
                (sdt((ngam, ngam), jnp.float32), sdt((ngam, ngam), jnp.float32),
                 sdt((ngam,), jnp.float32), sdt((ngam,), jnp.float32)), r)
            if comm == "psum":               # f32 fast path (~1e-7 rel)
                s = jax.lax.psum(s_hi, ax) + jax.lax.psum(s_lo, ax)
                g = jax.lax.psum(g_hi, ax) + jax.lax.psum(g_lo, ax)
                xg = jnp.linalg.solve(s, g)  # device interface solve
                xg_hi, xg_lo = xg, jnp.zeros_like(xg)
            else:                            # exact gather + f64 host solve
                xg_hi, xg_lo = jax.pure_callback(
                    solve_cb, (sdt((ngam,), jnp.float32),
                               sdt((ngam,), jnp.float32)),
                    jax.lax.all_gather(s_hi, ax),
                    jax.lax.all_gather(s_lo, ax),
                    jax.lax.all_gather(g_hi, ax),
                    jax.lax.all_gather(g_lo, ax))
            xl_hi, xl_lo = jax.pure_callback(
                back_cb, (sdt((maxrows,), jnp.float32),
                          sdt((maxrows,), jnp.float32)),
                r, xg_hi, xg_lo)
            return xl_hi[None], xl_lo[None]

        dummy = jnp.zeros((nranks, 1), jnp.float32)
        xs_hi, xs_lo = jax.shard_map(
            shard_fn, mesh=grid.mesh,
            in_specs=P(ax, None), out_specs=(P(ax, None), P(ax, None)))(dummy)
        xs = np.asarray(xs_hi, np.float64) + np.asarray(xs_lo, np.float64)
        return [xs[r, : hi - lo] for r, (lo, hi) in enumerate(row_ranges)]

    # host-loop fallback (same sparse math, no mesh)
    s_mat = np.zeros((ngam, ngam))
    g_rhs = np.zeros(ngam)
    locals_ = []
    for r in range(nranks):
        s_r, g_r, state = _mgmn_rank_schur(
            r, trips, row_ranges, interface, gamma, gpos, b_full, config)
        s_mat += s_r
        g_rhs += g_r
        locals_.append(state)
    if ngam:
        x[gamma] = np.linalg.solve(s_mat, g_rhs)
    for int_rows, loc, sub, y, g_i in locals_:
        if len(int_rows):
            x[int_rows] = g_i - (y @ x[loc] if len(loc) else 0.0)
    out = []
    for lo, hi in row_ranges:
        out.append(x[lo:hi])
    return out

def save_factors(solver: Solver, path: str) -> None:
    """Serialize analysis + factorization state (≙ the checkpoint/resume
    surface SURVEY.md §5 maps to plan-cache serialization): an .npz with
    perm, factors, prow, and config — reload with load_factors and solve
    without re-analyzing."""
    d = solver.data
    blobs = {"perm": d.perm, "prow": d.prow,
             "l_indptr": d.l_fac[0], "l_indices": d.l_fac[1], "l_data": d.l_fac[2],
             "matrix_type": np.array(solver.config.matrix_type.value),
             "hybrid": np.array(int(solver.config.hybrid_execute)),
             "a_indptr": np.asarray(solver.a.indptr),
             "a_indices": np.asarray(solver.a.indices),
             "a_data": np.asarray(solver.a.data),
             "shape": np.asarray(solver.a.shape)}
    if d.u_fac is not None:
        blobs.update({"u_indptr": d.u_fac[0], "u_indices": d.u_fac[1],
                      "u_data": d.u_fac[2]})
    np.savez_compressed(path, **blobs)


def load_factors(path: str) -> Solver:
    """Rebuild a ready-to-solve Solver from save_factors output."""
    import jax.numpy as jnp_

    z = np.load(path)
    csr = CSR(jnp_.asarray(z["a_indptr"]), jnp_.asarray(z["a_indices"]),
              jnp_.asarray(z["a_data"]), tuple(int(v) for v in z["shape"]))
    cfg = Config(matrix_type=MatrixType(str(z["matrix_type"])),
                 hybrid_execute=bool(int(z["hybrid"])))
    s = Solver(csr, cfg)
    s.data.perm = z["perm"]
    s.data.prow = z["prow"]
    s.data.l_fac = (z["l_indptr"], z["l_indices"], z["l_data"])
    s.data.u_fac = ((z["u_indptr"], z["u_indices"], z["u_data"])
                    if "u_indptr" in z.files else None)
    s._build_solve()
    return s

"""Device tridiagonal eigensolver: parallel-prefix Sturm bisection +
batched inverse iteration — the cusolverDn Xstebz/Xstein-class engine
behind xstedc.

≙ LAPACK dstebz/dstein as driven by cusolverDnXsyevd's tridiagonal stage
(cuSOLVER/Xsyevd/cusolver_Xsyevd_example.cu:1) and the cuSOLVERMp
sytrd→stedc→ormtr pipeline (cuSOLVERMp/mp_sytrd_stedc_ormtr.c:1).

TPU formulation (everything fixed-shape, no host control flow):

- **Sturm counts by parallel prefix**: the pivot recurrence
  q_k = (d_k − x) − e_{k-1}²/q_{k-1} is a Möbius transform, so the k-th
  pivot is a normalized product of 2×2 matrices
  M_k = [[d_k − x, −e_{k-1}²], [1, 0]] — ``lax.associative_scan`` gives
  ALL pivots' signs in log₂(n) levels instead of an n-step sequential
  scan (measured: the sequential scan costs ~n·µs-class per bisection
  round; the prefix form is ~levels·array-op-class). Scale invariance of
  Möbius transforms makes per-combine normalization exact.
- **Bisection**: one shift per eigenvalue index, all n indices narrowed
  simultaneously from Gershgorin brackets; ~f32-mantissa rounds.
- **Eigenvectors by twisted factorization** (the MRRR/Fernando core):
  top-down and bottom-up pivot sequences from stable sequential scans
  (the prefix form is sign-safe only), twist at the minimal-γ row, the
  vector read off as log-space ratio products — no unpivoted inverse
  iteration (which measurably loses digits on indefinite shifts).
- **LAPACK-style splitting + cluster site assignment**: negligible
  couplings are zeroed (pivot recurrences restart per irreducible
  block); twists sit at LOCAL MINIMA of |γ| (eigenvector localization
  sites), and the t-th copy of a (near-)degenerate cluster takes the
  t-th best site — covering repeated eigenvalues across decoupled
  blocks AND near-degenerate pairs inside one block — with windowed
  neighbor re-orthogonalization behind it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _mobius_prefix(d, e2, shifts):
    """Normalized prefix products of the Sturm/Thomas 2×2 transforms.

    Returns the pivots p[k, s] = q_k at shift s as a safeguarded ratio
    (A/C of the prefix matrix applied to q_0 = ∞)."""
    n = d.shape[0]
    a = d[:, None] - shifts[None, :]
    b = jnp.broadcast_to(-e2[:, None], a.shape)
    ones = jnp.ones_like(a)
    zeros = jnp.zeros_like(a)
    mats = jnp.stack([a, b, ones, zeros], axis=-1)

    def comb(x, y):
        xa, xb, xc, xd = (x[..., i] for i in range(4))
        ya, yb, yc, yd = (y[..., i] for i in range(4))
        pa = ya * xa + yb * xc
        pb = ya * xb + yb * xd
        pc = yc * xa + yd * xc
        pd = yc * xb + yd * xd
        s = jnp.maximum(jnp.maximum(jnp.abs(pa), jnp.abs(pb)),
                        jnp.maximum(jnp.abs(pc), jnp.abs(pd))) + 1e-37
        inv = 1.0 / s
        return jnp.stack([pa * inv, pb * inv, pc * inv, pd * inv], axis=-1)

    pref = jax.lax.associative_scan(comb, mats, axis=0)
    num = pref[..., 0]
    den = pref[..., 2]
    return num, den


def sturm_counts(d, e, shifts, method: str = "prefix"):
    """#eigenvalues of tridiag(e, d, e) strictly below each shift
    (≙ the dstebz count kernel). method="prefix" uses the log-depth
    Möbius products; "scan" the n-step sequential recurrence (less HBM
    traffic per round — the prefix materializes O(log n) (n, nshift)
    intermediates)."""
    if method == "scan":
        p = _pivot_scan(d, e, shifts)
        return jnp.sum((p < 0).astype(jnp.int32), axis=0)
    e2 = jnp.concatenate([jnp.zeros(1, d.dtype), e * e])
    num, den = _mobius_prefix(d, e2, shifts)
    neg = (num * den) < 0
    return jnp.sum(neg.astype(jnp.int32), axis=0)


@functools.partial(jax.jit, static_argnames=("rounds", "method"))
def stebz_device(d, e, rounds: int | None = None,
                 method: str = "prefix"):
    """ALL eigenvalues of tridiag(e, d, e), ascending — bisection with
    one Sturm-prefix evaluation per round narrowing every index at once
    (≙ cusolverDn's dstebz stage). ``rounds`` halvings of the Gershgorin
    interval default to the mantissa width of the dtype (~eps·‖T‖
    absolute accuracy)."""
    if rounds is None:
        rounds = 34 if d.dtype == jnp.float32 else 64
    n = d.shape[0]
    # split negligible couplings (LAPACK dstebz: per irreducible block)
    eps = jnp.asarray(np.finfo(d.dtype).eps, d.dtype)
    e = jnp.where(jnp.abs(e) <= eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:])),
                  0.0, e)
    ea = jnp.concatenate([jnp.zeros(1, d.dtype), jnp.abs(e)])
    eb = jnp.concatenate([jnp.abs(e), jnp.zeros(1, d.dtype)])
    lo0 = jnp.min(d - ea - eb)
    hi0 = jnp.max(d + ea + eb)
    idx = jnp.arange(n)
    lo = jnp.full((n,), lo0, d.dtype)
    hi = jnp.full((n,), hi0, d.dtype)

    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        cnt = sturm_counts(d, e, mid, method)
        below = cnt <= idx           # eigenvalue idx is >= mid
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return 0.5 * (lo + hi)


def _pivot_scan(d, e, lam):
    """Sequential LDLᵀ pivots p_k = (d_k − λ) − e_{k-1}²/p_{k-1} for all
    shifts at once (lanes). The parallel-prefix form is only sign-safe:
    its normalized products cancel catastrophically in f32 near pivot
    sign changes (measured rel err O(1) — NOTES_r4), so the VECTOR stage
    uses the stable sequential recurrence."""
    nev = lam.shape[0]
    e2 = jnp.concatenate([jnp.zeros(1, d.dtype), e * e])
    tiny = jnp.asarray(1e-30, d.dtype)

    def body(p, k):
        ps = jnp.where(jnp.abs(p) > tiny, p,
                       jnp.where(p >= 0, tiny, -tiny))
        pn = (d[k] - lam) - e2[k] / ps
        return pn, pn

    p0 = jnp.full((nev,), 1.0, d.dtype)
    _, ps = jax.lax.scan(body, p0, jnp.arange(d.shape[0]))
    return ps                                   # (n, nev)


def _linear_recurrence(alpha, beta, reverse: bool = False):
    """y_k = alpha_k · y_{k-1} + beta_k (y_0 = beta_0·…) via associative
    scan; composition (a2,b2)∘(a1,b1) = (a1·a2, a2·b1 + b2)."""
    def comb(x, y):
        return (x[0] * y[0], y[0] * x[1] + y[1])

    a, b = jax.lax.associative_scan(comb, (alpha, beta), axis=0,
                                    reverse=reverse)
    return b


@jax.jit
def stein_device(d, e, w, key=None):
    """Eigenvectors of tridiag(e, d, e) at eigenvalues ``w`` via TWISTED
    FACTORIZATIONS (the MRRR/Fernando construction LAPACK dstemr builds
    on — stabler than dstein's unpivoted inverse iteration, which loses
    digits on indefinite shifts): for each λ, combine the top-down LDLᵀ
    pivots p⁺ and bottom-up UDUᵀ pivots q, twist at
    r = argmin|p⁺ + q − (d − λ)|, and read the eigenvector off as pure
    ratio products

        x_r = 1,  x_k = −(e_k/p⁺_k)·x_{k+1} (k < r),
                  x_k = −(e_{k-1}/q_k)·x_{k-1} (k > r)

    — evaluated in LOG space (cumsum of log-magnitudes + sign parities:
    overflow-free, fully batched over eigenvectors; both pivot sequences
    come from the parallel-prefix Möbius products). Clustered eigenvalues
    get index-separated shifts plus windowed neighbor
    re-orthogonalization. Returns (n, nev)."""
    n = d.shape[0]
    nev = w.shape[0]
    eps = jnp.asarray(np.finfo(d.dtype).eps, d.dtype)
    scale = jnp.maximum(jnp.max(jnp.abs(d)) + 2 * jnp.max(
        jnp.abs(e) if e.shape[0] else jnp.zeros(1, d.dtype)), 1.0)
    # separate clustered shifts (the stein perturbation): λ_j += pos·sep
    # within runs of near-equal eigenvalues. The CLUSTER criterion for
    # site assignment/re-orthogonalization is much wider (tolc) than the
    # shift perturbation: near-degenerate pairs whose twisted vectors
    # would come out nearly parallel must get distinct localization
    # sites even when their eigenvalues are individually resolved.
    sep = 10.0 * eps * scale
    tolc = 1e3 * sep
    close_prev = jnp.concatenate(
        [jnp.zeros(1, jnp.bool_), (w[1:] - w[:-1]) < sep])
    runpos_sep = jax.lax.associative_scan(
        lambda x, y: (x[0] * y[0], y[0] * x[1] + y[1]),
        (close_prev.astype(d.dtype),
         close_prev.astype(d.dtype)))[1]
    lam = w + runpos_sep * sep

    # LAPACK-style SPLITTING: negligible couplings decouple the matrix
    # into irreducible blocks (unreduced tridiagonals have SIMPLE
    # spectra — duplicate eigenvalues always live in different blocks)
    ztol = eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:]))
    e = jnp.where(jnp.abs(e) <= ztol, 0.0, e)
    bid = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum((e == 0).astype(jnp.int32))])

    e_lo = jnp.concatenate([jnp.zeros(1, d.dtype), e])      # e_{k-1}
    e_hi = jnp.concatenate([e, jnp.zeros(1, d.dtype)])      # e_k
    tiny = 1e-30

    def safed(x):
        return jnp.where(jnp.abs(x) > tiny, x,
                         jnp.where(x >= 0, tiny, -tiny))

    # p⁺ (top-down) and q (bottom-up) pivots via the stable sequential
    # scans (prefix products are sign-safe only — see _pivot_scan);
    # zeroed couplings make the recurrences restart per block naturally
    p = _pivot_scan(d, e, lam)
    q = _pivot_scan(d[::-1], e[::-1], lam)[::-1]

    # twist index per eigenvector: the twist sits at a LOCAL MINIMUM of
    # |γ| (an eigenvector localization site). Repeated/near-degenerate
    # eigenvalues have several sites — across decoupled blocks AND
    # within one block — so the t-th COPY of a cluster (runpos) takes
    # the t-th best site: each copy lands in a different part of the
    # (near-)degenerate subspace and the neighbor re-orthogonalization
    # then works INSIDE that subspace.
    gamma = jnp.abs(p + q - (d[:, None] - lam[None, :]))
    inf = jnp.asarray(jnp.inf, d.dtype)
    g_lo = jnp.concatenate([jnp.full((1, nev), inf), gamma[:-1]], axis=0)
    g_hi = jnp.concatenate([gamma[1:], jnp.full((1, nev), inf)], axis=0)
    is_min = (gamma <= g_lo) & (gamma <= g_hi)
    cand = jnp.where(is_min, gamma, inf)
    order = jnp.argsort(cand, axis=0)                       # sites ranked
    nsites = jnp.sum(is_min.astype(jnp.int32), axis=0)

    # ratio chains in log space (shared by every site choice)
    t_up = -e_hi[:, None] / safed(p)        # k < r uses t_up[k]
    s_dn = -e_lo[:, None] / safed(q)        # k > r uses s_dn[k]
    logt = jnp.log(jnp.maximum(jnp.abs(t_up), tiny))
    logs = jnp.log(jnp.maximum(jnp.abs(s_dn), tiny))
    negt = (t_up < 0).astype(jnp.int32)
    negs = (s_dn < 0).astype(jnp.int32)
    # prefix sums with a leading zero: LT[k] = Σ_{i<k} logt[i]
    zrow = jnp.zeros((1, nev), d.dtype)
    zrow_i = jnp.zeros((1, nev), jnp.int32)
    lt = jnp.concatenate([zrow, jnp.cumsum(logt, axis=0)], axis=0)
    ls = jnp.concatenate([zrow, jnp.cumsum(logs, axis=0)], axis=0)
    st = jnp.concatenate([zrow_i, jnp.cumsum(negt, axis=0)], axis=0)
    ss = jnp.concatenate([zrow_i, jnp.cumsum(negs, axis=0)], axis=0)
    jj = jnp.arange(nev)
    k = jnp.arange(n)[:, None]

    def build(ct):
        r = jnp.take_along_axis(order, ct[None, :], axis=0)[0]
        lt_r = lt[r, jj][None, :]
        ls_r = ls[r + 1, jj][None, :]
        st_r = st[r, jj][None, :]
        ss_r = ss[r + 1, jj][None, :]
        rb = r[None, :]
        return r, lt_r, ls_r, st_r, ss_r, rb

    def vectors(ct):
        r, lt_r, ls_r, st_r, ss_r, rb = build(ct)
        # |x_k| in log space, clamped into the f32 exp range
        # (normalization absorbs the clamp; magnitudes decay away from
        # the twist)
        up_mag = jnp.clip(lt_r - lt[:n], -60.0, 40.0)
        dn_mag = jnp.clip(ls[1:n + 1] - ls_r, -60.0, 40.0)
        up_sgn = 1.0 - 2.0 * jnp.abs((st_r - st[:n]) % 2).astype(d.dtype)
        dn_sgn = 1.0 - 2.0 * jnp.abs(
            (ss[1:n + 1] - ss_r) % 2).astype(d.dtype)
        x = jnp.where(k < rb, up_sgn * jnp.exp(up_mag),
                      jnp.where(k == rb, 1.0, dn_sgn * jnp.exp(dn_mag)))
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=0, keepdims=True), 1e-30)

    def col_res(x):
        tx = d[:, None] * x
        ez = e[:, None]
        tx = tx + jnp.concatenate(
            [ez * x[1:], jnp.zeros((1, nev), d.dtype)], axis=0)
        tx = tx + jnp.concatenate(
            [jnp.zeros((1, nev), d.dtype), ez * x[:-1]], axis=0)
        return jnp.max(jnp.abs(tx - w[None, :] * x), axis=0)

    # VALIDATED MULTI-CANDIDATE SITE SELECTION: build the vector at the
    # best few localization sites, reject candidates whose RESIDUAL says
    # they belong to a different eigenvalue (a wrong site reproduces
    # some other eigenvector: residual ≈ |λ_other − λ| — cheap to test
    # with the tridiagonal matvec), and among acceptable candidates take
    # the one least parallel to the preceding columns. This one rule
    # covers simple eigenvalues (candidate 0 wins), duplicates across
    # decoupled blocks, AND near-degenerate doublets inside a block
    # (both sites pass validation; the overlap tie-break distributes the
    # copies). Columns where every alternative fails keep the best
    # residual — for clusters tighter than f32 resolves, the windowed
    # re-orthogonalization below then spans the cluster subspace (the
    # LAPACK dstein contract).
    ncand = min(4, n)
    xs = [vectors(jnp.minimum(jnp.full((nev,), c, jnp.int32),
                              jnp.maximum(nsites - 1, 0)))
          for c in range(ncand)]
    res_c = jnp.stack([col_res(xc) for xc in xs])           # (C, nev)
    res_best = jnp.min(res_c, axis=0)
    ok = res_c <= jnp.maximum(10.0 * res_best, 100.0 * eps * scale)
    refs = [jnp.concatenate([jnp.zeros((n, o), d.dtype),
                             xs[0][:, :-o]], axis=1) for o in (1, 2, 3)]
    ov_c = jnp.stack([sum(jnp.abs(jnp.sum(xc * rf, axis=0))
                          for rf in refs) for xc in xs])
    # tie-break: in an exact degenerate tie (all overlaps equal), the
    # t-th cluster copy prefers the t-th candidate — without this, every
    # copy of a multiplicity-k eigenvalue would jump to the SAME first
    # alternate site. Resolved eigenvalues are never in ties (their own
    # candidate-0 has near-zero overlap and wins outright).
    close_wide = jnp.concatenate(
        [jnp.zeros(1, jnp.bool_), (w[1:] - w[:-1]) < tolc])
    runpos_w = jax.lax.associative_scan(
        lambda a, b: (a[0] * b[0], b[0] * a[1] + b[1]),
        (close_wide.astype(d.dtype), close_wide.astype(d.dtype)))[1]
    pref = jnp.abs(jnp.arange(ncand, dtype=d.dtype)[:, None]
                   - runpos_w[None, :])
    score = ov_c + 1e6 * (~ok).astype(d.dtype) + 1e-3 * pref
    pick = jnp.argmin(score, axis=0)                        # (nev,)
    xstack = jnp.stack(xs)                                  # (C, n, nev)
    x = jnp.take_along_axis(xstack, pick[None, None, :], axis=0)[0]

    # windowed re-orthogonalization against sorted neighbors (clusters
    # are contiguous): a few sweeps of offset projections
    for _ in range(2):
        for off in (1, 2, 3):
            prev = jnp.concatenate(
                [jnp.zeros((n, off), d.dtype), x[:, :-off]], axis=1)
            same = jnp.concatenate(
                [jnp.zeros(off, jnp.bool_),
                 (w[off:] - w[:-off]) < tolc])
            proj = jnp.sum(prev * x, axis=0)
            x = x - jnp.where(same, proj, 0.0)[None, :] * prev
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=0, keepdims=True),
                            1e-30)
    return x

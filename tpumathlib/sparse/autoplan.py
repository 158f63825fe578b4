"""Plan-time CSR pattern analysis + automatic repack to the fast SpMV
engine (≙ cusparseSpMV_preprocess — the analysis step of the descriptor
lifecycle, cuSPARSE/spmv_csr/spmv_csr_example.c:88-112).

An unstructured CSR on TPU pays the x-gather wall (~1.5 GB/s measured);
the BlockedELL row-form Pallas engine streams at ~160 GB/s. Many "CSR"
matrices carry latent block structure (FEM, multi-dof graphs, banded
systems); this module detects it at plan time and repacks:

  engine="blockedell": nnz covered by (bs x bs) tiles with acceptable
      padding -> repack into BlockedELL + the SpmvPlan bf16-split
      row-form kernel. Break-even vs the gather path sits near a 300x
      storage blow-up (160/1.5 speed ratio / 3x byte ratio), but the
      default cap is far tighter (max_blowup=32) so memory stays sane.
  engine="sell": row lengths regular enough that sliced-ELL padding is
      small -> SELL (vector-regular gather; helps the VPU, not the
      gather wall — chosen only when blocks don't pay).
  engine="csr": true-random fallback — the scatter-free cumsum path.

Analysis runs on host numpy at plan time (the reference's preprocess is
likewise an offline step against the device execute loop).
"""

from __future__ import annotations

import numpy as np

from tpumathlib.core.errors import check
from tpumathlib.sparse.containers import CSR, COO, BlockedELL, SELL


def _csr_host(a):
    import jax.numpy as jnp  # noqa: F401

    if isinstance(a, COO):
        import scipy.sparse as sp

        m = sp.coo_matrix((np.asarray(a.data), (np.asarray(a.row),
                                                np.asarray(a.col))),
                          shape=a.shape).tocsr()
        return m.indptr, m.indices, m.data, a.shape
    check(isinstance(a, CSR), f"spmv_auto_plan needs CSR/COO, got {type(a)}")
    return (np.asarray(a.indptr), np.asarray(a.indices), np.asarray(a.data),
            a.shape)


class SpmvAutoPlan:
    """Analyze-once / execute-many SpMV plan over an arbitrary CSR/COO.

    ``plan.engine`` reports the chosen path; ``plan.stats`` the analysis
    metrics (block fill, padding ratios). execute(x) returns alpha*A@x.
    """

    def __init__(self, a, bs: int = 128, max_blowup: float = 32.0,
                 max_bytes: int = 1 << 31, sell_slice: int = 8,
                 sell_max_pad: float = 1.5):
        indptr, indices, data, (m, n) = _csr_host(a)
        nnz = int(indptr[-1])
        self.shape = (m, n)
        self.stats = {}
        rowlen = np.diff(indptr)
        self._csr = a if isinstance(a, CSR) else None

        engine = "csr"
        if nnz:
            mb = -(-m // bs)
            nbc = -(-n // bs)
            rows = np.repeat(np.arange(m, dtype=np.int64), rowlen)
            key = (rows // bs) * nbc + (indices.astype(np.int64) // bs)
            uk, inv = np.unique(key, return_inverse=True)
            ukrb = (uk // nbc).astype(np.int64)
            per_rb = np.bincount(ukrb, minlength=mb)
            ellw = int(per_rb.max()) if len(uk) else 0
            stored = float(mb) * max(ellw, 1) * bs * bs
            blowup = stored / nnz
            self.stats.update(block_fill=nnz / max(float(len(uk)) * bs * bs,
                                                   1.0),
                              bell_blowup=blowup, bell_ellw=ellw,
                              nnz=nnz, bs=bs)
            # bf16 hi+lo planes = 4 bytes per stored slot
            if ellw and blowup <= max_blowup and stored * 4 <= max_bytes:
                engine = "blockedell"
            else:
                ns = -(-m // sell_slice)
                pad_rows = ns * sell_slice
                wmax = np.zeros(ns, np.int64)
                np.maximum.at(wmax, np.arange(m) // sell_slice, rowlen)
                sell_pad = float((wmax * sell_slice).sum()) / nnz
                self.stats["sell_pad"] = sell_pad
                self.stats["pad_rows"] = pad_rows
                if sell_pad <= sell_max_pad:
                    engine = "sell"
        self.engine = engine

        import jax.numpy as jnp

        if engine == "blockedell":
            first = np.zeros(mb + 1, np.int64)
            np.add.at(first, ukrb + 1, 1)
            first = np.cumsum(first)
            slot_uk = np.arange(len(uk), dtype=np.int64) - first[ukrb]
            cols_arr = np.full((mb, ellw), -1, np.int32)
            cols_arr[ukrb, slot_uk] = (uk % nbc).astype(np.int32)
            dense = np.zeros((mb, ellw, bs, bs), np.float32)
            dense[rows // bs, slot_uk[inv], rows % bs,
                  indices.astype(np.int64) % bs] = data
            from tpumathlib.sparse.pallas_kernels import SpmvPlan

            self._bell = SpmvPlan(BlockedELL(jnp.asarray(cols_arr),
                                             jnp.asarray(dense),
                                             (mb * bs, nbc * bs), bs))
            self._npad = nbc * bs
        elif engine == "sell":
            cols = np.zeros((ns, sell_slice, int(wmax.max() or 1)), np.int32)
            vals = np.zeros_like(cols, np.float32)
            for s in range(ns):
                for r in range(sell_slice):
                    row = s * sell_slice + r
                    if row >= m:
                        break
                    lo, hi = indptr[row], indptr[row + 1]
                    cols[s, r, :hi - lo] = indices[lo:hi]
                    vals[s, r, :hi - lo] = data[lo:hi]
            self._sell = SELL(jnp.asarray(cols), jnp.asarray(vals),
                              jnp.asarray(wmax.astype(np.int32)),
                              (m, n), sell_slice)
        else:
            if self._csr is None:
                self._csr = CSR(jnp.asarray(indptr.astype(np.int32)),
                                jnp.asarray(indices.astype(np.int32)),
                                jnp.asarray(data), (m, n))

    def execute(self, x, alpha=1.0):
        import jax.numpy as jnp

        from tpumathlib.sparse.ops import spmv

        m, n = self.shape
        if self.engine == "blockedell":
            xp = x
            if self._npad != n:
                xp = jnp.zeros(self._npad, x.dtype).at[:n].set(x)
            return self._bell.execute(xp, alpha)[:m]
        if self.engine == "sell":
            return spmv(self._sell, x, alpha=alpha)
        return spmv(self._csr, x, alpha=alpha)

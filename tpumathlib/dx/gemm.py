"""Tiled MXU matmul Pallas kernel with fused epilogues — the engine under
blas.level3 / blas.lt (≙ the kernels cuBLASLt dispatches to; API parity notes
in blas/lt.py; design blueprint cuBLASLt/LtSgemm/sample_cublasLt_LtSgemm.cu).

Shape convention is row-major math: ``D = epilogue(alpha * A @ B + beta * C +
bias)`` with A (..., M, K), B (..., K, N); transposes are normalized by the
Lt layer (XLA fuses them into the kernel's operand layout).

Grid: (batch, M/bm, N/bn, K/bk) with K innermost and marked "arbitrary"
(sequential) so a f32 VMEM accumulator carries partial sums — the
split-K/stages knobs of the Lt algo space collapse into (bm, bn, bk) tile
selection here, which the autotuner sweeps (blas/lt.py algo search).

Epilogues (grep CUBLASLT_EPILOGUE_* across cuBLASLt/): DEFAULT, RELU,
RELU_AUX, GELU, GELU_AUX, BIAS and the *_BIAS combinations. D-amax tracking
for narrow-precision outputs (LtFp8Matmul D_AMAX_POINTER) is computed as a
fused XLA reduction over D rather than in-kernel — on TPU the grid iterates
sequentially per core, but cross-tile max would serialize the parallel grid
dims, so the reduction is cheaper outside.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.core.dtypes import round_up, traits
from tpumathlib.dx.pallas_utils import interpret_mode

_EPILOGUES = (
    "default",
    "relu",
    "gelu",
    "bias",
    "relu_bias",
    "gelu_bias",
    "relu_aux",
    "gelu_aux",
    "relu_aux_bias",
    "gelu_aux_bias",
)


@dataclasses.dataclass(frozen=True)
class MatmulConfig:
    """One point in the Lt "algo" space: tile sizes for the MXU pipeline."""

    bm: int = 512
    bn: int = 512
    bk: int = 512

    def vmem_bytes(self, a_itemsize: int, b_itemsize: int, out_itemsize: int) -> int:
        # double-buffered in/out blocks + f32 accumulator scratch
        return 2 * (
            self.bm * self.bk * a_itemsize
            + self.bk * self.bn * b_itemsize
            + self.bm * self.bn * out_itemsize
        ) + self.bm * self.bn * 4


def default_configs(dtype) -> Sequence[MatmulConfig]:
    """Candidate sweep for the autotuner (≙ AlgoGetIds/CapGetAttribute sweep,
    cuBLASLt/Common/LtMatmulCustomFind.h:189-274)."""
    it = traits(dtype).itemsize
    cands = []
    for bm in (128, 256, 512):
        for bn in (128, 256, 512, 1024):
            for bk in (256, 512, 1024, 2048):
                cfg = MatmulConfig(bm, bn, bk)
                if cfg.vmem_bytes(it, it, it) <= 12 * 1024 * 1024:
                    cands.append(cfg)
    return cands


def _pick_config(m, n, k, a_dtype, b_dtype, out_dtype) -> MatmulConfig:
    """Heuristic default (≙ cublasLtMatmulAlgoGetHeuristic): biggest aligned
    tile that fits comfortably in VMEM."""
    ai, bi, oi = traits(a_dtype).itemsize, traits(b_dtype).itemsize, traits(out_dtype).itemsize
    min_m = traits(a_dtype).min_tile[0]
    for bm, bn, bk in ((512, 1024, 512), (512, 512, 512), (256, 512, 512),
                       (256, 256, 512), (128, 256, 512), (128, 128, 512),
                       (128, 128, 256), (128, 128, 128)):
        cfg = MatmulConfig(min(bm, round_up(m, min_m)), min(bn, round_up(n, 128)),
                           min(bk, round_up(k, 128)))
        if cfg.vmem_bytes(ai, bi, oi) <= 12 * 1024 * 1024:
            return cfg
    return MatmulConfig(128, 128, 128)


def apply_epilogue(acc, epilogue: str, bias=None):
    """(d, aux) in accumulate dtype. ``aux`` is the pre-activation input
    (CUBLASLT_EPILOGUE_{RELU,GELU}_AUX semantics — saved for backward)."""
    if "bias" in epilogue and bias is not None:
        acc = acc + bias
    aux = acc
    if epilogue.startswith("relu"):
        acc = jnp.maximum(acc, 0.0)
    elif epilogue.startswith("gelu"):
        # tanh-approx GELU, matching CUBLASLT_EPILOGUE_GELU
        acc = 0.5 * acc * (1.0 + jnp.tanh(0.7978845608028654 * (acc + 0.044715 * acc**3)))
    return acc, aux


def _pad2(x, m, n):
    pm, pn = m - x.shape[-2], n - x.shape[-1]
    if pm or pn:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, pm), (0, pn)]
        x = jnp.pad(x, pad)
    return x


@functools.partial(
    jax.jit,
    static_argnames=("config", "out_dtype", "epilogue", "alpha", "beta", "return_aux"),
)
def pallas_matmul(
    a,
    b,
    c=None,
    bias=None,
    *,
    config: MatmulConfig | None = None,
    out_dtype=None,
    epilogue: str = "default",
    alpha: float = 1.0,
    beta: float = 0.0,
    return_aux: bool = False,
):
    """D = epilogue(alpha·A@B + beta·C + bias). A: (..., M, K), B: (..., K, N);
    leading dims are batch (≙ gemmStridedBatched when contiguous).

    Returns D, or (D, aux) when ``return_aux`` (aux = pre-activation, f32).
    """
    assert epilogue in _EPILOGUES, epilogue
    if out_dtype is None:
        out_dtype = a.dtype
    m, k = a.shape[-2], a.shape[-1]
    k2, n = b.shape[-2], b.shape[-1]
    assert k == k2, (a.shape, b.shape)
    batch_shape = a.shape[:-2]
    assert b.shape[:-2] == batch_shape, (a.shape, b.shape)

    if config is None:
        config = _pick_config(m, n, k, a.dtype, b.dtype, out_dtype)
    min_sub = max(traits(a.dtype).min_tile[0], traits(jnp.dtype(out_dtype)).min_tile[0])
    bm = min(config.bm, round_up(m, min_sub))
    bn = min(config.bn, round_up(n, 128))
    bk = min(config.bk, round_up(k, max(128, traits(b.dtype).min_tile[0])))

    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    a3 = _pad2(a.reshape((-1, m, k)), mp, kp)
    b3 = _pad2(b.reshape((-1, k, n)), kp, np_)
    nb = a3.shape[0]
    nm, nn, nk = mp // bm, np_ // bn, kp // bk

    has_c = c is not None
    has_bias = bias is not None
    has_aux = return_aux
    operands = [a3, b3]
    if has_c:
        operands.append(_pad2(jnp.broadcast_to(c, batch_shape + (m, n)).reshape((-1, m, n)), mp, np_))
    if has_bias:
        # bias is per-output-column; store 8 broadcast rows to honor sublane tiling
        bias3 = jnp.broadcast_to(
            jnp.asarray(bias).astype(jnp.float32).reshape((-1,))[None, None, :],
            (nb, 8, n),
        )
        operands.append(_pad2(bias3, 8, np_))

    grid = (nb, nm, nn, nk)
    in_specs = [
        pl.BlockSpec((1, bm, bk), lambda h, i, j, kk: (h, i, kk)),
        pl.BlockSpec((1, bk, bn), lambda h, i, j, kk: (h, kk, j)),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((1, bm, bn), lambda h, i, j, kk: (h, i, j)))
    if has_bias:
        in_specs.append(pl.BlockSpec((1, 8, bn), lambda h, i, j, kk: (h, 0, j)))
    out_shapes = [jax.ShapeDtypeStruct((nb, mp, np_), out_dtype)]
    out_specs = [pl.BlockSpec((1, bm, bn), lambda h, i, j, kk: (h, i, j))]
    if has_aux:
        out_shapes.append(jax.ShapeDtypeStruct((nb, mp, np_), jnp.float32))
        out_specs.append(pl.BlockSpec((1, bm, bn), lambda h, i, j, kk: (h, i, j)))

    out_dt = jnp.dtype(out_dtype)

    def kernel(*refs):
        idx = 2
        a_ref, b_ref = refs[0], refs[1]
        c_ref = refs[idx] if has_c else None
        idx += has_c
        bias_ref = refs[idx] if has_bias else None
        idx += has_bias
        out_ref = refs[idx]
        idx += 1
        aux_ref = refs[idx] if has_aux else None
        idx += has_aux
        acc_ref = refs[idx]

        k_idx = pl.program_id(3)

        @pl.when(k_idx == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(
            a_ref[0], b_ref[0], preferred_element_type=jnp.float32
        )

        @pl.when(k_idx == nk - 1)
        def _():
            acc = alpha * acc_ref[:]
            if has_c:
                acc = acc + beta * c_ref[0].astype(jnp.float32)
            bias_block = bias_ref[0, 0:1, :] if has_bias else None
            d, aux = apply_epilogue(acc, epilogue, bias_block)
            if has_aux:
                aux_ref[0] = aux
            out_ref[0] = d.astype(out_dt)

    flops = int(2 * nb * mp * np_ * kp)
    bytes_accessed = int(
        a3.size * a3.dtype.itemsize + b3.size * b3.dtype.itemsize
        + nb * mp * np_ * out_dt.itemsize
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret_mode(),
    )(*operands)

    d = outs[0][:, :m, :n].reshape(batch_shape + (m, n))
    if has_aux:
        return d, outs[1][:, :m, :n].reshape(batch_shape + (m, n))
    return d

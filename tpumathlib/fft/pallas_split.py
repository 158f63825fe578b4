"""Two-kernel Pallas four-step FFT: stage1+twiddle | stage2+digit-reversal.

Fallback fusion level between the composed-XLA path (~5 HBM round trips)
and the fully-fused tile kernel (rejected by the current axon Mosaic
service): two pallas_calls → two HBM round trips. Each kernel is three
HIGHEST-precision 2D matmuls (planar Karatsuba) plus supported
swaps/leading-reshapes only.

Layouts (all 3D so XLA-side reshapes stay free):
  in:   A  (b, n1, n2)   [x.reshape]
  mid:  C  (b, n2, k1)   [stage-1 output × twiddle, natural result layout]
  out:  D  (b, k2, k1)   [flattens to X[k2·n1+k1] row-major]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumathlib.dx.pallas_utils import interpret_mode
from tpumathlib.fft.kernels import _best_split, _dft_mats, _twiddle


def _mm(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def _cmm(lr, li, rr, ri):
    t1 = _mm(lr, rr)
    t2 = _mm(li, ri)
    t3 = _mm(lr + li, rr + ri)
    return t1 - t2, t3 - t1 - t2


def _stage1_kernel(n1, n2):
    def kernel(xr_ref, xi_ref, w1r, w1i, twr, twi, or_ref, oi_ref):
        t = xr_ref.shape[0]
        ar = xr_ref[:].swapaxes(1, 2).reshape(t * n2, n1)
        ai = xi_ref[:].swapaxes(1, 2).reshape(t * n2, n1)
        br, bi = _cmm(ar, ai, w1r[:], w1i[:])
        br = br.reshape(t, n2, n1)
        bi = bi.reshape(t, n2, n1)
        tr = twr[:][None, :, :]
        ti = twi[:][None, :, :]
        or_ref[:] = br * tr - bi * ti
        oi_ref[:] = br * ti + bi * tr

    return kernel


def _stage2_kernel(n1, n2):
    def kernel(cr_ref, ci_ref, w2r, w2i, or_ref, oi_ref):
        t = cr_ref.shape[0]
        cr = cr_ref[:].swapaxes(1, 2).reshape(t * n1, n2)
        ci = ci_ref[:].swapaxes(1, 2).reshape(t * n1, n2)
        dr, di = _cmm(cr, ci, w2r[:], w2i[:])
        or_ref[:] = dr.reshape(t, n1, n2).swapaxes(1, 2)
        oi_ref[:] = di.reshape(t, n1, n2).swapaxes(1, 2)

    return kernel


@functools.partial(jax.jit, static_argnames=("inverse", "tile"))
def pallas_fft2(xr, xi, inverse: bool = False, tile: int = 256):
    """Planar C2C FFT over the last axis, N = n1·n2 ≤ 16384."""
    n = xr.shape[-1]
    n1, n2 = _best_split(n)
    batch_shape = xr.shape[:-1]
    xr2 = xr.reshape(-1, n).astype(jnp.float32)
    xi2 = xi.reshape(-1, n).astype(jnp.float32)
    b = xr2.shape[0]
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
    bp = xr2.shape[0]
    nb = bp // tile

    w1r, w1i = (jnp.asarray(v) for v in _dft_mats(n1, inverse))
    twr_, twi_ = _twiddle(n1, n2, inverse)
    twr = jnp.asarray(twr_.T.copy())
    twi = jnp.asarray(twi_.T.copy())
    w2r, w2i = (jnp.asarray(v) for v in _dft_mats(n2, inverse))

    interp = interpret_mode()

    def run_stage(kernel, ins, in_shapes3, out_shape3, smalls):
        small_specs = [pl.BlockSpec(s.shape, lambda i: (0, 0)) for s in smalls]
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((tile,) + s, lambda i: (i, 0, 0))
                      for s in in_shapes3] + small_specs,
            out_specs=[pl.BlockSpec((tile,) + out_shape3, lambda i: (i, 0, 0))] * 2,
            out_shape=[jax.ShapeDtypeStruct((bp,) + out_shape3, jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interp,
        )(*ins, *smalls)

    xr3 = xr2.reshape(bp, n1, n2)
    xi3 = xi2.reshape(bp, n1, n2)
    cr, ci = run_stage(_stage1_kernel(n1, n2), [xr3, xi3],
                       [(n1, n2), (n1, n2)], (n2, n1), [w1r, w1i, twr, twi])
    dr, di = run_stage(_stage2_kernel(n1, n2), [cr, ci],
                       [(n2, n1), (n2, n1)], (n2, n1), [w2r, w2i])
    yr = dr.reshape(bp, n)[:b].reshape(batch_shape + (n,))
    yi = di.reshape(bp, n)[:b].reshape(batch_shape + (n,))
    return yr, yi

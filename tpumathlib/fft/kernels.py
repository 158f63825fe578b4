"""MXU-native FFT engine: the four-step (Bailey) factorization with DFT
stages as matrix multiplies.

This is the TPU analogue of the reference's device-side FFT tier (cuFFTDx
block FFTs): where cuFFTDx composes per-thread radix butterflies, the TPU's
128×128 systolic array makes *DFT-as-matmul* the native formulation — factor
N = N1·N2 (N1, N2 ≤ 128 preferred), then

  X[k2·N1+k1] = Σ_{n2} ω_N^{n2·k1} · ω_{N2}^{n2·k2} · (Σ_{n1} A[n1,n2] ω_{N1}^{n1·k1})

i.e. stage-1 DFT = W1@A on the MXU, twiddle on the VPU, stage-2 DFT = C@W2ᵀ
on the MXU, then an index transpose. Complex arithmetic is planar (separate
re/im f32 arrays — ≙ cuBLASLt planar-complex layouts) with the 3-multiply
Karatsuba trick per stage (blas.level3.gemm3m's scheme).

For N > 16384 the factorization recurses on N1. Odd/prime N falls back to
XLA's FFT. Accuracy: f32 matmul DFT keeps rel-L2 well under the 1e-4
complex64 bar for N ≤ 2^20 (tested).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _best_split(n: int) -> tuple[int, int]:
    """Factor n = n1·n2 with n1, n2 as close to sqrt(n) (MXU-tile friendly)."""
    best = None
    for n1 in range(int(math.isqrt(n)), 0, -1):
        if n % n1 == 0:
            best = (n1, n // n1)
            break
    return best


@functools.lru_cache(maxsize=64)
def _dft_mats(n: int, inverse: bool):
    """(re, im) of the n×n DFT matrix as numpy f32 (cached host-side)."""
    k = np.arange(n)
    sign = 2.0 if inverse else -2.0
    w = np.exp(sign * 1j * np.pi * np.outer(k, k) / n)
    return np.ascontiguousarray(w.real.astype(np.float32)), np.ascontiguousarray(w.imag.astype(np.float32))


@functools.lru_cache(maxsize=64)
def _twiddle(n1: int, n2: int, inverse: bool):
    k1 = np.arange(n1)
    n2r = np.arange(n2)
    sign = 2.0 if inverse else -2.0
    w = np.exp(sign * 1j * np.pi * np.outer(k1, n2r) / (n1 * n2))
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _mm(a, b):
    # HIGHEST precision: true-f32 MXU passes — TPU's default matmul precision
    # is bf16, which would cap FFT accuracy at ~1e-2 rel.
    return jnp.matmul(a, b, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def _cmatmul(ar, ai, br, bi):
    """Planar complex matmul with 3 real MXU products (Karatsuba)."""
    t1 = _mm(ar, br)
    t2 = _mm(ai, bi)
    t3 = _mm(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def _fft_planar(xr, xi, inverse: bool):
    """Planar-complex FFT over the last axis; any composite N."""
    n = xr.shape[-1]
    if n <= 128 or _best_split(n)[0] == 1:
        # direct DFT-as-matmul (or prime size): x @ Wᵀ; W symmetric so W==Wᵀ
        wr, wi = _dft_mats(n, inverse)
        return _cmatmul(xr, xi, jnp.asarray(wr), jnp.asarray(wi))
    n1, n2 = _best_split(n)
    batch = xr.shape[:-1]
    ar = xr.reshape(batch + (n1, n2))
    ai = xi.reshape(batch + (n1, n2))
    # stage 1: DFT over n1 → B[k1, n2] = Σ_n1 W1[k1,n1] A[n1,n2]
    if n1 <= 128:
        w1r, w1i = _dft_mats(n1, inverse)
        br, bi = _cmatmul(jnp.asarray(w1r), jnp.asarray(w1i), ar, ai)
    else:
        # recurse along n1: transpose to (..., n2, n1), fft, transpose back
        tr = jnp.swapaxes(ar, -1, -2)
        ti = jnp.swapaxes(ai, -1, -2)
        rr, ri = _fft_planar(tr, ti, inverse)
        br, bi = jnp.swapaxes(rr, -1, -2), jnp.swapaxes(ri, -1, -2)
    # twiddle: C[k1, n2] = B[k1, n2] · ω^{k1·n2}
    twr, twi = _twiddle(n1, n2, inverse)
    twr = jnp.asarray(twr)
    twi = jnp.asarray(twi)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    # stage 2: DFT over n2 → D[k1, k2] = Σ_n2 C[k1,n2] W2[n2,k2]
    if n2 <= 128:
        w2r, w2i = _dft_mats(n2, inverse)
        dr, di = _cmatmul(cr, ci, jnp.asarray(w2r), jnp.asarray(w2i))
    else:
        dr, di = _fft_planar(cr, ci, inverse)
    # output index k = k2·n1 + k1 → transpose (k1,k2) → (k2,k1) then flatten
    dr = jnp.swapaxes(dr, -1, -2).reshape(batch + (n,))
    di = jnp.swapaxes(di, -1, -2).reshape(batch + (n,))
    return dr, di


# ---------------- fused Pallas four-step kernel ----------------
#
# The composed jnp four-step makes ~5 HBM round trips (stage outputs,
# twiddle, digit-reversal transpose). This kernel keeps the whole transform
# of a row-tile in VMEM: load (tile, N) once, run both DFT stages + twiddle
# + transpose on MXU/VPU values, store once — the cuFFTDx-style fused block
# FFT, which is what gets FFT to the HBM roofline.
#
# STATUS: compiles and runs on the chip at tile<=32 (the opaque
# remote-compile HTTP 500s at larger tiles are VMEM overflow: blocks are
# double-buffered, so 2 in + 2 out blocks must fit well under 16 MB).
# Measured 75 GB/s at N=4096 — on par with the composed-XLA path because
# the DFT-as-matmul formulation is MXU-compute-bound (HIGHEST f32 = 6
# passes x 3 Karatsuba products), not HBM-bound. The path to the >=80%%
# HBM roofline target is a Stockham butterfly kernel (O(N log N) VPU work)
# rather than O(N sqrt N) matmuls — round-2 item (NOTES_r1.md).

def _make_fft_tile_kernel(n1: int, n2: int, inverse: bool):
    n = n1 * n2

    def kernel(xr_ref, xi_ref, w1r, w1i, twr, twi, w2r, w2i, or_ref, oi_ref):
        # Mosaic constraints honored: 2D matmuls only; reshapes only
        # collapse/expand the LEADING pair; transposes via swapaxes.
        # Blocks are 3D: in (t, n1, n2), out (t, n2, n1); the (b, n)↔3D
        # reshapes happen outside in XLA where they're free (contiguous).
        t = xr_ref.shape[0]

        def mm(a, b):
            # Mosaic supports DEFAULT (bf16, too coarse for c64 accuracy)
            # and HIGHEST (true f32) only
            return jnp.matmul(a, b, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)

        def cmm(lr, li, rr, ri):
            t1 = mm(lr, rr)
            t2 = mm(li, ri)
            t3 = mm(lr + li, rr + ri)
            return t1 - t2, t3 - t1 - t2

        # stage 1 over n1 as right-multiplication (DFT matrices are
        # symmetric): B[(t,n2), k1] = Aᵀ₍ₙ₂₎ @ W1
        ar = xr_ref[:].swapaxes(1, 2).reshape(t * n2, n1)
        ai = xi_ref[:].swapaxes(1, 2).reshape(t * n2, n1)
        br, bi = cmm(ar, ai, w1r[:], w1i[:])
        br = br.reshape(t, n2, n1)
        bi = bi.reshape(t, n2, n1)
        # twiddle ω^{k1·n2} in (n2, k1) layout, broadcast over t
        tr = twr[:][None, :, :]
        ti = twi[:][None, :, :]
        cr = br * tr - bi * ti
        ci = br * ti + bi * tr
        # stage 2 over n2: D[(t,k1), k2] = Cᵀ₍ₖ₁₎ @ W2
        cr = cr.swapaxes(1, 2).reshape(t * n1, n2)
        ci = ci.swapaxes(1, 2).reshape(t * n1, n2)
        dr, di = cmm(cr, ci, w2r[:], w2i[:])
        # (t, k1, k2) → out block (t, k2, k1); output index k = k2·n1+k1
        or_ref[:] = dr.reshape(t, n1, n2).swapaxes(1, 2)
        oi_ref[:] = di.reshape(t, n1, n2).swapaxes(1, 2)

    return kernel


@functools.partial(jax.jit, static_argnames=("inverse", "tile"))
def pallas_fft(xr, xi, inverse: bool = False, tile: int = 32):
    """Fused planar-complex FFT over the last axis for N = n1·n2 with
    n1, n2 ≤ 128 (N ≤ 16384). One HBM round trip per element."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpumathlib.dx.pallas_utils import interpret_mode

    n = xr.shape[-1]
    n1, n2 = _best_split(n)
    batch_shape = xr.shape[:-1]
    xr2 = xr.reshape(-1, n)
    xi2 = xi.reshape(-1, n)
    b = xr2.shape[0]
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
    bp = xr2.shape[0]
    nb = bp // tile
    # 3D views — free in XLA (contiguous), required by the kernel's
    # leading-collapse-only reshape discipline
    xr3 = xr2.reshape(bp, n1, n2).astype(jnp.float32)
    xi3 = xi2.reshape(bp, n1, n2).astype(jnp.float32)

    w1r, w1i = (jnp.asarray(v) for v in _dft_mats(n1, inverse))
    twr_, twi_ = _twiddle(n1, n2, inverse)
    twr = jnp.asarray(twr_.T.copy())  # (n2, k1) layout for the kernel
    twi = jnp.asarray(twi_.T.copy())
    w2r, w2i = (jnp.asarray(v) for v in _dft_mats(n2, inverse))

    kernel = _make_fft_tile_kernel(n1, n2, inverse)
    small = [
        pl.BlockSpec((n1, n1), lambda i: (0, 0)),
        pl.BlockSpec((n1, n1), lambda i: (0, 0)),
        pl.BlockSpec((n2, n1), lambda i: (0, 0)),
        pl.BlockSpec((n2, n1), lambda i: (0, 0)),
        pl.BlockSpec((n2, n2), lambda i: (0, 0)),
        pl.BlockSpec((n2, n2), lambda i: (0, 0)),
    ]
    yr, yi = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((tile, n1, n2), lambda i: (i, 0, 0)),
                  pl.BlockSpec((tile, n1, n2), lambda i: (i, 0, 0))] + small,
        out_specs=[pl.BlockSpec((tile, n2, n1), lambda i: (i, 0, 0)),
                   pl.BlockSpec((tile, n2, n1), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((bp, n2, n1), jnp.float32),
                   jax.ShapeDtypeStruct((bp, n2, n1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret_mode(),
    )(xr3, xi3, w1r, w1i, twr, twi, w2r, w2i)
    yr = yr.reshape(bp, n)[:b].reshape(batch_shape + (n,))
    yi = yi.reshape(bp, n)[:b].reshape(batch_shape + (n,))
    return yr, yi


@functools.partial(jax.jit, static_argnames=("inverse",))
def mxu_fft(x, inverse: bool = False):
    """Unnormalized C2C FFT over the last axis via MXU matmul stages.

    complex64 in/out; matches cuFFT forward/inverse (no 1/N on inverse).
    """
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    yr, yi = _fft_planar(xr, xi, inverse)
    return (yr + 1j * yi).astype(jnp.complex64)


@functools.partial(jax.jit, static_argnames=("inverse", "axes_len"))
def _mxu_fftn_impl(x, inverse: bool, axes_len: int):
    # transform the trailing axes_len axes, innermost-last ordering
    for ax in range(x.ndim - 1, x.ndim - 1 - axes_len, -1):
        xm = jnp.moveaxis(x, ax, -1)
        xm = mxu_fft(xm, inverse=inverse)
        x = jnp.moveaxis(xm, -1, ax)
    return x


def mxu_fftn(x, axes=None, inverse: bool = False):
    """N-D C2C via per-axis MXU FFTs (trailing axes by default)."""
    if axes is None:
        axes_len = x.ndim
    else:
        axes = sorted(a % x.ndim for a in axes)
        assert axes == list(range(x.ndim - len(axes), x.ndim)), (
            "mxu_fftn transforms trailing axes")
        axes_len = len(axes)
    return _mxu_fftn_impl(x, inverse, axes_len)


def mxu_rfft(x):
    """R2C via full complex transform, truncated spectrum (the MXU does the
    full matmul anyway; half-spectrum packing saves nothing on the MXU)."""
    n = x.shape[-1]
    y = mxu_fft(x.astype(jnp.complex64))
    return y[..., : n // 2 + 1]


def mxu_irfft(y, n: int):
    """C2R inverse (unnormalized)."""
    # rebuild the Hermitian-symmetric full spectrum
    tail = jnp.conj(y[..., 1 : (n + 1) // 2][..., ::-1])
    full = jnp.concatenate([y[..., : n // 2 + 1], tail], axis=-1)
    z = mxu_fft(full, inverse=True)
    return jnp.real(z)


# ---------------- planar (re, im) engines — the chip-executable tier ----
#
# This TPU backend has no complex dtypes (CLAUDE.md), so the production
# transforms are planar f32 pairs. The last-axis engine picks the Stockham
# butterfly pipeline (fft/stockham.py) for pow2 N >= 256 and the
# DFT-as-matmul four-step otherwise. ≙ the device-execution contract of
# cuFFT exec (cuFFT/1d_c2c/1d_c2c_example.cpp:50-69) and cuFFTMp's local
# transforms (cuFFTMp/samples/c2c/cufftmp_c2c.cu:69-96).

def fft_axis_planar(xr, xi, inverse: bool = False, half: bool = False):
    """Planar C2C over the LAST axis; routes to the fastest engine.

    ``half=True`` selects the bf16-plane fast mode of the Stockham engine
    (HALF the HBM stream bytes; butterflies stay f32; ~4e-3 rel-L2 —
    ≙ cuFFT half-precision C2C plans). Non-pow2 shapes ignore it."""
    from tpumathlib.fft.stockham import dif_fft

    n = xr.shape[-1]
    if n >= 256 and (n & (n - 1)) == 0:
        return dif_fft(xr, xi, inverse=inverse, halfplanes=half)
    return _fft_planar(xr, xi, inverse)


def fftn_planar(xr, xi, naxes: int, inverse: bool = False,
                half: bool = False):
    """Planar C2C over the trailing ``naxes`` axes."""
    for ax in range(-1, -naxes - 1, -1):
        xr_m = jnp.moveaxis(xr, ax, -1)
        xi_m = jnp.moveaxis(xi, ax, -1)
        yr, yi = fft_axis_planar(xr_m, xi_m, inverse, half=half)
        xr = jnp.moveaxis(yr, -1, ax)
        xi = jnp.moveaxis(yi, -1, ax)
    return xr, xi


def rfft_planar(x, half: bool = False):
    """R2C over the last axis: real f32 → planar half spectrum
    (..., n//2+1). Unnormalized forward (cuFFT convention).
    ``half=True`` runs the internal C2C on bf16 HBM planes (~4e-3
    rel-L2, half the stream bytes); the untangle math stays f32.

    Even batches use the two-for-one packing: adjacent real rows ride one
    complex row (z = a + i·b, A = (Z + Z̄rev)/2, B = (Z − Z̄rev)/2i) —
    the plain spelling streams a zero imaginary plane through the C2C
    engine, wasting half the FFT bandwidth.

    ≙ cufftExecR2C (cuFFT/1d_r2c/1d_r2c_example.cpp) executing on device —
    the round-2 jnp.fft.rfftn routing could not run on this backend.
    """
    n = x.shape[-1]
    x = x.astype(jnp.float32)
    h = n // 2 + 1
    if x.ndim >= 2 and x.shape[-2] % 2 == 0 and n >= 256 \
            and (n & (n - 1)) == 0:
        # pair row i with row i + batch/2 (NOT adjacent rows): the
        # pack/unpack are then free contiguous views + one tile-ALIGNED
        # concat, where adjacent pairing costs a full (8,128)-tile
        # interleave retile each way (measured 1.3 ms at 4096x4096 —
        # the dominant cost of the r2c_c2r cycle before this change).
        # The public row-order contract is unchanged.
        bh = x.shape[-2] // 2
        a = x[..., :bh, :]
        b = x[..., bh:, :]
        zr, zi = fft_axis_planar(a, b, half=half)
        # half mode: planes stay bf16 through the copies (reverse/concat)
        # so every HBM pass moves half bytes; the untangle arithmetic
        # upcasts inside the fused elementwise kernel only
        dt = zr.dtype
        f32 = jnp.float32
        zr_rev = jnp.concatenate([zr[..., :1], zr[..., :0:-1]], -1)[..., :h]
        zi_rev = jnp.concatenate([zi[..., :1], zi[..., :0:-1]], -1)[..., :h]
        zr = zr[..., :h]
        zi = zi[..., :h]
        ar = (0.5 * (zr.astype(f32) + zr_rev.astype(f32))).astype(dt)
        ai = (0.5 * (zi.astype(f32) - zi_rev.astype(f32))).astype(dt)
        br = (0.5 * (zi.astype(f32) + zi_rev.astype(f32))).astype(dt)
        bi = (0.5 * (zr_rev.astype(f32) - zr.astype(f32))).astype(dt)
        yr = jnp.concatenate([ar, br], axis=-2)
        yi = jnp.concatenate([ai, bi], axis=-2)
        return yr, yi
    yr, yi = fft_axis_planar(x, jnp.zeros_like(x), half=half)
    return yr[..., :h].astype(jnp.float32), yi[..., :h].astype(jnp.float32)


def _hermitian_full(yr, yi, n: int):
    """Half spectrum (..., n//2+1) → full (..., n) by conj symmetry."""
    tr = yr[..., 1:(n + 1) // 2][..., ::-1]
    ti = -yi[..., 1:(n + 1) // 2][..., ::-1]
    return (jnp.concatenate([yr[..., :n // 2 + 1], tr], axis=-1),
            jnp.concatenate([yi[..., :n // 2 + 1], ti], axis=-1))


def irfft_planar(yr, yi, n: int, half: bool = False):
    """C2R over the last axis: planar half spectrum (..., n//2+1) → real
    (..., n). Unnormalized inverse (ifft(fft(x)) == N·x). ``half=True``
    runs the internal C2C on bf16 HBM planes (~4e-3 rel-L2 contract).

    Even batches use the two-for-one inverse: Z = A_full + i·B_full,
    z = IFFT(Z), a = Re z, b = Im z — one complex inverse carries two
    real rows.

    ≙ cufftExecC2R (cuFFT/1d_c2r/1d_c2r_example.cpp) on device."""
    if yr.ndim >= 2 and yr.shape[-2] % 2 == 0 and n >= 256 \
            and (n & (n - 1)) == 0:
        # half-split pairing mirror of rfft_planar: free views in, one
        # aligned concat out (no interleave retiles)
        bh = yr.shape[-2] // 2
        ar, ai = _hermitian_full(yr[..., :bh, :], yi[..., :bh, :], n)
        br, bi = _hermitian_full(yr[..., bh:, :], yi[..., bh:, :], n)
        dt = yr.dtype
        f32 = jnp.float32
        pr = (ar.astype(f32) - bi.astype(f32)).astype(dt)
        pi = (ai.astype(f32) + br.astype(f32)).astype(dt)
        zr, zi = fft_axis_planar(pr, pi, inverse=True, half=half)
        return jnp.concatenate([zr, zi], axis=-2).astype(jnp.float32)
    fr, fi = _hermitian_full(yr, yi, n)
    zr, _ = fft_axis_planar(fr, fi, inverse=True, half=half)
    return zr.astype(jnp.float32)


def rfftn_planar(x, naxes: int, half: bool = False):
    """N-D R2C (trailing axes; last axis halved) — planar output."""
    yr, yi = rfft_planar(x, half=half)
    if naxes > 1:
        yr2 = jnp.moveaxis(yr, -1, 0)
        yi2 = jnp.moveaxis(yi, -1, 0)
        yr2, yi2 = fftn_planar(yr2, yi2, naxes - 1, half=half)
        yr, yi = jnp.moveaxis(yr2, 0, -1), jnp.moveaxis(yi2, 0, -1)
    return yr, yi


def irfftn_planar(yr, yi, shape: tuple, half: bool = False):
    """N-D C2R inverse of rfftn_planar (unnormalized)."""
    naxes = len(shape)
    if naxes > 1:
        yr2 = jnp.moveaxis(yr, -1, 0)
        yi2 = jnp.moveaxis(yi, -1, 0)
        yr2, yi2 = fftn_planar(yr2, yi2, naxes - 1, inverse=True, half=half)
        yr, yi = jnp.moveaxis(yr2, 0, -1), jnp.moveaxis(yi2, 0, -1)
    return irfft_planar(yr, yi, shape[-1], half=half)

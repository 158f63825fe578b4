"""Distributed FFT: slab and pencil decompositions over device meshes.

Parity: cuFFTMp (SURVEY.md §2.4) — slab X/Y C2C + R2C/C2R, pencil
decomposition (cufftXtSetDistribution, c2c_pencils.cu:106-146), the
standalone ``reshape`` redistribution API (samples/reshape/cufftmp_reshape.cu:
103-142), and box distributions (box_iterator.hpp:44-64). The design follows
the reference's own pure-JAX formulation (JAX_FFT/src/xfft/xfft.py:60-109):
local FFTs on unsharded axes + an all-to-all reshard between stages — here
written explicitly with shard_map so the collective schedule is visible and
Pallas-overlappable.

Data layout: global shape (X, Y, Z).
- slab:   input P(axis, None, None)  → output P(None, axis, None)
          stage 1: local FFT over (Y, Z); all-to-all X↔Y; stage 2: FFT over X.
- pencil: 2D mesh (x, y); input P('x', 'y', None) (Z-pencils) → output
          Z-pencils of the transform with X,Y roles rotated:
          FFT(Z) → a2a(y): Y↔Z → FFT(Y) → a2a(x): X↔Y → FFT(X);
          output sharded P(None, 'x', 'y') (X full, Y over x, Z over y).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpumathlib.core.errors import check
from tpumathlib.mp.grid import Grid


def _fftn_local(x, axes, inverse: bool):
    # cuFFT-style unnormalized transforms in both directions
    if inverse:
        return jnp.fft.ifftn(x, axes=axes, norm="forward")
    return jnp.fft.fftn(x, axes=axes)


def fft_slab(x, grid: Grid, axis: str | None = None, *, inverse: bool = False,
             callback_between=None):
    """3D (or 2D) C2C FFT with slab (1D) decomposition.

    ``x`` sharded P(axis, ...) on its first dim; returns the transform
    sharded P(None, axis, ...) on its second dim (≙ cuFFTMp's
    INPLACE→INPLACE_SHUFFLED format change — the output stays distributed,
    permuted, exactly like cufftXtExecDescriptor leaves it).

    ``callback_between`` runs on the (X-complete, Y-sharded) intermediate —
    the user-kernel-between-stages hook (≙ BoxIterator scaling kernels).
    """
    axis = axis or grid.axes[0]
    ndim = x.ndim

    def f(blk):
        # blk: (X/P, Y, Z...) — transform all non-first dims locally
        blk = _fftn_local(blk, tuple(range(1, ndim)), inverse)
        # redistribute: split Y over ranks, gather X
        blk = jax.lax.all_to_all(blk, axis, split_axis=1, concat_axis=0,
                                 tiled=True)
        # blk: (X, Y/P, Z...) — transform X
        if callback_between is not None:
            blk = callback_between(blk)
        blk = _fftn_local(blk, (0,), inverse)
        return blk

    return jax.shard_map(
        f, mesh=grid.mesh,
        in_specs=P(axis, *([None] * (ndim - 1))),
        out_specs=P(None, axis, *([None] * (ndim - 2))),
    )(x)


def ifft_slab(x, grid: Grid, axis: str | None = None):
    """Inverse slab FFT accepting the shuffled layout fft_slab produces:
    input P(None, axis, ...) → output P(axis, None, ...)."""
    axis = axis or grid.axes[0]
    ndim = x.ndim

    def f(blk):
        # blk: (X, Y/P, Z...) — inverse transform X first
        blk = _fftn_local(blk, (0,), True)
        blk = jax.lax.all_to_all(blk, axis, split_axis=0, concat_axis=1,
                                 tiled=True)
        # blk: (X/P, Y, Z...) — inverse transform the rest
        blk = _fftn_local(blk, tuple(range(1, ndim)), True)
        return blk

    return jax.shard_map(
        f, mesh=grid.mesh,
        in_specs=P(None, axis, *([None] * (ndim - 2))),
        out_specs=P(axis, *([None] * (ndim - 1))),
    )(x)


def fft_pencil(x, grid: Grid, *, inverse: bool = False):
    """3D C2C FFT with pencil (2D) decomposition over mesh axes (x, y).

    Input Z-pencils P('x', 'y', None); output P(None, 'x', 'y')
    (X complete, Y sharded over mesh-x, Z over mesh-y) — the pencil
    layout rotation of cufftmp_c2c_pencils.
    """
    ax, ay = grid.axes[0], grid.axes[1]

    def f(blk):
        # blk: (X/Px, Y/Py, Z)
        blk = _fftn_local(blk, (2,), inverse)
        # exchange within rows (y): split Z, gather Y → (X/Px, Y, Z/Py)
        blk = jax.lax.all_to_all(blk, ay, split_axis=2, concat_axis=1, tiled=True)
        blk = _fftn_local(blk, (1,), inverse)
        # exchange within cols (x): split Y, gather X → (X, Y/Px, Z/Py)
        blk = jax.lax.all_to_all(blk, ax, split_axis=1, concat_axis=0, tiled=True)
        blk = _fftn_local(blk, (0,), inverse)
        return blk

    return jax.shard_map(
        f, mesh=grid.mesh,
        in_specs=P(ax, ay, None),
        out_specs=P(None, ax, ay),
    )(x)


def ifft_pencil(x, grid: Grid):
    """Inverse pencil FFT accepting fft_pencil's output layout."""
    ax, ay = grid.axes[0], grid.axes[1]

    def f(blk):
        # blk: (X, Y/Px, Z/Py)
        blk = _fftn_local(blk, (0,), True)
        blk = jax.lax.all_to_all(blk, ax, split_axis=0, concat_axis=1, tiled=True)
        # (X/Px, Y, Z/Py)
        blk = _fftn_local(blk, (1,), True)
        blk = jax.lax.all_to_all(blk, ay, split_axis=1, concat_axis=2, tiled=True)
        # (X/Px, Y/Py, Z)
        blk = _fftn_local(blk, (2,), True)
        return blk

    return jax.shard_map(
        f, mesh=grid.mesh,
        in_specs=P(None, ax, ay),
        out_specs=P(ax, ay, None),
    )(x)


def rfft_slab(x, grid: Grid, axis: str | None = None):
    """R2C slab FFT: real input P(axis, None, None) → half-spectrum
    (Z → Z/2+1) sharded P(None, axis, None) (≙ cuFFTMp r2c samples)."""
    axis = axis or grid.axes[0]
    ndim = x.ndim

    def f(blk):
        blk = jnp.fft.rfft(blk, axis=-1)
        blk = jnp.fft.fftn(blk, axes=tuple(range(1, ndim - 1)))
        blk = jax.lax.all_to_all(blk, axis, split_axis=1, concat_axis=0, tiled=True)
        return jnp.fft.fft(blk, axis=0)

    return jax.shard_map(
        f, mesh=grid.mesh,
        in_specs=P(axis, *([None] * (ndim - 1))),
        out_specs=P(None, axis, *([None] * (ndim - 2))),
    )(x)


def irfft_slab(x, grid: Grid, nz: int, axis: str | None = None):
    """C2R slab inverse of rfft_slab (unnormalized, ifft·N semantics)."""
    axis = axis or grid.axes[0]
    ndim = x.ndim

    def f(blk):
        blk = jnp.fft.ifft(blk, axis=0, norm="forward")
        blk = jax.lax.all_to_all(blk, axis, split_axis=0, concat_axis=1, tiled=True)
        blk = jnp.fft.ifftn(blk, axes=tuple(range(1, ndim - 1)), norm="forward")
        return jnp.fft.irfft(blk, n=nz, axis=-1, norm="forward")

    return jax.shard_map(
        f, mesh=grid.mesh,
        in_specs=P(None, axis, *([None] * (ndim - 2))),
        out_specs=P(axis, *([None] * (ndim - 1))),
    )(x)


# ---------------- planar (re, im) distributed tier ----------------
#
# This TPU backend has no complex dtypes, so the chip-executable Mp FFT is
# planar: every local transform runs through the f32 planar engines
# (fft.kernels.fft_axis_planar → Stockham/MXU kernels on device) and the
# inter-stage redistributions are all-to-alls on both planes. Semantics
# match cuFFTMp exactly (cuFFTMp/samples/c2c/cufftmp_c2c.cu:69-96:
# distributed exec leaves the output distributed in the permuted layout).

def _axfft(xr, xi, axis: int, inverse: bool):
    from tpumathlib.fft import kernels

    xr_m = jnp.moveaxis(xr, axis, -1)
    xi_m = jnp.moveaxis(xi, axis, -1)
    yr, yi = kernels.fft_axis_planar(xr_m, xi_m, inverse)
    return jnp.moveaxis(yr, -1, axis), jnp.moveaxis(yi, -1, axis)


def _axfftn(xr, xi, axes, inverse: bool):
    for ax in axes:
        xr, xi = _axfft(xr, xi, ax, inverse)
    return xr, xi


def fft_slab_planar(xr, xi, grid: Grid, axis: str | None = None, *,
                    inverse: bool = False, callback_between=None):
    """Planar C2C slab FFT: (re, im) sharded P(axis, ...) → transform
    sharded P(None, axis, ...). Chip-executable (no complex dtypes).

    ≙ cuFFTMp slab samples (cufftmp_c2c.cu) running on a TPU slice."""
    axis = axis or grid.axes[0]
    ndim = xr.ndim

    def f(br, bi):
        br, bi = _axfftn(br, bi, tuple(range(ndim - 1, 0, -1)), inverse)
        br = jax.lax.all_to_all(br, axis, split_axis=1, concat_axis=0,
                                tiled=True)
        bi = jax.lax.all_to_all(bi, axis, split_axis=1, concat_axis=0,
                                tiled=True)
        if callback_between is not None:
            br, bi = callback_between((br, bi))
        return _axfft(br, bi, 0, inverse)

    spec_in = P(axis, *([None] * (ndim - 1)))
    spec_out = P(None, axis, *([None] * (ndim - 2)))
    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(spec_in, spec_in),
                         out_specs=(spec_out, spec_out))(xr, xi)


def ifft_slab_planar(xr, xi, grid: Grid, axis: str | None = None):
    """Planar inverse slab accepting fft_slab_planar's output layout."""
    axis = axis or grid.axes[0]
    ndim = xr.ndim

    def f(br, bi):
        br, bi = _axfft(br, bi, 0, True)
        br = jax.lax.all_to_all(br, axis, split_axis=0, concat_axis=1,
                                tiled=True)
        bi = jax.lax.all_to_all(bi, axis, split_axis=0, concat_axis=1,
                                tiled=True)
        return _axfftn(br, bi, tuple(range(ndim - 1, 0, -1)), True)

    spec_in = P(None, axis, *([None] * (ndim - 2)))
    spec_out = P(axis, *([None] * (ndim - 1)))
    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(spec_in, spec_in),
                         out_specs=(spec_out, spec_out))(xr, xi)


def fft_pencil_planar(xr, xi, grid: Grid, *, inverse: bool = False):
    """Planar pencil-decomposed 3D C2C (≙ cufftmp_c2c_pencils.cu:106-146):
    input Z-pencils P('x','y',None) → output P(None,'x','y')."""
    ax, ay = grid.axes[0], grid.axes[1]

    def f(br, bi):
        br, bi = _axfft(br, bi, 2, inverse)
        br = jax.lax.all_to_all(br, ay, split_axis=2, concat_axis=1, tiled=True)
        bi = jax.lax.all_to_all(bi, ay, split_axis=2, concat_axis=1, tiled=True)
        br, bi = _axfft(br, bi, 1, inverse)
        br = jax.lax.all_to_all(br, ax, split_axis=1, concat_axis=0, tiled=True)
        bi = jax.lax.all_to_all(bi, ax, split_axis=1, concat_axis=0, tiled=True)
        return _axfft(br, bi, 0, inverse)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(ax, ay, None), P(ax, ay, None)),
                         out_specs=(P(None, ax, ay), P(None, ax, ay)))(xr, xi)


def ifft_pencil_planar(xr, xi, grid: Grid):
    """Planar inverse of fft_pencil_planar."""
    ax, ay = grid.axes[0], grid.axes[1]

    def f(br, bi):
        br, bi = _axfft(br, bi, 0, True)
        br = jax.lax.all_to_all(br, ax, split_axis=0, concat_axis=1, tiled=True)
        bi = jax.lax.all_to_all(bi, ax, split_axis=0, concat_axis=1, tiled=True)
        br, bi = _axfft(br, bi, 1, True)
        br = jax.lax.all_to_all(br, ay, split_axis=1, concat_axis=2, tiled=True)
        bi = jax.lax.all_to_all(bi, ay, split_axis=1, concat_axis=2, tiled=True)
        return _axfft(br, bi, 2, True)

    return jax.shard_map(f, mesh=grid.mesh,
                         in_specs=(P(None, ax, ay), P(None, ax, ay)),
                         out_specs=(P(ax, ay, None), P(ax, ay, None)))(xr, xi)


def rfft_slab_planar(x, grid: Grid, axis: str | None = None):
    """Planar R2C slab: real input P(axis, None, None) → planar half
    spectrum (Z → Z/2+1) sharded P(None, axis, None) (≙ cuFFTMp
    cufftmp_r2c.cu) — device-executable on this backend."""
    from tpumathlib.fft import kernels

    axis = axis or grid.axes[0]
    ndim = x.ndim

    def f(blk):
        br, bi = kernels.rfft_planar(blk)
        br, bi = _axfftn(br, bi, tuple(range(ndim - 2, 0, -1)), False)
        br = jax.lax.all_to_all(br, axis, split_axis=1, concat_axis=0, tiled=True)
        bi = jax.lax.all_to_all(bi, axis, split_axis=1, concat_axis=0, tiled=True)
        return _axfft(br, bi, 0, False)

    spec_in = P(axis, *([None] * (ndim - 1)))
    spec_out = P(None, axis, *([None] * (ndim - 2)))
    return jax.shard_map(f, mesh=grid.mesh, in_specs=spec_in,
                         out_specs=(spec_out, spec_out))(x)


def irfft_slab_planar(xr, xi, grid: Grid, nz: int, axis: str | None = None):
    """Planar C2R slab inverse of rfft_slab_planar (unnormalized)."""
    from tpumathlib.fft import kernels

    axis = axis or grid.axes[0]
    ndim = xr.ndim

    def f(br, bi):
        br, bi = _axfft(br, bi, 0, True)
        br = jax.lax.all_to_all(br, axis, split_axis=0, concat_axis=1, tiled=True)
        bi = jax.lax.all_to_all(bi, axis, split_axis=0, concat_axis=1, tiled=True)
        br, bi = _axfftn(br, bi, tuple(range(ndim - 2, 0, -1)), True)
        return kernels.irfft_planar(br, bi, nz)

    spec_in = P(None, axis, *([None] * (ndim - 2)))
    spec_out = P(axis, *([None] * (ndim - 1)))
    return jax.shard_map(f, mesh=grid.mesh, in_specs=(spec_in, spec_in),
                         out_specs=spec_out)(xr, xi)


def fft1d_distributed(x, grid: Grid, axis: str | None = None,
                      inverse: bool = False):
    """Distributed 1D C2C FFT of a single huge vector (≙ cuFFT 1d_mgpu_c2c
    and cuFFTMp 1D slabs): four-step with the inter-stage transpose as an
    all-to-all.

    x: length N = n1·n2 (complex on CPU meshes), sharded P(axis) →
    output sharded P(axis) in natural order.
    """
    import math

    axis = axis or grid.axes[0]
    nproc = grid.mesh.shape[axis]
    n = x.shape[0]
    # n1 near sqrt(n) with both factors divisible by the grid
    n1 = None
    for cand in range(int(math.isqrt(n)), 0, -1):
        if n % cand == 0 and cand % nproc == 0 and (n // cand) % nproc == 0:
            n1 = cand
            break
    check(n1 is not None, "need an n = n1·n2 split with n1, n2 divisible by P")
    n2 = n // n1

    def f(blk):
        # view x as A[i1, i2] (n = i1·n2 + i2); this rank: rows (n1/P, n2)
        a = blk.reshape(n1 // nproc, n2)
        # transpose to column slabs (n1, n2/P); DFT over i1
        c = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0, tiled=True)
        c = _fftn_local(c, (0,), inverse)
        # twiddle ω_N^{k1·i2}
        me = jax.lax.axis_index(axis)
        k1 = jnp.arange(n1)[:, None]
        i2 = me * (n2 // nproc) + jnp.arange(n2 // nproc)[None, :]
        sign = 2j if inverse else -2j
        c = c * jnp.exp(sign * jnp.pi * (k1 * i2) / n).astype(c.dtype)
        # back to row slabs (n1/P, n2); DFT over i2
        d = jax.lax.all_to_all(c, axis, split_axis=0, concat_axis=1, tiled=True)
        d = _fftn_local(d, (1,), inverse)
        # X[k2·n1 + k1] = D[k1, k2]: transpose to natural output order
        out = jax.lax.all_to_all(d.T, axis, split_axis=0, concat_axis=1,
                                 tiled=True)  # (n2/P, n1)
        return out.reshape(-1)

    return jax.shard_map(
        f, mesh=grid.mesh, in_specs=P(axis), out_specs=P(axis),
    )(x)


@dataclasses.dataclass
class DistributedFftPlan:
    """≙ cufftMp plan: grid + decomposition choice, exec fwd/inv.

    decomposition: "slab" (1D mesh) | "pencil" (2D mesh).
    """

    grid: Grid
    shape: tuple[int, ...]
    decomposition: str = "slab"

    def __call__(self, x, inverse: bool = False):
        if isinstance(x, (tuple, list)):  # planar (re, im): chip-executable
            xr, xi = x
            if self.decomposition == "pencil":
                return fft_pencil_planar(xr, xi, self.grid) if not inverse \
                    else ifft_pencil_planar(xr, xi, self.grid)
            return fft_slab_planar(xr, xi, self.grid) if not inverse \
                else ifft_slab_planar(xr, xi, self.grid)
        if self.decomposition == "pencil":
            return fft_pencil(x, self.grid, inverse=inverse) if not inverse \
                else ifft_pencil(x, self.grid)
        return fft_slab(x, self.grid, inverse=inverse) if not inverse \
            else ifft_slab(x, self.grid)

    def input_sharding(self):
        g = self.grid
        if self.decomposition == "pencil":
            return NamedSharding(g.mesh, P(g.axes[0], g.axes[1], None))
        return NamedSharding(g.mesh, P(g.axes[0], *([None] * (len(self.shape) - 1))))

    def output_sharding(self):
        g = self.grid
        if self.decomposition == "pencil":
            return NamedSharding(g.mesh, P(None, g.axes[0], g.axes[1]))
        return NamedSharding(g.mesh, P(None, g.axes[0], *([None] * (len(self.shape) - 2))))


def reshape(x, dst_sharding: NamedSharding):
    """Standalone redistribution (≙ cufftMpCreateReshape/ExecReshapeAsync):
    XLA lowers the reshard to all-to-all over ICI."""
    return jax.device_put(x, dst_sharding)


@dataclasses.dataclass(frozen=True)
class Box:
    """(lower, upper, strides) box — the cuFFTMp distribution descriptor
    (cufftXtSetDistribution boxes / Box3D,
    cuFFTMp/samples/iterators/box_iterator.hpp:37-41). ``strides`` are
    the LOCAL memory strides of the shard; default = C-contiguous."""

    lower: tuple[int, ...]
    upper: tuple[int, ...]
    strides: tuple[int, ...] = ()

    def __post_init__(self):
        if not self.strides:
            ext = self.extents
            st = [1] * len(ext)
            for d in range(len(ext) - 2, -1, -1):
                st[d] = st[d + 1] * ext[d + 1]
            object.__setattr__(self, "strides", tuple(st))

    def __iter__(self):
        # unpacks as (lower, upper) — the round-3 local_box tuple shape
        return iter((self.lower, self.upper))

    def __getitem__(self, k):
        return (self.lower, self.upper)[k]

    @property
    def extents(self) -> tuple[int, ...]:
        return tuple(u - l for l, u in zip(self.lower, self.upper))

    @property
    def size(self) -> int:
        n = 1
        for e in self.extents:
            n *= e
        return n

    def coords(self, i):
        """Local linear index (array ok) → GLOBAL coordinates — the
        BoxIterator linear_to_box3d mapping (box_iterator.hpp:168-176),
        vectorized (TPU-native iteration = whole-array index math)."""
        import jax.numpy as jnp_

        i = jnp_.asarray(i)
        out = []
        rem = i
        ext = self.extents
        for d in range(len(ext)):
            tail = 1
            for e in ext[d + 1:]:
                tail *= e
            c = rem // tail
            rem = rem - c * tail
            out.append(c + self.lower[d])
        return tuple(out)

    def position(self, i):
        """Local linear index → strided LOCAL memory offset (the
        iterator's ptr_[x·s0 + y·s1 + z·s2] addressing)."""
        cs = self.coords(i)
        pos = 0
        for c, l, s in zip(cs, self.lower, self.strides):
            pos = pos + (c - l) * s
        return pos

    def apply(self, fn, local):
        """Map ``fn(value, *global_coords) -> value`` over a device shard
        (≙ the user scaling kernel between FFT stages,
        cuFFTMp/samples/common/scaling.cuh): builds the global coordinate
        arrays once and applies fn elementwise — one fused XLA kernel."""
        import jax.numpy as jnp_

        flat = local.reshape(-1)
        cs = self.coords(jnp_.arange(self.size))
        return fn(flat, *cs).reshape(local.shape)


def local_box(global_shape: Sequence[int], sharding: NamedSharding,
              device) -> Box:
    """``device``'s shard as a :class:`Box` (≙ the (lower, upper,
    strides) boxes of cufftXtSetDistribution / BoxIterator). Unpacks as
    (lower, upper) for round-3 callers."""
    idx = sharding.devices_indices_map(tuple(global_shape))[device]
    lower = tuple(0 if s.start is None else int(s.start) for s in idx)
    upper = tuple(
        int(n) if s.stop is None else int(s.stop)
        for s, n in zip(idx, global_shape)
    )
    return Box(lower, upper)

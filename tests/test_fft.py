"""FFT stack oracles.

Tolerances per the reference: rel L2 < 1e-6 for f64/C2C sample-class checks
(cuFFTMp/samples/common/error_checks.hpp:61-69), < 1e-4 for complex64
(JAX_FFT/tests/fft_test.py:91).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpumathlib.core import rel_l2
from tpumathlib.fft import (
    Direction,
    DistributedFftPlan,
    FftType,
    fft_pencil,
    fft_slab,
    local_box,
    plan_1d,
    plan_2d,
    plan_3d,
    plan_many,
)
from tpumathlib.fft.distributed import ifft_pencil, ifft_slab, irfft_slab, rfft_slab
from tpumathlib.mp import Grid


def _cplx(rng, shape, dtype=np.complex64):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(dtype)


# ---------------- local plans ----------------

def test_plan_1d_c2c_roundtrip(rng):
    """≙ cuFFT/1d_c2c: forward + unnormalized inverse."""
    n, batch = 256, 4
    x = jnp.asarray(_cplx(rng, (batch, n)))
    plan = plan_1d(n, FftType.C2C, batch)
    y = plan(x)
    assert rel_l2(y, np.fft.fft(np.asarray(x), axis=-1)) < 1e-4
    # cuFFT semantics: inverse(forward(x)) == N * x
    z = plan(y, Direction.INVERSE)
    assert rel_l2(z, n * np.asarray(x)) < 1e-4


def test_plan_1d_r2c_c2r(rng):
    """≙ cuFFT/1d_r2c_c2r."""
    n = 128
    x = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    fwd = plan_1d(n, FftType.R2C)
    y = fwd(x)
    assert y.shape == (3, n // 2 + 1)
    assert rel_l2(y, np.fft.rfft(np.asarray(x), axis=-1)) < 1e-4
    bwd = plan_1d(n, FftType.C2R)
    z = bwd(y, Direction.INVERSE)
    assert rel_l2(z, n * np.asarray(x)) < 1e-4


def test_plan_2d_3d(rng):
    x2 = jnp.asarray(_cplx(rng, (32, 16)))
    assert rel_l2(plan_2d(32, 16)(x2), np.fft.fft2(np.asarray(x2))) < 1e-4
    x3 = jnp.asarray(_cplx(rng, (8, 16, 32), np.complex128))
    assert rel_l2(plan_3d(8, 16, 32)(x3), np.fft.fftn(np.asarray(x3))) < 1e-6


def test_plan_cache():
    p1 = plan_1d(64, FftType.C2C)
    p2 = plan_1d(64, FftType.C2C)
    assert p1 is p2  # cached (≙ plan reuse)


def test_callback_window(rng):
    """≙ lto_callback_window_1d: low-pass window fused as a load callback."""
    n = 128
    keep = 16
    x = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    window = jnp.where(jnp.arange(n) < keep, 1.0, 0.0)
    plan = plan_many((n,), FftType.R2C, pre=lambda v: v * window)
    y = plan(x)
    want = np.fft.rfft(np.asarray(x) * np.asarray(window))
    assert rel_l2(y, want) < 1e-4
    # post callback (store-callback analogue): scaling
    plan2 = plan_many((n,), FftType.C2C, post=lambda v: v / n)
    xz = x.astype(jnp.complex64)
    assert rel_l2(plan2(xz), np.fft.fft(np.asarray(xz)) / n) < 1e-4


def test_ortho_norm(rng):
    n = 64
    x = jnp.asarray(_cplx(rng, (n,)))
    p = plan_many((n,), FftType.C2C, norm="ortho")
    y = p(x)
    assert rel_l2(y, np.fft.fft(np.asarray(x), norm="ortho")) < 1e-4
    z = p(y, Direction.INVERSE)
    assert rel_l2(z, np.asarray(x)) < 1e-4


@pytest.mark.parametrize("norm", [None, "ortho", "backward"])
def test_norm_planar_matches_complex(rng, norm):
    """The planar (re, im) path must apply the same norm scaling as the
    complex path — both directions (regression: planar ortho-inverse and
    backward were mis-scaled)."""
    n = 64
    x = _cplx(rng, (3, n))
    p = plan_many((n,), FftType.C2C, norm=norm)
    xr = jnp.asarray(x.real, jnp.float32)
    xi = jnp.asarray(x.imag, jnp.float32)
    for direction in (Direction.FORWARD, Direction.INVERSE):
        ref = np.asarray(p(jnp.asarray(x), direction))
        pr, pi = p((xr, xi), direction)
        got = np.asarray(pr) + 1j * np.asarray(pi)
        assert rel_l2(got, ref) < 1e-4, (norm, direction)


# ---------------- distributed ----------------

@pytest.fixture(scope="module")
def grid1():
    return Grid.create(jax.devices())


@pytest.fixture(scope="module")
def grid2():
    devs = jax.devices()
    return Grid.create(devs, nprow=4, npcol=2)


def test_fft_slab_3d(grid1, rng):
    """Slab-decomposed 3D C2C vs local reference (≙ cufftmp_c2c)."""
    shape = (16, 16, 8)
    x = _cplx(rng, shape)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(grid1.mesh, P("x", None, None)))
    y = fft_slab(xs, grid1)
    assert y.sharding.spec == P(None, "x", None)
    assert rel_l2(y, np.fft.fftn(x)) < 1e-4
    # unnormalized inverse roundtrip, landing back on the input layout
    z = ifft_slab(y, grid1)
    n = float(np.prod(shape))
    assert rel_l2(z, n * x) < 1e-4


def test_fft_slab_callback(grid1, rng):
    """User kernel between stages (≙ BoxIterator scaling)."""
    shape = (8, 16, 4)
    x = _cplx(rng, shape)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(grid1.mesh, P("x", None, None)))
    y = fft_slab(xs, grid1, callback_between=lambda b: b * 2.0)
    assert rel_l2(y, 2.0 * np.fft.fftn(x)) < 1e-4


def test_fft_pencil_3d(grid2, rng):
    """Pencil-decomposed 3D C2C on a 4x2 mesh (≙ cufftmp_c2c_pencils)."""
    shape = (16, 16, 8)
    x = _cplx(rng, shape)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(grid2.mesh, P("x", "y", None)))
    y = fft_pencil(xs, grid2)
    assert y.sharding.spec == P(None, "x", "y")
    assert rel_l2(y, np.fft.fftn(x)) < 1e-4
    z = ifft_pencil(y, grid2)
    assert rel_l2(z, float(np.prod(shape)) * x) < 1e-4


def test_rfft_slab_roundtrip(grid1, rng):
    """R2C/C2R slab cycle (≙ r2c_c2r_slabs samples incl. GROMACS shape)."""
    shape = (16, 8, 8)
    x = rng.normal(size=shape).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(grid1.mesh, P("x", None, None)))
    y = rfft_slab(xs, grid1)
    assert y.shape == (16, 8, 5)
    assert rel_l2(y, np.fft.rfftn(x)) < 1e-4
    z = irfft_slab(y, grid1, nz=8)
    assert rel_l2(z, float(np.prod(shape)) * x) < 1e-4


def test_distributed_plan_api(grid1, rng):
    shape = (16, 8, 8)
    plan = DistributedFftPlan(grid1, shape, "slab")
    x = _cplx(rng, shape)
    xs = jax.device_put(jnp.asarray(x), plan.input_sharding())
    y = plan(xs)
    assert rel_l2(y, np.fft.fftn(x)) < 1e-4


def test_local_box(grid1):
    """≙ cufftXtSetDistribution boxes / BoxIterator bounds."""
    shape = (16, 8, 8)
    sh = NamedSharding(grid1.mesh, P("x", None, None))
    n = len(grid1.mesh.devices.ravel())
    boxes = [local_box(shape, sh, d) for d in grid1.mesh.devices.ravel()]
    assert boxes[0][0] == (0, 0, 0)
    assert boxes[0][1] == (16 // n, 8, 8)
    assert boxes[-1][1] == (16, 8, 8)
    # stride/iterator semantics (≙ box_iterator.hpp:44-176): local linear
    # index -> global coords + strided local position, and the vectorized
    # elementwise apply (the scaling-kernel use case)
    b0 = boxes[-1]
    assert b0.extents == (16 // n, 8, 8)
    assert b0.strides == (64, 8, 1)       # C-contiguous defaults
    i = np.arange(b0.size)
    cx, cy, cz = (np.asarray(c) for c in b0.coords(i))
    assert cx[0] == 16 - 16 // n and (cy[:8] == 0).all()
    assert list(cz[:8]) == list(range(8))
    np.testing.assert_array_equal(np.asarray(b0.position(i)), i)
    loc = jnp.arange(b0.size, dtype=jnp.float32).reshape(b0.extents)
    scaled = b0.apply(lambda v, x, y, z: v * (x + 1.0), loc)
    np.testing.assert_allclose(np.asarray(scaled)[0].ravel(),
                               np.asarray(loc)[0].ravel() * (cx[0] + 1.0))
    from tpumathlib.fft.distributed import Box

    bs = Box((0, 0), (2, 3), strides=(4, 1))   # padded rows
    assert np.asarray(bs.position(np.arange(6))).tolist() == [0, 1, 2, 4, 5, 6]


def test_fft1d_distributed(grid1, rng):
    """Distributed single-vector 1D FFT (≙ cuFFT 1d_mgpu_c2c): four-step
    with all-to-all transposes."""
    from tpumathlib.fft.distributed import fft1d_distributed

    n = 4096
    x = _cplx(rng, (n,))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(grid1.mesh, P("x")))
    y = fft1d_distributed(xs, grid1)
    assert y.sharding.spec == P("x")
    assert rel_l2(y, np.fft.fft(x)) < 1e-4
    z = fft1d_distributed(y, grid1, inverse=True)
    assert rel_l2(z, n * x) < 1e-4


def test_c2r_forward_rejected():
    """C2R plans are inverse-only; calling FORWARD must raise (this was a
    dead always-true check in round 2)."""
    import pytest

    from tpumathlib.fft.plan import Direction, FftType, plan_many

    p = plan_many((16,), FftType.C2R)
    x = jnp.ones(9, jnp.complex64)
    with pytest.raises(Exception):
        p(x, Direction.FORWARD)


def test_plan_r2c_c2r_planar(rng):
    """Chip-executable planar R2C/C2R plans (no complex dtypes anywhere):
    forward half spectrum matches np.fft.rfft; C2R inverse is the
    unnormalized cuFFT inverse."""
    from tpumathlib.fft.plan import plan_many

    for shape in ((64,), (256,), (12,)):
        n = shape[0]
        x = rng.normal(size=(6,) + shape).astype(np.float32)
        p = plan_many(shape, FftType.R2C)
        yr, yi = p(jnp.asarray(x), planar=True)
        assert yr.dtype == jnp.float32
        ref = np.fft.rfft(x, axis=-1)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4
        pc = plan_many(shape, FftType.C2R)
        z = pc((yr, yi), Direction.INVERSE)
        assert z.dtype == jnp.float32
        assert np.linalg.norm(np.asarray(z) - n * x) / np.linalg.norm(n * x) < 1e-4


def test_plan_r2c_c2r_planar_2d(rng):
    """2D planar R2C: trailing axis halved, leading axis full C2C."""
    from tpumathlib.fft.plan import plan_2d

    x = rng.normal(size=(16, 32)).astype(np.float32)
    p = plan_2d(16, 32, FftType.R2C)
    yr, yi = p(jnp.asarray(x), planar=True)
    ref = np.fft.rfftn(x)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert yr.shape == (16, 17)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4
    pc = plan_2d(16, 32, FftType.C2R)
    z = pc((yr, yi), Direction.INVERSE)
    assert np.linalg.norm(np.asarray(z) - 512 * x) / np.linalg.norm(512 * x) < 1e-4


def test_fft_slab_planar(grid1, rng):
    """Planar slab C2C — the chip-executable Mp FFT path — matches the
    complex reference and roundtrips (≙ cufftmp_c2c.cu:69-96)."""
    from tpumathlib.fft.distributed import fft_slab_planar, ifft_slab_planar

    shape = (16, 16, 8)
    x = _cplx(rng, shape)
    sh = NamedSharding(grid1.mesh, P("x", None, None))
    xr = jax.device_put(jnp.asarray(x.real, jnp.float32), sh)
    xi = jax.device_put(jnp.asarray(x.imag, jnp.float32), sh)
    yr, yi = fft_slab_planar(xr, xi, grid1)
    assert yr.sharding.spec == P(None, "x", None)
    ref = np.fft.fftn(x)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4
    zr, zi = ifft_slab_planar(yr, yi, grid1)
    nn = float(np.prod(shape))
    assert np.linalg.norm((np.asarray(zr) + 1j * np.asarray(zi)) - nn * x) \
        / (nn * np.linalg.norm(x)) < 1e-4


def test_fft_pencil_planar(grid2, rng):
    """Planar pencil C2C on a 4x2 mesh (≙ cufftmp_c2c_pencils)."""
    from tpumathlib.fft.distributed import fft_pencil_planar, ifft_pencil_planar

    shape = (16, 16, 8)
    x = _cplx(rng, shape)
    sh = NamedSharding(grid2.mesh, P("x", "y", None))
    xr = jax.device_put(jnp.asarray(x.real, jnp.float32), sh)
    xi = jax.device_put(jnp.asarray(x.imag, jnp.float32), sh)
    yr, yi = fft_pencil_planar(xr, xi, grid2)
    assert yr.sharding.spec == P(None, "x", "y")
    ref = np.fft.fftn(x)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4
    zr, zi = ifft_pencil_planar(yr, yi, grid2)
    nn = float(np.prod(shape))
    assert np.linalg.norm((np.asarray(zr) + 1j * np.asarray(zi)) - nn * x) \
        / (nn * np.linalg.norm(x)) < 1e-4


def test_rfft_slab_planar(grid1, rng):
    """Planar R2C/C2R slab cycle (≙ cufftmp r2c_c2r_slabs) — real input,
    planar half spectrum, unnormalized C2R back."""
    from tpumathlib.fft.distributed import irfft_slab_planar, rfft_slab_planar

    shape = (16, 8, 8)
    x = rng.normal(size=shape).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(grid1.mesh, P("x", None, None)))
    yr, yi = rfft_slab_planar(xs, grid1)
    assert yr.shape == (16, 8, 5)
    ref = np.fft.rfftn(x)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4
    z = irfft_slab_planar(yr, yi, grid1, nz=8)
    nn = float(np.prod(shape))
    assert np.linalg.norm(np.asarray(z) - nn * x) / (nn * np.linalg.norm(x)) < 1e-4


def test_plan_precision_bf16(rng):
    """precision="bf16" plans (≙ cuFFT half-precision C2C/R2C plans,
    cufftXtMakePlanMany with CUDA_C_16F): half the HBM plane bytes on the
    planar engines at the documented ~5e-3 rel-L2; f32 stays default."""
    from tpumathlib.fft.plan import FftType, plan_many

    x = rng.normal(size=(8, 512)).astype(np.float32)
    pr = plan_many((512,), FftType.R2C, precision="bf16")
    pc = plan_many((512,), FftType.C2R, precision="bf16")
    yr, yi = pr._fwd_planar(jnp.asarray(x))
    ref = np.fft.rfft(x)
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 2e-2
    back = np.asarray(pc._inv_planar(yr, yi), np.float64) / 512
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < 2e-2
    # C2C planar path honors it too
    pcx = plan_many((512,), FftType.C2C, precision="bf16")
    ar = jnp.asarray(x)
    ai = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))
    zr, zi = pcx._fwd_planar(ar, ai)
    refc = np.fft.fft(np.asarray(ar) + 1j * np.asarray(ai))
    gotc = np.asarray(zr, np.float64) + 1j * np.asarray(zi, np.float64)
    assert np.linalg.norm(gotc - refc) / np.linalg.norm(refc) < 2e-2
    # unknown precision rejected
    import pytest as _pytest
    with _pytest.raises(Exception):
        plan_many((512,), FftType.C2C, precision="fp8")

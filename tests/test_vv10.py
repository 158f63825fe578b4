"""VV10 nonlocal correlation oracles (≙ cuEST 4_exchange_correlation
nonlocal_xc_potential / nonlocal_xc_gradient samples).

Validation without a QC package:
- the homogeneous-electron-gas identity: β is DEFINED so the pairwise
  term cancels it for uniform ρ — ½∫ρΦ → −β as the box grows. This pins
  every constant of the implementation (ω₀, κ, β, Φ) against the
  published functional, not against our own code.
- autodiff potential vs finite differences of E_nl in the density.
- autodiff nuclear gradient vs finite differences in a coordinate, plus
  translation invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.apps import est
from tpumathlib.apps.scf import Molecule
from tpumathlib.apps.vv10 import (
    VV10Integrator,
    vv10_beta,
    vv10_gradient,
    vv10_pair_energy,
)

_H2 = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def test_vv10_heg_identity():
    """Uniform gas on a 41³ lattice: ½Σ wρΦ(center,·) = −β within box
    truncation (<1%), and the full-box E_nl/Nₑ is ≪ β."""
    h, n, rho0, b, c = 1.0, 41, 0.3, 5.9, 0.0093
    ax = (np.arange(n) - n // 2) * h
    pts = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    g = pts.shape[0]
    rho = np.full(g, rho0)
    w = np.full(g, h ** 3)
    e = float(vv10_pair_energy(jnp.asarray(rho, jnp.float64),
                               jnp.zeros(g, jnp.float64),
                               jnp.asarray(pts, jnp.float64),
                               jnp.asarray(w, jnp.float64), b, c,
                               chunk=1681))
    beta = vv10_beta(b)
    n_e = rho0 * g * h ** 3
    # edge points miss part of their neighborhoods (kernel range ~3.4
    # bohr → ~40% of the box is surface-affected); the bulk cancels
    assert 0.0 < e / n_e < 0.2 * beta, (e / n_e, beta)
    # direct center identity
    kappa = b * (1.5 * np.pi) * (rho0 / (9 * np.pi)) ** (1 / 6)
    w0 = np.sqrt(4 * np.pi * rho0 / 3)
    r2 = (pts ** 2).sum(1)
    gg = w0 * r2 + kappa
    inner = 0.5 * (h ** 3 * rho0 * (-1.5 / (gg * gg * 2 * gg))).sum()
    assert abs(inner / (-beta) - 1.0) < 0.01


def test_vv10_potential_autodiff_fd(rng):
    """V_nl = ∂E_nl/∂D from jax.grad matches finite differences."""
    shells = est.sto3g_shells(_H2)
    vvi = VV10Integrator(shells, _H2, n_rad=16, n_theta=4, n_phi=8,
                         chunk=256)
    c = rng.normal(size=(2, 1))
    d = (c @ c.T) / np.trace(c @ c.T)
    dj = jnp.asarray(d, jnp.float32)
    e, va, vb = vvi.evaluate(dj, dj)
    assert float(e) > 0.0                     # NL dispersion energy > 0
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-7)
    z = rng.normal(size=(2, 2))
    z = (z + z.T) / 2
    h = 1e-3
    ep = vvi.evaluate(jnp.asarray(d + h * z, jnp.float32), dj)[0]
    em = vvi.evaluate(jnp.asarray(d - h * z, jnp.float32), dj)[0]
    fd = (float(ep) - float(em)) / (2 * h)
    ad = float(np.sum(np.asarray(va) * z))
    assert abs(fd - ad) < 5e-3 * max(abs(fd), 1e-6), (fd, ad)


def test_vv10_pallas_kernel_matches_xla(rng):
    """The fused Pallas pairwise core (dx/vv10.py) reproduces the XLA
    formulation's energy AND hand-derived-VJP gradients on an unpadded-
    size grid with masked (ρ→0) points."""
    from tpumathlib.apps.vv10 import vv10_pair_energy
    from tpumathlib.dx.vv10 import vv10_pair_energy_pallas

    g = 1500
    rho = jnp.asarray(rng.uniform(0.01, 0.5, g), jnp.float32)
    rho = rho.at[::17].set(1e-12)           # exercise the ρ-mask
    s2 = jnp.asarray(rng.uniform(0, 0.1, g), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(g, 3)) * 3, jnp.float32)
    w = jnp.asarray(rng.uniform(0.001, 0.02, g), jnp.float32)
    f_ref = lambda *a: vv10_pair_energy(*a, 5.9, 0.0093, chunk=500)
    f_new = lambda *a: vv10_pair_energy_pallas(*a, 5.9, 0.0093)
    e_ref, gr = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3))(
        rho, s2, pts, w)
    e_new, gn = jax.value_and_grad(f_new, argnums=(0, 1, 2, 3))(
        rho, s2, pts, w)
    assert abs(float(e_ref) - float(e_new)) < 1e-7 * abs(float(e_ref))
    for a, b in zip(gr, gn):
        scale = max(float(jnp.abs(a).max()), 1e-30)
        assert float(jnp.abs(a - b).max()) < 1e-5 * scale

    # integrator engine knob end-to-end
    shells = est.sto3g_shells(_H2)
    c = rng.normal(size=(2, 1))
    d = (c @ c.T) / np.trace(c @ c.T)
    vx = VV10Integrator(shells, _H2, n_rad=14, n_theta=4, n_phi=8,
                        chunk=128)
    vp = VV10Integrator(shells, _H2, n_rad=14, n_theta=4, n_phi=8,
                        engine="pallas")
    ex, vax, _ = vx.evaluate(d, d)
    ep, vap, _ = vp.evaluate(d, d)
    assert abs(float(ex) - float(ep)) < 1e-6 * max(abs(float(ex)), 1e-12)
    np.testing.assert_allclose(np.asarray(vap), np.asarray(vax),
                               rtol=0, atol=1e-6)


def test_rks_with_nlc_converges(rng):
    """rks(..., nlc=True) self-consistently couples VV10 into the Fock
    build: converges, and E(NLC) > E(no NLC) by a small positive
    dispersion-scale amount (VV10's E_nl > 0 at these densities)."""
    from tpumathlib.apps.xc import rks

    kw = dict(grid_kw=dict(n_rad=20, n_theta=6, n_phi=12),
              max_iters=60, conv=1e-7)
    e0, _, _ = rks(_H2, xc="pbe", **kw)
    e1, _, _ = rks(_H2, xc="pbe", nlc=True,
                   nlc_grid_kw=dict(n_rad=14, n_theta=4, n_phi=8,
                                    chunk=128), **kw)
    assert 1e-5 < (e1 - e0) < 5e-2, (e0, e1)


def test_vv10_nuclear_gradient_fd(rng):
    """jax.grad through grid+AOs+pairwise kernel vs finite differences,
    and Σ_atoms ∇E = 0 (translation invariance)."""
    shells = est.sto3g_shells(_H2)
    c = rng.normal(size=(2, 1))
    d = (c @ c.T) / np.trace(c @ c.T)
    kw = dict(n_rad=14, n_theta=4, n_phi=8, chunk=128)
    g = vv10_gradient(_H2, d, d, shells=shells, **kw)
    assert np.abs(g.sum(axis=0)).max() < 1e-8          # translation inv.
    h = 2e-3
    for (atom, axis) in ((1, 2), (0, 2)):
        cp = _H2.coords.copy()
        cp[atom, axis] += h
        cm = _H2.coords.copy()
        cm[atom, axis] -= h

        def e_at(coords):
            m = Molecule(_H2.symbols, coords)
            sh = est.sto3g_shells(m)
            vvi = VV10Integrator(sh, m, n_rad=kw["n_rad"],
                                 n_theta=kw["n_theta"], n_phi=kw["n_phi"],
                                 chunk=kw["chunk"])
            return float(vvi.evaluate(jnp.asarray(d, jnp.float32),
                                      jnp.asarray(d, jnp.float32))[0])

        fd = (e_at(cp) - e_at(cm)) / (2 * h)
        assert abs(fd - g[atom, axis]) < 3e-4 * max(abs(fd), 1e-3), \
            (atom, axis, fd, g[atom, axis])

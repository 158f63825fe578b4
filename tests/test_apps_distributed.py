"""Distributed cuEST tier: mesh-sharded DF J/K and XC vs the
single-device oracles (≙ cuEST basic_multigpu_usage — one handle per
device — re-expressed as SPMD over a jax Mesh). Runs on the 8-device
virtual CPU mesh from conftest."""

import jax
import numpy as np
import pytest

from tpumathlib.apps import est
from tpumathlib.apps.distributed import DistributedDF, DistributedXC
from tpumathlib.apps.scf import Molecule
from tpumathlib.apps.xc import XCIntegrator

_H2 = Molecule(["H", "H"], np.array([[0., 0., 0.], [0., 0., 1.4]]))
_H2O = Molecule(
    ["O", "H", "H"],
    np.array([[0.0, 0.0, -0.143225816552],
              [0.0, 1.638036840407, 1.136548822547],
              [0.0, -1.638036840407, 1.136548822547]]))


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _random_density(n, rng):
    c = rng.normal(size=(n, 5))
    d = c @ c.T
    return (d / np.trace(d)).astype(np.float64)


def test_distributed_df_jk_matches_single_device(rng):
    """J/K from the aux-sharded fit tensor == single-device DFTensors
    (same contractions, one psum) across every mesh size that divides 8."""
    shells = est.sto3g_shells(_H2O)
    df = est.DFTensors(shells)
    d = _random_density(df.b_np.shape[0], rng)
    j_ref = np.asarray(df.coulomb(d), np.float64)
    k_ref = np.asarray(df.exchange(d), np.float64)

    from jax.sharding import Mesh

    for ndev in (8, 4, 1):
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("aux",))
        ddf = DistributedDF(df, mesh)
        np.testing.assert_allclose(np.asarray(ddf.coulomb(d)), j_ref,
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ddf.exchange(d)), k_ref,
                                   rtol=0, atol=2e-5)


def test_distributed_xc_matches_single_device(rng):
    """Grid-sharded XC quadrature == XCIntegrator.evaluate for both an
    LDA (svwn) and a GGA (pbe) functional, including the autodiff
    potential matrices."""
    shells = est.sto3g_shells(_H2O)
    d = _random_density(7, rng)
    for xc in ("svwn", "pbe", "r2scan"):
        integ = XCIntegrator(shells, _H2O, xc=xc, n_rad=20, n_theta=6,
                             n_phi=12)
        exc_ref, va_ref, vb_ref = integ.evaluate(d, d)
        dxc = DistributedXC(integ)
        exc, va, vb = dxc.evaluate(d, d)
        assert abs(float(exc) - float(exc_ref)) < 5e-5 * max(
            1.0, abs(float(exc_ref)))
        np.testing.assert_allclose(np.asarray(va), np.asarray(va_ref),
                                   rtol=0, atol=5e-5)
        np.testing.assert_allclose(np.asarray(vb), np.asarray(vb_ref),
                                   rtol=0, atol=5e-5)


def test_distributed_vv10_matches_single_device(rng):
    """Mesh-sharded VV10 pairwise kernel == single-device VV10Integrator
    (energy and autodiff potential through the shard_map collectives)."""
    from tpumathlib.apps.distributed import DistributedVV10
    from tpumathlib.apps.vv10 import VV10Integrator

    shells = est.sto3g_shells(_H2)
    vvi = VV10Integrator(shells, _H2, n_rad=14, n_theta=4, n_phi=8,
                         chunk=128)
    d = _random_density(2, rng)
    e_ref, va_ref, _ = vvi.evaluate(d, d)
    dv = DistributedVV10(vvi)
    e, va, vb = dv.evaluate(d, d)
    assert abs(float(e) - float(e_ref)) < 1e-6 * max(1.0, abs(float(e_ref)))
    np.testing.assert_allclose(np.asarray(va), np.asarray(va_ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                               rtol=0, atol=1e-7)


def test_distributed_df_padding_exactness(rng):
    """naux not divisible by the mesh size: the zero-padded B panes must
    contribute exactly nothing (bitwise-zero contributions)."""
    from jax.sharding import Mesh

    shells = est.sto3g_shells(_H2O)
    df = est.DFTensors(shells)
    naux = df.b_np.shape[2]
    # pick a mesh size that does NOT divide naux so zero panes are real
    ndev = next(d for d in (8, 7, 6, 5, 3, 2) if naux % d != 0)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("aux",))
    d = np.eye(df.b_np.shape[0])
    ddf = DistributedDF(df, mesh)
    assert ddf.b.shape[2] > naux          # padding actually engaged
    j1 = np.asarray(ddf.coulomb(d))
    j2 = np.asarray(df.coulomb(d.astype(np.float32)))
    np.testing.assert_allclose(j1, j2, rtol=0, atol=2e-5)

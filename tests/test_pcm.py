"""PCM (smooth C-PCM / SWIG) oracles.

≙ cuEST/python_examples/6_pcm/pcm_potential/run.py (potential matrix +
dielectric energy + CG convergence queries) and pcm_gradients/run.py.
"""

import numpy as np

from tpumathlib.apps import est
from tpumathlib.apps.pcm import PCMPlan, pcm_gradient, rhf_pcm
from tpumathlib.apps.scf import Molecule

H2O = Molecule(["O", "H", "H"], np.array([
    [0.0, 0.0, 0.2217],
    [0.0, 1.4309, -0.8867],
    [0.0, -1.4309, -0.8867]]))


def test_born_ion_limit():
    """Single cavity sphere + bare nuclear charge → the classical Born
    solvation energy −½·f·Z²/R (discretization at the ~1% level)."""
    mol = Molecule(["He"], np.zeros((1, 3)), charge=2)
    plan = PCMPlan(mol, epsilon=80.0)
    n = est.nbf(plan.shells)
    q, v_pcm, res = plan.potential_compute(np.zeros((n, n)))
    r_cav = 1.2 * 1.40 / 0.52917720859
    born = -0.5 * plan.f * 4.0 / r_cav
    assert res.converged
    np.testing.assert_allclose(res.dielectric_energy, born, rtol=0.02)
    # total induced charge ≈ −f·Z (Gauss's law on the conductor limit)
    np.testing.assert_allclose(float(np.sum(np.asarray(q))),
                               -plan.f * 2.0, rtol=0.02)


def test_potential_compute_random_density():
    """The reference sample's exact scenario: a random symmetric density
    stand-in, PCG-converged charges, symmetric PCM potential matrix."""
    plan = PCMPlan(H2O, epsilon=80.0)
    rng = np.random.default_rng(0)
    n = est.nbf(plan.shells)
    d = rng.standard_normal((n, n))
    d = 0.5 * (d + d.T)
    q, v_pcm, res = plan.potential_compute(d)
    assert res.converged and res.iterations < plan.max_iters
    assert res.residual < plan.tol
    v = np.asarray(v_pcm)
    np.testing.assert_allclose(v, v.T, atol=1e-10)
    # energy consistency: E = ½ qᵀ v(D)
    np.testing.assert_allclose(
        res.dielectric_energy, plan.dielectric_energy(d, q), atol=1e-12)
    # warm start from the converged charges → immediate convergence
    _, _, res2 = plan.potential_compute(d, in_q=q)
    assert res2.iterations <= 1


def test_rhf_pcm_water_stabilized():
    e_gas, _, _ = est.rhf(H2O)
    e_solv, _, _, res = rhf_pcm(H2O, epsilon=80.0)
    assert res.converged
    # dielectric stabilization of a polar solute: negative, few–15 mHa at
    # this cavity/basis
    assert -0.030 < e_solv - e_gas < -0.001


def test_pcm_gradient_fd():
    """Analytic dE_diel/dR vs finite differences at fixed density (the
    energy is variational in q, so re-solving per geometry matches the
    fixed-q derivative)."""
    mol = Molecule(["O", "H", "H"], H2O.coords)
    # the gradient identity is first-order in the PCG residual — tight tol
    plan = PCMPlan(mol, tol=1e-12)
    n = est.nbf(plan.shells)
    rng = np.random.default_rng(1)
    d = rng.standard_normal((n, n)) * 0.1
    d = 0.5 * (d + d.T) + np.eye(n) * 0.4
    g = pcm_gradient(mol, d, plan)
    np.testing.assert_allclose(g.sum(0), 0.0, atol=1e-8)
    h = 1e-5
    for a, ax in [(0, 2), (1, 1), (2, 0)]:

        def e_at(coords):
            m2 = Molecule(mol.symbols, coords)
            p2 = PCMPlan(m2, tol=1e-12)
            q2, _, r2 = p2.potential_compute(d)
            return r2.dielectric_energy

        cp = np.asarray(mol.coords, float).copy()
        cp[a, ax] += h
        cm = np.asarray(mol.coords, float).copy()
        cm[a, ax] -= h
        fd = (e_at(cp) - e_at(cm)) / (2 * h)
        np.testing.assert_allclose(g[a, ax], fd, atol=5e-7)


def test_rhf_pcm_gradient_fd():
    """Full solvated-SCF nuclear gradient (Pulay + coupled dielectric
    terms) against central differences of the rhf_pcm total energy
    (≙ 6_pcm/pcm_gradients/run.py carried through the full SCF
    gradient)."""
    from tpumathlib.apps.deriv import rhf_pcm_gradient

    kw = dict(max_iters=500, conv=1e-12)
    g = rhf_pcm_gradient(H2O, epsilon=80.0,
                         scf=rhf_pcm(H2O, 80.0, **kw))
    h = 1e-3
    for ia, ax in ((0, 2), (1, 1)):
        cp = H2O.coords.copy()
        cp[ia, ax] += h
        cm = H2O.coords.copy()
        cm[ia, ax] -= h
        ep = rhf_pcm(Molecule(H2O.symbols, cp), 80.0, **kw)[0]
        em = rhf_pcm(Molecule(H2O.symbols, cm), 80.0, **kw)[0]
        np.testing.assert_allclose(g[ia, ax], (ep - em) / (2 * h),
                                   atol=2e-6)

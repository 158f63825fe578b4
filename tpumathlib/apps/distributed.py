"""Distributed quantum-chemistry tier — mesh-sharded DF J/K and XC.

Reference parity: cuEST's multi-device surface —
``c_examples/examples/0_context/basic_multigpu_usage/main.c:36-110`` (one
cuEST handle per GPU, pthreads) and ``basic_multistream_usage`` — plus the
DF J/K and XC compute areas those handles feed
(``3_density_fitting/core_df_jk/``, ``4_exchange_correlation/``). On TPU
the handle-per-device model collapses into SPMD over one
``jax.sharding.Mesh``: the two heavy SCF contractions are data-parallel
along an enormous axis (the auxiliary fit dimension P for DF J/K; the
quadrature points g for XC), so each device holds a slab of the big
tensor, contracts it locally, and ONE psum per quantity rides ICI.

Design (shard_map, explicit collectives):

- ``DistributedDF``: B^{μν}_P sharded over P.
  J: g_P = Σ_{μν} B_P^{μν} D_{μν} is per-P (no comm);
     J = psum_P(Σ_{P local} B_P g_P).
  K: K = psum_P(Σ_{P local} (B_P D) B_Pᵀ).
  Both are a single psum of an (nao, nao) matrix per call.
- ``DistributedXC``: AO values/gradients + weights sharded over grid
  points; each device runs the same local functional-autodiff quadrature
  (`apps.xc.xc_local_eval`), then (E_xc, V_a, V_b) are psum'd.

Zero padding makes the sharded axes divisible: zero B panes and
zero-weight/zero-AO grid points contribute exactly 0 to every sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from tpumathlib.apps.est import DFTensors
from tpumathlib.apps.xc import XCIntegrator, xc_local_eval


def _default_mesh(mesh: Mesh | None) -> Mesh:
    if mesh is not None:
        return mesh
    devs = jax.devices()
    return Mesh(np.array(devs), ("aux",))


def _pad_to(x: np.ndarray, axis: int, mult: int) -> np.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    width = [(0, 0)] * x.ndim
    width[axis] = (0, pad)
    return np.pad(x, width)


class DistributedDF:
    """DF J/K with the fit tensor sharded over the auxiliary dimension.

    Drop-in for ``DFTensors.coulomb/exchange`` (same math, same einsums),
    but ``b`` lives distributed: (nao, nao, naux_local) per device. The
    density is replicated (it is (nao, nao)-small); each J/K call does the
    local MXU contractions plus one psum.
    """

    def __init__(self, df: DFTensors, mesh: Mesh | None = None,
                 axis: str = "aux"):
        self.mesh = _default_mesh(mesh)
        self.axis = axis if mesh is not None else "aux"
        ndev = self.mesh.shape[self.axis]
        b = _pad_to(np.asarray(df.b_np, np.float32), 2, ndev)
        self.b = jax.device_put(
            jnp.asarray(b),
            NamedSharding(self.mesh, P(None, None, self.axis)))
        spec_b = P(None, None, self.axis)
        spec_r = P(None, None)

        @jax.jit
        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(spec_b, spec_r), out_specs=spec_r)
        def _coulomb(b_loc, d):
            g = jnp.einsum("mnp,mn->p", b_loc, d)
            j = jnp.einsum("mnp,p->mn", b_loc, g)
            return jax.lax.psum(j, self.axis)

        @jax.jit
        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(spec_b, spec_r), out_specs=spec_r)
        def _exchange(b_loc, d):
            bd = jnp.einsum("mlp,ls->msp", b_loc, d)
            k = jnp.einsum("msp,nsp->mn", bd, b_loc)
            return jax.lax.psum(k, self.axis)

        self._coulomb = _coulomb
        self._exchange = _exchange

    def coulomb(self, d):
        """J_{μν} = Σ_P B_P^{μν} (Σ_{λσ} B_P^{λσ} D_{λσ}) — one psum."""
        return self._coulomb(self.b, jnp.asarray(d, jnp.float32))

    def exchange(self, d):
        """K_{μν} = Σ_P Σ_{λσ} B_P^{μλ} D_{λσ} B_P^{νσ} — one psum."""
        return self._exchange(self.b, jnp.asarray(d, jnp.float32))


class DistributedXC:
    """Grid-sharded XC quadrature: each device holds a slab of grid
    points (AO values, GGA gradients, weights) and evaluates the same
    functional + autodiff potential as ``XCIntegrator.evaluate``; the
    scalar E_xc and (nao, nao) V matrices are psum'd.

    Padding points carry zero weight AND zero AO values, so their ρ=0
    rows are excluded by the quadrature mask and contribute nothing.
    """

    def __init__(self, integ: XCIntegrator, mesh: Mesh | None = None,
                 axis: str = "aux"):
        self.mesh = _default_mesh(mesh)
        self.axis = axis if mesh is not None else "aux"
        ndev = self.mesh.shape[self.axis]
        self.kind, self.f = integ.kind, integ.f
        ao = _pad_to(np.asarray(integ.ao_np, np.float32), 0, ndev)
        w = _pad_to(np.asarray(integ.w_np, np.float32), 0, ndev)
        shard = lambda a, spec: jax.device_put(
            jnp.asarray(a), NamedSharding(self.mesh, spec))
        self.ao = shard(ao, P(self.axis, None))
        self.w = shard(w, P(self.axis))
        if self.kind in ("gga", "mgga"):
            grad = _pad_to(np.asarray(integ.grad_np, np.float32), 1, ndev)
            self.grad = shard(grad, P(None, self.axis, None))
            in_specs = (P(self.axis, None), P(None, self.axis, None),
                        P(self.axis), P(None, None), P(None, None))
        else:
            self.grad = None
            in_specs = (P(self.axis, None), P(self.axis),
                        P(None, None), P(None, None))
        rep = P()

        if self.kind in ("gga", "mgga"):
            @jax.jit
            @functools.partial(shard_map, mesh=self.mesh,
                               in_specs=in_specs,
                               out_specs=(rep, P(None, None), P(None, None)))
            def _eval(ao_l, grad_l, w_l, da, db):
                exc, va, vb = xc_local_eval(self.kind, self.f, ao_l,
                                            grad_l, w_l, da, db)
                return (jax.lax.psum(exc, self.axis),
                        jax.lax.psum(va, self.axis),
                        jax.lax.psum(vb, self.axis))

            self._eval = lambda da, db: _eval(self.ao, self.grad, self.w,
                                              da, db)
        else:
            @jax.jit
            @functools.partial(shard_map, mesh=self.mesh,
                               in_specs=in_specs,
                               out_specs=(rep, P(None, None), P(None, None)))
            def _eval(ao_l, w_l, da, db):
                exc, va, vb = xc_local_eval(self.kind, self.f, ao_l,
                                            None, w_l, da, db)
                return (jax.lax.psum(exc, self.axis),
                        jax.lax.psum(va, self.axis),
                        jax.lax.psum(vb, self.axis))

            self._eval = lambda da, db: _eval(self.ao, self.w, da, db)

    def evaluate(self, da, db):
        """(E_xc, V_a, V_b), numerically matching the single-device
        ``XCIntegrator.evaluate`` on the same grid."""
        return self._eval(jnp.asarray(da, jnp.float32),
                          jnp.asarray(db, jnp.float32))


class DistributedVV10:
    """Mesh-sharded VV10 nonlocal correlation — the O(G²) pairwise kernel
    is the natural multi-device workload of the chemistry tier (≙ the
    reference's nonlocal_xc_potential running on the multigpu handles).

    Sharding: grid points (AO values/gradients/weights/positions) are
    row-sharded. Each device computes its LOCAL per-point (ωρ, ω₀, κ)
    channel values, all_gathers the j-side per-point vectors (4 floats per
    point — negligible traffic), contracts its own i-rows against the full
    j-set on the MXU, and one psum reduces E_nl. The potential matrices
    come from jax.grad THROUGH the shard_map (collectives are
    differentiable), exactly matching the single-device
    `apps.vv10.VV10Integrator`."""

    def __init__(self, integ, mesh: Mesh | None = None, axis: str = "aux",
                 chunk: int = 512):
        from tpumathlib.apps.vv10 import vv10_beta

        self.mesh = _default_mesh(mesh)
        self.axis = axis if mesh is not None else "aux"
        ndev = self.mesh.shape[self.axis]
        self.b, self.c = integ.b, integ.c
        self.beta = vv10_beta(integ.b)
        # pad so every device's local block is a whole number of chunks
        # (the per-device pairwise work is lax.map'd chunk by chunk — no
        # (G_local, G_total) matrix is ever materialized at once)
        g0 = np.asarray(integ.w).shape[0]
        chunk = min(chunk, -(-g0 // ndev))
        mult = ndev * chunk
        ao = _pad_to(np.asarray(integ.ao, np.float32), 0, mult)
        grad = _pad_to(np.asarray(integ.grad, np.float32), 1, mult)
        w = _pad_to(np.asarray(integ.w, np.float32), 0, mult)
        pts = _pad_to(np.asarray(integ.pts, np.float32), 0, mult)
        shard = lambda a, spec: jax.device_put(
            jnp.asarray(a), NamedSharding(self.mesh, spec))
        self.ao = shard(ao, P(self.axis, None))
        self.grad = shard(grad, P(None, self.axis, None))
        self.w = shard(w, P(self.axis))
        self.pts = shard(pts, P(self.axis, None))
        axis_name = self.axis
        b, c, beta = self.b, self.c, self.beta

        def local_e(ao_l, grad_l, w_l, pts_l, da, db):
            dt = da + db
            rho = jnp.einsum("gm,mn,gn->g", ao_l, dt, ao_l)
            gr = 2.0 * jnp.einsum("xgm,mn,gn->xg", grad_l, dt, ao_l)
            s2 = jnp.einsum("xg,xg->g", gr, gr)
            good = rho > 1e-9
            rs = jnp.where(good, rho, 1.0)
            w0 = jnp.sqrt(c * (s2 / (rs * rs)) ** 2
                          + (4.0 * jnp.pi) * rs / 3.0)
            kappa = b * (1.5 * jnp.pi) * (rs / (9.0 * jnp.pi)) ** (1.0 / 6.0)
            wr = jnp.where(good, w_l * rho, 0.0)
            # j-side channel vectors, gathered across the mesh
            w0_all = jax.lax.all_gather(w0, axis_name, tiled=True)
            k_all = jax.lax.all_gather(kappa, axis_name, tiled=True)
            wr_all = jax.lax.all_gather(wr, axis_name, tiled=True)
            pts_all = jax.lax.all_gather(pts_l, axis_name, tiled=True)
            nrm_all = jnp.sum(pts_all * pts_all, axis=1)

            # remat, as in vv10_pair_energy: without it the lax.map scan
            # saves O(G²/devices) Φ intermediates for the backward pass
            @jax.checkpoint
            def block(args):
                pi, w0i, ki, wri = args
                # HIGHEST: the MXU's DEFAULT bf16 demotion costs 2e-4 in
                # grad[rho] on chip (see apps/vv10.py vv10_pair_energy)
                hi = jax.lax.Precision.HIGHEST
                r2 = jnp.maximum(jnp.sum(pi * pi, 1)[:, None]
                                 + nrm_all[None, :]
                                 - 2.0 * jnp.dot(pi, pts_all.T,
                                                 precision=hi), 0.0)
                gi = w0i[:, None] * r2 + ki[:, None]
                gj = w0_all[None, :] * r2 + k_all[None, :]
                phi = -1.5 / (gi * gj * (gi + gj))
                return jnp.sum(wri * jnp.dot(phi, wr_all, precision=hi))

            inner = jax.lax.map(
                block, (pts_l.reshape(-1, chunk, 3),
                        w0.reshape(-1, chunk), kappa.reshape(-1, chunk),
                        wr.reshape(-1, chunk)))
            e_loc = beta * jnp.sum(wr) + 0.5 * jnp.sum(inner)
            return jax.lax.psum(e_loc, axis_name)

        sm = shard_map(
            local_e, mesh=self.mesh,
            in_specs=(P(self.axis, None), P(None, self.axis, None),
                      P(self.axis), P(self.axis, None), P(None, None),
                      P(None, None)),
            out_specs=P())

        @jax.jit
        def _eval(ao_l, grad_l, w_l, pts_l, da, db):
            e, (va, vb) = jax.value_and_grad(
                lambda x, y: sm(ao_l, grad_l, w_l, pts_l, x, y),
                argnums=(0, 1))(da, db)
            return e, 0.5 * (va + va.T), 0.5 * (vb + vb.T)

        self._eval = _eval

    def evaluate(self, da, db):
        return self._eval(self.ao, self.grad, self.w, self.pts,
                          jnp.asarray(da, jnp.float32),
                          jnp.asarray(db, jnp.float32))

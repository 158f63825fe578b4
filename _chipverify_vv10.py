"""On-chip verification of the fused Pallas VV10 kernel (dx/vv10.py):
1) energy + all four gradients vs the XLA formulation (apps/vv10.py),
2) A/B timing at a production-scale grid (amortized fori_loop chain).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from tpumathlib.apps.vv10 import vv10_pair_energy
from tpumathlib.dx.vv10 import vv10_pair_energy_pallas

print("backend:", jax.default_backend())
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)
g = 1500
rho = jnp.asarray(rng.uniform(0.01, 0.5, g), jnp.float32)
rho = rho.at[::17].set(1e-12)
s2 = jnp.asarray(rng.uniform(0, 0.1, g), jnp.float32)
pts = jnp.asarray(rng.normal(size=(g, 3)) * 3, jnp.float32)
w = jnp.asarray(rng.uniform(0.001, 0.02, g), jnp.float32)

f_ref = jax.jit(lambda *a: vv10_pair_energy(*a, 5.9, 0.0093, chunk=500))
f_new = jax.jit(lambda *a: vv10_pair_energy_pallas(*a, 5.9, 0.0093))

e_ref, gr = jax.jit(jax.value_and_grad(
    lambda *a: vv10_pair_energy(*a, 5.9, 0.0093, chunk=500),
    argnums=(0, 1, 2, 3)))(rho, s2, pts, w)
e_new, gn = jax.jit(jax.value_and_grad(
    lambda *a: vv10_pair_energy_pallas(*a, 5.9, 0.0093),
    argnums=(0, 1, 2, 3)))(rho, s2, pts, w)
e_ref, e_new = float(e_ref), float(e_new)
print("E ref/new:", e_ref, e_new, "rel", abs(e_ref - e_new) / abs(e_ref))
assert abs(e_ref - e_new) < 1e-5 * abs(e_ref), (e_ref, e_new)
names = ["rho", "s2", "pts", "w"]
for nm, a, b in zip(names, gr, gn):
    scale = max(float(jnp.abs(a).max()), 1e-30)
    err = float(jnp.abs(a - b).max()) / scale
    print(f"grad[{nm}] rel-max err: {err:.3e}")
    assert err < 5e-5, (nm, err)
print("CORRECTNESS OK")

# --- A/B timing at production scale -----------------------------------
G = 40960  # ~a mid-size molecule's pruned grid
rho = jnp.asarray(rng.uniform(0.01, 0.5, G), jnp.float32)
s2 = jnp.asarray(rng.uniform(0, 0.1, G), jnp.float32)
pts = jnp.asarray(rng.normal(size=(G, 3)) * 3, jnp.float32)
w = jnp.asarray(rng.uniform(0.001, 0.02, G), jnp.float32)


def timed(f, iters, *args):
    @jax.jit
    def chain(*a):
        def body(i, acc):
            return acc + f(*a) * (1.0 + 0.0 * acc)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    chain(*args).block_until_ready()
    t0 = time.perf_counter()
    out = float(chain(*args))
    t1 = time.perf_counter()
    return (t1 - t0) / iters, out


for label, f, chunk in [
    ("xla chunk=4096", lambda *a: vv10_pair_energy(*a, 5.9, 0.0093, chunk=4096), None),
    ("pallas", lambda *a: vv10_pair_energy_pallas(*a, 5.9, 0.0093), None),
]:
    dt, out = timed(f, 20, rho, s2, pts, w)
    pairs = G * G
    print(f"{label}: {dt*1e3:.3f} ms/eval  ({pairs/dt/1e9:.1f} Gpairs/s)  E={out/20:.6f}")

# grad A/B (the SCF hotspot is value_and_grad for the potential)
for label, f in [
    ("xla grad", jax.value_and_grad(lambda *a: vv10_pair_energy(*a, 5.9, 0.0093, chunk=4096), argnums=(0, 1, 2, 3))),
    ("pallas grad", jax.value_and_grad(lambda *a: vv10_pair_energy_pallas(*a, 5.9, 0.0093), argnums=(0, 1, 2, 3))),
]:
    def g2(*a, _f=f):
        v, gs = _f(*a)
        return v + sum(jnp.sum(x) for x in gs)
    dt, out = timed(g2, 10, rho, s2, pts, w)
    print(f"{label}: {dt*1e3:.3f} ms/eval")
print("DONE")

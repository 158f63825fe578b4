"""Diagnose the 2e-4 grad[rho] chip delta: compare chip-pallas AND chip-XLA
each against a CPU float64 oracle of the same quantities."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
from tpumathlib.apps.vv10 import vv10_pair_energy
from tpumathlib.dx.vv10 import vv10_pair_energy_pallas

rng = np.random.default_rng(0)
g = 1500
rho = rng.uniform(0.01, 0.5, g); rho[::17] = 1e-12
s2 = rng.uniform(0, 0.1, g)
pts = rng.normal(size=(g, 3)) * 3
w = rng.uniform(0.001, 0.02, g)

# ---- CPU f64 oracle (numpy) ----
def oracle(rho, s2, pts, w, b=5.9, c=0.0093):
    good = rho > 1e-9
    rs = np.where(good, rho, 1.0)
    wg2 = c * (s2 / (rs * rs)) ** 2
    wp2 = 4 * np.pi * rs
    w0 = np.sqrt(wg2 + wp2 / 3.0)
    kappa = b * 1.5 * np.pi * (rs / (9 * np.pi)) ** (1 / 6)
    wr = np.where(good, w * rho, 0.0)
    d = pts[:, None, :] - pts[None, :, :]
    r2 = np.sum(d * d, axis=-1)
    gi = w0[:, None] * r2 + kappa[:, None]
    gj = w0[None, :] * r2 + kappa[None, :]
    phi = -1.5 / (gi * gj * (gi + gj))
    from tpumathlib.apps.vv10 import vv10_beta
    beta = vv10_beta(b)
    inner = phi @ wr
    e = beta * wr.sum() + 0.5 * np.sum(wr * inner)
    return e, inner

e64, inner64 = oracle(rho, s2, pts, w)
print("oracle E:", e64)

a = [jnp.asarray(x, jnp.float32) for x in (rho, s2, pts, w)]

# grads on chip, both engines, and the f64 grad via CPU jax
f_x = lambda *z: vv10_pair_energy(*z, 5.9, 0.0093, chunk=500)
f_p = lambda *z: vv10_pair_energy_pallas(*z, 5.9, 0.0093)
gx = jax.jit(jax.grad(f_x, argnums=(0,)))(*a)[0]
gp = jax.jit(jax.grad(f_p, argnums=(0,)))(*a)[0]

# f64 oracle gradient wrt rho by finite structure: use CPU jax x64
import subprocess, sys, pickle, os
code = r'''
import numpy as np, pickle, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from tpumathlib.apps.vv10 import vv10_pair_energy
with open("/tmp/vv10_in.pkl","rb") as f: rho, s2, pts, w = pickle.load(f)
a = [jnp.asarray(x, jnp.float64) for x in (rho, s2, pts, w)]
g = jax.grad(lambda *z: vv10_pair_energy(*z, 5.9, 0.0093, chunk=500), argnums=(0,))(*a)[0]
np.save("/tmp/vv10_g64.npy", np.asarray(g))
'''
with open("/tmp/vv10_in.pkl", "wb") as f:
    pickle.dump((rho, s2, pts, w), f)
subprocess.run([sys.executable, "-c", code], check=True, cwd="/tmp")
g64 = np.load("/tmp/vv10_g64.npy")

sc = np.abs(g64).max()
for nm, gg in [("chip-XLA", gx), ("chip-pallas", gp)]:
    err = np.abs(np.asarray(gg, np.float64) - g64).max() / sc
    print(f"{nm} vs f64 oracle grad[rho] rel-max: {err:.3e}")
err_ab = np.abs(np.asarray(gx, np.float64) - np.asarray(gp, np.float64)).max() / sc
print(f"chip-XLA vs chip-pallas: {err_ab:.3e}")

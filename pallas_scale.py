import time
import numpy as np, jax, jax.numpy as jnp
from compton2d_tpu.transport import flight_pallas as fpk
n = 1 << 17; nz, nr = 8, 4
rng = np.random.default_rng(0)
phi = rng.uniform(0, 2*np.pi, n)
args = dict(
  e=jnp.asarray(rng.uniform(1.0, 10.0, n), jnp.float32),
  w=jnp.ones(n, jnp.float32), w0=jnp.ones(n, jnp.float32),
  r=jnp.asarray(rng.uniform(0.1, 0.9, n), jnp.float32),
  z=jnp.asarray(rng.uniform(0.1, 0.9, n), jnp.float32),
  mu=jnp.asarray(rng.uniform(-1, 1, n), jnp.float32),
  cphi=jnp.asarray(np.cos(phi), jnp.float32),
  sphi=jnp.asarray(np.sin(phi), jnp.float32),
  dcen=jnp.full(n, 2.0, jnp.float32),
  jz=jnp.asarray(rng.integers(0, nz, n), jnp.int32),
  kr=jnp.asarray(rng.integers(0, nr, n), jnp.int32),
  alive=jnp.ones(n, bool),
  sk=jnp.asarray(rng.uniform(0.5, 2.0, (n, nz*nr*2)), jnp.float32),
  r_edges=jnp.asarray(np.linspace(0, 1, nr+1), jnp.float32),
  z_edges=jnp.asarray(np.linspace(0, 1, nz+1), jnp.float32),
  seeds=jnp.arange(n // fpk.TILE, dtype=jnp.int32),
)
def call(mi):
    return fpk.flight_rounds(
        args["e"],args["w"],args["w0"],args["r"],args["z"],args["mu"],
        args["cphi"],args["sphi"],args["dcen"],args["jz"],args["kr"],
        args["alive"],args["sk"],args["r_edges"],args["z_edges"],args["seeds"],
        nz=nz,nr=nr,pair_switch=False,weight_floor=1e-10,max_iters=mi)
for mi in (256,):
    t0=time.time(); out = call(mi); jax.block_until_ready(out[0])
    print("max_iters",mi,"compile+run",round(time.time()-t0,1),flush=True)
    t0=time.time(); out = call(mi); jax.block_until_ready(out[0])
    print("max_iters",mi,"run",round(time.time()-t0,3),flush=True)
    print("flags:",np.bincount(np.asarray(out[9]),minlength=3),flush=True)

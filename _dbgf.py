import os
cpu = bool(int(os.environ.get("DBG_CPU", 0)))
if cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if cpu:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
from compton2d_tpu.examples import small_corona
sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3,
                   max_flight_iters=0)
sim.step()
ph = sim.state.photons
e = np.asarray(ph.e); al = np.asarray(ph.alive); w = np.asarray(ph.w)
print(jax.default_backend(), "alive:", al.sum())
print("n e>1e4:", ((e>1e4)&al).sum(), " max:", e[al].max())
big = (e>1e4)&al
if big.any():
    print("w of big:", w[big][:5], "r:", np.asarray(ph.r)[big][:5])

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
                   n_vol=128, nphfield=128, t_const=False, seed=3)
out = sim.step()
nesp = np.asarray(out.tallies.n_esp)
print(jax.default_backend(), "n_esp>o at bins:", np.nonzero(nesp)[0][-8:],
      " counts tail:", nesp[np.nonzero(nesp)[0][-8:]])
e = np.asarray(sim.state.photons.e); al = np.asarray(sim.state.photons.alive)
print("big photons:", ((e>1e4)&al).sum())

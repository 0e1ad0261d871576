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
# replicate the driver's volume_em call
from compton2d_tpu.physics.emissivity import volume_em, equipartition_b
import jax.numpy as jnp
z = sim.state.zones
g = sim.grid
l_min = jnp.minimum(g.dz, g.dr) * jnp.ones_like(g.vol)
ve = volume_em(sim.tables.e_ph, sim.tables.gnt, z.f_nt, z.tea, z.n_e,
               z.B_field, z.amxwl, g.vol, g.zone_surf, l_min,
               sim.state.dt, sim.tables.sync, sim.scales,
               f_pair=z.f_pair)
eps = np.asarray(ve.eps_tot)[0, 0]
e_ph = np.asarray(sim.tables.e_ph)
print(jax.default_backend(), "e_ph range:", e_ph[0], e_ph[-1])
print("eps_tot[0,0] tail (last 6):", eps[-6:])
print("cdf at bin -2:", eps[-2], " -> top-bin mass:", 1 - eps[-2])

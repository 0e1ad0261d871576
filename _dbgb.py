import os
cpu = bool(int(os.environ.get("DBG_CPU", 0)))
if cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if cpu:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from compton2d_tpu.examples import small_corona
from compton2d_tpu.physics.emissivity import volume_em
from compton2d_tpu.transport import sourcing

sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3)
z = sim.state.zones; g = sim.grid
l_min = jnp.minimum(g.dz, g.dr) * jnp.ones_like(g.vol)
ve = volume_em(sim.tables.e_ph, sim.tables.gnt, z.f_nt, z.tea, z.n_e,
               z.B_field, z.amxwl, g.vol, g.zone_surf, l_min,
               sim.state.dt, sim.tables.sync, sim.scales, f_pair=z.f_pair)
print(jax.default_backend())
print("eloss_tot:", np.asarray(ve.eloss_tot).reshape(-1)[:6])
print("eloss_th :", np.asarray(ve.eloss_th).reshape(-1)[:6])
eps_th = np.asarray(ve.eps_th).reshape(12, -1)
print("eps_th rows all-zero?:", (eps_th.max(axis=1) == 0).sum(), "of 12")
print("eps_th[0] tail:", eps_th[0][-4:])
budget = sourcing.compute_budget(
    sim.src_static, ve.eloss_tot, jnp.zeros((4,3)), jnp.zeros((3,)),
    g.area_lower, g.area_upper, g.area_inner, g.area_outer,
    sim.state.dt, sim.state.dt_prev, 20000, 10.0, sim.scales.sigma_sb,
    dh_sentinel=False, replicas=1)
print("nsv sum:", int(np.asarray(budget.counts).sum()))

import numpy as np
import jax
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
budget = sourcing.compute_budget(
    sim.src_static, ve.eloss_tot, jnp.zeros((4,3)), jnp.zeros((3,)),
    g.area_lower, g.area_upper, g.area_inner, g.area_outer,
    sim.state.dt, sim.state.dt_prev, 20000, 10.0, sim.scales.sigma_sb,
    dh_sentinel=False, replicas=1)
cnt = np.asarray(budget.counts); wts = np.asarray(budget.weights)
print("n categories:", len(cnt), "(12 zones + surfaces)")
for i in range(len(cnt)):
    if cnt[i] > 0:
        print(f"cat {i}: count={cnt[i]} weight={wts[i]:.4g}")

# standalone emit with the real budget/eps
from compton2d_tpu.state import PhotonArray
ph = PhotonArray.empty(1 << 15)
ph = jax.tree_util.tree_map(jnp.asarray, ph)
key = jax.random.PRNGKey(7)
out = sourcing.emit(
    ph, key, budget, sim.src_static, sim.grid.r_edges,
    sim.grid.z_edges, sim.grid.zone_surf, ve.eps_tot, ve.eps_th,
    ve.eloss_th, ve.eloss_tot, sim.tables.e_ph, sim.state.dt,
    4, 3, float(sim.scales.c),
)
out = out[0] if isinstance(out, tuple) else out
e = np.asarray(out.e); al = np.asarray(out.alive)
print("standalone emit: big:", ((e > 1e4) & al).sum(), "of", al.sum(),
      " max e:", e[al].max())

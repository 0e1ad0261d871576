import numpy as np
import jax
import jax.numpy as jnp
from compton2d_tpu.examples import small_corona
from compton2d_tpu.physics.emissivity import volume_em
from compton2d_tpu.transport import sourcing
from compton2d_tpu.state import PhotonArray

sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3)
z = sim.state.zones; g = sim.grid

def fused(zones, dt, key):
    l_min = jnp.minimum(g.dz, g.dr) * jnp.ones_like(g.vol)
    ve = volume_em(sim.tables.e_ph, sim.tables.gnt, zones.f_nt, zones.tea,
                   zones.n_e, zones.B_field, zones.amxwl, g.vol,
                   g.zone_surf, l_min, dt, sim.tables.sync, sim.scales,
                   f_pair=zones.f_pair)
    budget = sourcing.compute_budget(
        sim.src_static, ve.eloss_tot, jnp.zeros((4,3)), jnp.zeros((3,)),
        g.area_lower, g.area_upper, g.area_inner, g.area_outer,
        dt, dt, 20000, 10.0, sim.scales.sigma_sb,
        dh_sentinel=False, replicas=1)
    ph = jax.tree_util.tree_map(jnp.asarray, PhotonArray.empty(1 << 15))
    out, e_lost = sourcing.emit(
        ph, key, budget, sim.src_static, g.r_edges, g.z_edges,
        g.zone_surf, ve.eps_tot, ve.eps_th, ve.eloss_th, ve.eloss_tot,
        sim.tables.e_ph, dt, 4, 3, float(sim.scales.c))
    return out, ve.eps_tot

out, eps = jax.jit(fused)(z, sim.state.dt, jax.random.PRNGKey(7))
e = np.asarray(out.e); al = np.asarray(out.alive)
print("fused volume_em+emit: big:", ((e>1e4)&al).sum(), "of", al.sum(),
      " max:", e[al].max())
eps = np.asarray(eps)[0,0]
print("eps[0,0][-3:]:", eps[-3:], " eps[0,0][60:64]:", eps[60:64])

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
from compton2d_tpu.transport import sourcing
from compton2d_tpu.driver import Simulation
from compton2d_tpu.examples import small_corona

import jax.numpy as _jnp
HOST_EPS = {}
orig_emit = sourcing.emit
def spy(ph, key, budget, src, r_edges, z_edges, zone_surf,
        eps_tot, eps_th, eloss_th, eloss_tot, e_ph, dt, nz, nr,
        c_scaled=None, **kw):
    out, e_lost = orig_emit(ph, key, budget, src, r_edges, z_edges,
                            zone_surf, eps_tot, eps_th, eloss_th,
                            eloss_tot, e_ph, dt, nz, nr,
                            **({} if c_scaled is None else {"c_scaled": c_scaled}), **kw)
    probe = (
        jnp.sum((~jnp.isfinite(eps_tot)).astype(jnp.float32))
        + 1.0e4 * jnp.sum((~jnp.isfinite(eps_th)).astype(jnp.float32))
        + 1.0e8 * jnp.sum((eps_tot[..., -1] < 0.5).astype(jnp.float32))
    )
    return out, probe
sourcing.emit = spy

sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3)
# host-computed clean eps tables
from compton2d_tpu.physics.emissivity import volume_em
z0 = sim.state.zones; g0 = sim.grid
l_min = jnp.minimum(g0.dz, g0.dr) * jnp.ones_like(g0.vol)
ve0 = volume_em(sim.tables.e_ph, sim.tables.gnt, z0.f_nt, z0.tea, z0.n_e,
                z0.B_field, z0.amxwl, g0.vol, g0.zone_surf, l_min,
                sim.state.dt, sim.tables.sync, sim.scales, f_pair=z0.f_pair)
HOST_EPS["tot"] = np.asarray(ve0.eps_tot)
HOST_EPS["th"] = np.asarray(ve0.eps_th)
cfg = dataclasses.replace(
    sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking="off"))
sim = Simulation(cfg)
sim.step()
e = np.asarray(sim.state.photons.e); al = np.asarray(sim.state.photons.alive)
print("after step: big:", ((e>1e4)&al).sum())
print("probe e_src_lost:", float(sim.last_outputs.tallies.e_src_lost) * 0 + float(sim.last_outputs.tallies.e_src_lost))

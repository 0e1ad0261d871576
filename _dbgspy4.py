import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
from compton2d_tpu.transport import sourcing
from compton2d_tpu.physics import emissivity as em
import compton2d_tpu.driver as drv
from compton2d_tpu.examples import small_corona

STASH = []
orig_ve = em.volume_em
def ve_spy(e_ph, gnt, f_nt, tea, n_e, B, *a, **k):
    ve = orig_ve(e_ph, gnt, f_nt, tea, n_e, B, *a, **k)
    STASH.append((jnp.max(B), jnp.min(B), jnp.max(ve.eloss_sy)))
    return ve
em.volume_em = ve_spy
drv.volume_em = ve_spy

orig_emit = sourcing.emit
def spy(*a, **k):
    out, e_lost = orig_emit(*a, **k)
    bmax, bmin, elmax = STASH[-1]
    probe = jnp.round(bmax * 1e3) + 1e7 * jnp.round(bmin * 1e3)
    return out, probe
sourcing.emit = spy

sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3)
cfg = dataclasses.replace(
    sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking="off"))
from compton2d_tpu.driver import Simulation
sim = Simulation(cfg)
sim.step()
p = float(sim.last_outputs.tallies.e_src_lost)
print("B*1e3: max:", p % 1e7, " min:", p // 1e7)

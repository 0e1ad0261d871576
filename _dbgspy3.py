import os, dataclasses
import numpy as np
import jax
import jax.numpy as jnp
from compton2d_tpu.transport import sourcing
from compton2d_tpu.physics import emissivity as em
import compton2d_tpu.driver as drv
from compton2d_tpu.examples import small_corona

ZC = int(os.environ.get("DBG_ZC", 64))
orig_ve = em.volume_em
def ve_spy(*a, **k):
    k["zone_chunk"] = ZC
    return orig_ve(*a, **k)
em.volume_em = ve_spy
drv.volume_em = ve_spy

sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3)
cfg = dataclasses.replace(
    sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking="off"))
from compton2d_tpu.driver import Simulation
sim = Simulation(cfg)
sim.step()
e = np.asarray(sim.state.photons.e); al = np.asarray(sim.state.photons.alive)
print("zone_chunk=%d big=%d" % (ZC, ((e>1e4)&al).sum()))

import dataclasses
import numpy as np
import jax
from compton2d_tpu.driver import Simulation
from compton2d_tpu.examples import small_corona

def run(pallas, steps=3):
    sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1 << 15, num_nt=100,
                       n_vol=128, nphfield=128, t_const=False, seed=3,
                       pair_switch=False)
    cfg = dataclasses.replace(
        sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking=pallas))
    sim = Simulation(cfg)
    for i in range(steps):
        out = sim.step()
        a = sim.energy_audit()
        t = out.tallies
        e = np.asarray(sim.state.photons.e)
        al = np.asarray(sim.state.photons.alive)
        print(pallas, i, "esc=%.4g cen=%.4g esct=%.4g bal=%.5f Emax=%.3g nal=%d rnds=%d" % (
            a["escaped"], a["census"], a["scatter_gain"], a["balance"],
            e[al].max() if al.any() else 0, al.sum(), int(t.trk_rounds)))
run("off")
run("on")

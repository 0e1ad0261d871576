import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import numpy as np
from compton2d_tpu.driver import Simulation
from compton2d_tpu.examples import small_corona

def run(pallas, steps=2):
    sim = small_corona(nz=4, nr=3, nst=4000, n_slots=1 << 13, num_nt=60,
                       n_vol=64, nphfield=64, t_const=False, seed=3,
                       pair_switch=True)
    cfg = dataclasses.replace(
        sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking=pallas))
    sim = Simulation(cfg)
    for i in range(steps):
        out = sim.step()
        a = sim.energy_audit()
        print(pallas, i, "esc=%.4g cen=%.4g esct=%.4g bal=%.5f" % (
            a["escaped"], a["census"], a["scatter_gain"], a["balance"]))
run("off")
run("on")

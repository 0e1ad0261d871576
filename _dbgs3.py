import dataclasses
import numpy as np
import jax
from compton2d_tpu.driver import Simulation
from compton2d_tpu.examples import small_corona

def run(pallas, seed, steps=3):
    sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1 << 15, num_nt=100,
                       n_vol=128, nphfield=128, t_const=False, seed=seed,
                       pair_switch=True)
    cfg = dataclasses.replace(
        sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking=pallas))
    sim = Simulation(cfg)
    row = []
    for i in range(steps):
        sim.step()
        row.append(sim.energy_audit()["scatter_gain"])
    print(pallas, "seed", seed, " esct:", ["%.3g" % v for v in row])

for seed in (3, 4, 5, 6):
    run("on", seed)
for seed in (3, 4):
    run("off", seed)

import dataclasses
import numpy as np
import jax
from compton2d_tpu.driver import Simulation
from compton2d_tpu.examples import small_corona

for mfi in (0, 256):
    sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                       n_vol=128, nphfield=128, t_const=False, seed=3,
                       max_flight_iters=mfi)
    cfg = dataclasses.replace(
        sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking="off"))
    sim = Simulation(cfg)
    sim.step()
    ph = sim.state.photons
    e = np.asarray(ph.e); al = np.asarray(ph.alive)
    w0 = np.asarray(ph.w0)
    tiny_w0 = (w0 < 1e-9) & al
    print("mfi=%d alive=%d big_e=%d tiny_w0=%d w0min=%.3g" % (
        mfi, al.sum(), ((e > 1e4) & al).sum(), tiny_w0.sum(),
        w0[al].min() if al.any() else -1))

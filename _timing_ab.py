import dataclasses, time
import numpy as np
import jax
from compton2d_tpu.driver import Simulation
from compton2d_tpu.examples import small_corona

def run(steps=4):
    sim = small_corona(nz=8, nr=4, nst=60000, n_slots=1 << 17, num_nt=200,
                       n_vol=400, nphfield=400, t_const=False)
    sim.step(); sim.step()
    jax.block_until_ready(sim.state.photons.alive)
    t0 = time.time()
    outs = []
    for _ in range(steps):
        out = sim.step()
        outs.append(out.n_tracked)
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / steps
    hist = sum(int(a) for a in outs) / steps
    print(f"step {dt*1e3:.1f} ms  hist/s {hist/dt:.3e}")
run()
run()

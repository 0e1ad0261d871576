import numpy as np
import jax
from compton2d_tpu.examples import small_corona
sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3,
                   pair_switch=False)
import dataclasses
cfg = dataclasses.replace(sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking="off"))
from compton2d_tpu.driver import Simulation
sim = Simulation(cfg)
out = sim.step()
ph = sim.state.photons
e = np.asarray(ph.e); al = np.asarray(ph.alive); w = np.asarray(ph.w)
m = np.where(al, e, 0)
idx = np.argsort(m)[-8:]
for i in idx:
    print("e=%.5g w=%.4g jz=%d kr=%d r=%.4f z=%.4f mu=%.4f dcen=%.3g" % (
        e[i], w[i], ph.jz[i], ph.kr[i], ph.r[i], ph.z[i], ph.mu[i], ph.dcen[i]))
print("n with e>1e4:", ((e>1e4)&al).sum())

big = (e > 1e4) & al
eb = e[big]; wb = w[big]
print("cohort e: min %.4g p50 %.4g max %.4g" % (eb.min(), np.median(eb), eb.max()))
print("cohort w: min %.4g p50 %.4g max %.4g" % (wb.min(), np.median(wb), wb.max()))
print("cohort mu range:", np.asarray(ph.mu)[big].min(), np.asarray(ph.mu)[big].max())
h, edges = np.histogram(np.log10(eb), bins=8)
print("log10(e) hist:", h, edges.round(2))
w0b = np.asarray(ph.w0)[big]
print("w0 p50:", np.median(w0b), " w/w0 p50:", np.median(wb/w0b))

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
from compton2d_tpu.transport import sourcing, population
from compton2d_tpu.physics import emissivity as em
import compton2d_tpu.driver as drv
from compton2d_tpu.examples import small_corona

STASH = []
orig_eq = em.equipartition_b
def eq_spy(ep, tea, tna, n_e, f_pair, B_field, fwd):
    out = orig_eq(ep, tea, tna, n_e, f_pair, B_field, fwd)
    STASH.append(dict(bin_=jnp.max(B_field), bout=jnp.max(out),
                      ep=jnp.max(ep)))
    return out
em.equipartition_b = eq_spy
drv.equipartition_b = eq_spy
orig_ve = em.volume_em
def ve_spy(e_ph, gnt, f_nt, tea, n_e, B, *a, **k):
    ve = orig_ve(e_ph, gnt, f_nt, tea, n_e, B, *a, **k)
    STASH.append(dict(
        bmax=jnp.max(B),
        eps_last_min=jnp.min(ve.eps_tot[..., -1]),
        elsy=jnp.max(ve.eloss_sy),
        kapmax=jnp.max(ve.kappa_tot),
    ))
    return ve
em.volume_em = ve_spy
drv.volume_em = ve_spy

orig_emit = sourcing.emit
def spy(*a, **k):
    out, _ = orig_emit(*a, **k)
    s = STASH[-1]
    # log-encode eloss: round(1000*(log10(elsy)+40)) stays < 2^24
    p = jnp.round(1000.0 * (jnp.log10(jnp.maximum(s["elsy"], 1e-38)) + 40.0))
    return out, p
sourcing.emit = spy

orig_rr = population.census_roulette
def rr_spy(ph, key, hi, lo, n_reserve=0):
    ph2, e_rr, n_rr = orig_rr(ph, key, hi, lo, n_reserve=n_reserve)
    s = STASH[-1] if STASH else None
    if s is not None:
        eq = [x for x in STASH if "bin_" in x][-1]
        e_rr = jnp.round(100.0 * eq["bin_"])
        n_rr = jnp.round(100.0 * eq["bout"]).astype(jnp.int32)
    return ph2, e_rr, n_rr
population.census_roulette = rr_spy

sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3)
cfg = dataclasses.replace(
    sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking="off"))
from compton2d_tpu.driver import Simulation
sim = Simulation(cfg)
sim.step()    # census_roulette spy sees STASH only on step >= 2
sim.step()
t = sim.last_outputs.tallies
print("log10(eloss_sy_max):", float(t.e_src_lost)/1000.0 - 40.0)
print("equip B_field in:", float(t.e_rr)/100.0)
print("equip B out:", int(t.n_rr)/100.0)

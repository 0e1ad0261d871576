import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
from compton2d_tpu.transport import sourcing
from compton2d_tpu.physics import emissivity as em
import compton2d_tpu.driver as drv
from compton2d_tpu.examples import small_corona

STASH = []
SYNC = []
orig_sync = em.sync_kernel_f32
def sync_spy(t):
    out = orig_sync(t)
    SYNC.append((jnp.max(out), jnp.max(t), jnp.min(t)))
    return out
em.sync_kernel_f32 = sync_spy
orig_ve = em.volume_em
def ve_spy(*a, **k):
    ve = orig_ve(*a, **k)
    kap = ve.kappa_tot
    fmax = jnp.max(jnp.stack([s[0] for s in SYNC])) if SYNC else jnp.float32(-1)
    probe = (
        jnp.round(1e4 * jnp.clip(fmax, 0, 1))                        # F max
        + 1e8 * jnp.sum((ve.eps_tot[..., -1] < 0.5).astype(jnp.float32))
    )
    STASH.append(probe)
    return ve
em.volume_em = ve_spy
drv.volume_em = ve_spy

orig_emit = sourcing.emit
def spy(*a, **k):
    out, e_lost = orig_emit(*a, **k)
    return out, STASH[-1]
sourcing.emit = spy

sim = small_corona(nz=4, nr=3, nst=20000, n_slots=1<<15, num_nt=100,
                   n_vol=128, nphfield=128, t_const=False, seed=3)
cfg = dataclasses.replace(
    sim.cfg, run=dataclasses.replace(sim.cfg.run, pallas_tracking="off"))
from compton2d_tpu.driver import Simulation
sim = Simulation(cfg)
sim.step()
p = float(sim.last_outputs.tallies.e_src_lost)
print("probe:", p)
print("  Fmax*1e4:", p % 1e8, " degen rows:", p // 1e8)

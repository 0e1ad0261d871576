import time, functools
import numpy as np, jax, jax.numpy as jnp
from compton2d_tpu.examples import small_corona

log = open('/tmp/micro.log', 'w', buffering=1)
def p(*a): print(*a, file=log)

sim = small_corona(nz=8, nr=4, nst=60000, n_slots=1 << 17, num_nt=200,
                   n_vol=400, nphfield=400, t_const=True)
sim.step(); sim.step()
st = sim.state

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    p(name, round((time.time()-t0)/10*1000, 2), 'ms')

from compton2d_tpu.transport import sourcing
from compton2d_tpu.transport.tracking import census_tally, TrackStatics, TrackContext, zone_accum
from compton2d_tpu.physics.emissivity import volume_em, equipartition_b
from compton2d_tpu.physics.compton import zone_sigma_table

cfg = sim.cfg; g = cfg.grid; sc = sim.scales; grid = sim.grid; tab = sim.tables
zones = st.zones
l_min = jnp.minimum(grid.dz, grid.dr) * jnp.ones_like(grid.vol)

ve_fn = jax.jit(lambda z: volume_em(tab.e_ph, tab.gnt, z.f_nt, z.tea, z.n_e,
    z.B_field, z.amxwl, grid.vol, grid.zone_surf, l_min, st.dt, tab.sync, sc,
    f_pair=z.f_pair))
timeit('volume_em', ve_fn, zones)
ve = ve_fn(zones)

bud_fn = jax.jit(lambda: sourcing.compute_budget(
    sim.src_static, ve.eloss_tot, jnp.ones((g.nz, g.nr)), st.ed_abs,
    grid.area_lower, grid.area_upper, grid.area_inner, grid.area_outer,
    st.dt, st.dt_prev, cfg.source.nst, cfg.source.bias_cap, sc.sigma_sb))
timeit('budget', bud_fn)
bud = bud_fn()

emit_fn = jax.jit(lambda ph, k: sourcing.emit(ph, k, bud, sim.src_static,
    grid.r_edges, grid.z_edges, grid.zone_surf, ve.eps_tot, ve.eps_th,
    ve.eloss_th, ve.eloss_tot, tab.e_ph, st.dt, g.nz, g.nr, c_scaled=sc.c))
timeit('emit', emit_fn, st.photons, jax.random.PRNGKey(0))

zs_fn = jax.jit(lambda z: zone_sigma_table(tab.sigma_e, z.f_nt, tab.gnt, z.n_e, None))
timeit('zone_sigma_table', zs_fn, zones)

# census_tally needs ctx/st: reuse internals cheaply
from compton2d_tpu.transport.population import census_roulette
rr_fn = jax.jit(lambda ph, k: census_roulette(ph, k, 0.85, 0.6, n_reserve=bud.n_new))
timeit('census_roulette', rr_fn, st.photons, jax.random.PRNGKey(1))

za_fn = jax.jit(lambda ph: zone_accum(jnp.where(ph.alive, ph.w, 0.0),
    jnp.clip(ph.jz,0,g.nz-1)*g.nr + jnp.clip(ph.kr,0,g.nr-1), g.nz*g.nr))
timeit('zone_accum(ecens)', za_fn, st.photons)

# n_field scatter-add as in census_tally
def nf_fn(ph):
    zid = jnp.clip(ph.jz,0,g.nz-1)*g.nr + jnp.clip(ph.kr,0,g.nr-1)
    counts = jnp.where(ph.alive, ph.w / jnp.maximum(ph.e, 1e-30), 0.0)
    x = (jnp.log(jnp.maximum(ph.e,1e-30)) - jnp.log(tab.e_field[0])) / jnp.log(tab.e_field[1]/tab.e_field[0])
    fbin = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, g.nphfield-1)
    return jnp.zeros((g.nz*g.nr, g.nphfield)).at[zid, fbin].add(counts, mode='drop')
timeit('n_field scatter-add', jax.jit(nf_fn), st.photons)
p('done')

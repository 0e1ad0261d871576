import glob, gzip, json, os, time
import jax
from compton2d_tpu.examples import small_corona

log = open('/tmp/trace.log', 'w', buffering=1)
def p(*a): print(*a, file=log)

sim = small_corona(nz=8, nr=4, nst=60000, n_slots=1 << 17, num_nt=200,
                   n_vol=400, nphfield=400, t_const=True,
                   max_flight_iters=0)
sim.step(); sim.step()
jax.block_until_ready(sim.state.photons.alive)
d = '/tmp/jtrace'
with jax.profiler.trace(d):
    for _ in range(3):
        out = sim.step()
    jax.block_until_ready(out.tallies.edep)
p('trace captured')
files = glob.glob(d + '/**/*.trace.json.gz', recursive=True)
p('files', files)
if files:
    with gzip.open(files[0], 'rt') as fh:
        tr = json.load(fh)
    evs = [e for e in tr.get('traceEvents', []) if e.get('ph') == 'X']
    # keep device-lane events (TensorFlow Op / XLA Op lanes)
    tot = {}
    for e in evs:
        nm = e.get('name', '?')
        dur = e.get('dur', 0)
        tot[nm] = tot.get(nm, 0) + dur
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    for nm, dur in top:
        p(f'{dur/1000:10.2f} ms  {nm[:110]}')
p('done')

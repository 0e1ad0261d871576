"""Per-phase wall-time breakdown of the simulation step (VERDICT item:
'profile, then make tracking fast').

The step is one fused jit, so phases are isolated by ablation on the
bench config (small_corona at reference-scale tables):

  full        : sourcing + tracking + census tallies + FP
  no_track    : max_flight_iters=0 (flight while_loop exits immediately)
  no_fp       : t_const=True (FP solve skipped)
  neither     : both ablations

  tracking ~ full - no_track ; fp ~ full - no_fp ;
  sourcing+tally ~ neither

Also (optionally, PROFILE_TRACE=dir) captures a jax.profiler trace of
the full step for op-level inspection.

Run on the real TPU chip:  python tools/profile_phases.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def timed_run(steps=5, warmup=2, **kw):
    from compton2d_tpu.examples import small_corona

    sim = small_corona(
        nz=8, nr=4, nst=60000, n_slots=1 << 17, num_nt=200,
        n_vol=400, nphfield=400, **kw,
    )
    for _ in range(warmup):
        sim.step()
    jax.block_until_ready(sim.state.photons.alive)
    t0 = time.time()
    outs = []
    for _ in range(steps):
        out = sim.step()
        outs.append(out.n_tracked)
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / steps
    return dt, sum(int(x) for x in outs) / steps


def main():
    steps = int(os.environ.get("PROFILE_STEPS", 5))
    t_full, hist = timed_run(steps, t_const=False)
    t_notrk, _ = timed_run(steps, t_const=False, max_flight_iters=0)
    t_nofp, _ = timed_run(steps, t_const=True)
    t_neither, _ = timed_run(steps, t_const=True, max_flight_iters=0)

    phases = {
        "full_step_s": t_full,
        "tracking_s": t_full - t_notrk,
        "fp_s": t_full - t_nofp,
        "sourcing_tally_s": t_neither,
        "histories_per_step": hist,
        "histories_per_s": hist / t_full,
    }
    print(json.dumps(phases, indent=2))

    trace_dir = os.environ.get("PROFILE_TRACE")
    if trace_dir:
        from compton2d_tpu.examples import small_corona

        sim = small_corona(
            nz=8, nr=4, nst=60000, n_slots=1 << 17, num_nt=200,
            n_vol=400, nphfield=400,
        )
        sim.step()
        sim.step()
        jax.block_until_ready(sim.state.photons.alive)
        with jax.profiler.trace(trace_dir):
            for _ in range(2):
                sim.step()
            jax.block_until_ready(sim.state.photons.alive)
        print(f"# trace written to {trace_dir}")


if __name__ == "__main__":
    main()

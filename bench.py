"""Benchmark: photon histories/sec/chip on the flagship corona config.

Prints ONE JSON line:
  {"metric": "photon_histories_per_sec_per_chip", "value": N,
   "unit": "histories/s", "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md), so
vs_baseline is measured against this framework's own first recorded
number (BASELINE_VALUE below) — >1.0 means faster than round-1.

A "history" = one photon tracked through a full time step (census
replays + fresh emissions), the unit the reference's task farm processes
per rank per cycle.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main():
    size = os.environ.get("BENCH_SIZE", "full")
    import jax

    from compton2d_tpu.examples import small_corona

    if size == "small":
        sim = small_corona(
            nz=4, nr=3, nst=5000, n_slots=1 << 14, num_nt=100,
            n_vol=128, nphfield=128, t_const=True,
        )
        steps = 3
    else:
        # reference-scale tables: 200 gamma bins, 400-bin emissivity and
        # field grids (general.pa)
        sim = small_corona(
            nz=8, nr=4, nst=60000, n_slots=1 << 17, num_nt=200,
            n_vol=400, nphfield=400,
            t_const=bool(int(os.environ.get("BENCH_TCONST", 0))),
            max_flight_iters=int(os.environ.get("BENCH_MAX_ITERS", 256)),
        )
        steps = int(os.environ.get("BENCH_STEPS", 3))

    # warmup: compile + populate the census
    t0 = time.time()
    sim.step()
    compile_s = time.time() - t0
    sim.step()

    histories = 0
    jax.block_until_ready(sim.state.photons.alive)
    t0 = time.time()
    for _ in range(steps):
        out = sim.step()
        histories += int(out.n_tracked)
    jax.block_until_ready(sim.state.photons.alive)
    dt_s = time.time() - t0

    value = histories / dt_s
    BASELINE_VALUE = 1.0e5  # round-1 self-baseline (histories/s/chip)
    print(
        json.dumps(
            {
                "metric": "photon_histories_per_sec_per_chip",
                "value": value,
                "unit": "histories/s",
                "vs_baseline": value / BASELINE_VALUE,
            }
        )
    )
    print(
        f"# compile={compile_s:.1f}s measure={dt_s:.2f}s "
        f"histories={histories} devices={jax.devices()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

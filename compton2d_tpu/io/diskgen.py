"""External photon-field spectrum generator.

Re-implements ``/root/reference/disk/disk.f``: generates the 4-column
``blackbody*.in`` files (E [keV], L_disk, F_blr, F_ir) consumed by the
boundary file-spectrum machinery (file_sp):

- accretion disk: blackbody at T_disk = 3e4 K;
- BLR: blackbody at the comoving Ghisellini-Ghisellini 2009 temperature
  T_blr = 1.5 Gamma nu_alpha h / 3.93 k (disk.f:34);
- IR torus: blackbody at 367 Gamma K (disk.f:35);
- optional nonthermal power-law tail above E_min with exponential
  cutoff (disk.f:60-72).

The reference's beamed-BLR construction integrates a digitized Tavecchio
et al. (2008) table that does not ship usefully; since ``file_sp``
renormalizes the BLR/IR total fluxes to the Ghisellini-Madau energy
densities anyway (imcsurf2d_para.f:636-646), the boosted-blackbody shape
used here is the standard equivalent.
"""
from __future__ import annotations

import numpy as np

H_ERG_S = 6.62618e-27
C_CM_S = 2.99792e10
K_B = 1.38e-16
SIGMA_SB = 5.67e-5
NU_ALPHA = 2.47e15  # Ly-alpha frequency (disk.f:11)
ERG_PER_KEV = 1.602e-9


def _bb_shape(e_kev: np.ndarray, T_K: float, norm: float) -> np.ndarray:
    """norm * 2 h nu^3/c^2 / (e^{h nu/kT}-1) / (sigma T^4 / pi)
    (disk.f:51-53), f32-safe magnitudes."""
    nu = e_kev * ERG_PER_KEV / H_ERG_S
    x = H_ERG_S * nu / (K_B * T_K)
    planck = np.where(
        x < 500.0,
        2.0 * H_ERG_S * nu**3 / C_CM_S**2 / np.expm1(np.minimum(x, 500.0)),
        0.0,
    )
    return norm * planck / (SIGMA_SB / np.pi * T_K**4)


def generate(
    gamma_bulk: float,
    n_bins: int = 500,
    e_min_kev: float = 1e-7,
    e_max_kev: float = 1e3,
    L_disk_norm: float = 9.0e62,
    L_ext_norm: float = 1.0e44,
    pl_tail: bool = False,
    pl_e_min: float = 5e7,
    pl_e_max: float = 5e8,
    pl_index: float = 1.0,
) -> np.ndarray:
    """Returns the (n_bins, 4) table [E, L_disk, F_blr, F_ir]."""
    t_disk = 3.0e4
    t_blr = 1.5 * gamma_bulk * NU_ALPHA * H_ERG_S / 3.93 / K_B
    t_ir = 367.0 * gamma_bulk

    e = np.geomspace(e_min_kev, e_max_kev, n_bins)
    f_disk = _bb_shape(e, t_disk, L_disk_norm)
    f_blr = _bb_shape(e, t_blr, L_ext_norm)
    f_ir = _bb_shape(e, t_ir, L_ext_norm)

    if pl_tail:
        tail = np.where(
            (e > pl_e_min) & (e / pl_e_max < 100.0),
            (e / pl_e_min) ** (-pl_index)
            * np.exp(-np.minimum(e / pl_e_max, 100.0)),
            0.0,
        )
        f_disk = np.where(e > pl_e_min, f_disk[0] * tail, f_disk)

    out = np.stack(
        [
            e,
            np.maximum(f_disk, 1e-30),
            np.maximum(f_blr, 1e-30),
            np.maximum(f_ir, 1e-30),
        ],
        axis=1,
    )
    return out


def write_spectrum_file(path: str, gamma_bulk: float, **kw):
    table = generate(gamma_bulk, **kw)
    np.savetxt(path, table, fmt="%14.6e")
    return table

"""Cylindrical (r, z) grid geometry.

Uniform-linear zone edges, cylindrical-shell volumes and boundary surface
areas, mirroring ``/root/reference/src/setup2d.f:60-114`` — but held as a
small static pytree of arrays instead of COMMON-block scalars.

Zone indexing convention (matches the reference's (j, k) = (z, r) order):
axis 0 = z (``nz`` zones), axis 1 = r (``nr`` zones). Zone (j, k) spans
``z_edges[j] .. z_edges[j+1]`` x ``r_edges[k] .. r_edges[k+1]`` with
``z_edges[0] = 0`` and ``r_edges[0] = r_min``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from compton2d_tpu import constants as cn
from compton2d_tpu.config import GridConfig


class Grid(NamedTuple):
    """Static geometry arrays (float64)."""

    z_edges: jnp.ndarray     # (nz+1,)  z-plane positions, z_edges[0]=0
    r_edges: jnp.ndarray     # (nr+1,)  r-shell radii, r_edges[0]=r_min
    vol: jnp.ndarray         # (nz, nr) cell volumes [cm^3]
    zone_surf: jnp.ndarray   # (nz, nr) total cell surface [cm^2]
    area_inner: jnp.ndarray  # (nz,)    inner r boundary area per z row
    area_outer: jnp.ndarray  # (nz,)    outer r boundary area per z row
    area_upper: jnp.ndarray  # (nr,)    upper z boundary area per r ring
    area_lower: jnp.ndarray  # (nr,)    lower z boundary area per r ring
    dz: jnp.ndarray          # ()       uniform z spacing
    dr: jnp.ndarray          # ()       uniform r spacing

    @property
    def nz(self) -> int:
        return self.vol.shape[0]

    @property
    def nr(self) -> int:
        return self.vol.shape[1]

    @property
    def r_min(self):
        return self.r_edges[0]

    @property
    def r_max(self):
        return self.r_edges[-1]

    @property
    def z_max(self):
        return self.z_edges[-1]


def make_grid(cfg: GridConfig, length_scale: float = 1.0) -> Grid:
    """Build the uniform grid (setup2d.f:60-114).

    ``length_scale`` [cm] divides all lengths (f32-safe scaled units,
    see compton2d_tpu.units): volumes come out in L^3, areas in L^2.
    """
    nz, nr = cfg.nz, cfg.nr
    L = float(length_scale)
    z_edges = np.linspace(0.0, cfg.z_max / L, nz + 1)
    r_edges = np.linspace(cfg.r_min / L, cfg.r_max / L, nr + 1)

    dz = z_edges[1:] - z_edges[:-1]              # (nz,)
    r_lo, r_hi = r_edges[:-1], r_edges[1:]       # (nr,)
    ring = np.pi * (r_hi**2 - r_lo**2)           # (nr,) annulus area

    vol = dz[:, None] * ring[None, :]            # (nz, nr)
    # total surface of the cylindrical shell cell (setup2d.f:83-100):
    # 2*pi*(r_hi + r_lo)*dz (side walls) + 2 * ring (top+bottom)
    zone_surf = (
        2.0 * np.pi * (r_hi + r_lo)[None, :] * dz[:, None]
        + 2.0 * ring[None, :]
    )

    area_inner = 2.0 * np.pi * cfg.r_min * dz            # (nz,)
    area_outer = 2.0 * np.pi * cfg.r_max * dz            # (nz,)
    area_upper = ring.copy()                             # (nr,)
    area_lower = ring.copy()                             # (nr,)

    return Grid(
        z_edges=jnp.asarray(z_edges),
        r_edges=jnp.asarray(r_edges),
        vol=jnp.asarray(vol),
        zone_surf=jnp.asarray(zone_surf),
        area_inner=jnp.asarray(area_inner),
        area_outer=jnp.asarray(area_outer),
        area_upper=jnp.asarray(area_upper),
        area_lower=jnp.asarray(area_lower),
        dz=jnp.asarray(dz[0]),
        dr=jnp.asarray(r_edges[1] - r_edges[0]),
    )


def initial_dt(
    grid: Grid, mcdt: float, inj_v: float = cn.C_LIGHT,
    length_scale: float = 1.0,
) -> float:
    """Initial time step dt = mcdt * min(r_max/nr, z_max/nz) / v
    (setup2d.f:50-51). ``length_scale`` converts the (scaled) grid back
    to cm."""
    dist = float(min(grid.r_max / grid.nr, grid.z_max / grid.nz))
    return float(mcdt) * dist * float(length_scale) / float(inj_v)

"""Per-zone volume emissivities, opacities and emission CDFs.

Re-implements the active paths of ``/root/reference/src/volume2d.f``
(``volume_em``) and the per-zone energy budget of
``/root/reference/src/imcgen2d.f:203-335``, vectorized over all zones:

- exact nonthermal synchrotron emissivity j_sy and self-absorption
  kappa_sy from the evolving electron distribution f_nt, using the
  K_{4/3} K_{1/3} form of the single-electron synchrotron function
  (volume2d.f:206-239, expk13/expk43 fits volume2d.f:672-746);
- the emission split rule (volume2d.f:342-369): optically thin bins
  (kappa < max(1/l_min, 10 kappa_C)) build the MC volume-emission CDF
  ``eps_tot``; optically thick bins emit as a thermal surface term with
  blackbody j_th * (1 - exp(-tau)) into ``eps_th`` / ``Eloss_th``;
- total synchrotron energy loss Eloss_sy = 1.058e-15 n_e dt B^2
  sum (gamma^2-1) f dgamma vol (imcgen2d.f:280-286) — the active
  Eloss_tot (bremsstrahlung/cyclotron/pair-annihilation losses are
  computed in the reference but excluded from the budget,
  imcgen2d.f:328-331; we keep them available as diagnostics);
- equipartition magnetic field options (ep_switch, imcgen2d.f:216-236).

TPU design: the synchrotron function F(t) is a universal 1-D shape, so it
is tabulated once on a log grid; the per-zone (n_vol x num_nt)
contraction against f_nt then uses gathers + matmul-style reductions
batched over zones.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from compton2d_tpu import constants as cn

_SIGMA_T = 6.6524616e-25
_E_CHARGE = 4.803e-10
_E_MASS = 9.109e-28


def expk13(t: jnp.ndarray) -> jnp.ndarray:
    """exp(t) * K_{1/3}(t) (volume2d.f:672-714)."""
    c1, c2 = 0.35502805, 0.25881940
    ts = jnp.maximum(t, 1e-30)
    # small-argument Airy expansion
    z3 = 1.5 * ts
    zs = z3 ** (1.0 / 3.0)
    z = zs * zs
    z32 = z3 * z3
    f1 = 1.0 + z32 / 6.0 * (1.0 + z32 / 30.0 * (1.0 + z32 / 56.0))
    f2 = z * (1.0 + z32 / 12.0 * (1.0 + z32 / 42.0 * (1.0 + z32 / 90.0)))
    small = jnp.exp(jnp.minimum(ts, 1.0)) * jnp.pi * 1.7320508 / zs * (
        c1 * f1 - c2 * f2
    )
    # large-argument asymptotic
    zl = 1.0 / (72.0 * ts)
    poly = 1.0 - 5.0 * zl * (1.0 - 38.5 * zl)
    large = jnp.sqrt(0.5 * jnp.pi / ts) * poly / (
        1.0 + 1.0 / (1.0 + 58.0 * ts * ts)
    )
    return jnp.where(t <= 1.0, small, large)


def expk43(t: jnp.ndarray) -> jnp.ndarray:
    """exp(t) * K_{4/3}(t) (volume2d.f:718-746)."""
    ts = jnp.maximum(t, 1e-30)
    poly_s = 1.0 + ts * (0.9757317 - 7.6790616e-2 * ts)
    small = 0.44648975 * (2.0 / ts) ** (4.0 / 3.0) * poly_s
    zl = 1.0 / (72.0 * ts)
    poly_l = 1.0 + 55.0 * zl * (1.0 - 8.5 * zl)
    large = jnp.sqrt(0.5 * jnp.pi / ts) * poly_l * (
        1.0 + 1.0 / (1.0 + 50.0 * ts * ts)
    )
    return jnp.where(t <= 1.0, small, large)


def sync_kernel(t: jnp.ndarray) -> jnp.ndarray:
    """Angle-averaged single-electron synchrotron spectral shape
    (volume2d.f:206-216): t^2 [K43 K13 - 0.6 t (K43^2 - K13^2)] e^{-2t},
    with t = nu / (3 gamma^2 nu_b)."""
    e43 = expk43(t)
    e13 = expk13(t)
    ff = t * t * (e43 * e13 - 0.6 * t * (e43 - e13) * (e43 + e13))
    return jnp.where(t < 1.0e4, ff * jnp.exp(-2.0 * t), 0.0)


class SyncKernelTable(NamedTuple):
    """Log-spaced table of sync_kernel for fast batched evaluation."""

    log_t: jnp.ndarray
    val: jnp.ndarray

    @classmethod
    def build(cls, t_min=1e-12, t_max=2e4, n=2048) -> "SyncKernelTable":
        lt = jnp.linspace(jnp.log(t_min), jnp.log(t_max), n)
        return cls(log_t=lt, val=sync_kernel(jnp.exp(lt)))

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.interp(
            jnp.log(jnp.maximum(t, 1e-300)), self.log_t, self.val,
            left=self.val[0], right=0.0,
        )


def equipartition_b(
    ep_switch: jnp.ndarray,   # (nz, nr) int
    tea: jnp.ndarray,         # (nz, nr) keV
    tna: jnp.ndarray,         # (nz, nr) keV
    n_e: jnp.ndarray,         # (nz, nr)
    f_pair: jnp.ndarray,      # (nz, nr)
    B_field: jnp.ndarray,     # (nz, nr) current value (kept if switch=0)
    gamma_bar_fwd,            # callable Theta -> <gamma>+Theta... (table)
) -> jnp.ndarray:
    """B from electron (ep_switch=1) or proton (=2) thermal energy
    density equipartition (imcgen2d.f:216-236)."""

    def u_of(th):
        small = 1.5 * th + 7.5 * th * th
        # gamma_bar = K3/K2 - Theta  =>  K3/K2 - Theta - 1 = gbar - 1
        large = gamma_bar_fwd(jnp.maximum(th, 1e-6)) - 1.0
        return jnp.where(th < 1e-2, small, large)

    th_e = cn.KEV_TO_MEC2 * tea
    ub_e = u_of(th_e) * n_e * cn.MEC2_ERG * (1.0 + 2.0 * f_pair)
    th_p = 1.066e-6 * tna
    ub_p = u_of(th_p) * n_e * 1.5e-3
    b1 = jnp.sqrt(25.13 * ub_e)
    b2 = jnp.sqrt(25.13 * ub_p)
    return jnp.where(
        ep_switch == 1, b1, jnp.where(ep_switch == 2, b2, B_field)
    )


class VolumeEmission(NamedTuple):
    """Per-zone, per-step emission tables (all shapes (nz, nr, ...))."""

    kappa_tot: jnp.ndarray    # (nz, nr, n_vol) [1/cm] synchrotron s.a.
    eps_tot: jnp.ndarray      # (nz, nr, n_vol) MC emission CDF
    eps_th: jnp.ndarray       # (nz, nr, n_vol) thick thermal CDF
    eloss_sy: jnp.ndarray     # (nz, nr) [erg] per step
    eloss_th: jnp.ndarray     # (nz, nr) [erg] per step
    eloss_br: jnp.ndarray     # (nz, nr) [erg] diagnostic
    eloss_tot: jnp.ndarray    # (nz, nr) [erg] = active budget (fas)


def volume_em(
    e_ph: jnp.ndarray,        # (n_vol,) photon energy grid [keV]
    gnt: jnp.ndarray,         # (num_nt,)
    f_nt: jnp.ndarray,        # (nz, nr, num_nt) unit-normalized
    tea: jnp.ndarray,         # (nz, nr) [keV]
    n_e: jnp.ndarray,         # (nz, nr) [cm^-3]
    B: jnp.ndarray,           # (nz, nr) [G]
    amxwl: jnp.ndarray,       # (nz, nr)
    vol: jnp.ndarray,         # (nz, nr) [cm^3]
    zsurf: jnp.ndarray,       # (nz, nr) [cm^2]
    l_min: jnp.ndarray,       # (nz, nr) [cm] min zone dimension
    dt: jnp.ndarray,          # [] time step [s]
    sync_tab: SyncKernelTable,
    zone_chunk: int = 64,
) -> VolumeEmission:
    """Vectorized volume_em over all zones (volume2d.f:10-390 +
    imcgen2d.f:276-335)."""
    nz, nr, num_nt = f_nt.shape
    n_vol = e_ph.shape[0]
    gamma = gnt + 1.0
    gamp = gamma * jnp.sqrt(jnp.maximum(gamma * gamma - 1.0, 1e-20))
    dg = jnp.diff(gnt)
    wdg = jnp.concatenate([dg, dg[-1:] * 0.0])
    nu = 2.41487e17 * e_ph                       # (n_vol,) Hz
    # log-spaced grid => E*(dE-1) bin widths (volume2d.f:104,346)
    de_ratio = e_ph[1] / e_ph[0]
    bin_w = e_ph * (de_ratio - 1.0)

    zshape = (nz * nr,)
    f_flat = f_nt.reshape(nz * nr, num_nt)
    st = {
        "f": f_flat,
        "tea": tea.reshape(zshape),
        "n_e": n_e.reshape(zshape),
        "B": B.reshape(zshape),
        "vol": vol.reshape(zshape),
        "zsurf": zsurf.reshape(zshape),
        "l_min": l_min.reshape(zshape),
        "amxwl": amxwl.reshape(zshape),
    }

    def per_zone(zs):
        f = zs["f"]                               # (num_nt,)
        Bz = jnp.maximum(zs["B"], 1e-20)
        nez = zs["n_e"]
        nu_b = _E_CHARGE * Bz / (2.0 * jnp.pi * _E_MASS * cn.C_LIGHT)
        ub = Bz * Bz / (8.0 * jnp.pi)
        face = 3.0**1.5 * _SIGMA_T * cn.C_LIGHT * ub / (jnp.pi * nu_b)
        nu_p = 9.0e3 * jnp.sqrt(nez)              # plasma frequency

        # t(nu, gamma) = nu / (3 gamma^2 nu_b)
        t = nu[:, None] / (3.0 * gamma[None, :] ** 2 * nu_b)
        es = face * sync_tab(t)                   # (n_vol, num_nt)
        j_sy = (es @ (f * wdg)) * nez / (4.0 * jnp.pi)
        # absorption integral (volume2d.f:232-239)
        dfg = f / gamp
        slope = jnp.concatenate([dfg[:-1] - dfg[1:], dfg[-1:] * 0.0])
        kap_sy = (es @ (slope * gamp)) * nez / (
            8.0 * jnp.pi * _E_MASS * nu * nu
        )
        kap_sy = jnp.abs(kap_sy)
        below_plasma = nu <= nu_p
        j_sy = jnp.where(below_plasma, 0.0, j_sy)
        kap_sy = jnp.where(below_plasma, 0.0, kap_sy)

        kappa_tot = kap_sy
        kappa_C = 6.65e-25 * nez
        thin = kappa_tot < jnp.maximum(1.0 / zs["l_min"], 10.0 * kappa_C)

        # thick bins: blackbody surface emission (volume2d.f:349-366)
        x = e_ph / jnp.maximum(zs["tea"], 1e-10)
        j_th = jnp.where(
            x < 100.0, 1.47e-47 * nu**3 / jnp.expm1(jnp.minimum(x, 100.0)),
            1e-50,
        )
        tau = jnp.minimum(kappa_tot * zs["l_min"], 50.0)
        j_th = j_th * -jnp.expm1(-tau)

        w_tot = jnp.where(thin, j_sy, 0.0) * bin_w
        w_th = jnp.where(~thin, j_th, 0.0) * bin_w
        p_tot = jnp.cumsum(w_tot)
        p_th = jnp.cumsum(w_th)
        eps_tot = p_tot / jnp.maximum(p_tot[-1], 1e-50)
        eps_th = p_th / jnp.maximum(p_th[-1], 1e-50)

        # energy budget (imcgen2d.f:276-335)
        sum_g2m1 = jnp.sum((gamma**2 - 1.0) * f * wdg)
        eloss_sy = 1.058e-15 * nez * dt * Bz * Bz * sum_g2m1 * zs["vol"]
        eloss_th = dt * zs["zsurf"] * p_th[-1]
        th_e = cn.KEV_TO_MEC2 * zs["tea"]
        f_rel = 1.41 * jnp.sqrt(th_e) * (jnp.log(2.0 * th_e) + 0.9228) - 1.0
        f_rel = jnp.maximum(1.0 + th_e**2 * f_rel / (1.0 + th_e**2), 1.0)
        eloss_br = (
            5.34e-24 * zs["vol"] * dt * zs["amxwl"]
            * jnp.sqrt(zs["tea"]) * f_rel * nez**2
        )
        return dict(
            kappa_tot=kappa_tot, eps_tot=eps_tot, eps_th=eps_th,
            eloss_sy=eloss_sy, eloss_th=eloss_th, eloss_br=eloss_br,
        )

    out = jax.lax.map(per_zone, st, batch_size=zone_chunk)
    shape2 = (nz, nr)
    eloss_sy = out["eloss_sy"].reshape(shape2)
    eloss_th = out["eloss_th"].reshape(shape2)
    return VolumeEmission(
        kappa_tot=out["kappa_tot"].reshape(nz, nr, n_vol),
        eps_tot=out["eps_tot"].reshape(nz, nr, n_vol),
        eps_th=out["eps_th"].reshape(nz, nr, n_vol),
        eloss_sy=eloss_sy,
        eloss_th=eloss_th,
        eloss_br=out["eloss_br"].reshape(shape2),
        # active budget: synchrotron only (imcgen2d.f:328-331)
        eloss_tot=eloss_sy,
    )

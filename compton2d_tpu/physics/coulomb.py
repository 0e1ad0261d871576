"""Exact Coulomb (electron-proton) and Moller (electron-electron)
drift/dispersion coefficients.

Re-implements the live integrals of ``FP_calc``
(``/root/reference/src/update2d.f:2083-2470``): ``Intdgcp``/``Intd2cp``
(relativistic e-p Coulomb drift/dispersion over a thermal proton bath),
``Intdgmo``/``Intd2mo`` (full Moller forms), ``dg_mo``/``disp_mo``
(Nayakshin & Melia 1998 small-angle Moller forms with the chi/zeta
closed forms ``ch_f``/``z_f``), and ``Inteta``.

And the rate-table layer of ``coulomb.f``: the reference caches these
integrals in per-temperature files (``rates/dgeTTTT.dat``); here
:func:`build_coulomb_tables` precomputes (gamma x temperature) tables in
host numpy f64 once, and :class:`CoulombTables` interpolates them inside
jit for the optional ``fp_include_coulomb`` FP operator (the reference's
*active* operator excludes these terms, update2d.f:1048-1049).

Usage of the raw integrals in FP coefficients (update2d.f:898-988):

    dg_cp  = 1.194e-14 n_p lnL Intdgcp /((1+1.875 Th_p+.8203 Th_p^2)
             sqrt(Th_p) g^2 b)                       [gamma < 3]
    dg_ce  = 1.496e-14 lnL (n_lept/Th K2(1/Th)) dg_mo /(g^2 b)
    disp_ce= 0.25 * 2.99e-14 lnL (n_lept/Th K2) disp_mo /(g^2 b)
    disp_cp= 1.194e-14 n_p Intd2cp /(Th_p^1.5 (1+1.875 Th_p
             +.8203 Th_p^2) g^2 b)                   [gamma < 3]
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

ME_KEV = 511.0
MP_KEV = 9.38e5


def ch_f(x):
    """update2d.f:2402-2421."""
    x = np.asarray(x, np.float64)
    ok = x >= 1.00000001
    xs = np.where(ok, x, 2.0)
    z = np.sqrt(0.5 * (xs - 1.0))
    x1 = 2.0 * np.log(z + np.sqrt(z * z + 1.0))
    x2 = np.sqrt(xs * xs - 1.0)
    x3 = np.sqrt((xs + 1.0) / (xs - 1.0))
    return np.where(ok, x1 + x2 - x3, 0.0)


def z_f(g, g1, x):
    """update2d.f:2425-2443."""
    x = np.asarray(x, np.float64)
    ok = x >= 1.00000001
    xs = np.where(ok, x, 2.0)
    y = xs * xs - 1.0
    sq = np.sqrt(y)
    I1 = sq - np.log(xs + sq) + np.sqrt((xs - 1.0) / (xs + 1.0))
    I2 = 0.5 * (xs * sq + np.log(xs + sq))
    return np.where(ok, 0.5 * (g + g1) ** 2 * I1 - I2, 0.0)


def dg_mo(g, b, theta, n_x=4000):
    """Small-angle Moller energy-exchange integral
    (update2d.f:2330-2358), vectorized over the thermal bath grid."""
    g = np.asarray(g, np.float64)[..., None]
    b = np.asarray(b, np.float64)[..., None]
    xs = 1.0 + (np.arange(n_x) + 0.5) * (10.0 * theta / n_x)
    d = 10.0 * theta / n_x
    bs = np.sqrt(np.maximum(1.0 - 1.0 / xs**2, 0.0))
    y = xs / theta
    gplus = g * xs * (1.0 + b * bs)
    gminus = g * xs * (1.0 - b * bs)
    chi = ch_f(gplus) - ch_f(gminus)
    sd = np.where(
        (y < 500.0) & (gplus > 1.0001 * gminus),
        0.5 * (xs - g) * chi * np.exp(-np.minimum(y, 500.0)),
        0.0,
    )
    return np.sum(sd * d, axis=-1)


def disp_mo(g, b, theta, n_x=4000):
    """update2d.f:2366-2396."""
    g = np.asarray(g, np.float64)[..., None]
    b = np.asarray(b, np.float64)[..., None]
    xs = 1.0 + (np.arange(n_x) + 0.5) * (10.0 * theta / n_x)
    d = 10.0 * theta / n_x
    bs = np.sqrt(np.maximum(1.0 - 1.0 / xs**2, 0.0))
    y = xs / theta
    gplus = g * xs * (1.0 + b * bs)
    gminus = g * xs * (1.0 - b * bs)
    chi = ch_f(gplus) - ch_f(gminus)
    zeta = z_f(g, xs, gplus) - z_f(g, xs, gminus)
    sd = np.where(
        (y < 500.0) & (gplus > 1.0001 * gminus),
        (-0.5 * (g - xs) ** 2 * chi + zeta)
        * np.exp(-np.minimum(y, 500.0)),
        0.0,
    )
    return np.sum(sd * d, axis=-1)


def intdgcp(g, b, kTp, n_gr=12000):
    """Relativistic e-p Coulomb drift integral (update2d.f:2083-2139),
    midpoint log grid over the proton Lorentz factor."""
    g = float(g)
    b = float(b)
    me, mp = ME_KEV, MP_KEV
    dgr = 1.001
    gr = np.cumprod(np.full(n_gr, dgr)) / dgr
    grs = gr * 0.5 * (1.0 + dgr)
    d = dgr - 1.0
    br = np.sqrt(np.maximum(1.0 - 1.0 / grs**2, 1e-30))
    s = mp**2 + me**2 + 2.0 * mp * me * grs
    q = np.sqrt(s) / kTp
    gs = (mp * grs + me) / np.sqrt(s)
    bs = np.sqrt(np.maximum(1.0 - 1.0 / gs**2, 0.0))
    E10, E1s = me * g, me * gs
    p10 = me * g * b
    p1s = me * mp * grs * br / np.sqrt(s)
    gcp = (E10 * E1s + p10 * p1s) / me**2
    gcm = (E10 * E1s - p10 * p1s) / me**2
    xm = (mp + g * me) / kTp - q * gcm
    xp = (mp + g * me) / kTp - q * gcp
    om1 = np.where(xm > -200.0, np.exp(np.minimum(xm, 200.0)), 0.0)
    om2 = np.where(xp > -200.0, np.exp(np.minimum(xp, 200.0)), 0.0)
    om_p, om_m = om1 + om2, om1 - om2
    sd = (
        om_m * (g * (bs * gs) ** 2 + gs / q)
        - om_p * b * g * bs * gs**2
    ) / (grs * br**3)
    return float(np.sum(sd * gr * d))


def _inteta(x0, x1, p, q, tau, n=2000):
    """update2d.f:2446-2470 (midpoint log grid)."""
    if x1 <= x0:
        return 0.0
    x = np.geomspace(x0, x1, n + 1)
    xs = np.sqrt(x[1:] * x[:-1])
    dx = np.diff(x)
    y = tau - q * xs
    sd = np.where(
        y > -200.0,
        (xs**p if p >= 0.1 else 1.0) * np.exp(np.minimum(y, 200.0)),
        0.0,
    )
    return float(np.sum(sd * dx))


def intd2cp(g, b, kTp, lnL=20.0, n_gr=3000):
    """update2d.f:2145-2196."""
    me, mp = ME_KEV, MP_KEV
    dgr = 1.001
    gr = np.cumprod(np.full(n_gr, dgr)) / dgr
    grs = gr * 0.5 * (1.0 + dgr)
    d = dgr - 1.0
    total = 0.0
    br = np.sqrt(np.maximum(1.0 - 1.0 / grs**2, 1e-30))
    const_A = lnL - 0.25 * (1.0 + br**2)
    const_B = lnL - 0.25 * (6.0 + br**2)
    s = mp**2 + me**2 + 2.0 * mp * me * grs
    gs = (mp * grs + me) / np.sqrt(s)
    bs = np.sqrt(np.maximum(1.0 - 1.0 / gs**2, 1e-30))
    p1s = me * mp * grs * br / np.sqrt(s)
    gcp = (me * g * me * gs + me * g * b * p1s) / me**2
    gcm = (me * g * me * gs - me * g * b * p1s) / me**2
    q = np.sqrt(s) / kTp
    tau = (mp + g * me) / kTp
    for i in range(n_gr):
        if gcp[i] <= gcm[i] * (1.0 + 1e-12):
            continue
        eta0 = _inteta(gcm[i], gcp[i], 0.0, q[i], tau)
        eta1 = _inteta(gcm[i], gcp[i], 1.0, q[i], tau)
        eta2 = _inteta(gcm[i], gcp[i], 2.0, q[i], tau)
        sd = (
            -eta0 * (const_A[i] * (bs[i] * gs[i]) ** 2
                     + const_B[i] * g**2)
            + 2.0 * eta1 * const_B[i] * g * gs[i]
            + eta2 * (const_A[i] * (bs[i] * gs[i]) ** 2
                      - const_B[i] * gs[i] ** 2)
        ) / (gs[i] * bs[i] * br[i] ** 2)
        total += sd * gr[i] * d
        # convergence in the reference: stop once terms are negligible
        if i > 100 and abs(sd) < 1e-12 * abs(total):
            break
    return float(total)


def _k2_theta(theta):
    """Th * K2(1/Th) (the reference's Th_K2, update2d.f:878)."""
    from compton2d_tpu.physics.electron_dist import _mcdonald_np

    return float(theta * _mcdonald_np(2.0, np.array([1.0 / theta]))[0])


class CoulombTables(NamedTuple):
    """(gamma x T) tables for jit-time interpolation (the reference's
    rates/ file cache, coulomb.f:29-132)."""

    log_te: jnp.ndarray     # (nte,) electron temperature grid [keV]
    log_tp: jnp.ndarray     # (ntp,) proton temperature grid [keV]
    dg_ce: jnp.ndarray      # (nte, num_nt) per n_lept [1/s cm^3]
    disp_ce: jnp.ndarray    # (nte, num_nt)
    dg_cp: jnp.ndarray      # (ntp, num_nt) per n_p
    disp_cp: jnp.ndarray    # (ntp, num_nt)

    def lookup(self, gnt_idx_unused, te, tp):
        """Interpolated per-zone coefficient rows; te/tp shape (Z,).
        Returns (dg_ce, disp_ce, dg_cp, disp_cp) each (Z, num_nt),
        still to be multiplied by n_lept / n_p."""
        def interp(table, grid, t):
            x = jnp.interp(jnp.log(t), grid,
                           jnp.arange(grid.shape[0], dtype=jnp.float32))
            i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                          grid.shape[0] - 2)
            f = (x - i0)[:, None]
            return table[i0] * (1 - f) + table[i0 + 1] * f

        return (
            interp(self.dg_ce, self.log_te, te),
            interp(self.disp_ce, self.log_te, te),
            interp(self.dg_cp, self.log_tp, tp),
            interp(self.disp_cp, self.log_tp, tp),
        )


def build_coulomb_tables(
    gnt: np.ndarray,
    te_grid=None,
    tp_grid=None,
    lnL: float = 20.0,
    gamma_cp_max: float = 3.0,
) -> CoulombTables:
    """Precompute the coefficient tables (host numpy f64 -> f32 device).

    Uses the NM98 small-angle Moller forms for e-e (the reference's
    live path when rate files are absent, update2d.f:911-915, 966-977)
    and Intdgcp/Intd2cp for e-p below gamma_cp_max (frozen above, as in
    update2d.f:898-907).
    """
    if te_grid is None:
        te_grid = np.geomspace(5.0, 1000.0, 24)
    if tp_grid is None:
        tp_grid = np.geomspace(5.0, 1.0e5, 8)
    gamma = np.asarray(gnt) + 1.0
    beta = np.sqrt(np.maximum(1.0 - 1.0 / gamma**2, 1e-20))
    num_nt = len(gamma)

    dg_ce = np.zeros((len(te_grid), num_nt))
    disp_ce = np.zeros_like(dg_ce)
    for i, te in enumerate(te_grid):
        th = te / ME_KEV
        k2 = _k2_theta(th)
        dm = dg_mo(gamma, beta, th)
        d2 = disp_mo(gamma, beta, th)
        dg_ce[i] = 1.496e-14 * lnL / k2 * dm / (gamma**2 * beta)
        disp_ce[i] = 0.25 * 2.99e-14 * lnL / k2 * d2 / (gamma**2 * beta)

    dg_cp = np.zeros((len(tp_grid), num_nt))
    disp_cp = np.zeros_like(dg_cp)
    for i, tp in enumerate(tp_grid):
        th_p = tp / MP_KEV
        denom_fac = (1.0 + 1.875 * th_p + 0.8203 * th_p**2)
        last_dg = 0.0
        for j, (g, b) in enumerate(zip(gamma, beta)):
            if g < gamma_cp_max:
                last_dg = (
                    1.194e-14 * lnL * intdgcp(g, b, tp)
                    / (denom_fac * np.sqrt(th_p) * g**2 * b)
                )
                disp_cp[i, j] = (
                    1.194e-14 * intd2cp(g, b, tp, lnL)
                    / (th_p**1.5 * denom_fac * g**2 * b)
                )
            dg_cp[i, j] = last_dg
    return CoulombTables(
        log_te=jnp.asarray(np.log(te_grid), jnp.float32),
        log_tp=jnp.asarray(np.log(tp_grid), jnp.float32),
        dg_ce=jnp.asarray(dg_ce, jnp.float32),
        disp_ce=jnp.asarray(disp_ce, jnp.float32),
        dg_cp=jnp.asarray(dg_cp, jnp.float32),
        disp_cp=jnp.asarray(disp_cp, jnp.float32),
    )

"""Hybrid thermal + nonthermal electron distributions.

Re-implements the reference's per-zone electron distribution machinery
(``/root/reference/src/nontherm2d.f``, ``gamma1_2d.f``, and the
``gamma_bar``/``McDonald`` helpers of ``volume2d.f:572-666``) as
vectorized-over-zones JAX functions:

- the log gamma-1 grid ``gnt`` (nontherm2d.f:52-99);
- initial hybrid Maxwell-Juttner + power-law ``f_nt`` and its sampling CDF
  ``Pnt`` (nontherm2d.f:57-125);
- inverse-CDF electron draws for the scatter kernel (nth2d,
  nontherm2d.f:159-183);
- mean thermal Lorentz factor gamma_bar(Theta) and its inverse (used for
  the FP temperature update, update2d.f:1440-1468), via a precomputed
  monotone table instead of the reference's multiplicative bisection.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from compton2d_tpu import constants as cn


def gnt_grid(num_nt: int = cn.NUM_NT) -> np.ndarray:
    """Log grid in gamma-1: gnt[0] = 0.2/1.1, gnt[i] = 0.2*1.1^(i-1)
    (nontherm2d.f:52-54, 87-99)."""
    i = np.arange(num_nt)
    g = cn.GNT_FIRST * cn.GNT_RATIO ** (i - 1.0)
    return g


def maxwell_juttner_shape(gnt: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized relativistic Maxwellian g^2 beta exp(-(g-1)/Theta)
    on the gamma-1 grid (nontherm2d.f:62-67). Broadcasts theta against a
    trailing gamma axis."""
    g = gnt + 1.0
    beta = jnp.sqrt(jnp.maximum(1.0 - 1.0 / (g * g), 0.0))
    y = gnt / theta
    return jnp.where(y < 100.0, g * g * beta * jnp.exp(-y), 0.0)


def init_f_nt(
    gnt: jnp.ndarray,     # (num_nt,)
    tea: jnp.ndarray,     # (nz, nr) [keV]
    amxwl: jnp.ndarray,   # (nz, nr)
    gmin: jnp.ndarray,    # (nz, nr)
    gmax: jnp.ndarray,    # (nz, nr)
    p_nth: jnp.ndarray,   # (nz, nr)
) -> jnp.ndarray:
    """Initial hybrid distribution, all zones at once
    (nontherm2d.f:57-125). Returns f_nt with unit integral
    sum_i f(i) dgamma(i), shape (nz, nr, num_nt)."""
    theta = (tea / cn.EMASS_KEV)[..., None]
    g = gnt + 1.0                                     # (num_nt,)
    dg = jnp.diff(gnt)
    w = jnp.concatenate([dg, dg[-1:] * 0.0])          # left-rectangle weights

    th = maxwell_juttner_shape(gnt, theta)            # (nz, nr, num_nt)
    th = jnp.where(g < gmin[..., None], th, 0.0)
    th_norm = jnp.maximum(jnp.sum(th * w, axis=-1, keepdims=True), 1e-30)
    th = th / th_norm

    p1 = 1.0 - p_nth[..., None]
    n_nth = p1 / (gmax[..., None] ** p1 - gmin[..., None] ** p1)
    y = g / gmax[..., None]
    pl = jnp.where(
        (g >= gmin[..., None]) & (y < 100.0),
        n_nth * g ** (-p_nth[..., None]) * jnp.exp(-y),
        0.0,
    )

    a = amxwl[..., None]
    f = jnp.where(a > 1e-4, a * th, 0.0) + jnp.where(
        a < 0.99999999, (1.0 - a) * pl, 0.0
    )
    norm = jnp.maximum(jnp.sum(f * w, axis=-1, keepdims=True), 1e-30)
    return f / norm


def build_cdf(f_nt: jnp.ndarray, gnt: jnp.ndarray) -> jnp.ndarray:
    """Sampling CDF Pnt over the gamma grid (nontherm2d.f:89-102,120),
    normalized to 1 in the last bin. Shape = f_nt."""
    dg = jnp.diff(gnt)
    contrib = f_nt[..., :-1] * dg
    cdf = jnp.cumsum(contrib, axis=-1)
    total = jnp.maximum(cdf[..., -1:], 1e-30)
    cdf = cdf / total
    return jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)


def sample_gamma(
    u: jnp.ndarray,        # uniforms in [0,1), any shape S
    cdf: jnp.ndarray,      # (..., num_nt) per-zone CDF already gathered to S
    gnt: jnp.ndarray,      # (num_nt,)
):
    """Inverse-CDF electron draw (nth2d, nontherm2d.f:172-180).

    Returns (gamma, beta, bin_index). ``cdf`` must be pre-gathered so its
    leading shape matches ``u`` (one CDF row per sample).
    """
    # searchsorted along the last axis, batched
    idx = jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 1, gnt.shape[0] - 1)
    gm1 = jnp.sqrt(gnt[idx] * gnt[idx - 1])
    gamma = gm1 + 1.0
    beta = jnp.sqrt(jnp.maximum(1.0 - 1.0 / (gamma * gamma), 0.0))
    return gamma, beta, idx


# ---------------------------------------------------------------------------
# Mean thermal Lorentz factor and its inverse
# ---------------------------------------------------------------------------
def _mcdonald_np(nu: float, z: np.ndarray) -> np.ndarray:
    """Modified Bessel K_nu(z) by the integral representation the
    reference uses (volume2d.f:599-636), host-side numpy."""
    from math import gamma as gamma_fn, sqrt, pi

    t = np.geomspace(1.0, 1e4, 20000)
    ts = np.sqrt(t[1:] * t[:-1])
    dt = np.diff(t)
    z = np.atleast_1d(np.asarray(z, np.float64))
    y = z[:, None] * ts[None, :]
    integrand = np.where(
        y < 700.0, (ts**2 - 1.0) ** (nu - 0.5) * np.exp(-y), 0.0
    )
    integral = np.sum(integrand * dt[None, :], axis=-1)
    pref = sqrt(pi) * (0.5 * z) ** nu / gamma_fn(nu + 0.5)
    return pref * integral


def gamma_bar_np(theta: np.ndarray) -> np.ndarray:
    """<gamma> - Theta of a Maxwell-Juttner distribution
    (volume2d.f:572-594): Pade fit below Theta=0.2, K3/K2 - Theta above."""
    theta = np.asarray(theta, np.float64)
    fit = (
        (1.0 + 4.375 * theta + 7.383 * theta**2 + 3.384 * theta**3)
        / (1.0 + 1.875 * theta + 0.8203 * theta**2)
        - theta
    )
    k2 = _mcdonald_np(2.0, 1.0 / np.maximum(theta, 1e-10))
    k3 = _mcdonald_np(3.0, 1.0 / np.maximum(theta, 1e-10))
    with np.errstate(invalid="ignore", divide="ignore"):
        exact = k3 / np.maximum(k2, 1e-30) - theta
    out = np.where(theta < 0.2, fit, exact)
    return np.maximum(out, 1.0)


class GammaBarTable(NamedTuple):
    """Monotone table of gamma_bar(Theta) for vectorized forward/inverse
    evaluation inside jit (replaces the reference's bisection loop,
    update2d.f:1445-1462). A pytree of device arrays."""

    log_theta: jnp.ndarray
    gbar: jnp.ndarray
    log_gbar_m1: jnp.ndarray

    @classmethod
    def build(cls, theta_min=1e-4, theta_max=30.0, n=512) -> "GammaBarTable":
        log_theta = np.linspace(np.log(theta_min), np.log(theta_max), n)
        gbar = gamma_bar_np(np.exp(log_theta))
        # enforce strict monotonicity for inversion
        gbar = np.maximum.accumulate(gbar)
        return cls(
            log_theta=jnp.asarray(log_theta),
            gbar=jnp.asarray(gbar),
            log_gbar_m1=jnp.asarray(np.log(np.maximum(gbar - 1.0, 1e-12))),
        )

    def forward(self, theta: jnp.ndarray) -> jnp.ndarray:
        return jnp.interp(jnp.log(theta), self.log_theta, self.gbar)

    def inverse(self, gbar: jnp.ndarray) -> jnp.ndarray:
        """Theta such that gamma_bar(Theta) = gbar (clipped to table)."""
        lg = jnp.log(jnp.maximum(gbar - 1.0, 1e-12))
        return jnp.exp(jnp.interp(lg, self.log_gbar_m1, self.log_theta))

"""Vectorized relativistic Compton scattering kernel.

Re-implements the single-scatter sampler ``compb2d``
(``/root/reference/src/compb_2d.f``) for a whole batch of photons at once:

1. draw a target electron from the zone's hybrid distribution CDF
   (nth2d, nontherm2d.f:159-183);
2. relativistic flux-factor selection of the electron-photon angle
   (compb_2d.f:58-68);
3. accept the target with probability sigma_KN/sigma_T at the
   Doppler-shifted energy (compb_2d.f:75-93);
4. sample the scattered energy in the electron frame by the standard
   sz-rejection (compb_2d.f:98-107);
5. boost back to the lab, update direction cosines and azimuth
   (compb_2d.f:143-239);
6. weight update ew *= E'/E so photon number ew/E is conserved
   (compb_2d.f:307).

The reference's open-ended rejection loops become fixed-bound masked
while-loops (all photons retry in lockstep until every one has accepted).
The von-Neumann (wa, wb) circle trick for azimuths (compb_2d.f:111-121)
is replaced by the exact equivalent cos/sin of a uniform angle, and the
azimuthal rotation is applied to the (cphi, sphi) unit vector with a
random sign (the reference always rotates one way, compb_2d.f:230-235,
which is statistically equivalent for azimuth-symmetric tallies).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from compton2d_tpu import constants as cn

_CLAMP = 0.9999999


class ScatterResult(NamedTuple):
    e: jnp.ndarray       # new photon energy [keV]
    mu: jnp.ndarray      # new direction cosine
    cphi: jnp.ndarray    # new azimuth unit vector
    sphi: jnp.ndarray
    wscale: jnp.ndarray  # multiplicative weight factor E'/E
    i_gam: jnp.ndarray   # int32 electron bin index (for the E_IC tally)


def _sample_electron_and_angle(key, znu, draw_electron, max_tries, need):
    """Stages 1-3: returns (gamma, beta, omeg, znue, i_gam).

    ``draw_electron(key) -> (gamma, beta, i_gam)`` supplies target
    candidates (inverse-CDF zone draw in production; a fixed population
    in tests). Masked rejection: keeps redrawing for unaccepted photons
    up to ``max_tries`` rounds; the last draw is kept on exhaustion (the
    acceptance probability is bounded well away from 0). The electron is
    redrawn jointly with the angle, as in the reference (compb_2d.f:36-93),
    so accepted targets carry the correct KN weighting.
    """
    n = znu.shape[0]

    def body(carry):
        it, key, acc, gamma, beta, omeg, znue, i_gam = carry
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        g_new, b_new, i_new = draw_electron(k1)
        om = 2.0 * jax.random.uniform(k2, (n,), jnp.float32) - 1.0
        om = jnp.clip(om, -_CLAMP, _CLAMP)
        # relativistic flux factor: flip with prob 1 - (1-beta*om)/2
        tl = jax.random.uniform(k3, (n,), jnp.float32)
        tr = 0.5 * (1.0 - b_new * om)
        om = jnp.clip(jnp.where(tl > tr, -om, om), -_CLAMP, _CLAMP)
        zn = (1.0 - b_new * om) * znu * g_new
        xknot = _kn_ratio_f32(zn)
        u_acc = jax.random.uniform(k4, (n,), jnp.float32)
        ok = (zn >= 1e-10) & (u_acc <= xknot)
        take = ok & ~acc
        gamma = jnp.where(take, g_new, gamma)
        beta = jnp.where(take, b_new, beta)
        omeg = jnp.where(take, om, omeg)
        znue = jnp.where(take, zn, znue)
        i_gam = jnp.where(take, i_new, i_gam)
        return it + 1, key, acc | ok, gamma, beta, omeg, znue, i_gam

    def cond(carry):
        it, _, acc, *_ = carry
        return (it < max_tries) & ~jnp.all(acc)

    z0 = jnp.zeros((n,), jnp.float32)
    init = (
        0, key, ~need,
        jnp.ones((n,), jnp.float32), z0, z0,
        jnp.full((n,), 1e-3, jnp.float32),
        jnp.zeros((n,), jnp.int32),
    )
    _, _, acc, gamma, beta, omeg, znue, i_gam = jax.lax.while_loop(
        cond, body, init
    )
    return gamma, beta, omeg, znue, i_gam


def _draw_from_cdf(u, cdf_rows, gnt):
    """Inverse-CDF electron draw; cdf_rows shape (n, num_nt).

    The bin-midpoint lookup is a one-hot matmul rather than
    ``gnt[idx]`` — per-lane scalar gathers cost ~10 ns each on TPU and
    this runs inside the rejection retry loop (two gathers x n lanes x
    tries ~ milliseconds per scatter round)."""
    num_nt = gnt.shape[0]
    idx = jnp.sum((cdf_rows < u[:, None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 1, num_nt - 1)
    gm1_mid = jnp.sqrt(gnt[1:] * gnt[:-1]).astype(jnp.float32)
    oh = (
        idx[:, None] - 1
        == jax.lax.broadcasted_iota(jnp.int32, (1, num_nt - 1), 1)
    ).astype(jnp.float32)
    gm1 = jnp.dot(oh, gm1_mid, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    gamma = gm1 + 1.0
    beta = jnp.sqrt(jnp.maximum(1.0 - 1.0 / (gamma * gamma), 0.0))
    return gamma, beta, idx.astype(jnp.int32)


def _kn_ratio_f32(znue):
    """sigma_KN(z)/sigma_T (compb_2d.f:77-87) in f32.

    The closed form's numerator ``4z + gamz*log(1+2z) + O(z^3)``
    cancels to O(z^3), amplifying the platform log error by ~1/z^2 —
    on TPU (log accurate to ~1e-6 relative) that is O(10%+) errors in
    the KN *acceptance probability* for z in [0.01, 0.1], the core
    Comptonization regime, silently biasing the electron selection.
    The reference's f64 build tolerates its z<=1e-2 cutoff; this f32
    port uses the 7-term series to z = 0.15 (truncation ~1.4e-4 at the
    cutoff, and the closed form's log sensitivity has fallen below
    1e-4 by then)."""
    z = znue
    small = z <= 0.15
    # sigma/sigma_T = 1 - 2z + 26/5 z^2 - 133/10 z^3 + 1144/35 z^4
    #   - 544/7 z^5 + 7864/63 z^6 - ...
    ser = 1.0 - z * (2.0 - z * (5.2 - z * (13.3 - z * (
        32.685714 - z * (77.714286 - z * 124.825397)
    ))))
    zs = jnp.maximum(z, 1e-6)
    z3 = zs * zs * zs
    betz = 1.0 + 2.0 * zs
    gamz = zs * (zs - 2.0) - 2.0
    full = 0.375 * (
        4.0 * zs + 2.0 * z3 * (1.0 + zs) / (betz * betz)
        + gamz * jnp.log(betz)
    ) / z3
    return jnp.where(small, ser, full)


def _sample_sz(key, znue, max_tries, need):
    """Stage 4 (compb_2d.f:98-107): sample sz = E'_rest/E_rest."""
    n = znue.shape[0]
    betz = 1.0 + 2.0 * znue
    phat = betz + 1.0 / betz

    def body(carry):
        it, key, acc, sz = carry
        key, k1, k2 = jax.random.split(key, 3)
        u1 = jax.random.uniform(k1, (n,), jnp.float32)
        s = (1.0 + 2.0 * znue * u1) / betz
        games = 1.0 + (1.0 - 1.0 / s) / znue
        ok_g = games * games <= 1.0
        tr = games * games - 1.0 + s + 1.0 / s
        u2 = jax.random.uniform(k2, (n,), jnp.float32)
        ok = ok_g & (u2 * phat <= tr)
        take = ok & ~acc
        sz = jnp.where(take, s, sz)
        return it + 1, key, acc | ok, sz

    def cond(carry):
        it, _, acc, _ = carry
        return (it < max_tries) & ~jnp.all(acc)

    init = (0, key, ~need, jnp.ones((n,), jnp.float32))
    _, _, _, sz = jax.lax.while_loop(cond, body, init)
    return sz


def scatter(
    key: jax.Array,
    e_kev: jnp.ndarray,       # (n,) photon energies
    mu: jnp.ndarray,          # (n,)
    cphi: jnp.ndarray,        # (n,)
    sphi: jnp.ndarray,        # (n,)
    cdf_rows: jnp.ndarray,    # (n, num_nt) per-photon zone electron CDF
    gnt: jnp.ndarray,         # (num_nt,)
    max_tries: int = 64,
    draw_electron=None,
    need: jnp.ndarray | None = None,
) -> ScatterResult:
    """Sample one Compton scattering for each photon in the batch.

    ``draw_electron`` overrides the zone-CDF target draw (testing with
    prescribed electron populations). ``need`` marks the slots that
    actually scatter this call — unneeded slots are treated as already
    accepted so the rejection loops exit immediately (their outputs are
    unused garbage)."""
    znu = (e_kev / cn.EMASS_KEV).astype(jnp.float32)
    n = znu.shape[0]
    if need is None:
        need = jnp.ones((n,), bool)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    if draw_electron is None:
        def draw_electron(k):
            u_e = jax.random.uniform(k, (n,), jnp.float32)
            return _draw_from_cdf(u_e, cdf_rows, gnt)

    gamma, beta, omeg, znue, i_gam = _sample_electron_and_angle(
        k1, znu, draw_electron, max_tries, need
    )
    sz = _sample_sz(k2, znue, max_tries, need)
    return _finish_scatter(
        (k3, k4, k5), znu, mu, cphi, sphi,
        gamma, beta, omeg, znue, sz, i_gam,
    )


def scatter_stratified(
    key: jax.Array,
    e_kev: jnp.ndarray,
    mu: jnp.ndarray,
    cphi: jnp.ndarray,
    sphi: jnp.ndarray,
    cdf_rows: jnp.ndarray,
    gnt: jnp.ndarray,
    u_lo: jnp.ndarray,        # (n,) electron-CDF stratum bounds
    u_hi: jnp.ndarray,
    inv_z: jnp.ndarray,       # (n,) 1/Z = n_eff sigma_T L / sigma_zone(E)
    max_tries: int = 64,
    need: jnp.ndarray | None = None,
) -> ScatterResult:
    """Weighted (rejection-free) scatter for stratified tail splitting.

    The target electron conditional given a scattering event is
    p(gamma, omega | scat) ∝ f(gamma) * flux(omega) * sigma_KN(znue)
    with normalizer Z = <sigma_KN-ratio> = sigma_zone(E)/(n_eff sigma_T)
    — exactly the per-zone macroscopic table the tracker already
    interpolates. Instead of the reference's acceptance-rejection on
    sigma_KN (compb_2d.f:75-93) this draws gamma by inverse CDF
    *restricted to* [u_lo, u_hi) and omega from the flux measure, and
    carries the measure correction sigma_KN-ratio(znue)/Z in ``wscale``.
    Unbiased for any stratum: the caller supplies the stratum
    probability P(S) = u_hi - u_lo as the split weight fraction.

    This replaces the reference's biased spl3 re-sampling loop
    (imctrk2d.f:629-661 resamples until the upscatter is large) with an
    exact zero-bias scheme that guarantees tail coverage.
    """
    znu = (e_kev / cn.EMASS_KEV).astype(jnp.float32)
    n = znu.shape[0]
    if need is None:
        need = jnp.ones((n,), bool)
    k1a, k1b, k1c, k2, k3, k4, k5 = jax.random.split(key, 7)

    u_e = u_lo + jax.random.uniform(k1a, (n,), jnp.float32) * jnp.maximum(
        u_hi - u_lo, 0.0
    )
    gamma, beta, i_gam = _draw_from_cdf(u_e, cdf_rows, gnt)
    om = 2.0 * jax.random.uniform(k1b, (n,), jnp.float32) - 1.0
    om = jnp.clip(om, -_CLAMP, _CLAMP)
    tl = jax.random.uniform(k1c, (n,), jnp.float32)
    om = jnp.clip(
        jnp.where(tl > 0.5 * (1.0 - beta * om), -om, om), -_CLAMP, _CLAMP
    )
    znue = jnp.maximum((1.0 - beta * om) * znu * gamma, 1e-10)
    w_kn = _kn_ratio_f32(znue) * inv_z

    sz = _sample_sz(k2, znue, max_tries, need)
    res = _finish_scatter(
        (k3, k4, k5), znu, mu, cphi, sphi,
        gamma, beta, om, znue, sz, i_gam,
    )
    return res._replace(wscale=res.wscale * w_kn)


def _finish_scatter(keys, znu, mu, cphi, sphi, gamma, beta, omeg, znue,
                    sz, i_gam) -> ScatterResult:
    """Stages 5-6 (compb_2d.f:111-239): electron-frame angles, boost to
    lab, new direction cosines and azimuth, weight scale E'/E."""
    k3, k4, k5 = keys
    n = znu.shape[0]
    znues = znue * sz

    # electron-frame angles (compb_2d.f:111-132)
    a1 = jnp.pi * (
        2.0 * jax.random.uniform(k3, (n,), jnp.float32) - 1.0
    )
    cazes = jnp.cos(a1)
    omege = jnp.clip((omeg - beta) / (1.0 - beta * omeg), -_CLAMP, _CLAMP)
    games = 1.0 + (1.0 - 1.0 / sz) / znue
    games = jnp.clip(games, -_CLAMP, _CLAMP)
    omeges = games * omege + cazes * jnp.sqrt(
        jnp.maximum((1.0 - omege * omege) * (1.0 - games * games), 0.0)
    )
    omeges = jnp.clip(omeges, -_CLAMP, _CLAMP)

    # boost back to lab (compb_2d.f:143-153)
    znus = (1.0 + beta * omeges) * gamma * znues
    gams = 1.0 - (znue - znues) / jnp.maximum(znu * znus, 1e-30)
    gams = jnp.clip(gams, -_CLAMP, _CLAMP)

    # new polar direction (compb_2d.f:159-172)
    a2 = jnp.pi * (2.0 * jax.random.uniform(k4, (n,), jnp.float32) - 1.0)
    cazs = jnp.clip(jnp.cos(a2), -_CLAMP, _CLAMP)
    mu_c = jnp.clip(mu, -_CLAMP, _CLAMP)
    wmus = mu_c * gams + cazs * jnp.sqrt(
        jnp.maximum((1.0 - gams * gams) * (1.0 - mu_c * mu_c), 0.0)
    )
    wmus = jnp.clip(wmus, -_CLAMP, _CLAMP)

    # azimuth rotation (compb_2d.f:230-235) applied to the unit vector,
    # with a random sign
    cosd = (gams - mu_c * wmus) / jnp.sqrt(
        jnp.maximum((1.0 - mu_c * mu_c) * (1.0 - wmus * wmus), 1e-20)
    )
    cosd = jnp.clip(cosd, -_CLAMP, _CLAMP)
    sind = jnp.sqrt(jnp.maximum(1.0 - cosd * cosd, 0.0))
    sgn = jnp.where(
        jax.random.uniform(k5, (n,), jnp.float32) < 0.5, 1.0, -1.0
    )
    sind = sgn * sind
    cphi_n = cphi * cosd - sphi * sind
    sphi_n = sphi * cosd + cphi * sind
    nrm = jnp.sqrt(jnp.maximum(cphi_n**2 + sphi_n**2, 1e-12))

    e_new = znus * jnp.float32(cn.EMASS_KEV)
    wscale = znus / jnp.maximum(znu, 1e-30)
    return ScatterResult(
        e=e_new, mu=wmus, cphi=cphi_n / nrm, sphi=sphi_n / nrm,
        wscale=wscale, i_gam=i_gam,
    )

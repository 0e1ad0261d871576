"""Compton scatter kernel physics tests: energy shift moments against
analytic Comptonization theory."""
import jax
import jax.numpy as jnp
import numpy as np

from compton2d_tpu.physics import electron_dist as ed
from compton2d_tpu.transport import scatter as sc


def _thermal_cdf(gnt, n, t_kev=100.0):
    """CDF of a thermal distribution representable on the gnt grid."""
    f = ed.init_f_nt(
        jnp.asarray(gnt),
        jnp.full((1, 1), t_kev),
        jnp.full((1, 1), 1.0),
        jnp.full((1, 1), 1e3),
        jnp.full((1, 1), 1e5),
        jnp.full((1, 1), 2.5),
    )
    cdf = ed.build_cdf(f, jnp.asarray(gnt))
    return jnp.broadcast_to(cdf[0, 0], (n, cdf.shape[-1]))


def test_cold_thomson_recoil():
    """Low-energy photons on (prescribed) cold electrons:
    <dE/E> = -E/mc^2 recoil. The gnt grid cannot represent cold
    electrons (floor gamma-1 = 0.18, as in the reference), so prescribe
    them via draw_electron."""
    gnt = ed.gnt_grid(200)
    n = 60000
    e0 = 5.0  # keV

    def cold(key):
        g = jnp.full((n,), 1.0 + 1e-9, jnp.float32)
        b = jnp.full((n,), 1e-5, jnp.float32)
        return g, b, jnp.zeros((n,), jnp.int32)

    res = sc.scatter(
        jax.random.key(0),
        jnp.full((n,), e0, jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, gnt.shape[0])), jnp.asarray(gnt),
        draw_electron=cold,
    )
    shift = float(jnp.mean(res.e)) / e0 - 1.0
    assert np.isclose(shift, -e0 / 511.0, atol=1e-3)


def test_inverse_compton_amplification():
    """Mono-energetic isotropic electrons, Thomson regime:
    <E'/E> = (4/3) gamma^2 - 1/3 (classic single-scatter result with
    the relativistic flux factor)."""
    gnt = ed.gnt_grid(200)
    n = 120000
    e0 = 0.1  # keV; gamma*E << mc^2 keeps KN corrections tiny
    g0 = 2.0
    b0 = float(np.sqrt(1 - 1 / g0**2))

    def mono(key):
        return (
            jnp.full((n,), g0, jnp.float32),
            jnp.full((n,), b0, jnp.float32),
            jnp.zeros((n,), jnp.int32),
        )

    key = jax.random.key(1)
    mu0 = jax.random.uniform(key, (n,), jnp.float32, -1.0, 1.0)
    res = sc.scatter(
        jax.random.key(11),
        jnp.full((n,), e0, jnp.float32),
        mu0,
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, gnt.shape[0])), jnp.asarray(gnt),
        draw_electron=mono,
    )
    amp = float(jnp.mean(res.e)) / e0
    expect = (4.0 / 3.0) * g0**2 - 1.0 / 3.0
    assert np.isclose(amp, expect, rtol=0.02)


def test_isotropy_cold():
    """Scattering isotropic photons off an isotropic bath stays isotropic."""
    gnt = ed.gnt_grid(200)
    n = 60000
    key = jax.random.key(2)
    mu0 = jax.random.uniform(key, (n,), jnp.float32, -1.0, 1.0)
    cdf = _thermal_cdf(gnt, n)
    res = sc.scatter(
        jax.random.key(3),
        jnp.full((n,), 1.0, jnp.float32),
        mu0,
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        cdf, jnp.asarray(gnt),
    )
    assert abs(float(jnp.mean(res.mu))) < 0.01
    # <mu^2> = 1/3 for isotropic
    assert np.isclose(float(jnp.mean(res.mu**2)), 1.0 / 3.0, atol=0.01)
    # azimuth unit vectors stay normalized
    nrm = np.asarray(res.cphi**2 + res.sphi**2)
    assert np.allclose(nrm, 1.0, atol=1e-5)


def test_weight_scale_conserves_photon_number():
    gnt = ed.gnt_grid(200)
    n = 1000
    cdf = _thermal_cdf(gnt, n)
    e0 = jnp.full((n,), 10.0, jnp.float32)
    res = sc.scatter(
        jax.random.key(4), e0,
        jnp.zeros((n,), jnp.float32),
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        cdf, jnp.asarray(gnt),
    )
    # ew' / E' = ew / E  =>  wscale = E'/E
    assert np.allclose(
        np.asarray(res.wscale), np.asarray(res.e) / 10.0, rtol=1e-5
    )


def test_kn_ratio_f32_matches_f64_closed_form():
    """Regression for the TPU sampler bias (round 4): the closed-form
    KN total-sigma ratio cancels to O(z^3) near small z and amplifies
    the platform log error by ~1/z^2 — the f32 sampler must therefore
    use the series well past the cancellation region. Pin _kn_ratio_f32
    against the f64 closed form over the full Comptonization range."""
    import numpy as np
    import jax.numpy as jnp

    from compton2d_tpu.transport.scatter import _kn_ratio_f32

    z = np.geomspace(1e-5, 50.0, 400)
    z3 = z**3
    betz = 1 + 2 * z
    gamz = z * (z - 2) - 2
    small = z < 1e-3
    zs = np.where(small, 1e-3, z)
    full = 0.375 * (
        4 * zs + 2 * zs**3 * (1 + zs) / (1 + 2 * zs) ** 2
        + (zs * (zs - 2) - 2) * np.log(1 + 2 * zs)
    ) / zs**3
    series64 = 1 - z * (2 - z * (26 / 5 - z * (133 / 10 - z * (
        1144 / 35 - z * (544 / 7 - z * 7864 / 63)))))
    ref = np.where(small, series64, full)
    got = np.asarray(_kn_ratio_f32(jnp.asarray(z, jnp.float32)))
    assert np.max(np.abs(got / ref - 1)) < 5e-4, np.max(
        np.abs(got / ref - 1)
    )

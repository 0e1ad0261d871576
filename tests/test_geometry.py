"""Cylindrical flight geometry tests against brute-force ray marching."""
import jax.numpy as jnp
import numpy as np

from compton2d_tpu.transport import geometry as geo


def _march(r0, z0, mu, cphi, sphi, r_edges, z_edges, jz, kr, ds=1e-4):
    """Brute-force: march the straight ray in tiny steps until it leaves
    the zone box; return the path length."""
    # 3D cartesian: put photon at (x, y) = (r0, 0); radial dir is +x.
    sh = np.sqrt(1.0 - mu**2)
    d = np.array([sh * cphi, sh * sphi, mu])
    p = np.array([r0, 0.0, z0])
    s = 0.0
    rin, rout = r_edges[kr], r_edges[kr + 1]
    zb, zt = z_edges[jz], z_edges[jz + 1]
    for _ in range(10_000_000):
        p2 = p + d * ds
        rr = np.hypot(p2[0], p2[1])
        if rr > rout or (rr < rin) or p2[2] > zt or p2[2] < zb:
            # bisect for accuracy
            lo, hi = s, s + ds
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                pm = p + d * 0  # unused
                q = np.array([r0, 0, z0]) + d * mid
                rr = np.hypot(q[0], q[1])
                inside = (rin <= rr <= rout) and (zb <= q[2] <= zt)
                if inside:
                    lo = mid
                else:
                    hi = mid
            return 0.5 * (lo + hi)
        p = p2
        s += ds
    raise RuntimeError("no exit")


def test_distance_matches_ray_march():
    r_edges = np.array([0.0, 1.0, 2.0, 3.0])
    z_edges = np.array([0.0, 1.0, 2.0])
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(40):
        kr = rng.integers(0, 3)
        jz = rng.integers(0, 2)
        r0 = rng.uniform(r_edges[kr] + 0.01, r_edges[kr + 1] - 0.01)
        z0 = rng.uniform(z_edges[jz] + 0.01, z_edges[jz + 1] - 0.01)
        mu = rng.uniform(-0.95, 0.95)
        phi = rng.uniform(-np.pi, np.pi)
        cases.append((r0, z0, mu, np.cos(phi), np.sin(phi), jz, kr))
    arr = np.array([c[:5] for c in cases])
    jzs = np.array([c[5] for c in cases], np.int32)
    krs = np.array([c[6] for c in cases], np.int32)

    g = geo.distance_to_boundary(
        jnp.asarray(arr[:, 0], jnp.float32), jnp.asarray(arr[:, 1], jnp.float32),
        jnp.asarray(arr[:, 2], jnp.float32), jnp.asarray(arr[:, 3], jnp.float32),
        jnp.asarray(arr[:, 4], jnp.float32),
        jnp.asarray(jzs), jnp.asarray(krs),
        jnp.asarray(r_edges), jnp.asarray(z_edges),
    )
    got = np.asarray(g.trldb)
    for i, c in enumerate(cases):
        r0, z0, mu, cp, sp, jz, kr = c
        want = _march(r0, z0, mu, cp, sp, r_edges, z_edges, jz, kr)
        assert abs(got[i] - want) < 5e-3, (i, c, got[i], want)


def test_advance_conserves_direction_invariants():
    """After advancing, the impact parameter r*sphi must be invariant and
    the azimuth vector stays unit."""
    r0, z0 = 1.5, 0.5
    mu, phi = 0.3, 2.0
    trld = 0.7
    rn, zn, c, s = geo.advance(
        jnp.float32(r0), jnp.float32(z0), jnp.float32(mu),
        jnp.float32(np.cos(phi)), jnp.float32(np.sin(phi)),
        jnp.float32(trld),
    )
    # invariant: r*sin(phi) (angular momentum of the horizontal motion)
    assert np.isclose(float(rn * s), r0 * np.sin(phi), rtol=1e-5)
    assert np.isclose(float(c**2 + s**2), 1.0, atol=1e-6)
    assert np.isclose(float(zn), z0 + trld * mu, rtol=1e-6)
    # radius change matches law of cosines
    f = trld * np.sqrt(1 - mu**2)
    want_r = np.sqrt(f**2 + r0**2 + 2 * f * r0 * np.cos(phi))
    assert np.isclose(float(rn), want_r, rtol=1e-5)

"""Post-processing tests: Doppler transform physics, native C++ vs
numpy agreement, event-file round trip."""
import numpy as np

from compton2d_tpu.io import events as ev
from compton2d_tpu.io import native
from compton2d_tpu.io import postprocess as pp


def _fake_events(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 1e4, n)
    E = rng.lognormal(0, 2, n)
    w = rng.lognormal(0, 1, n) * 1e40
    r = rng.uniform(0, 1e16, n)
    z = rng.uniform(0, 1e16, n)
    mu = rng.uniform(-1, 1, n)
    phi = rng.uniform(-np.pi, np.pi, n)
    return np.stack([t, E, w, r, z, mu, phi], axis=1)


def test_doppler_boost_physics():
    """A photon moving straight down (mu=-1 lab) is seen head-on by the
    observer after the transform: E' = E*Gamma*(1+beta), mu' -> 1."""
    evts = np.zeros((1, 7))
    evts[0] = [100.0, 10.0, 1.0, 0.0, 0.0, -1.0, 0.0]
    g = 10.0
    beta = np.sqrt(1 - 1 / g**2)
    tr = pp.doppler_transform(evts, g, r_max=0.0)
    t, E, w, mu = tr[0]
    assert np.isclose(E, 10.0 * g * (1 + beta), rtol=1e-6)
    assert np.isclose(mu, 1.0, atol=1e-9)
    assert np.isclose(w, 1.0 * g * (1 + beta), rtol=1e-6)


def test_native_matches_numpy_lc_and_sed():
    if not native.available():
        import pytest

        pytest.skip("no g++ available")
    evts = _fake_events()
    t_edges = np.linspace(0, 2e4, 33)
    bands = np.array([[0.1, 10.0], [10.0, 1e4]])
    a = pp.light_curves(evts, 15.0, 1e16, t_edges, bands)
    b = native.light_curves(evts, 15.0, 1e16, t_edges, bands)
    assert np.allclose(a.flux, b.flux, rtol=1e-12)
    assert np.allclose(a.flux_sq, b.flux_sq, rtol=1e-12)
    assert np.array_equal(a.counts, b.counts)

    e_edges = np.geomspace(1e-2, 1e5, 41)
    sa = pp.sed(evts, 15.0, 1e16, 0.0, 1e4, e_edges)
    sb = native.sed(evts, 15.0, 1e16, 0.0, 1e4, e_edges)
    assert np.allclose(sa.flux, sb.flux, rtol=1e-12)
    assert np.array_equal(sa.counts, sb.counts)


def test_event_file_roundtrip(tmp_path):
    evts = _fake_events(200)
    path = str(tmp_path / "evb.dat")
    with open(path, "w") as fh:
        np.savetxt(fh, evts, fmt="%14.7e")
    back = ev.read_event_file(path)
    assert np.allclose(back, evts, rtol=1e-6)
    if native.available():
        back2 = native.read_event_file(path)
        assert np.allclose(back2, evts, rtol=1e-6)

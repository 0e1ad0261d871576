"""Pair-physics kernel tests and an end-to-end pair_switch run."""
import jax.numpy as jnp
import numpy as np

from compton2d_tpu.physics import pairs
from compton2d_tpu.physics.electron_dist import gnt_grid
from compton2d_tpu.tables import e_gg_grid


def test_kgg_threshold_and_positivity():
    e_gg = e_gg_grid(50)
    M = pairs.kgg_matrix(e_gg, 1.0)
    assert np.all(M >= 0)
    # threshold: eps1*eps2 > 1 (E1*E2 > 511^2 keV^2); for the lowest
    # input bin (50 keV) opacity requires E_out > 511^2/50 ~ 5.2e3 keV —
    # outside this 50..5000 keV grid except the top end
    eps = 1.957e-3 * e_gg
    s = eps[:, None] * eps[None, :]
    assert np.all(M[s <= 1.0] == 0)
    # peak of the pair cross section is near s ~ 2-4
    assert M.max() > 0


def test_vsigma_thomson_limit():
    """Nonrelativistic annihilation: <sigma v> -> pi r0^2 c ~ 7.5e-15."""
    gnt = gnt_grid(100)
    V = pairs.vsigma_matrix(gnt)
    assert np.all(V >= 0)
    # low-energy corner: both near the grid floor (gamma ~ 1.18,
    # beta ~ 0.5); sigma*v ~ (pi r0^2 c / beta) * [...] order 1e-14
    assert 1e-16 < V[0, 0] < 1e-13


def test_pairprod_threshold():
    gnt = gnt_grid(60)
    e_gg = e_gg_grid(40)
    F = pairs.pairprod_tensor(gnt, e_gg)
    assert np.all(np.isfinite(F))
    assert np.all(F >= -1e-30)
    # producing a pair needs eps1+eps2 >= 2 (in mc^2): low-energy photon
    # pairs give zero
    eps = 1.957e-3 * e_gg
    low = eps[:, None] + eps[None, :] < 2.0
    assert np.all(np.abs(F[:, low]) < 1e-25)


def test_nph_smooth_fits_powerlaw_cutoff():
    e_gg = jnp.asarray(e_gg_grid(60), jnp.float32)
    # synthetic field: 1e4 (E/E3)^-1.5 exp(-E/300), plus noise
    rng = np.random.default_rng(0)
    e3 = float(e_gg[2])
    truth = 1e4 * (np.asarray(e_gg) / e3) ** -1.5 * np.exp(
        -np.asarray(e_gg) / 300.0
    )
    noisy = truth * rng.lognormal(0, 0.2, truth.shape)
    out = pairs.nph_smooth(
        jnp.asarray(noisy[None, :], jnp.float32), e_gg,
        jnp.asarray([300.0], jnp.float32),
    )
    out = np.asarray(out[0])
    sel = truth > 100.0
    assert np.allclose(out[sel], truth[sel], rtol=0.5)


def test_pair_switch_end_to_end():
    """A hot corona with pair_switch=1 runs and stays finite; the pair
    fraction is non-negative."""
    from compton2d_tpu.examples import small_corona

    sim = small_corona(
        nz=2, nr=2, nst=400, n_slots=2048, num_nt=40, n_vol=32,
        nphfield=32, t_const=False, pair_switch=1,
    )
    for _ in range(3):
        out = sim.step()
    assert np.isfinite(float(out.bingo))
    fp = np.asarray(sim.state.zones.f_pair)
    assert np.all(fp >= 0)
    assert np.all(np.isfinite(fp))

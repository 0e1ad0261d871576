"""Mrk 421 workload smoke test: shock-injected SSC blob produces
synchrotron + IC photons; Doppler post-processing in the reference's
mu window yields band light curves."""
import numpy as np

from compton2d_tpu import examples
from compton2d_tpu.io import events as ev
from compton2d_tpu.io import postprocess as pp


def test_mrk421_small_run():
    # num_nt=160 so the gamma grid reaches past the injection band
    # (g1=5e2, g2=2e5); smaller grids leave injection inert
    sim = examples.mrk421(
        nz=4, nr=2, nst=1500, n_slots=8192, num_nt=160, n_vol=64,
        nphfield=64,
    )
    store = ev.EventArrayStore(sim.scales.E)
    for _ in range(4):
        out = sim.step()
        store.write(out.events)
        a = sim.energy_audit()
        assert np.isclose(a["balance"], 1.0, atol=5e-3), a
    evts = store.all()
    assert evts.shape[0] > 0
    # Doppler post-processing with the reference workload parameters
    lc = pp.light_curves(
        evts, examples.MRK421_GAMMA, sim.cfg.grid.r_max,
        t_edges=np.arange(0.0, 8 * examples.MRK421_DT_S,
                          examples.MRK421_DT_S),
        e_bands=np.asarray(examples.MRK421_BANDS),
        mu_edges=np.array([examples.MRK421_MU_RANGE[0],
                           examples.MRK421_MU_RANGE[1]]),
    )
    assert np.all(np.isfinite(lc.flux))
    # the shock injects nonthermal electrons -> synchrotron photons
    # escape; total flux across all bands/angles must be positive
    sed = pp.sed(
        evts, examples.MRK421_GAMMA, sim.cfg.grid.r_max,
        0.0, 1e9, np.geomspace(1e-8, 1e10, 60),
    )
    assert sed.flux.sum() > 0

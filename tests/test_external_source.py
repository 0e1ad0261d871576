"""Blazar external-radiation pipeline: disk.f-style generator ->
file_sp-style boosted CDF -> beamed lower-boundary source -> transport."""
import numpy as np
import jax.numpy as jnp

from compton2d_tpu.io import diskgen


def test_diskgen_shapes_and_planck_peak(tmp_path):
    path = str(tmp_path / "blackbody.in")
    tab = diskgen.write_spectrum_file(path, gamma_bulk=10.0)
    assert tab.shape[1] == 5  # disk.f's 5-column format (disk.f:106-110)
    e = tab[:, 0]
    # disk BB at 3e4 K: kT = 2.6e-3 keV, flux peak at 2.82 kT ~ 7.3e-3
    peak = e[np.argmax(tab[:, 1])]
    assert 5e-3 < peak < 1e-2
    # IR torus at 367*Gamma K = 3670 K peaks ~ 9e-4 keV, below the disk
    peak_ir = e[np.argmax(tab[:, 3])]
    assert 5e-4 < peak_ir < 1.5e-3
    assert peak_ir < peak


def test_beamed_external_source_runs(tmp_path):
    from compton2d_tpu.config import (
        GridConfig, PhysicsConfig, RunConfig, SimConfig, SourceConfig,
        TimeWindow, ZoneInit, ExternalRadiationConfig,
    )
    from compton2d_tpu.driver import Simulation

    path = str(tmp_path / "bb.in")
    diskgen.write_spectrum_file(path, gamma_bulk=10.0)

    nz, nr = 3, 2
    grid = GridConfig(
        nz=nz, nr=nr, z_max=1e16, r_max=3e15, num_nt=40, n_vol=32,
        nphfield=32, n_gg=16, n_ref=50, nmu=4,
        spectral_regions=((1e-7, 1e-2, 15), (1e-2, 1e4, 25)),
        lc_bands=((2.0, 10.0),),
    )
    win = TimeWindow(
        t0=0.0, t1=1e30,
        tbb_lower=(-1.0,) * nr,     # negative => file spectrum
        tbb_upper=(0.0,) * nr,
        tbb_inner=(0.0,) * nz,
        tbb_outer=(0.0,) * nz,
        lower_spectra=(path,) * nr,
    )
    ext = ExternalRadiationConfig(
        R_blr=1e17, fr_blr=0.1, R_ir=1e18, fr_ir=0.3,
        R_disk=1e15, d_jet=1e17, g_bulk=10.0,
    )
    cfg = SimConfig(
        grid=grid,
        physics=PhysicsConfig(t_const=True),
        source=SourceConfig(nst=500, external=ext),
        run=RunConfig(seed=0, n_slots=2048, event_capacity=2048),
        windows=(win,),
    )
    zi = ZoneInit.uniform(grid, tea=10.0, n_e=1e8, B_field=1.0, amxwl=0.1,
                          gmin=1e2, gmax=1e4, p_nth=2.4)
    sim = Simulation(cfg, zi)
    for _ in range(2):
        out = sim.step()
    # external photons are beamed up: most should escape the top
    up = float(jnp.sum(out.tallies.erlk_upper))
    assert np.isfinite(float(out.bingo)) and float(out.bingo) > 0
    assert up > 0
    a = sim.energy_audit()
    assert np.isclose(a["balance"], 1.0, atol=5e-3), a

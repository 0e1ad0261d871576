"""Per-step time-window boundary conditions (imcgen2d.f:111-120,
reader.f:222-283): the driver must re-select the boundary window by
time + dt/2 every step, switch the per-ring spectrum bank with it, and
only activate file boundaries once time + dt/2 >= t0."""
import numpy as np
import jax.numpy as jnp

from compton2d_tpu.config import (
    GridConfig,
    PhysicsConfig,
    RunConfig,
    SimConfig,
    SourceConfig,
    TimeWindow,
    ZoneInit,
)
from compton2d_tpu.driver import Simulation, build_window_sources


def _grid(nz=2, nr=2):
    return GridConfig(
        nz=nz, nr=nr, z_max=1e15, r_max=1e15, num_nt=40, n_vol=32,
        nphfield=32, n_gg=16, n_ref=50, nmu=4,
        spectral_regions=((1e-4, 1e-1, 10), (1e-1, 1e4, 20)),
        lc_bands=((2.0, 10.0),),
    )


def _sim(windows, nst=400, seed=0, **phys_kw):
    grid = _grid()
    cfg = SimConfig(
        grid=grid,
        physics=PhysicsConfig(t_const=True, **phys_kw),
        source=SourceConfig(nst=nst),
        run=RunConfig(seed=seed, n_slots=2048, event_capacity=2048),
        windows=windows,
    )
    zi = ZoneInit.uniform(grid, tea=50.0, n_e=1e8)
    return Simulation(cfg, zi)


def test_boundary_temperature_steps_mid_run():
    """A 2-window config where the lower-boundary T doubles mid-run:
    the fresh-energy budget must jump by ~2^4 when the window flips."""
    nr, nz = 2, 2
    mk = lambda t0, t1, tbb: TimeWindow(
        t0=t0, t1=t1,
        tbb_lower=(tbb,) * nr, tbb_upper=(0.0,) * nr,
        tbb_inner=(0.0,) * nz, tbb_outer=(0.0,) * nz,
    )
    sim = _sim((mk(0.0, 1.0, 1.0), mk(1.0, 1e30, 2.0)))
    dt = float(sim.state.dt)
    # window flips once time + dt/2 >= t1(1): edge at 2.5 dt =>
    # steps 0,1 use window 1, steps 2+ use window 2
    t_edge = 2.49 * dt
    sim.cfg = sim.cfg.replace(windows=(
        mk(0.0, t_edge, 1.0), mk(t_edge, 1e30, 2.0),
    ))
    sim.window_sources = build_window_sources(sim.cfg, sim.scales)

    fresh = []       # bingo minus the census carry-over = new input
    prev_census = 0.0
    for _ in range(5):
        out = sim.step()
        fresh.append(float(out.bingo) - prev_census)
        prev_census = float(jnp.sum(out.tallies.ecens))
        a = sim.energy_audit()
        assert np.isclose(a["balance"], 1.0, atol=5e-3), a
    # fresh surface input scales as T^4 = 16x at the flip
    assert np.isclose(fresh[1], fresh[0], rtol=1e-5)
    assert np.isclose(fresh[2], 16.0 * fresh[0], rtol=1e-4)
    assert np.isclose(fresh[4], 16.0 * fresh[0], rtol=1e-4)


def test_file_boundary_waits_for_t0(tmp_path):
    """tbb<0 rings only source from the file once time+dt/2 >= t0
    (imcgen2d.f:156-158)."""
    from compton2d_tpu.io import diskgen

    path = str(tmp_path / "bb.in")
    diskgen.write_spectrum_file(path, gamma_bulk=10.0)
    nr, nz = 2, 2
    from compton2d_tpu.config import ExternalRadiationConfig

    ext = ExternalRadiationConfig(
        R_blr=1e17, fr_blr=0.1, R_ir=1e18, fr_ir=0.3,
        R_disk=1e15, d_jet=1e17, g_bulk=10.0,
    )
    grid = _grid()
    mk = lambda t0: TimeWindow(
        t0=t0, t1=1e30,
        tbb_lower=(-1.0,) * nr, tbb_upper=(0.0,) * nr,
        tbb_inner=(0.0,) * nz, tbb_outer=(0.0,) * nz,
        lower_spectra=(path,) * nr,
    )
    cfg = SimConfig(
        grid=grid,
        physics=PhysicsConfig(t_const=True),
        source=SourceConfig(nst=400, external=ext),
        run=RunConfig(seed=0, n_slots=2048, event_capacity=2048),
        windows=(mk(0.0),),
    )
    # nearly emission-free zones so the file flux dominates the budget
    zi = ZoneInit.uniform(grid, tea=10.0, n_e=1.0, B_field=1e-6)
    sim = Simulation(cfg, zi)
    dt = float(sim.state.dt)
    t0 = 2.49 * dt
    sim.cfg = cfg.replace(windows=(mk(t0),))
    sim.window_sources = build_window_sources(sim.cfg, sim.scales)
    fresh, prev_census = [], 0.0
    for _ in range(5):
        out = sim.step()
        fresh.append(float(out.bingo) - prev_census)
        prev_census = float(jnp.sum(out.tallies.ecens))
    # before t0 (steps 0,1) the file boundary is off; after, it
    # dominates the fresh-energy input by orders of magnitude
    assert fresh[2] > 1e3 * max(fresh[0], fresh[1], 1e-30)
    assert fresh[4] > 1e3 * max(fresh[0], fresh[1], 1e-30)


def test_per_ring_spectrum_bank(tmp_path):
    """Two different spectrum files on different rings land in distinct
    bank rows with distinct fluxes and sampling CDFs."""
    from compton2d_tpu.io import diskgen
    from compton2d_tpu.config import ExternalRadiationConfig

    p1 = str(tmp_path / "bb1.in")
    p2 = str(tmp_path / "bb2.in")
    diskgen.write_spectrum_file(p1, gamma_bulk=5.0)
    diskgen.write_spectrum_file(p2, gamma_bulk=20.0)
    nr, nz = 2, 2
    win = TimeWindow(
        t0=0.0, t1=1e30,
        tbb_lower=(-1.0, -1.0), tbb_upper=(0.0,) * nr,
        tbb_inner=(0.0,) * nz, tbb_outer=(0.0,) * nz,
        lower_spectra=(p1, p2),
    )
    ext = ExternalRadiationConfig(
        R_blr=1e17, fr_blr=0.1, R_ir=1e18, fr_ir=0.3,
        R_disk=1e15, d_jet=1e17, g_bulk=10.0,
    )
    grid = _grid()
    cfg = SimConfig(
        grid=grid, physics=PhysicsConfig(t_const=True),
        source=SourceConfig(nst=400, external=ext),
        run=RunConfig(seed=0, n_slots=2048, event_capacity=2048),
        windows=(win,),
    )
    sim = Simulation(cfg, ZoneInit.uniform(grid, tea=50.0, n_e=1e8))
    src = sim.src_static
    assert int(src.spec_lower[0]) != int(src.spec_lower[1])
    # distinct bank rows with distinct sampling CDFs (the integrated
    # fluxes agree because both files share the same disk luminosity)
    r1, r2 = int(src.spec_lower[0]), int(src.spec_lower[1])
    assert float(jnp.max(jnp.abs(src.spec_cdf[r1] - src.spec_cdf[r2]))) > 1e-3
    assert float(src.flux_lower[0]) > 0 and float(src.flux_lower[1]) > 0
    # both rings source photons and the budget balances
    out = sim.step()
    assert float(out.bingo) > 0
    a = sim.energy_audit()
    assert np.isclose(a["balance"], 1.0, atol=5e-3), a

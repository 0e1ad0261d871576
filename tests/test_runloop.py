"""Run-loop tests: t_stop termination, walltime self-checkpoint +
resume, output files, sharded event flushing."""
import os

import jax
import numpy as np

from compton2d_tpu.examples import small_corona


def _tiny(**kw):
    return small_corona(
        nz=2, nr=2, nst=300, n_slots=1024, num_nt=40, n_vol=32,
        nphfield=32, t_const=True, **kw,
    )


def test_run_to_stop_and_outputs(tmp_path):
    sim = _tiny()
    # shrink t_stop to a few steps
    dt0 = float(sim.state.dt)
    sim.cfg = sim.cfg.replace(
        run=sim.cfg.run.__class__(
            t_stop=3.5 * dt0, n_slots=1024, event_capacity=1024,
        )
    )
    sim.attach_outputs(str(tmp_path))
    done = sim.run_to_stop()
    assert done
    assert int(sim.state.ncycle) >= 4
    files = os.listdir(tmp_path)
    assert "spectrum.dat" in files and "evb.dat" in files
    assert any(f.startswith("lc_mu") for f in files)
    # spectrum file parses and has positive flux somewhere
    import numpy as np

    spec = np.loadtxt(tmp_path / "spectrum.dat")
    assert spec.shape[1] >= 2
    assert np.nanmax(spec[:, 1:]) > 0


def test_walltime_checkpoint_and_resume(tmp_path):
    from compton2d_tpu.io.checkpoint import load_checkpoint, load_meta

    sim = _tiny()
    ck = str(tmp_path / "ck.npz")
    # zero walltime budget with frac 0 => immediate checkpoint trigger
    done = sim.run_to_stop(
        walltime_budget_s=1e-9, checkpoint_path=ck, max_steps=10
    )
    assert not done
    assert os.path.exists(ck)
    meta = load_meta(ck)
    assert "ncycle" in meta
    # resume into a fresh simulation
    sim2 = _tiny()
    sim2.state = load_checkpoint(ck, sim2.state)
    out = sim2.step()
    assert np.isfinite(float(out.bingo))


def test_sharded_event_flush(tmp_path):
    from compton2d_tpu.io.events import EventFileWriter
    from compton2d_tpu.parallel.mesh import make_photon_mesh

    mesh = make_photon_mesh(jax.devices()[:2])
    sim = _tiny(mesh=mesh)
    w = EventFileWriter(str(tmp_path / "evb.dat"), sim.scales.E)
    sim.step()
    out = sim.step()
    n = w.write(out.events)
    # events buffer is per-device stacked; writer must de-interleave
    assert n == int(out.events.count.sum()) or w.n_dropped > 0
    if n > 0:
        data = np.loadtxt(tmp_path / "evb.dat").reshape(-1, 7)
        assert data.shape[0] == n


def test_adaptive_dt_grows_when_quiet():
    """run.adaptive_dt: the FP dT_max ladder (update2d.f:232-243) must
    grow dt (x3 per step) when temperature changes are small, and the
    host clock mirror must track the device dt exactly."""
    import dataclasses

    import numpy as np

    from compton2d_tpu.examples import small_corona

    sim = small_corona(
        nz=2, nr=2, nst=200, n_slots=1024, num_nt=40, n_vol=32,
        nphfield=32, t_const=False, seed=9,
        # optically thin + weak coupling: dT_max ~ 0 -> ladder grows
        n_e=1.0e2,
    )
    cfg = dataclasses.replace(
        sim.cfg, run=dataclasses.replace(sim.cfg.run, adaptive_dt=True)
    )
    sim = sim.with_config(cfg)
    dt0 = float(sim.state.dt)
    sim.step()          # ncycle 0: no FP application yet
    sim.step()
    sim.step()
    dt2 = float(sim.state.dt)
    assert dt2 > 2.0 * dt0, (dt0, dt2)
    assert np.isclose(sim._host_dt, dt2, rtol=0, atol=0)
    # time advanced consistently with the varying dt
    assert np.isclose(sim._host_time, float(sim.state.time), rtol=1e-6)


def test_adaptive_dt_zone_shard_consistent():
    """Adaptive dt under zone-sharded FP (advisor r4 medium): the dt
    ladder must apply ONE GLOBAL dt — the zshard aggregation pmins the
    per-device dt_new (= the ladder at the pmax'ed dT_max), otherwise
    each replica silently applies a different dt derived from its
    local zone slice. Checked by asserting every device's replica of
    the replicated dt/time leaves stays BITWISE identical through a
    4-device zone-sharded adaptive-dt run (the divergence is exactly
    what the bug produced), and that the ladder actually moves dt."""
    import dataclasses

    import jax
    import numpy as np

    from compton2d_tpu.examples import small_corona
    from compton2d_tpu.parallel.mesh import make_photon_mesh

    def run(mesh):
        sim = small_corona(
            nz=4, nr=2, nst=800, n_slots=4096, num_nt=40, n_vol=32,
            nphfield=32, t_const=False, seed=5, mesh=mesh,
        )
        cfg = dataclasses.replace(
            sim.cfg,
            run=dataclasses.replace(sim.cfg.run, adaptive_dt=True),
        )
        sim = sim.with_config(cfg, mesh=mesh)
        dts = []
        for _ in range(4):
            sim.step()
            dts.append(float(sim.state.dt))
            if mesh is not None:
                # THE regression check: every device's replica of the
                # replicated dt/time leaves must be bitwise identical —
                # without the pmin'd dt_new each replica applies the
                # ladder at its LOCAL slice's dT_max and the
                # "replicated" clock silently diverges
                for leaf in (sim.state.dt, sim.state.time):
                    shards = [
                        np.asarray(s.data)
                        for s in leaf.addressable_shards
                    ]
                    assert len(shards) == 4
                    for sh in shards[1:]:
                        assert np.array_equal(sh, shards[0]), shards
        return np.asarray(dts)

    dt4 = run(make_photon_mesh(jax.devices()[:4]))
    assert np.all(dt4 > 0) and np.all(np.isfinite(dt4))
    # the ladder actually moved dt at least once in this config
    assert not np.allclose(dt4, dt4[0])

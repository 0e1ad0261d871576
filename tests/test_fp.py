"""Fokker-Planck solver tests: Thomas vs dense solve, cooling advection,
acceleration balance."""
import jax.numpy as jnp
import numpy as np

from compton2d_tpu.fp.chang_cooper import chang_cooper_coeffs, thomas_solve
from compton2d_tpu.physics.electron_dist import gnt_grid


def test_thomas_matches_dense():
    rng = np.random.default_rng(3)
    Z, N = 4, 30
    a = rng.random((Z, N)) * 0.1
    b = 1.0 + rng.random((Z, N))
    c = rng.random((Z, N)) * 0.1
    a[:, 0] = 0.0
    c[:, -1] = 0.0
    d = rng.random((Z, N))
    got = np.asarray(
        thomas_solve(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d),
            clamp_negative=False,
        )
    )
    for z in range(Z):
        M = np.diag(b[z]) + np.diag(a[z][1:], -1) + np.diag(c[z][:-1], 1)
        want = np.linalg.solve(M, d[z])
        assert np.allclose(got[z], want, rtol=2e-4, atol=1e-6), z


def test_cooling_moves_distribution_down():
    """Pure synchrotron-like cooling drift: mean gamma must decrease."""
    gnt = jnp.asarray(gnt_grid(100))
    gamma = gnt + 1.0
    dg = jnp.diff(gnt)
    w = jnp.concatenate([dg, dg[-1:] * 0.0])
    # initial bump at gamma ~ 100
    f0 = jnp.exp(-0.5 * ((jnp.log(gamma) - np.log(100.0)) / 0.3) ** 2)
    f0 = f0 / jnp.sum(f0 * w)
    k_cool = 1e-4
    dgdt = -k_cool * (gamma**2 - 1.0)
    disp = 1e-12 * gamma**2  # tiny dispersion for CC weights
    d_t = jnp.asarray([50.0])
    a, b, c = chang_cooper_coeffs(
        gnt, dgdt[None, :], disp[None, :], d_t, 1e30
    )
    f1 = thomas_solve(a, b, c, f0[None, :])[0]
    f1 = f1 / jnp.maximum(jnp.sum(f1 * w), 1e-300)
    g0 = float(jnp.sum(gamma * f0 * w))
    g1 = float(jnp.sum(gamma * f1 * w))
    assert g1 < g0
    # cooling rate roughly dgamma/dt = -k gamma^2:
    # after dt: 1/g1 - 1/g0 ~ k*dt
    assert np.isclose(1 / g1 - 1 / g0, k_cool * 50.0, rtol=0.35)


def test_acceleration_pushes_distribution_up():
    gnt = jnp.asarray(gnt_grid(100))
    gamma = gnt + 1.0
    dg = jnp.diff(gnt)
    w = jnp.concatenate([dg, dg[-1:] * 0.0])
    f0 = jnp.exp(-0.5 * ((jnp.log(gamma) - np.log(10.0)) / 0.3) ** 2)
    f0 = f0 / jnp.sum(f0 * w)
    t_acc = 1000.0
    dgdt = gamma / t_acc
    disp = gamma**2 / (2 * t_acc)
    d_t = jnp.asarray([100.0])
    a, b, c = chang_cooper_coeffs(
        gnt, dgdt[None, :], disp[None, :], d_t, 1e30
    )
    f1 = thomas_solve(a, b, c, f0[None, :])[0]
    f1 = f1 / jnp.maximum(jnp.sum(f1 * w), 1e-300)
    g0 = float(jnp.sum(gamma * f0 * w))
    g1 = float(jnp.sum(gamma * f1 * w))
    assert g1 > g0


def test_coulomb_tables_thermalize():
    """Exact Moller coefficients must drive slow electrons up and fast
    electrons down in gamma (thermalization toward the bath)."""
    import numpy as np
    from compton2d_tpu.physics import coulomb as cl

    g = np.array([1.05, 1.2, 2.0, 10.0])
    b = np.sqrt(1 - 1 / g**2)
    dm = cl.dg_mo(g, b, 0.2)
    assert dm[0] > 0 and dm[-1] < 0
    assert np.all(cl.disp_mo(g, b, 0.2) > 0)


def test_fp_include_coulomb_runs():
    from compton2d_tpu.examples import small_corona

    sim = small_corona(
        nz=2, nr=2, nst=300, n_slots=1024, num_nt=40, n_vol=32,
        nphfield=32, t_const=False, fp_include_coulomb=True,
    )
    out = sim.step()
    out = sim.step()
    import numpy as np

    assert np.isfinite(float(sim.state.zones.tea[0, 0]))


def test_photon_fill_first_cycle_rates():
    """photon_fill (update2d.f:1747-1921): the cycle-1 explicit
    thermal-rate diagnostic. After one step the tallied field must
    give a nonzero Compton rate in the interior, synchrotron must
    cool (dT_sy <= 0), and the explicit Te estimate must be finite."""
    from compton2d_tpu.examples import small_corona

    sim = small_corona(nz=3, nr=2, nst=2000, n_slots=4096, seed=3)
    sim.step()
    r = sim.photon_fill_diagnostic()
    for name, arr in r._asdict().items():
        assert np.all(np.isfinite(np.asarray(arr))), name
    # the disk-illuminated corona has photons everywhere after step 1:
    # dT_c (from n_field x F_IC) must be nonzero in every zone
    assert np.all(np.abs(np.asarray(r.dT_c)) > 0.0)
    assert np.all(np.asarray(r.dT_sy) <= 0.0)
    assert np.all(np.asarray(r.d_t_opt) > 0.0)
    # Compton cooling of a 100 keV corona on a 0.5 keV disk field:
    # total rate should be cooling-dominated somewhere
    assert float(np.min(np.asarray(r.dT_total))) < 0.0


def test_pcr_matches_thomas():
    """Parallel cyclic reduction vs the sequential Thomas solve on
    Chang-Cooper-like diagonally-dominant systems (the production FP
    path uses PCR: log2(N) vector rounds instead of a 2N-step scan)."""
    from compton2d_tpu.fp.chang_cooper import pcr_solve

    rng = np.random.default_rng(7)
    Z, N = 8, 200
    a = -rng.random((Z, N)) * 0.3
    c = -rng.random((Z, N)) * 0.3
    b = 1.0 + np.abs(a) + np.abs(c) + rng.random((Z, N))
    a[:, 0] = c[:, -1] = 0.0
    # boundary rows as chang_cooper_coeffs sets them
    a[:, 0] = c[:, 0] = 0.0
    b[:, 0] = 1.0
    a[:, -1] = c[:, -1] = 0.0
    b[:, -1] = 1.0
    d = rng.random((Z, N))
    ref = np.asarray(thomas_solve(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(c, jnp.float32), jnp.asarray(d, jnp.float32),
        clamp_negative=False,
    ))
    got = np.asarray(pcr_solve(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(c, jnp.float32), jnp.asarray(d, jnp.float32),
        clamp_negative=False,
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_fp_include_bremsstrahlung_cools():
    """The optional dg_br drift (update2d.f:864-878: dg_br =
    -f_br*gamma^1.1, f_br normalized to the tallied Eloss_br) must cool
    the electrons relative to the flag-off solve on identical inputs.
    Tested directly on fp_step (a full driver run at high density
    saturates fp_max_substeps, where the per-substep change is
    ~df_implicit*Te regardless of the operator magnitude and the flag
    difference cancels to first order)."""
    import dataclasses

    import jax.numpy as jnp

    from compton2d_tpu.examples import small_corona
    from compton2d_tpu.fp.update import fp_step
    from compton2d_tpu.physics.emissivity import volume_em

    def solve(flag):
        sim = small_corona(
            nz=2, nr=2, nst=300, n_slots=1024, num_nt=40, n_vol=64,
            nphfield=32, t_const=False, seed=5, n_e=1.0e16,
            fp_include_bremsstrahlung=flag,
        )
        z = sim.state.zones
        g = sim.grid
        l_min = jnp.minimum(g.dz, g.dr) * jnp.ones_like(g.vol)
        ve = volume_em(
            sim.tables.e_ph, sim.tables.gnt, z.f_nt, z.tea, z.n_e,
            z.B_field, z.amxwl, g.vol, g.zone_surf, l_min,
            sim.state.dt, sim.tables.sync, sim.scales,
            f_pair=z.f_pair,
        )
        nf = jnp.zeros((2, 2, 32), jnp.float32)
        r = fp_step(
            z, nf, sim.tables, g.vol, float(sim.cfg.grid.z_max), g.dz,
            sim.state.dt, sim.state.time, ve.eloss_sy,
            sim.cfg.physics, sim.scales, eloss_br=ve.eloss_br,
        )
        return np.asarray(r.zones.tea)

    te_off = solve(False)
    te_on = solve(True)
    assert np.all(np.isfinite(te_on))
    assert np.all(te_on < te_off - 5.0), (te_on, te_off)


def test_stiff_zone_completes_with_dt_floor():
    """A zone whose Compton cooling time is << dt makes the
    df_implicit substep rule (update2d.f:662-666) collapse to
    d_t ~ 1/rate -> 0: the reference's unbounded loop would hang there,
    and before the d_t floor our fp_max_substeps cap left such zones
    FROZEN at their initial Te (t_fp stayed 0). With the floor
    d_t >= dt/fp_max_substeps the implicit Chang-Cooper solve must
    instead complete the step (incomplete == 0) and actually relax the
    temperature toward the Compton equilibrium."""
    import jax.numpy as jnp

    from compton2d_tpu.examples import small_corona
    from compton2d_tpu.fp.update import fp_step
    from compton2d_tpu.physics.emissivity import volume_em

    sim = small_corona(
        nz=2, nr=2, nst=300, n_slots=1024, num_nt=40, n_vol=64,
        nphfield=32, t_const=False, seed=7,
    )
    z = sim.state.zones
    g = sim.grid
    l_min = jnp.minimum(g.dz, g.dr) * jnp.ones_like(g.vol)
    ve = volume_em(
        sim.tables.e_ph, sim.tables.gnt, z.f_nt, z.tea, z.n_e,
        z.B_field, z.amxwl, g.vol, g.zone_surf, l_min,
        sim.state.dt, sim.tables.sync, sim.scales, f_pair=z.f_pair,
    )
    # flood the soft field bins with an enormous photon count: the
    # IC rate becomes so stiff that d_t without the floor is ~1e-30
    nf = jnp.zeros((2, 2, 32), jnp.float32).at[:, :, :10].set(1e7)
    r = fp_step(
        z, nf, sim.tables, g.vol, float(sim.cfg.grid.z_max), g.dz,
        sim.state.dt, sim.state.time, ve.eloss_sy,
        sim.cfg.physics, sim.scales, eloss_br=ve.eloss_br,
    )
    te0 = np.asarray(z.tea)
    te1 = np.asarray(r.zones.tea)
    assert int(r.incomplete) == 0, int(r.incomplete)
    assert np.all(np.isfinite(te1))
    # frozen zones used to return te1 == te0 bit-exactly
    assert np.all(np.abs(te1 - te0) > 0.01 * te0), (te0, te1)

"""v2 flight-megakernel unit tests (interpret mode on the CPU mesh).

The compiled-Mosaic path is gated separately on the real chip by
``tools/pallas_e2e.py`` (pallas on/off end-to-end physics comparison,
embedded in every BENCH JSON). These tests pin the kernel-internal
contracts: energy bookkeeping with the inlined scatter, determinism,
free-streaming geometry, the strat-mode scatter freeze, the
guide-table bracketing of the electron draw, and the inlined sampler's
agreement with the XLA ``transport.scatter`` reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compton2d_tpu.transport import flight_pallas2 as fp2


def _tables(nz, nr, n_vol=48, n_gg=32, num_nt=40, sig=1.0, kap=0.5,
            theta=0.2):
    nzr = nz * nr
    e_ph = np.geomspace(1e-3, 1e3, n_vol)
    e_gg = np.geomspace(50.0, 5000.0, n_gg)
    opac = np.zeros((nzr, n_vol, 2), np.float32)
    opac[:, :, 0] = sig
    opac[:, :, 1] = kap
    kgg = np.zeros((nzr, n_gg), np.float32)
    gnt = np.geomspace(1e-4, 1e4, num_nt)
    pdf = np.exp(-gnt / theta)
    cdf = np.cumsum(pdf) / pdf.sum()
    cdf_nt = np.tile(cdf[None, :], (nzr, 1)).astype(np.float32)
    r_edges = np.linspace(0, 1.0, nr + 1)
    z_edges = np.linspace(0, 1.0, nz + 1)
    ktab, dims = fp2.build_kernel_tables(
        jnp.asarray(opac), jnp.asarray(kgg), jnp.asarray(cdf_nt),
        jnp.asarray(gnt), jnp.asarray(r_edges), jnp.asarray(z_edges),
        float(np.log(e_ph[0])), float(np.log(e_ph[1] / e_ph[0])),
        float(np.log(e_gg[0])), float(np.log(e_gg[1] / e_gg[0])),
    )
    return ktab, dims, jnp.asarray(cdf_nt), jnp.asarray(gnt)


def _mkphotons(n, nz, nr, seed=0, dcen=5.0):
    rng = np.random.default_rng(seed)
    phi = rng.uniform(0, 2 * np.pi, n)
    return dict(
        e=jnp.asarray(rng.uniform(1.0, 10.0, n), jnp.float32),
        w=jnp.ones(n, jnp.float32),
        w0=jnp.ones(n, jnp.float32),
        r=jnp.asarray(rng.uniform(0.1, 0.9, n), jnp.float32),
        z=jnp.asarray(rng.uniform(0.1, 0.9, n), jnp.float32),
        mu=jnp.asarray(rng.uniform(-1, 1, n), jnp.float32),
        cphi=jnp.asarray(np.cos(phi), jnp.float32),
        sphi=jnp.asarray(np.sin(phi), jnp.float32),
        dcen=jnp.full(n, dcen, jnp.float32),
        jz=jnp.asarray(rng.integers(0, nz, n), jnp.int32),
        kr=jnp.asarray(rng.integers(0, nr, n), jnp.int32),
        alive=jnp.ones(n, bool),
        seeds=jnp.arange(n // fp2.TILE, dtype=jnp.int32) + seed,
    )


def _run(p, ktab, dims, nz, nr, inline=True, **kw):
    kw.setdefault("max_iters", 64)
    kw.setdefault("max_tries", 64)
    return fp2.flight_step_v2(
        p["e"], p["w"], p["w0"], p["r"], p["z"], p["mu"], p["cphi"],
        p["sphi"], p["dcen"], p["jz"], p["kr"], p["alive"],
        ktab, p["seeds"],
        dims=dims, nz=nz, nr=nr, pair_switch=False,
        inline_scatter=inline, weight_floor=1e-10, interpret=True,
        **kw,
    )


def test_v2_energy_bookkeeping():
    """sum(w_out) + edep + ekill - 2*esct == sum(w_in): the edep tally
    includes the scatter exchange d_e (imctrk2d.f:649-679) and esct is
    that same exchange, which also appears in the photon weights."""
    nz, nr = 3, 2
    ktab, dims, _, _ = _tables(nz, nr)
    p = _mkphotons(fp2.TILE * 2, nz, nr)
    out = _run(p, ktab, dims, nz, nr)
    w_out = np.asarray(out[1])
    ekill, esct = float(out[16]), float(out[17])
    tall = np.asarray(out[20])
    total = w_out.sum() + tall[0].sum() + ekill - 2.0 * esct
    np.testing.assert_allclose(total, float(p["w"].sum()), rtol=2e-4)


def test_v2_deterministic():
    nz, nr = 3, 2
    ktab, dims, _, _ = _tables(nz, nr)
    p = _mkphotons(fp2.TILE, nz, nr, seed=4)
    o1 = _run(p, ktab, dims, nz, nr)
    o2 = _run(p, ktab, dims, nz, nr)
    for a, b in zip(o1, o2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_v2_pure_streaming_census():
    """kap=0, sigma tiny: photons free-stream their census distance;
    flag stays NONE, dcen -> 0, straight-line z advance."""
    nz, nr = 2, 2
    n = fp2.TILE
    ktab, dims, _, _ = _tables(nz, nr, sig=1e-25, kap=0.0)
    p = _mkphotons(n, nz, nr, dcen=0.3)
    p["mu"] = jnp.full(n, 0.2, jnp.float32)
    p["z"] = jnp.full(n, 0.4, jnp.float32)
    p["r"] = jnp.full(n, 0.3, jnp.float32)
    out = _run(p, ktab, dims, nz, nr)
    z_n = np.asarray(out[3])
    dcen_n = np.asarray(out[7])
    flag = np.asarray(out[12])
    stayed = flag == fp2.FLAG_NONE
    assert stayed.mean() > 0.5
    np.testing.assert_allclose(dcen_n[stayed], 0.0, atol=1e-6)
    np.testing.assert_allclose(z_n[stayed], 0.4 + 0.2 * 0.3, rtol=1e-5)
    assert np.asarray(out[20])[0].sum() < 1e-6


def test_v2_strat_mode_scatter_freeze():
    """inline_scatter=False (strat-split mode): optically thick,
    absorption-free medium freezes every lane with FLAG_SCATTER —
    the v1 contract the XLA apply_scatter path relies on."""
    nz, nr = 2, 2
    ktab, dims, _, _ = _tables(nz, nr, sig=500.0, kap=0.0)
    p = _mkphotons(fp2.TILE, nz, nr, dcen=10.0)
    out = _run(p, ktab, dims, nz, nr, inline=False, max_iters=4)
    flag = np.asarray(out[12])
    assert (flag == fp2.FLAG_SCATTER).mean() > 0.95


def test_v2_inline_scatter_happens():
    """Optically thick medium with the scatter inlined: lanes scatter
    in-kernel (sct_cnt > 0), nothing freezes with FLAG_SCATTER, and
    the event log matches the per-lane counts."""
    nz, nr = 2, 2
    ktab, dims, _, _ = _tables(nz, nr, sig=50.0, kap=0.0)
    p = _mkphotons(fp2.TILE, nz, nr, dcen=0.5)
    out = _run(p, ktab, dims, nz, nr, max_iters=128)
    flag = np.asarray(out[12])
    cnt = np.asarray(out[19])
    iglog = np.asarray(out[21])
    assert not (flag == fp2.FLAG_SCATTER).any()
    assert cnt.mean() > 1.0
    nlog = (iglog >= 0).sum(axis=1)
    assert (nlog == np.minimum(cnt, fp2.K_LOG)).all()


def test_guide_brackets_exact_count():
    """The guide table must bracket the exact electron-CDF count for
    any u: lo_j <= #(cdf < u) <= hi_j with u in cell j — including at
    float cell boundaries and deep in the nonthermal tail."""
    rng = np.random.default_rng(7)
    num_nt = 200
    gnt = np.geomspace(1e-4, 1e4, num_nt)
    # hybrid thermal + hard tail: tail strata at p ~ 1e-6
    pdf = np.exp(-gnt / 0.05) + 1e-6 * gnt ** -0.5 * (gnt > 10)
    cdf = jnp.asarray(
        (np.cumsum(pdf) / pdf.sum()).astype(np.float32)
    )
    guide = jnp.searchsorted(
        cdf, jnp.asarray(fp2.guide_u_edges()), side="left"
    )
    u = jnp.asarray(
        np.concatenate([
            rng.uniform(0, 1, 20000),
            1.0 - np.geomspace(1e-7, 0.5, 2000),   # tail strata
            fp2.guide_u_edges()[1:],               # exact edges
        ]).astype(np.float32)
    )
    cell = fp2._guide_cell(u)
    lo = guide[cell]
    hi = jnp.where(cell >= fp2.GUIDE_G - 1, num_nt, guide[cell + 1])
    exact = jnp.sum(
        (cdf[None, :] < u[:, None]).astype(jnp.int32), axis=1
    )
    assert bool(jnp.all(lo <= exact)), "guide lower bound violated"
    assert bool(jnp.all(exact <= hi)), "guide upper bound violated"
    # the scan is short: typical bracket width ~ an iteration's budget
    width = np.asarray(hi - lo)
    assert np.median(width) <= fp2.SCAN_S


def test_v2_inline_scatter_matches_xla_sampler():
    """Single uniform zone, optically thick: the inlined sampler's
    single-scatter energy statistics must agree with the XLA reference
    sampler (transport.scatter) on the same photon population — the
    compb_2d.f port is the same math, only the RNG stream differs."""
    from compton2d_tpu.transport.scatter import scatter

    nz, nr = 1, 1
    theta = 0.04
    ktab, dims, cdf_nt, gnt = _tables(
        nz, nr, num_nt=100, sig=100.0, kap=0.0, theta=theta
    )
    n = fp2.TILE * 4
    p = _mkphotons(n, nz, nr, seed=9, dcen=10.0)
    e0 = jnp.full(n, 5.0, jnp.float32)
    p["e"] = e0
    # few iterations: flight -> SCT_A -> SCT_B gives most lanes exactly
    # one scatter before the budget ends
    out = _run(p, ktab, dims, nz, nr, max_iters=4)
    e_k = np.asarray(out[0])
    cnt = np.asarray(out[19])
    one = cnt == 1
    assert one.sum() > n // 4, one.sum()

    cdf_rows = jnp.broadcast_to(cdf_nt[0], (n, cdf_nt.shape[1]))
    res = scatter(
        jax.random.PRNGKey(3), e0, p["mu"], p["cphi"], p["sphi"],
        cdf_rows, gnt,
    )
    e_x = np.asarray(res.e)
    m_k, m_x = e_k[one].mean(), e_x.mean()
    s_k, s_x = e_k[one].std(), e_x.std()
    # MC tolerance: ~5 sigma of the mean estimator
    tol = 5.0 * max(s_k, s_x) / np.sqrt(min(one.sum(), n))
    assert abs(m_k - m_x) < tol, (m_k, m_x, tol)
    assert 0.5 < s_k / s_x < 2.0, (s_k, s_x)


def test_v2_driver_interpret_matches_xla_statistically():
    """Full-driver coverage of the pallas outer loop on CPU: forcing
    pallas_tracking='on' off-TPU runs the kernel in interpret mode
    (driver sets pallas_interpret); two steps of the same config must
    agree with the XLA path within loose MC tolerances and keep the
    energy audit exact. (The compiled-Mosaic path is gated on the chip
    by tools/pallas_e2e.py; this covers the outer-loop wiring — leak
    handoff, tally/log plumbing, straggler semantics — in CI.)"""
    import dataclasses

    from compton2d_tpu.examples import small_corona

    def run(pallas):
        sim = small_corona(
            nz=3, nr=2, nst=3000, n_slots=4096, num_nt=50, n_vol=64,
            nphfield=64, t_const=False, seed=6,
        )
        cfg = dataclasses.replace(
            sim.cfg,
            run=dataclasses.replace(sim.cfg.run, pallas_tracking=pallas),
        )
        sim = sim.with_config(cfg)
        for _ in range(2):
            sim.step()
        a = sim.energy_audit()
        return a

    a_x = run("off")
    a_p = run("on")
    assert abs(a_p["balance"] - 1.0) < 2e-3
    assert abs(a_x["balance"] - 1.0) < 2e-3
    # loose order-of-magnitude agreement: nst=3000 seed-to-seed spread
    # is ~30% on these totals, so this catches wiring breakage (the
    # precision comparison is the on-chip gate's job)
    for q in ("escaped", "census"):
        ref = max(abs(a_x[q]), 1e-300)
        assert abs(a_p[q] - a_x[q]) / ref < 0.6, (q, a_p[q], a_x[q])


def test_v2_gamma_gamma_absorption_channel():
    """pair_switch=True kernel path: a strong uniform kgg table must
    attenuate >47 keV photons with the absorbed energy tallied to
    pair_abs (not edep), leaving the audit exact."""
    nz, nr = 2, 2
    nzr = nz * nr
    n_vol, n_gg, num_nt = 48, 32, 40
    e_ph = np.geomspace(1e-3, 1e3, n_vol)
    e_gg = np.geomspace(50.0, 5000.0, n_gg)
    opac = np.zeros((nzr, n_vol, 2), np.float32)
    opac[:, :, 0] = 1e-3
    kgg = np.full((nzr, n_gg), 3.0, np.float32)
    gnt = np.geomspace(1e-4, 1e4, num_nt)
    cdf = np.cumsum(np.exp(-gnt / 0.2))
    cdf_nt = np.tile((cdf / cdf[-1])[None, :], (nzr, 1)).astype(np.float32)
    ktab, dims = fp2.build_kernel_tables(
        jnp.asarray(opac), jnp.asarray(kgg), jnp.asarray(cdf_nt),
        jnp.asarray(gnt), jnp.asarray(np.linspace(0, 1, nr + 1)),
        jnp.asarray(np.linspace(0, 1, nz + 1)),
        float(np.log(e_ph[0])), float(np.log(e_ph[1] / e_ph[0])),
        float(np.log(e_gg[0])), float(np.log(e_gg[1] / e_gg[0])),
    )
    n = fp2.TILE
    p = _mkphotons(n, nz, nr, dcen=1.0)
    p["e"] = jnp.full(n, 100.0, jnp.float32)    # > 47 keV, in e_gg grid
    out = fp2.flight_step_v2(
        p["e"], p["w"], p["w0"], p["r"], p["z"], p["mu"], p["cphi"],
        p["sphi"], p["dcen"], p["jz"], p["kr"], p["alive"],
        ktab, p["seeds"],
        dims=dims, nz=nz, nr=nr, pair_switch=True, inline_scatter=True,
        weight_floor=1e-10, max_iters=64, max_tries=64, interpret=True,
    )
    w = np.asarray(out[1])
    ekill, esct, epair = (float(out[16]), float(out[17]),
                          float(out[18]))
    tall = np.asarray(out[20])
    # strong attenuation happened and went to the pair channel
    assert w.sum() < 0.8 * n
    assert epair > 0.1 * n
    # nearly all absorption is gamma-gamma (kap tiny): edep ~ d_e only
    total = w.sum() + tall[0].sum() + ekill + epair - 2.0 * esct
    np.testing.assert_allclose(total, float(n), rtol=3e-4)


def test_v2_kernel_composes_with_photon_mesh():
    """The pallas path must compose with the shard_map photon mesh
    (each device runs the kernel on its local SoA shard; tallies
    psum'd): 2 steps on a 4-device mesh with an exact audit. On real
    hardware this is the multi-chip configuration; here the kernel
    runs in interpret mode inside the sharded step."""
    import dataclasses

    from compton2d_tpu.examples import small_corona
    from compton2d_tpu.parallel.mesh import make_photon_mesh

    mesh = make_photon_mesh(jax.devices()[:4])
    sim = small_corona(
        nz=3, nr=2, nst=2000, n_slots=4096, num_nt=40, n_vol=48,
        nphfield=48, t_const=False, seed=2, mesh=mesh,
    )
    cfg = dataclasses.replace(
        sim.cfg, run=dataclasses.replace(sim.cfg.run,
                                         pallas_tracking="on"),
    )
    sim = sim.with_config(cfg, mesh=mesh)
    for _ in range(2):
        sim.step()
    assert abs(sim.energy_audit()["balance"] - 1.0) < 2e-3


def test_v2_windowed_tables_large_grid_interpret():
    """Windowed-table mode (grids beyond MAX_ZONES, flight_pallas2
    WIN_Z): a 40x30 = 1200-zone grid forces win_z > 0 — per-tile
    2*WIN_Z-zone table windows, the FLAG_WINDOW freeze/retry path, the
    per-tile tally recombination, and the driver's zone-sort prepass
    all run in interpret mode and must agree with the XLA loop within
    MC tolerances at an exact audit."""
    import dataclasses

    from compton2d_tpu.examples import small_corona
    from compton2d_tpu.transport import flight_pallas2 as fp2

    def run(pallas):
        sim = small_corona(
            nz=40, nr=30, nst=3000, n_slots=8192, num_nt=40, n_vol=32,
            nphfield=32, max_flight_iters=64, seed=4,
        )
        assert sim.cfg.grid.nz * sim.cfg.grid.nr > fp2.MAX_ZONES
        cfg = dataclasses.replace(
            sim.cfg,
            run=dataclasses.replace(sim.cfg.run, pallas_tracking=pallas),
        )
        sim = sim.with_config(cfg)
        for _ in range(2):
            sim.step()
        return sim.energy_audit(), sim.state

    a_p, s_p = run("on")
    a_x, s_x = run("off")
    assert abs(a_p["balance"] - 1.0) < 2e-3, a_p
    assert abs(a_x["balance"] - 1.0) < 2e-3, a_x
    for q in ("escaped", "census"):
        ref = max(abs(a_x[q]), 1e-300)
        assert abs(a_p[q] - a_x[q]) / ref < 0.6, (q, a_p[q], a_x[q])
    # zone temperatures relax consistently (field-driven cooling)
    import numpy as np

    te_p = np.asarray(s_p.zones.tea)
    te_x = np.asarray(s_x.zones.tea)
    assert np.all(np.isfinite(te_p))
    assert abs(np.mean(te_p) - np.mean(te_x)) / np.mean(te_x) < 0.1

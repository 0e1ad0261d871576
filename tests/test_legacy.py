"""Legacy input.dat / input_JJ_KK.dat importer round-trip test."""
import os

import numpy as np

from compton2d_tpu.io import legacy


def _fmt(label, value):
    return label.ljust(80) + str(value) + "\n"


def _write_sample(dirpath, nz=2, nr=2):
    lines = []
    a = lines.append
    a(_fmt("number of vertical zones", nz))
    a(_fmt("number of radial zones", nr))
    a(_fmt("z height [cm]", "1.0000000e15"))
    a(_fmt("rmin [cm]", "0.0000000e00"))
    a(_fmt("r max [cm]", "2.0000000e15"))
    a(_fmt("star switch", 0))
    a(_fmt("tstop [s]", "1.0000000e05"))
    a(_fmt("mcdt", "3.0000000e-01"))
    a(_fmt("ntime", 1))
    # window 1
    a(_fmt("t0", "0.0000000e00"))
    a(_fmt("t1", "1.0000000e30"))
    for k in range(nr):
        a(_fmt(f"tbbu({k+1})", "0.0000000e00"))
        a(_fmt("ufile", "none"))
        a(_fmt(f"tbbl({k+1})", "5.0000000e-01"))
        a(_fmt("lfile", "none"))
    a(_fmt("spec_switch", 0))
    a(_fmt("number of photon regions", 2))
    a(_fmt("Ephmin(1)", "1.0000000e-04"))
    a(_fmt("Ephmax(1)", "1.0000000e00"))
    a(_fmt("nphbins(1)", 20))
    a(_fmt("Ephmin(2)", "1.0000000e00"))
    a(_fmt("Ephmax(2)", "1.0000000e04"))
    a(_fmt("nphbins(2)", 30))
    a(_fmt("nmu", 4))
    a(_fmt("nph_lc", 1))
    a(_fmt("Elcmin(1)", "2.0000000e00"))
    a(_fmt("Elcmax(1)", "1.0000000e01"))
    a(_fmt("spectrum file", "sp_test.dat"))
    a(_fmt("photon file", "ph_test.dat"))
    a(_fmt("lc file", "lc_test_.dat"))
    a(_fmt("event file", "evb.dat"))
    a(_fmt("temperature file", "temp.dat"))
    a(_fmt("nst", 5000))
    a(_fmt("rseed", 42))
    a(_fmt("rand_switch", 0))
    a(_fmt("cr_sent", 1))
    a(_fmt("upper_sent", 0))
    a(_fmt("dh_sentinel", 0))
    a(_fmt("pair_switch", 0))
    a(_fmt("T_const", 0))
    a(_fmt("cf_sentinel", 0))
    for name in ("r_flare", "z_flare", "t_flare"):
        a(_fmt(name, "0.0000000e00"))
    for name in ("sigma_r", "sigma_z", "sigma_t"):
        a(_fmt(name, "1.0000000e00"))
    a(_fmt("flare_amp", "0.0000000e00"))
    a(_fmt("r_esc", "3.0000000e00"))
    a(_fmt("r_acc", "1.0000000e09"))
    a(_fmt("inj_switch", 1))
    a(_fmt("inj_dis", 2))
    a(_fmt("g2var_switch", 0))
    a(_fmt("pick_sw", 0))
    a(_fmt("inj_g1", "1.0000000e02"))
    a(_fmt("inj_g2", "1.0000000e04"))
    a(_fmt("inj_p", "2.4000000e00"))
    a(_fmt("inj_t", "0.0000000e00"))
    a(_fmt("inj_L", "1.0000000e42"))
    a(_fmt("pick_rate", "0.0000000e00"))
    a(_fmt("inj_gg", "1.0000000e03"))
    a(_fmt("inj_sigma", "1.0000000e02"))
    a(_fmt("g_bulk", "1.0000000e01"))
    a(_fmt("R_blr", "1.0000000e17"))
    a(_fmt("fr_blr", "1.0000000e-01"))
    a(_fmt("R_ir", "1.0000000e18"))
    a(_fmt("fr_ir", "3.0000000e-01"))
    a(_fmt("R_disk", "1.0000000e15"))
    a(_fmt("d_jet", "1.0000000e17"))
    a(_fmt("split1", 1))
    a(_fmt("split2", 1))
    a(_fmt("split3", 1))
    a(_fmt("spl3_trg", 10))
    with open(os.path.join(dirpath, "input.dat"), "w") as fh:
        fh.writelines(lines)

    for j in range(nz):
        for k in range(nr):
            zl = []
            zl.append(_fmt("tea [keV]", "1.0000000e02"))
            zl.append(_fmt("tna [keV]", "1.0000000e02"))
            zl.append(_fmt("n_e [cm^-3]", "1.0000000e10"))
            zl.append(_fmt("ep_switch", 0))
            zl.append(_fmt("B [G]", "1.0000000e01"))
            zl.append(_fmt("amxwl", "9.0000000e-01"))
            zl.append(_fmt("gmin", "1.0000000e02"))
            zl.append(_fmt("gmax", "1.0000000e05"))
            zl.append(_fmt("p_nth", "2.5000000e00"))
            zl.append(_fmt("q_turb", "1.6666667e00"))
            zl.append(_fmt("turb_lev", "0.0000000e00"))
            with open(
                os.path.join(dirpath, f"input_{j+1:02d}_{k+1:02d}.dat"),
                "w",
            ) as fh:
                fh.writelines(zl)


def test_legacy_roundtrip(tmp_path):
    _write_sample(str(tmp_path))
    lc = legacy.load_legacy_config(str(tmp_path))
    cfg = lc.cfg
    assert cfg.grid.nz == 2 and cfg.grid.nr == 2
    assert np.isclose(cfg.grid.z_max, 1e15)
    assert np.isclose(cfg.grid.r_max, 2e15)
    assert cfg.grid.nphtotal == 50
    assert cfg.grid.nmu == 4
    assert cfg.physics.cr_sent == 1
    assert not cfg.physics.t_const
    assert cfg.physics.injection.switch == 1
    assert np.isclose(cfg.physics.injection.luminosity, 1e42)
    assert cfg.source.nst == 5000
    assert lc.seed == 42
    assert np.isclose(cfg.windows[0].tbb_lower[0], 0.5)
    assert np.isclose(lc.zones.tea[0, 0], 100.0)
    assert np.isclose(lc.zones.amxwl[1, 1], 0.9)
    # the imported config can build a working Simulation
    from compton2d_tpu.driver import Simulation

    cfg2 = cfg.replace(
        run=cfg.run.__class__(
            seed=lc.seed, n_slots=1024, event_capacity=1024,
        )
    )
    sim = Simulation(cfg2, lc.zones)
    out = sim.step()
    assert np.isfinite(float(out.bingo))


def test_external_spectrum_cdf():
    import numpy as np
    from compton2d_tpu.config import ExternalRadiationConfig

    # synthesize a blackbody-ish 4-column file
    e = np.geomspace(1e-5, 1e-1, 100)
    l_disk = e**2 / np.expm1(e / 1e-3)
    f_blr = l_disk.copy()
    f_ir = 0.1 * l_disk
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".in", delete=False) as fh:
        for row in zip(e, l_disk, f_blr, f_ir):
            fh.write(" ".join("%14.7e" % v for v in row) + "\n")
        path = fh.name
    ext = ExternalRadiationConfig(
        R_blr=1e17, fr_blr=0.1, R_ir=1e18, fr_ir=0.3,
        R_disk=1e15, d_jet=1e17, g_bulk=10.0,
    )
    ef, ff, cdf, tot = legacy.external_spectrum(path, ext)
    os.unlink(path)
    assert cdf[0] == 0.0 and np.isclose(cdf[-1], 1.0)
    assert np.all(np.diff(cdf) >= 0)
    assert tot > 0


def test_malformed_input_names_the_field(tmp_path):
    """reader.f errors.txt parity: a malformed value must raise
    LegacyConfigError naming the field and line, not a bare float()
    traceback or a silently shifted parse."""
    import pytest

    _write_sample(str(tmp_path))
    path = os.path.join(str(tmp_path), "input.dat")
    with open(path) as fh:
        lines = fh.readlines()
    # corrupt the z_max value (line 3)
    lines[2] = "z height [cm]".ljust(80) + "bogus\n"
    with open(path, "w") as fh:
        fh.writelines(lines)
    with pytest.raises(legacy.LegacyConfigError, match="z_max"):
        legacy.parse_input_dat(path)


def test_truncated_input_names_the_field(tmp_path):
    import pytest

    _write_sample(str(tmp_path))
    path = os.path.join(str(tmp_path), "input.dat")
    with open(path) as fh:
        lines = fh.readlines()
    with open(path, "w") as fh:
        fh.writelines(lines[:-4])      # drop the splitting block tail
    with pytest.raises(legacy.LegacyConfigError, match="split|spl3"):
        legacy.parse_input_dat(path)


def test_invalid_ranges_are_collected(tmp_path):
    """Range/consistency validation: r_max <= r_min and a reversed
    spectral region are both reported, each naming its field."""
    import pytest

    _write_sample(str(tmp_path))
    path = os.path.join(str(tmp_path), "input.dat")
    with open(path) as fh:
        lines = fh.readlines()
    lines[3] = "rmin [cm]".ljust(80) + "3.0000000e15\n"   # > r_max
    lines[10] = "t1".ljust(80) + "-1.0000000e00\n"        # t1 < t0
    with open(path, "w") as fh:
        fh.writelines(lines)
    with pytest.raises(legacy.LegacyConfigError) as ei:
        legacy.parse_input_dat(path)
    msg = str(ei.value)
    assert "r_max" in msg and "window[0]" in msg


def test_missing_zone_file_named(tmp_path):
    import pytest

    _write_sample(str(tmp_path))
    os.remove(os.path.join(str(tmp_path), "input_02_01.dat"))
    with pytest.raises(legacy.LegacyConfigError, match="input_02_01"):
        legacy.load_legacy_config(str(tmp_path))


def test_config_echo_written(tmp_path):
    """log.txt echo parity (reader.f:170-201): every scalar field and
    the window table appear in the echo file."""
    _write_sample(str(tmp_path))
    echo = os.path.join(str(tmp_path), "log.txt")
    legacy.load_legacy_config(str(tmp_path), echo_path=echo)
    text = open(echo).read()
    for frag in ("nz = 2", "tstop = 100000", "window[0]", "split1 = 1",
                 "g_bulk = 10", "nst = 5000"):
        assert frag in text, frag

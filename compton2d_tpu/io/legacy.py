"""Legacy configuration importer.

Reads the reference's fixed-format inputs so a user of the Fortran code
can run the same setup here:

- ``input/input.dat`` — global config, exact field order of
  ``/root/reference/src/reader.f:157-597`` (each line: an 80-column
  label field followed by the value; we also accept the value as the
  last whitespace token for hand-written files);
- ``input/input_JJ_KK.dat`` — 11 per-zone fields (reader.f:608-657);
- 4-column external spectrum files (E, L_disk, F_blr, F_ir) with the
  Ghisellini-Tavecchio/Ghisellini-Madau boosted BLR+torus construction
  of ``file_sp`` (imcsurf2d_para.f:544-685).
"""
from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from compton2d_tpu import constants as cn
from compton2d_tpu.config import (
    FlareConfig,
    GridConfig,
    InjectionConfig,
    PhysicsConfig,
    RunConfig,
    SimConfig,
    SourceConfig,
    ExternalRadiationConfig,
    TimeWindow,
    ZoneInit,
)


class _Lines:
    """Sequential fixed-format reader: value at column 81+, with a
    whitespace-token fallback."""

    def __init__(self, path: str):
        with open(path) as fh:
            self.lines = fh.readlines()
        self.i = 0

    def _next(self) -> str:
        line = self.lines[self.i]
        self.i += 1
        return line.rstrip("\n")

    def _value(self, line: str) -> str:
        if len(line) > 80 and line[80:].strip():
            return line[80:].strip()
        parts = line.split()
        return parts[-1] if parts else ""

    def f(self) -> float:
        return float(self._value(self._next()).replace("d", "e").replace(
            "D", "E"
        ))

    def i_(self) -> int:
        return int(float(self._value(self._next()).replace("d", "e")))

    def s(self) -> str:
        return self._value(self._next())


@dataclass
class LegacyConfig:
    cfg: SimConfig
    zones: ZoneInit
    filenames: dict
    spectrum_files: dict      # boundary side -> filename (if any)
    seed: int
    splits: Tuple[int, int, int, int]


def parse_input_dat(path: str) -> dict:
    """Parse input/input.dat in reader.f order."""
    L = _Lines(path)
    d = {}
    d["nz"] = L.i_()
    d["nr"] = L.i_()
    d["z_max"] = L.f()
    d["r_min"] = L.f()
    d["r_max"] = L.f()
    d["star_switch"] = L.i_()
    if d["star_switch"] == 1:
        d["r_star"] = L.f()
        d["dist_star"] = L.f()
    else:
        d["r_star"] = 1.0
        d["dist_star"] = 1.0
    d["tstop"] = L.f()
    d["mcdt"] = L.f()
    d["ntime"] = L.i_()

    windows = []
    for _ in range(d["ntime"]):
        t0 = L.f()
        t1 = L.f()
        tbbu, tbbl, ufn, lfn = [], [], [], []
        for _k in range(d["nr"]):
            tbbu.append(L.f())
            ufn.append(L.s())            # filename or placeholder
            tbbl.append(L.f())
            lfn.append(L.s())
        # tbbi/tbbo are forced to 0 in the active reference
        # (reader.f:400-405)
        windows.append(
            dict(t0=t0, t1=t1, tbbu=tbbu, tbbl=tbbl, ufn=ufn, lfn=lfn)
        )
    d["windows"] = windows

    d["spec_switch"] = L.i_()
    d["nphreg"] = L.i_()
    regions = []
    for _ in range(d["nphreg"]):
        emin = L.f()
        emax = L.f()
        nb = L.i_()
        regions.append((emin, emax, nb))
    d["regions"] = regions
    d["nmu"] = L.i_()
    d["nph_lc"] = L.i_()
    lc = []
    for _ in range(d["nph_lc"]):
        lo = L.f()
        hi = L.f()
        lc.append((lo, hi))
    d["lc_bands"] = lc
    d["spname"] = L.s()
    d["phname"] = L.s()
    d["lcname"] = L.s()
    d["eventfile"] = L.s()
    d["temp_file"] = L.s()
    d["nst"] = L.i_()
    d["rseed"] = L.i_()
    d["rand_switch"] = L.i_()
    d["cr_sent"] = L.i_()
    d["upper_sent"] = L.i_()
    d["dh_sentinel"] = L.i_()
    d["pair_switch"] = L.i_()
    d["T_const"] = L.i_()
    d["cf_sentinel"] = L.i_()
    d["r_flare"] = L.f()
    d["z_flare"] = L.f()
    d["t_flare"] = L.f()
    d["sigma_r"] = L.f()
    d["sigma_z"] = L.f()
    d["sigma_t"] = L.f()
    d["flare_amp"] = L.f()
    d["r_esc"] = L.f()
    d["r_acc"] = L.f()
    d["inj_switch"] = L.i_()
    d["inj_dis"] = L.i_()
    d["g2var_switch"] = L.i_()
    d["pick_sw"] = L.i_()
    d["inj_g1"] = L.f()
    d["inj_g2"] = L.f()
    d["inj_p"] = L.f()
    d["inj_t"] = L.f()
    d["inj_L"] = L.f()
    d["pick_rate"] = L.f()
    d["inj_gg"] = L.f()
    d["inj_sigma"] = L.f()
    d["g_bulk"] = L.f()
    d["R_blr"] = L.f()
    d["fr_blr"] = L.f()
    d["R_ir"] = L.f()
    d["fr_ir"] = L.f()
    d["R_disk"] = L.f()
    d["d_jet"] = L.f()
    d["split1"] = L.i_()
    d["split2"] = L.i_()
    d["split3"] = L.i_()
    d["spl3_trg"] = L.i_()
    return d


def parse_zone_file(path: str) -> dict:
    """input/input_JJ_KK.dat (reader.f:630-642)."""
    L = _Lines(path)
    return dict(
        tea=L.f(), tna=L.f(), n_e=L.f(), ep_switch=L.i_(),
        B_field=L.f(), amxwl=L.f(), gmin=L.f(), gmax=L.f(),
        p_nth=L.f(), q_turb=L.f(), turb_lev=L.f(),
    )


def load_legacy_config(input_dir: str, **run_overrides) -> LegacyConfig:
    """Load a full reference-style config directory."""
    d = parse_input_dat(os.path.join(input_dir, "input.dat"))
    nz, nr = d["nz"], d["nr"]

    grid = GridConfig(
        nz=nz, nr=nr, z_max=d["z_max"], r_min=d["r_min"],
        r_max=d["r_max"],
        spectral_regions=tuple(d["regions"]),
        nmu=d["nmu"],
        lc_bands=tuple(d["lc_bands"]),
    )
    def _resolve(name: str) -> str:
        """Spectrum filenames in input.dat are relative to the run
        directory (the parent of input/); accept either location."""
        if not name or os.path.isabs(name):
            return name
        for cand in (
            os.path.join(input_dir, name),
            os.path.join(os.path.dirname(os.path.abspath(input_dir)),
                         name),
            name,
        ):
            if os.path.exists(cand):
                return cand
        return name

    windows = tuple(
        TimeWindow(
            t0=w["t0"], t1=w["t1"],
            tbb_lower=tuple(w["tbbl"]),
            tbb_upper=tuple(w["tbbu"]),
            tbb_inner=(0.0,) * nz,
            tbb_outer=(0.0,) * nz,
            # per-ring per-window spectrum files (reader.f:228-246); the
            # name line is only meaningful where tbb < 0
            upper_spectra=tuple(
                _resolve(w["ufn"][k]) if w["tbbu"][k] < 0.0 else None
                for k in range(nr)
            ),
            lower_spectra=tuple(
                _resolve(w["lfn"][k]) if w["tbbl"][k] < 0.0 else None
                for k in range(nr)
            ),
        )
        for w in d["windows"]
    )
    inj_v = float(np.sqrt(max(1.0 - 1.0 / d["g_bulk"] ** 2, 1e-12))
                  * cn.C_LIGHT) if d["g_bulk"] > 1.0 else cn.C_LIGHT
    phys = PhysicsConfig(
        cr_sent=d["cr_sent"], upper_sent=d["upper_sent"],
        dh_sentinel=d["dh_sentinel"], pair_switch=d["pair_switch"],
        t_const=bool(d["T_const"]),
        star_switch=d["star_switch"], r_star=d["r_star"],
        dist_star=d["dist_star"],
        r_esc=d["r_esc"], r_acc=d["r_acc"],
        flare=FlareConfig(
            enabled=bool(d["cf_sentinel"]),
            r_flare=d["r_flare"], z_flare=d["z_flare"],
            t_flare=d["t_flare"], sigma_r=d["sigma_r"],
            sigma_z=d["sigma_z"], sigma_t=d["sigma_t"],
            amplitude=d["flare_amp"],
        ),
        injection=InjectionConfig(
            switch=d["inj_switch"], distribution=d["inj_dis"],
            g1=d["inj_g1"], g2=d["inj_g2"], p=d["inj_p"],
            t_start=d["inj_t"], gauss_g=d["inj_gg"],
            gauss_sigma=d["inj_sigma"], luminosity=d["inj_L"],
            v=inj_v, g2var_switch=d["g2var_switch"],
            pickup=bool(d["pick_sw"]), pickup_rate=d["pick_rate"],
        ),
    )
    source = SourceConfig(
        nst=d["nst"],
        split=max(d["split1"], 1),
        external=ExternalRadiationConfig(
            R_blr=d["R_blr"], fr_blr=d["fr_blr"],
            R_ir=d["R_ir"], fr_ir=d["fr_ir"],
            R_disk=d["R_disk"], d_jet=d["d_jet"],
            g_bulk=d["g_bulk"],
        ),
    )
    run = RunConfig(
        t_stop=d["tstop"], mcdt=d["mcdt"], seed=d["rseed"],
        **run_overrides,
    )
    cfg = SimConfig(
        grid=grid, physics=phys, source=source, run=run, windows=windows
    )

    # per-zone files
    z = ZoneInit.uniform(grid)
    for j in range(nz):
        for k in range(nr):
            path = os.path.join(
                input_dir, f"input_{j + 1:02d}_{k + 1:02d}.dat"
            )
            zd = parse_zone_file(path)
            for name, val in zd.items():
                getattr(z, name)[j, k] = val

    # first file-spectrum boundary (back-compat convenience)
    spectrum_files = {}
    for w in d["windows"]:
        for k in range(nr):
            if w["tbbl"][k] < 0 and w["lfn"][k]:
                spectrum_files.setdefault("lower", _resolve(w["lfn"][k]))
            if w["tbbu"][k] < 0 and w["ufn"][k]:
                spectrum_files.setdefault("upper", _resolve(w["ufn"][k]))

    return LegacyConfig(
        cfg=cfg, zones=z,
        filenames=dict(
            spname=d["spname"], phname=d["phname"], lcname=d["lcname"],
            eventfile=d["eventfile"], temp_file=d["temp_file"],
        ),
        spectrum_files=spectrum_files,
        seed=d["rseed"],
        splits=(d["split1"], d["split2"], d["split3"], d["spl3_trg"]),
    )


# ---------------------------------------------------------------------------
# External (disk/BLR/IR) spectrum files — file_sp
# ---------------------------------------------------------------------------
def external_spectrum(
    fname: str,
    ext: ExternalRadiationConfig,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """file_sp (imcsurf2d_para.f:544-685): read the 4-column spectrum
    (E [keV], L_disk, F_blr, F_ir), normalize the BLR and torus fluxes to
    the Ghisellini-Madau comoving-frame energy densities boosted by
    Gamma^2, and build the piecewise-power-law sampling CDF.

    Returns (E_file, F_file, P_file CDF, int_file [erg/cm^2/s]).
    """
    data = np.loadtxt(fname)
    e = data[:, 0]
    l_disk = data[:, 1]
    f_blr = data[:, 2]
    f_ir = data[:, 3]
    n = len(e)
    de = np.diff(e)
    ratio = np.sqrt(e[1] / e[0])

    ltot = np.sum(l_disk[:-1] * de) / ratio
    fblr_tot = np.sum(f_blr[:-1] * de) / ratio
    fir_tot = np.sum(f_ir[:-1] * de) / ratio

    g2 = ext.g_bulk**2
    fblr_norm = 17.0 / 48.0 / np.pi * g2 * ext.fr_blr * ltot / ext.R_blr**2
    fir_norm = 0.25 / np.pi * g2 * ext.fr_ir * ltot / ext.R_ir**2
    f_file = (
        f_blr / max(fblr_tot, 1e-300) * fblr_norm
        + f_ir / max(fir_tot, 1e-300) * fir_norm
    )

    # piecewise-power-law integrals (imcsurf2d_para.f:659-682)
    f_file = np.maximum(f_file, 1e-300)
    alpha = np.log(f_file[1:] / f_file[:-1]) / np.log(e[1:] / e[:-1])
    a1 = np.clip(alpha + 1.0, -20.0, 20.0)
    seg = np.where(
        np.abs(a1) < 1e-3,
        f_file[:-1] * e[:-1] * np.log(e[1:] / e[:-1]),
        f_file[:-1] * e[:-1] * ((e[1:] / e[:-1]) ** a1 - 1.0) / a1,
    )
    isum = np.sum(seg)
    cdf = np.cumsum(seg) / max(isum, 1e-300)
    p_file = np.concatenate([[0.0], cdf])
    return e, f_file, p_file, float(isum)

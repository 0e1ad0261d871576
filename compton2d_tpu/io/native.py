"""ctypes bindings to the native C++ event-processing library.

Compiles ``compton2d_tpu/native/evtproc.cpp`` with g++ on first use
(cached as a shared object next to the source). Falls back to the
pure-numpy implementations in :mod:`compton2d_tpu.io.postprocess` when no
compiler is available — call :func:`available` to check.

The native layer mirrors the reference's C post-processors
(``plcm.c``/``pspt.c``): streaming parse of 7-column text event files
and Doppler light-curve/SED binning of millions of records.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _src_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "native")


def _build() -> Optional[str]:
    src = os.path.abspath(os.path.join(_src_dir(), "evtproc.cpp"))
    out = os.path.abspath(os.path.join(_src_dir(), "libevtproc.so"))
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    c_dp = ctypes.POINTER(ctypes.c_double)
    lib.evt_count_rows.restype = ctypes.c_int64
    lib.evt_count_rows.argtypes = [ctypes.c_char_p]
    lib.evt_read.restype = ctypes.c_int64
    lib.evt_read.argtypes = [ctypes.c_char_p, c_dp, ctypes.c_int64]
    lib.evt_doppler_lc.restype = None
    lib.evt_doppler_lc.argtypes = [
        c_dp, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        c_dp, ctypes.c_int64,
        c_dp, ctypes.c_int64,
        c_dp, c_dp, ctypes.c_int64,
        c_dp, c_dp, c_dp,
    ]
    lib.evt_write_rows.restype = ctypes.c_int64
    lib.evt_write_rows.argtypes = [ctypes.c_char_p, c_dp, ctypes.c_int64]
    lib.evt_doppler_sed.restype = None
    lib.evt_doppler_sed.argtypes = [
        c_dp, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double,
        c_dp, ctypes.c_int64,
        c_dp, c_dp,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def write_event_rows(path: str, rec: np.ndarray) -> int:
    """Native append of (n, 7) records in the reference e14.7 text
    format; returns rows written or -1 when the native library is
    unavailable (caller falls back to np.savetxt)."""
    lib = _load()
    if lib is None:
        return -1
    rec = np.ascontiguousarray(rec, np.float64)
    return int(lib.evt_write_rows(path.encode(), _ptr(rec), rec.shape[0]))


def read_event_file(path: str) -> np.ndarray:
    """Native streaming parse of a 7-column event file."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path).reshape(-1, 7)
    n = lib.evt_count_rows(path.encode())
    if n <= 0:
        return np.zeros((0, 7))
    out = np.empty((n, 7), np.float64)
    got = lib.evt_read(path.encode(), _ptr(out), n)
    return out[: max(got, 0)]


def light_curves(
    events: np.ndarray,
    gam_bulk: float,
    r_max: float,
    t_edges: np.ndarray,
    e_bands: np.ndarray,
    mu_edges: Optional[np.ndarray] = None,
    t_offset: float = 0.0,
):
    """Native plcm.c binning; returns the same LightCurves object as
    io.postprocess.light_curves."""
    from compton2d_tpu.io.postprocess import LightCurves
    from compton2d_tpu.io import postprocess as pp

    lib = _load()
    if lib is None:
        return pp.light_curves(
            events, gam_bulk, r_max, t_edges, e_bands, mu_edges, t_offset
        )
    if mu_edges is None:
        mu_edges = np.linspace(-1.0, 1.0, 11)
    events = np.ascontiguousarray(events, np.float64)
    t_edges = np.ascontiguousarray(t_edges, np.float64)
    mu_edges = np.ascontiguousarray(mu_edges, np.float64)
    eb = np.asarray(e_bands, np.float64).reshape(-1, 2)
    e_lo = np.ascontiguousarray(eb[:, 0])
    e_hi = np.ascontiguousarray(eb[:, 1])
    nt, nmu, nb = len(t_edges) - 1, len(mu_edges) - 1, len(eb)
    F = np.zeros((nt, nmu, nb))
    F2 = np.zeros((nt, nmu, nb))
    counts = np.zeros((nt, nmu, nb))
    lib.evt_doppler_lc(
        _ptr(events), events.shape[0],
        float(gam_bulk), float(r_max), float(t_offset),
        _ptr(t_edges), nt, _ptr(mu_edges), nmu,
        _ptr(e_lo), _ptr(e_hi), nb,
        _ptr(F), _ptr(F2), _ptr(counts),
    )
    return LightCurves(
        t_edges=t_edges, mu_edges=mu_edges, e_bands=eb,
        flux=F, flux_sq=F2, counts=counts,
    )


def sed(
    events: np.ndarray,
    gam_bulk: float,
    r_max: float,
    t_start: float,
    t_end: float,
    e_edges: np.ndarray,
    mu_range: Tuple[float, float] = (-1.0, 1.0),
):
    from compton2d_tpu.io import postprocess as pp

    lib = _load()
    if lib is None:
        return pp.sed(
            events, gam_bulk, r_max, t_start, t_end, e_edges, mu_range
        )
    events = np.ascontiguousarray(events, np.float64)
    e_edges = np.ascontiguousarray(e_edges, np.float64)
    ne = len(e_edges) - 1
    flux = np.zeros(ne)
    counts = np.zeros(ne)
    lib.evt_doppler_sed(
        _ptr(events), events.shape[0],
        float(gam_bulk), float(r_max),
        float(t_start), float(t_end),
        float(mu_range[0]), float(mu_range[1]),
        _ptr(e_edges), ne, _ptr(flux), _ptr(counts),
    )
    return pp.SED(e_edges=e_edges, flux=flux, counts=counts)

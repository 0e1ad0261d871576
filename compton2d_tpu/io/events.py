"""Escaping-photon event records.

The reference writes every escaping photon to per-rank text event files
``pNNN_<name>`` in a 7-column e14.7 format
(``/root/reference/src/imcleak2d.f:105,181``):

    t_bound  xnu  ew  rpre  zpre  wmu  phi

Those files are both the science output and the input of the C
post-processors (``postprocessing/plcm.c:384``). Here the device
accumulates a fixed-capacity EventBuffer per step (per device); the host
flushes it.

Two sinks are provided:
- :class:`EventFileWriter` — reference-format text file (so the original
  plcm/pspt post-processors remain usable);
- :class:`EventArrayStore` — in-memory numpy stack for the native
  post-processing in :mod:`compton2d_tpu.io.postprocess`.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def _to_host(arr) -> np.ndarray:
    """Materialize a (possibly multi-process sharded) jax array's
    LOCAL data: in a multi-process run each host spools only its own
    addressable shards (the analogue of the reference's per-rank
    pNNN_evb.dat files)."""
    if hasattr(arr, "is_fully_addressable") and not arr.is_fully_addressable:
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(arr)


def buffer_to_numpy(events, energy_scale: float) -> np.ndarray:
    """Extract valid records as (n, 7) float64, weights converted to erg.

    ``events.data`` may be the per-device-stacked global array from a
    sharded run: shape (ndev*cap, 7) with counts (ndev,). In a
    multi-process run only the local devices' records are returned.
    """
    data = np.asarray(_to_host(events.data), np.float64)
    counts = np.atleast_1d(_to_host(events.count))
    ndev = counts.shape[0]
    cap = data.shape[0] // ndev
    rows: List[np.ndarray] = []
    for d in range(ndev):
        n = int(min(counts[d], cap))
        rows.append(data[d * cap: d * cap + n])
    out = np.concatenate(rows, axis=0) if rows else np.zeros((0, 7))
    out[:, 2] *= energy_scale  # ew -> erg
    return out


class EventFileWriter:
    """Append reference-format event records to a text file."""

    def __init__(self, path: str, energy_scale: float):
        self.path = path
        self.energy_scale = energy_scale
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # Truncate on open so a re-run into an existing path never mixes
        # stale records with new ones (the native writer appends, so the
        # truncation must happen here, before the first write). Writes go
        # through the native formatter when available
        # (io.native.write_event_rows, ~3x np.savetxt).
        self._fh = open(path, "w")
        self.n_written = 0
        self.n_dropped = 0

    def write(self, events) -> int:
        from compton2d_tpu.io import native as _native

        rec = buffer_to_numpy(events, self.energy_scale)
        counts = np.atleast_1d(np.asarray(events.count))
        cap = np.asarray(events.data).shape[0] // counts.shape[0]
        self.n_dropped += int(np.sum(np.maximum(counts - cap, 0)))
        self._fh.flush()
        if _native.write_event_rows(self.path, rec) < 0:
            np.savetxt(self._fh, rec, fmt="%14.7e")
            self._fh.flush()
        self.n_written += rec.shape[0]
        return rec.shape[0]

    def close(self):
        self._fh.close()


class EventArrayStore:
    """Accumulate event records in memory for native post-processing."""

    def __init__(self, energy_scale: float):
        self.energy_scale = energy_scale
        self._chunks: List[np.ndarray] = []
        self.n_dropped = 0

    def write(self, events) -> int:
        rec = buffer_to_numpy(events, self.energy_scale)
        counts = np.atleast_1d(np.asarray(events.count))
        cap = np.asarray(events.data).shape[0] // counts.shape[0]
        self.n_dropped += int(np.sum(np.maximum(counts - cap, 0)))
        self._chunks.append(rec)
        return rec.shape[0]

    def all(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros((0, 7))
        return np.concatenate(self._chunks, axis=0)


def read_event_file(path: str) -> np.ndarray:
    """Read a reference-format event file into (n, 7) float64."""
    return np.loadtxt(path).reshape(-1, 7)

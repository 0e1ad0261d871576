"""Checkpoint / resume.

The reference dumps the entire COMMON block per rank to text files
(``/root/reference/src/write_record.f``/``read_record.f``) when 95 % of
the assumed 8-hour walltime is spent (``xec2d.f:24,50-55``), and resumes
automatically when ``p000_misc.dat`` exists (``compton2d.f:16-21``).

Here the full ``SimState`` pytree (zone fields, photon SoA including the
in-flight census population, RNG key, time/step counters) goes to a
single ``.npz``; restore rebuilds the pytree onto devices. RNG state is
the counter-based key, so the random stream resumes exactly — the
reference needed to dump its 10000-entry lagged-Fibonacci ring buffer
(``write_record.f:388-390``) for the same guarantee.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, state, meta: Optional[dict] = None):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)
    if meta is not None:
        with open(path + ".meta.json", "w") as fh:
            json.dump(meta, fh)


def load_checkpoint(path: str, like_state):
    """Restore a SimState saved by :func:`save_checkpoint`. ``like_state``
    provides the pytree structure and dtypes."""
    leaves, treedef = jax.tree_util.tree_flatten(like_state)
    with np.load(path) as data:
        new_leaves = [
            jnp.asarray(data[f"leaf_{i}"], leaves[i].dtype)
            for i in range(len(leaves))
        ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_meta(path: str) -> dict:
    with open(path + ".meta.json") as fh:
        return json.load(fh)


class WalltimeGuard:
    """Self-checkpoint trigger at a fraction of the walltime budget
    (xec2d.f:50-55: 95 % of 8 h)."""

    def __init__(self, budget_s: float, frac: float = 0.95):
        self.t0 = time.time()
        self.budget_s = budget_s
        self.frac = frac

    def should_checkpoint(self) -> bool:
        if self.budget_s <= 0:
            return False
        return (time.time() - self.t0) >= self.frac * self.budget_s

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


def _local_shard(arr) -> np.ndarray:
    """This process's addressable slice of a (possibly multi-process)
    jax.Array, concatenated along the leading sharded axis."""
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def _atomic_savez(path: str, arrays: dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def save_checkpoint(path: str, state, meta: Optional[dict] = None):
    """Dump the state pytree.

    Single-process: everything to one ``.npz`` at ``path``.

    Multi-process (jax.distributed): every process writes its own
    addressable shards of non-fully-addressable leaves to
    ``path.pNNN.npz`` — the analogue of the reference's per-rank
    ``pNNN_misc.dat``/``pNNN_census.dat`` dumps (write_record.f:16-435);
    process 0 additionally writes the replicated leaves + meta to
    ``path``. ``np.asarray`` on a non-fully-addressable global array
    would raise, so those leaves never touch the single-file path.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    nproc = jax.process_count()
    if nproc == 1:
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        _atomic_savez(path, arrays)
    else:
        local, replicated = {}, {}
        for i, x in enumerate(leaves):
            if (
                hasattr(x, "is_fully_addressable")
                and not x.is_fully_addressable
                and not x.sharding.is_fully_replicated
            ):
                local[f"leaf_{i}"] = _local_shard(x)
            elif (
                hasattr(x, "is_fully_addressable")
                and not x.is_fully_addressable
            ):
                # replicated global array: every process holds a full
                # copy in each addressable shard
                replicated[f"leaf_{i}"] = np.asarray(
                    x.addressable_shards[0].data
                )
            else:
                replicated[f"leaf_{i}"] = np.asarray(x)
        _atomic_savez(f"{path}.p{jax.process_index():03d}.npz", local)
        if jax.process_index() == 0:
            replicated["_nproc"] = np.asarray(nproc)
            _atomic_savez(path, replicated)
    if meta is not None and jax.process_index() == 0:
        with open(path + ".meta.json", "w") as fh:
            json.dump(meta, fh)


def load_checkpoint(path: str, like_state):
    """Restore a state saved by :func:`save_checkpoint`. ``like_state``
    provides the pytree structure, dtypes, and (multi-process) the
    target shardings; the process count must match the saving run
    (the reference resumes on the same rank layout, read_record.f)."""
    leaves, treedef = jax.tree_util.tree_flatten(like_state)
    nproc = jax.process_count()
    if nproc == 1:
        with np.load(path) as data:
            new_leaves = [
                jnp.asarray(data[f"leaf_{i}"], leaves[i].dtype)
                for i in range(len(leaves))
            ]
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    with np.load(path) as repl, np.load(
        f"{path}.p{jax.process_index():03d}.npz"
    ) as local:
        saved_np = int(repl["_nproc"])
        if saved_np != nproc:
            raise ValueError(
                f"checkpoint written by {saved_np} processes, "
                f"resuming with {nproc}"
            )
        new_leaves = []
        for i, like in enumerate(leaves):
            key = f"leaf_{i}"
            if key in local.files:
                host = local[key].astype(like.dtype)
                new_leaves.append(
                    jax.make_array_from_process_local_data(
                        like.sharding, host
                    )
                )
            else:
                host = repl[key].astype(like.dtype)
                if (
                    hasattr(like, "is_fully_addressable")
                    and not like.is_fully_addressable
                ):
                    # rebuild the replicated global array on the mesh
                    new_leaves.append(
                        jax.make_array_from_callback(
                            host.shape, like.sharding,
                            lambda idx, h=host: h[idx],
                        )
                    )
                else:
                    new_leaves.append(jnp.asarray(host))
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

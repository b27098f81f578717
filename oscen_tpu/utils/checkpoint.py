"""Checkpoint / resume for compiled graphs.

The reference has no checkpointing (SURVEY §5.4); its nearest concepts are
``prepare()`` and kernel ``reset()``.  Here the entire engine state — node
states, feedback carries, resampler histories, ring buffers, FDL spectra —
is one pytree, so save/restore is trivial and bit-exact: rendering after a
restore continues identically (tested).
"""

from __future__ import annotations

import pickle
import jax
import numpy as np


def save_state(compiled, path: str) -> None:
    """Serialize a CompiledGraph's device state (plus host param/ramp
    state) to ``path``."""
    host_params = {
        name: {"current": float(r.current), "target": float(r.target),
               "increment": float(r.increment),
               "frames_remaining": int(r.frames_remaining)}
        for name, r in compiled._params.items()}
    blob = {
        "state": jax.tree_util.tree_map(np.asarray, compiled.state),
        "params": host_params,
        "sample_rate": compiled.sample_rate,
        "graph": compiled.ir.name,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_state(compiled, path: str) -> None:
    """Restore state saved by :func:`save_state` into ``compiled``.
    Graph name and sample rate must match."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob["graph"] != compiled.ir.name:
        raise ValueError(
            f"checkpoint is for graph '{blob['graph']}', not "
            f"'{compiled.ir.name}'")
    if blob["sample_rate"] != compiled.sample_rate:
        raise ValueError("sample rate mismatch")
    compiled.state = jax.tree_util.tree_map(lambda x: x, blob["state"])
    for name, p in blob["params"].items():
        r = compiled._params.get(name)
        if r is None:
            continue
        r.current = np.float32(p["current"])
        r.target = np.float32(p["target"])
        r.increment = np.float32(p["increment"])
        r.frames_remaining = int(p["frames_remaining"])

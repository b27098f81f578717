"""Checkpoint / resume for compiled graphs.

The reference has no checkpointing (SURVEY §5.4); its nearest concepts are
``prepare()`` and kernel ``reset()``.  Here the engine state has three
parts, all serialized: the device pytree (node states, feedback carries,
resampler histories, ring buffers, FDL spectra), the host parameter/ramp
state, and the host-domain control state (voice-allocator LRU tables,
MIDI note tracking, pending un-consumed event queues).  Save/restore is
bit-exact: rendering after a restore continues identically, including
voice allocation in polyphonic graphs (tested).
"""

from __future__ import annotations

import pickle
import jax
import numpy as np


def _host_node_instances(compiled, name):
    insts = compiled.prog.host_instances.get(name)
    if insts is None:
        insts = [compiled.ir.nodes[name].node]
    return insts


def save_state(compiled, path: str) -> None:
    """Serialize a CompiledGraph's device state (plus host param/ramp and
    host-domain control state) to ``path``."""
    host_params = {
        name: {"current": float(r.current), "target": float(r.target),
               "increment": float(r.increment),
               "frames_remaining": int(r.frames_remaining)}
        for name, r in compiled._params.items()}
    host_nodes = {
        name: [inst.host_state()
               for inst in _host_node_instances(compiled, name)]
        for name in compiled.prog.host_nodes}
    pending_events = {
        name: [(int(e.frame_offset), e.payload) for e in q]
        for name, q in compiled._event_queues.items()}
    blob = {
        "state": jax.tree_util.tree_map(np.asarray, compiled.state),
        "params": host_params,
        "host_nodes": host_nodes,
        "pending_events": pending_events,
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
    # structural validation: a checkpoint from a graph compiled with a
    # different voice count / node config must error, not silently load
    # wrong-shaped leaves
    cur_struct = jax.tree_util.tree_structure(compiled.state)
    new_struct = jax.tree_util.tree_structure(blob["state"])
    if cur_struct != new_struct:
        raise ValueError(
            "checkpoint state tree does not match this compiled graph "
            f"(saved {new_struct}, expected {cur_struct})")
    for cur, new in zip(jax.tree_util.tree_leaves(compiled.state),
                        jax.tree_util.tree_leaves(blob["state"])):
        if np.shape(cur) != np.shape(new):
            raise ValueError(
                "checkpoint leaf shape mismatch "
                f"({np.shape(new)} vs {np.shape(cur)}) — was the graph "
                "compiled with a different voice count or block config?")
    compiled.state = jax.tree_util.tree_map(lambda x: x, blob["state"])
    for name, p in blob["params"].items():
        r = compiled._params.get(name)
        if r is None:
            continue
        r.current = np.float32(p["current"])
        r.target = np.float32(p["target"])
        r.increment = np.float32(p["increment"])
        r.frames_remaining = int(p["frames_remaining"])
        # conservative: restored params stage as runtime data (the
        # checkpoint doesn't record whether they were ever set, and the
        # saved value may differ from the compile-time default)
        r.touched = True
    for name, snapshots in blob.get("host_nodes", {}).items():
        if name not in compiled.prog.host_set:
            continue
        insts = _host_node_instances(compiled, name)
        if len(insts) != len(snapshots):
            raise ValueError(
                f"checkpoint has {len(snapshots)} snapshots for host "
                f"node '{name}' but the graph has {len(insts)} "
                "instances — voice counts must match")
        for inst, snap in zip(insts, snapshots):
            inst.restore_host_state(snap)
    # restored host state invalidates the per-instance steady memo and
    # any cached staging built from the pre-restore state
    compiled._host_steady.clear()
    compiled._staging_cache.clear()
    compiled._control_dirty = True
    if "pending_events" in blob:
        from ..core.events import EventInstance
        for q in compiled._event_queues.values():
            q.clear()
        for name, evs in blob["pending_events"].items():
            q = compiled._event_queues.get(name)
            if q is None:
                continue
            q.extend(EventInstance(off, payload) for off, payload in evs)

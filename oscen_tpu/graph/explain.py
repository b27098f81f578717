"""Trace-time introspection of kernel/fast-path selection.

The performance contract of the compiled graph is otherwise implicit:
which node runs a fused Pallas kernel vs a vmapped fallback, whether the
FM chain's zero-feedback vectorized branch engages, whether an epilogue
was fused into a producer kernel, whether a feedback component scans
per-sample or dissolved into block phases.  The reference exposes the
analogous information structurally — generated graphs are plain structs
whose node fields are public (examples/electric-piano/src/main.rs:364-368)
— so a user can see exactly what their graph compiled into.  Here the
decisions happen while TRACING ``block_fn``, so they are recorded as a
side effect of tracing: ``CompiledGraph.explain()`` re-traces the block
function abstractly (``jax.eval_shape`` — no device work) inside
``recording()`` and returns the notes.

Usage from node/op code (no-op unless a recording is active)::

    from ..graph import explain
    explain.note(kernel="fm_chain3", fast_path="zero_feedback",
                 engaged=True)

The ``node`` field is filled automatically from the surrounding
``processing(name)`` scope that block_mode enters per node.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Dict, List, Optional

_REC: Optional[List[Dict[str, Any]]] = None
_NODE: Optional[str] = None


def active() -> bool:
    """True while an explain() trace is recording."""
    return _REC is not None


@contextmanager
def recording(out: List[Dict[str, Any]]):
    """Collect notes emitted during the enclosed trace into ``out``."""
    global _REC
    prev, _REC = _REC, out
    try:
        yield out
    finally:
        _REC = prev


@contextmanager
def processing(name: str):
    """Scope marking which graph node is currently being traced."""
    global _NODE
    if _REC is None:
        yield
        return
    prev, _NODE = _NODE, name
    try:
        yield
    finally:
        _NODE = prev


def note(**facts: Any) -> None:
    """Record one fact dict against the current node (trace-time only)."""
    if _REC is None:
        return
    entry = dict(facts)
    entry.setdefault("node", _NODE)
    _REC.append(entry)


def format_report(entries: List[Dict[str, Any]]) -> str:
    """Human-readable rendering of explain() entries."""
    lines = []
    for e in entries:
        node = e.get("node") or "<graph>"
        rest = {k: v for k, v in e.items() if k != "node"}
        kv = ", ".join(f"{k}={v}" for k, v in rest.items())
        lines.append(f"{node}: {kv}")
    return "\n".join(lines)

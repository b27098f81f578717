"""Event types and the host↔device event representation.

The reference carries events as ``EventInstance{frame_offset, payload}``
queues on node struct fields (graph/types.rs:86-241).  Here events live in two
domains:

- **Host domain** (control logic, runs in Python/NumPy per block): plain
  :class:`EventInstance` lists.  MidiParser, VoiceAllocator, MidiVoiceHandler
  and EventPassthrough operate on these — they are event-rate control nodes,
  exactly like the reference runs them in the event phase of
  ``process_block`` (codegen/mod.rs:754-872).
- **Device domain** (inside jit): a dense, static-shape
  :class:`EventBuffer` per event-input endpoint — sorted ``offsets[K]``,
  scalar ``values[K]`` and a ``valid[K]`` mask.  Node event handlers are pure
  functions applied under that mask at the exact frame offset, reproducing
  the reference's sample-accurate sub-block splitting semantics without
  dynamic shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

import numpy as np

from .types import MAX_STATIC_EVENTS_PER_ENDPOINT


@dataclass(frozen=True)
class NoteOnEvent:
    """Typed note-on payload (reference midi.rs:25-29)."""

    note: int
    velocity: float  # 0.0 - 1.0


@dataclass(frozen=True)
class NoteOffEvent:
    """Typed note-off payload (reference midi.rs:31-35)."""

    note: int


@dataclass(frozen=True)
class RawMidiMessage:
    """Raw (unparsed) MIDI bytes (reference midi.rs:7-22)."""

    bytes: tuple

    @staticmethod
    def new(data: Sequence[int]) -> "RawMidiMessage":
        return RawMidiMessage(tuple(int(b) for b in data[:3]))


@dataclass(frozen=True)
class EventInstance:
    """One event: sample-accurate offset within the block plus a payload.

    ``payload`` is a float for scalar events (the reference's
    ``EventPayload::Scalar``) or any Python object for object events
    (``EventPayload::Object`` — NoteOnEvent etc.).
    """

    frame_offset: int
    payload: Any

    @property
    def scalar(self) -> float:
        """Scalar view of the payload (objects coerce to 1.0, matching
        reference adsr.rs:250-254)."""
        if isinstance(self.payload, (int, float)):
            return float(self.payload)
        return 1.0


def scalar_event(frame_offset: int, v: float) -> EventInstance:
    return EventInstance(int(frame_offset), float(v))


from jax import tree_util as _tree_util


@dataclass
class EventBuffer:
    """Dense static-shape device representation of one endpoint's events.

    ``offsets`` int32[K] (sorted ascending; invalid slots hold a sentinel of
    ``block_len``), ``values`` float32[K] (scalar payloads), ``valid``
    bool[K].  K is static; jit specializes on it.  The reference caps events
    at 32 per endpoint per block (types.rs:18) so K ≤ 32 loses nothing.
    """

    offsets: Any  # int32[K] (np or jnp)
    values: Any   # float32[K]
    valid: Any    # bool[K]

    @property
    def capacity(self) -> int:
        return int(np.shape(self.offsets)[-1])

    @staticmethod
    def empty(capacity: int = 0) -> "EventBuffer":
        return EventBuffer(
            offsets=np.zeros((capacity,), np.int32),
            values=np.zeros((capacity,), np.float32),
            valid=np.zeros((capacity,), bool),
        )

    @staticmethod
    def from_events(events: Sequence[EventInstance],
                    capacity: Optional[int] = None) -> "EventBuffer":
        """Pack a host event list into a sorted dense buffer.

        Events are sorted by frame_offset with a *stable* sort, preserving
        push order within a frame — the same staging the reference does in
        ``process_block`` (codegen/mod.rs:782-799).  Overflow beyond the cap
        is dropped (reference: ``try_push`` ignored, static_context.rs:86).
        """
        evs = sorted(events, key=lambda e: e.frame_offset)
        evs = evs[:MAX_STATIC_EVENTS_PER_ENDPOINT]
        n = len(evs)
        if capacity is None:
            capacity = n
        capacity = max(capacity, n)
        off = np.zeros((capacity,), np.int32)
        val = np.zeros((capacity,), np.float32)
        ok = np.zeros((capacity,), bool)
        for i, e in enumerate(evs):
            off[i] = e.frame_offset
            val[i] = e.scalar
            ok[i] = True
        return EventBuffer(off, val, ok)

    @staticmethod
    def stack(buffers: Sequence["EventBuffer"]) -> "EventBuffer":
        """Stack per-instance buffers into a leading instance axis
        (for node arrays / per-voice event demux)."""
        cap = max((b.capacity for b in buffers), default=0)
        padded = [b.pad_to(cap) for b in buffers]
        return EventBuffer(
            offsets=np.stack([np.asarray(b.offsets) for b in padded]),
            values=np.stack([np.asarray(b.values) for b in padded]),
            valid=np.stack([np.asarray(b.valid) for b in padded]),
        )

    def pad_to(self, capacity: int) -> "EventBuffer":
        k = self.capacity
        if k == capacity:
            return self
        if k > capacity:
            raise ValueError("cannot shrink EventBuffer")
        pad = capacity - k
        pw = [(0, 0)] * (np.ndim(self.offsets) - 1) + [(0, pad)]
        return EventBuffer(
            offsets=np.pad(np.asarray(self.offsets), pw),
            values=np.pad(np.asarray(self.values), pw),
            valid=np.pad(np.asarray(self.valid), pw),
        )


_tree_util.register_pytree_node(
    EventBuffer,
    lambda b: ((b.offsets, b.values, b.valid), None),
    lambda aux, leaves: EventBuffer(*leaves),
)


@dataclass
class EventQueue:
    """Host-side mutable event queue used by host-domain control nodes.

    The analogue of the reference's ``EventInput``/``EventOutput`` ArrayVec
    queues (types.rs:136-241), with the same drop-on-overflow semantics.
    """

    events: List[EventInstance] = field(default_factory=list)
    capacity: int = MAX_STATIC_EVENTS_PER_ENDPOINT

    def try_push(self, ev: EventInstance) -> bool:
        if len(self.events) >= self.capacity:
            return False  # dropped, like reference try_push overflow
        self.events.append(ev)
        return True

    def clear(self) -> None:
        self.events.clear()

    def __iter__(self):
        return iter(self.events)

    def __len__(self) -> int:
        return len(self.events)

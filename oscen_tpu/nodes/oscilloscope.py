"""Oscilloscope — the observability tap.

Counterpart of the reference Oscilloscope
(/root/reference/oscen-lib/src/oscilloscope/mod.rs): a pass-through node
writing into a lock-free ring readable by UI threads via ``snapshot``, with
zero-crossing trigger alignment (manual period or auto-detect).

Here the ring lives in the state pytree (device memory); ``snapshot`` runs
on the host between blocks, reading the ring without touching the render
path — the atomic-u32 ring's host↔device analogue.

Auto-detect parity (reference :236-287): the reference counts samples
between rising zero crossings per sample, clamps the measured distance to
[10, capacity] as the display period, and (re)stores a triggered window at
every crossing.  The block path reproduces that state machine with
vectorized reductions: within a block two adjacent crossings are
impossible (a rising crossing forces the next prev > 0), so the final
detected period is the distance between the last two crossings — or the
carried count + first-crossing offset when the block holds just one.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.types import SampleRate, stream
from ..graph.node import Node

DEFAULT_CAPACITY = 4096
MIN_PERIOD = 10  # reference clamp floor (oscilloscope/mod.rs:261)


class Oscilloscope(Node):
    INPUTS = (stream("input", 0.0),)
    OUTPUTS = (stream("output"),)

    def __init__(self, capacity: int = DEFAULT_CAPACITY):
        self.capacity = int(capacity)

    def init_state(self, sr: SampleRate):
        return {"ring": jnp.zeros((self.capacity,), jnp.float32),
                "write_pos": jnp.int32(0),
                "last_sample": jnp.float32(0.0),
                "period_count": jnp.int32(0),
                "detected_period": jnp.int32(0),
                # ring position one past the most recent trigger crossing
                "trig_end": jnp.int32(-1)}

    def _trigger_update(self, state, x, B):
        """Replay the reference's per-sample period detector over a block
        (count samples between rising crossings; clamp to [10, capacity];
        store a triggered window at each crossing)."""
        prevs = jnp.concatenate(
            [jnp.reshape(state["last_sample"], (1,)), x[:-1]])
        cross = jnp.logical_and(prevs <= 0.0, x > 0.0)
        idx = jnp.arange(B, dtype=jnp.int32)
        any_cross = jnp.any(cross)
        t_last = jnp.max(jnp.where(cross, idx, -1))
        t_first = jnp.min(jnp.where(cross, idx, B))
        # distance recorded at the last crossing: between the last two
        # crossings, or carried count + offset when only one in the block
        t_prev = jnp.max(jnp.where(jnp.logical_and(cross, idx < t_last),
                                   idx, -1))
        first_dist = state["period_count"] + t_first + 1
        last_dist = jnp.where(t_prev >= 0, t_last - t_prev, first_dist)
        detected = jnp.where(
            jnp.logical_and(any_cross, last_dist > 1),
            jnp.clip(last_dist, MIN_PERIOD, self.capacity),
            state["detected_period"]).astype(jnp.int32)
        count = jnp.where(any_cross, B - 1 - t_last,
                          state["period_count"] + B).astype(jnp.int32)
        trig_end = jnp.where(
            jnp.logical_and(any_cross, detected > 0),
            (state["write_pos"] + t_last + 1) % self.capacity,
            state["trig_end"]).astype(jnp.int32)
        return {"last_sample": x[B - 1], "period_count": count,
                "detected_period": detected, "trig_end": trig_end}

    def tick(self, state, ins, sr):
        x = ins["input"]
        ring = state["ring"].at[state["write_pos"]].set(x)
        wp = (state["write_pos"] + 1) % self.capacity
        trig = self._trigger_update(state, jnp.reshape(x, (1,)), 1)
        return {**state, **trig, "ring": ring, "write_pos": wp}, \
            {"output": x}

    def process_block(self, state, ins, events, sr, block_len):
        x = ins["input"]
        idx = (state["write_pos"]
               + jnp.arange(block_len, dtype=jnp.int32)) % self.capacity
        ring = state["ring"].at[idx].set(x)
        wp = (state["write_pos"] + block_len) % self.capacity
        trig = self._trigger_update(state, x, block_len)
        return {**state, **trig, "ring": ring, "write_pos": wp}, \
            {"output": x}

    # ------------------------------------------------------------------ #
    @staticmethod
    def snapshot(state, length: Optional[int] = None,
                 trigger: bool = True,
                 period: Optional[int] = None) -> np.ndarray:
        """Host-side snapshot of the ring.

        ``trigger=True`` returns the triggered display window: the
        ``period`` (manual) or auto-detected-period (reference
        :244-270) samples ending at the most recent rising zero
        crossing.  ``length`` optionally overrides the window length;
        without a trigger yet (or ``trigger=False``) the most recent
        samples are returned.
        """
        ring = np.asarray(state["ring"])
        wp = int(state["write_pos"])
        cap = len(ring)
        chron = np.concatenate([ring[wp:], ring[:wp]])  # oldest..newest

        trig_end = int(state.get("trig_end", -1))
        detected = int(state.get("detected_period", 0))
        win = int(period if period is not None
                  else (detected if detected > 0 else (length or cap)))
        win = max(min(win, cap), 1)
        if not trigger or trig_end < 0:
            return chron[-(length or win):]
        # ring position -> chronological index
        end_chron = (trig_end - wp) % cap
        if end_chron == 0:
            end_chron = cap
        start = max(end_chron - win, 0)
        out = chron[start:end_chron]
        if length is not None:
            out = out[-length:] if len(out) >= length \
                else chron[max(end_chron - length, 0):end_chron]
        return out

"""Oscilloscope — the observability tap.

Counterpart of the reference Oscilloscope
(/root/reference/oscen-lib/src/oscilloscope/mod.rs): a pass-through node
writing into a lock-free ring readable by UI threads via ``snapshot``, with
zero-crossing trigger alignment (manual period or auto-detect).

Here the ring lives in the state pytree (device memory); ``snapshot`` runs
on the host between blocks, reading the ring without touching the render
path — the atomic-u32 ring's host↔device analogue.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.types import SampleRate, stream
from ..graph.node import Node

DEFAULT_CAPACITY = 4096


class Oscilloscope(Node):
    INPUTS = (stream("input", 0.0),)
    OUTPUTS = (stream("output"),)

    def __init__(self, capacity: int = DEFAULT_CAPACITY):
        self.capacity = int(capacity)

    def init_state(self, sr: SampleRate):
        return {"ring": jnp.zeros((self.capacity,), jnp.float32),
                "write_pos": jnp.int32(0)}

    def tick(self, state, ins, sr):
        x = ins["input"]
        ring = state["ring"].at[state["write_pos"]].set(x)
        wp = (state["write_pos"] + 1) % self.capacity
        return {"ring": ring, "write_pos": wp}, {"output": x}

    def process_block(self, state, ins, events, sr, block_len):
        x = ins["input"]
        idx = (state["write_pos"]
               + jnp.arange(block_len, dtype=jnp.int32)) % self.capacity
        ring = state["ring"].at[idx].set(x)
        wp = (state["write_pos"] + block_len) % self.capacity
        return {"ring": ring, "write_pos": wp}, {"output": x}

    # ------------------------------------------------------------------ #
    @staticmethod
    def snapshot(state, length: int = 1024,
                 trigger: bool = True,
                 period: Optional[int] = None) -> np.ndarray:
        """Host-side snapshot of the most recent samples, optionally
        aligned to a rising zero crossing (reference :236-287).

        ``period``: manual trigger search window; auto-detected from the
        first rising zero crossing when None.
        """
        ring = np.asarray(state["ring"])
        wp = int(state["write_pos"])
        cap = len(ring)
        chron = np.concatenate([ring[wp:], ring[:wp]])  # oldest..newest
        if not trigger:
            return chron[-length:]
        search = chron[:-length] if len(chron) > length else chron[:1]
        window = len(search)
        start = max(window - (period or window), 0)
        seg = search[start:]
        rising = np.nonzero((seg[:-1] <= 0.0) & (seg[1:] > 0.0))[0]
        if len(rising) == 0:
            return chron[-length:]
        t0 = start + rising[0] + 1
        return chron[t0:t0 + length] if t0 + length <= len(chron) \
            else chron[-length:]

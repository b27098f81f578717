"""Looping sample playback with a runtime-swappable buffer.

Counterpart of the reference SamplePlayer
(/root/reference/oscen-lib/src/sample_player/mod.rs): loops an asset
buffer; publishing a new asset swaps it in RT-safely and hard-resets the
playhead.  The buffer lives in the state pytree at a fixed capacity
(shorter assets zero-pad, a ``length`` field bounds the loop), so swaps
never change shapes — no retrace in the render loop.

Channel mapping (reference SamplePlayerConsumer::build): mono broadcasts,
extra source channels drop, missing channels clamp to the last source
channel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..assets import AudioAsset
from ..core.types import SampleRate, asset, stream
from ..graph.node import Node

DEFAULT_CAPACITY = 1 << 18  # 262144 frames ≈ 5.5 s at 48 kHz


class SamplePlayer(Node):
    def __init__(self, channels: int = 1, capacity: int = DEFAULT_CAPACITY):
        self.channels = int(channels)
        self.capacity = int(capacity)
        self.INPUTS = (asset("buf"),)
        self.OUTPUTS = (stream("output", channels=channels),)

    def init_state(self, sr: SampleRate):
        return {
            "buf": jnp.zeros((self.capacity, self.channels), jnp.float32),
            "length": jnp.int32(0),
            "playhead": jnp.int32(0),
        }

    # ------------------------------------------------------------------ #
    def asset_consume(self, state, a: AudioAsset, sr: SampleRate):
        """Build the playable and swap it in (publish→take analogue);
        playhead hard-resets (reference sample_player/mod.rs:100-127)."""
        src_ch = a.channels
        frames = min(a.frames, self.capacity)
        buf = np.zeros((self.capacity, self.channels), np.float32)
        for c in range(self.channels):
            sc = 0 if src_ch == 1 else min(c, src_ch - 1)
            buf[:frames, c] = a.channel(sc)[:frames]
        return {**state, "buf": jnp.asarray(buf),
                "length": jnp.int32(frames),
                "playhead": jnp.int32(0)}

    # ------------------------------------------------------------------ #
    def _read(self, state, idx):
        v = state["buf"][idx]
        v = jnp.where(state["length"] > 0, v, 0.0)
        return v[..., 0] if self.channels == 1 else v

    def tick(self, state, ins, sr):
        out = self._read(state, state["playhead"])
        length = jnp.maximum(state["length"], 1)
        playhead = (state["playhead"] + 1) % length
        return {**state, "playhead": playhead}, {"output": out}

    def process_block(self, state, ins, events, sr, block_len):
        length = jnp.maximum(state["length"], 1)
        idx = (state["playhead"] + jnp.arange(block_len,
                                              dtype=jnp.int32)) % length
        out = self._read(state, idx)
        playhead = (state["playhead"] + block_len) % length
        return {**state, "playhead": playhead}, {"output": out}

"""Zero-latency impulse-response convolver with live IR hot-swap.

Counterpart of the reference Convolver
(/root/reference/oscen-lib/src/convolution/mod.rs:453-574): sample-exact
full convolution with no latency, per-channel engines (L→L, R→R, no cross
terms), and a 20 ms equal-power crossfade on live IR swaps with at most two
engines alive.

The reference needs the 3-tier Gardner decomposition because it streams per
sample; here the block path computes the exact convolution directly with a
whole-block FFT MAC over the carried input history (see
oscen_tpu/ops/conv.py for the rationale), and the per-sample path (sample
mode) is the direct time-domain sum.  IR capacity is fixed at
construction, so swaps are pure functional state replacement — shapes never
change, nothing retraces, and the old IR is dropped by the host (the
"retire off-thread" analogue).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import AudioAsset
from ..core.types import SampleRate, asset, stream
from ..graph.node import Node

CROSSFADE_SECONDS = 0.02  # reference convolution/mod.rs:468-469
DEFAULT_MAX_IR = 4096


def _next_pow2(n: int) -> int:
    return 1 << (max(int(n), 1) - 1).bit_length()


class Convolver(Node):
    def __init__(self, ir=None, max_ir_len: int = DEFAULT_MAX_IR,
                 channels: int = 1):
        self.channels = int(channels)
        self.capacity = int(max_ir_len)
        self._initial_ir = None if ir is None else np.asarray(
            ir, np.float32)
        if self._initial_ir is not None \
                and len(self._initial_ir) > self.capacity:
            self.capacity = _next_pow2(len(self._initial_ir))
        self.INPUTS = (stream("input", 0.0, channels=channels),
                       asset("ir"))
        self.OUTPUTS = (stream("output", channels=channels),)

    @classmethod
    def with_ir(cls, ir, channels: int = 1) -> "Convolver":
        """Mono IR baked in at construction, broadcast to every channel
        (reference convolution/mod.rs:494-499)."""
        return cls(ir=ir, channels=channels)

    # ------------------------------------------------------------------ #
    def init_state(self, sr: SampleRate):
        cap, C = self.capacity, self.channels
        ir = np.zeros((cap, C), np.float32)
        if self._initial_ir is not None:
            ir[:len(self._initial_ir), :] = \
                self._initial_ir[:, None]
        fade_len = max(int(round(CROSSFADE_SECONDS * sr.hz)), 1)
        return {
            "past": jnp.zeros((cap, C), jnp.float32),  # chronological
            "ir_cur": jnp.asarray(ir),
            "ir_old": jnp.zeros((cap, C), jnp.float32),
            "fade_pos": jnp.int32(fade_len),  # >= fade_len: not fading
        }

    def _fade_len(self, sr: SampleRate) -> int:
        return max(int(round(CROSSFADE_SECONDS * sr.hz)), 1)

    # ------------------------------------------------------------------ #
    def asset_consume(self, state, a: AudioAsset, sr: SampleRate):
        """Live IR swap: fade from the outgoing engine to the new one
        (reference process(), convolution/mod.rs:534-573).  Channel
        mapping per MultiConvolverEngine::from_asset (:323-351)."""
        cap, C = self.capacity, self.channels
        ir = np.zeros((cap, C), np.float32)
        src_ch = a.channels
        if C == 1 and src_ch > 1:
            mono = a.to_mono()
            ir[:min(len(mono), cap), 0] = mono[:cap]
        else:
            for c in range(C):
                sc = 0 if src_ch == 1 else min(c, src_ch - 1)
                data = a.channel(sc)
                ir[:min(len(data), cap), c] = data[:cap]
        return {**state,
                "ir_old": state["ir_cur"],
                "ir_cur": jnp.asarray(ir),
                "fade_pos": jnp.int32(0)}

    # ------------------------------------------------------------------ #
    def _squeeze(self, v):
        return v[..., 0] if self.channels == 1 else v

    def _expand(self, v):
        return v[..., None] if self.channels == 1 else v

    def tick(self, state, ins, sr):
        x = self._expand(jnp.asarray(ins["input"]))  # [C]
        past = jnp.concatenate([state["past"][1:], x[None]], axis=0)
        rev = past[::-1]  # rev[k] = x[t-k]
        y_new = jnp.sum(rev * state["ir_cur"], axis=0)
        fade_len = self._fade_len(sr)
        fading = state["fade_pos"] < fade_len
        y_old = jnp.sum(rev * state["ir_old"], axis=0)
        g = state["fade_pos"].astype(jnp.float32) / fade_len
        gain_new = jnp.sin(g * (math.pi / 2.0))
        gain_old = jnp.cos(g * (math.pi / 2.0))
        out = jnp.where(fading, y_new * gain_new + y_old * gain_old,
                        y_new)
        fade_pos = jnp.where(fading, state["fade_pos"] + 1,
                             state["fade_pos"])
        return ({**state, "past": past, "fade_pos": fade_pos},
                {"output": self._squeeze(out)})

    def process_block(self, state, ins, events, sr, block_len):
        B = block_len
        cap = self.capacity
        x = self._expand(jnp.asarray(ins["input"]))  # [B, C]
        window = jnp.concatenate([state["past"], x], axis=0)  # [cap+B, C]
        L = _next_pow2(cap + B)
        S = jnp.fft.rfft(window, n=L, axis=0)

        def conv_with(ir):
            H = jnp.fft.rfft(ir, n=L, axis=0)
            y = jnp.fft.irfft(S * H, n=L, axis=0)
            return jax.lax.slice_in_dim(y, cap, cap + B, axis=0) \
                .astype(jnp.float32)

        y_new = conv_with(state["ir_cur"])
        fade_len = self._fade_len(sr)
        y_old = conv_with(state["ir_old"])
        pos = state["fade_pos"] + jnp.arange(B, dtype=jnp.int32)
        g = jnp.clip(pos.astype(jnp.float32) / fade_len, 0.0, 1.0)[:, None]
        out = y_new * jnp.sin(g * (math.pi / 2.0)) \
            + y_old * jnp.cos(g * (math.pi / 2.0))
        fade_pos = jnp.minimum(state["fade_pos"] + B, fade_len)
        return ({**state, "past": window[-cap:],
                 "fade_pos": jnp.int32(fade_pos)},
                {"output": self._squeeze(out)})

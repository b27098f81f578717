"""Zero-latency impulse-response convolver with live IR hot-swap.

Counterpart of the reference Convolver
(/root/reference/oscen-lib/src/convolution/mod.rs:453-574): sample-exact
full convolution with no latency, per-channel engines (L→L, R→R, no cross
terms), and a 20 ms equal-power crossfade on live IR swaps with at most two
engines alive.

The reference needs the 3-tier Gardner decomposition because it streams per
sample; here the block path is a **uniform-partition frequency-domain
delay line at the graph block size** (ops/conv.py::BlockConvolver):
per block one 2B-point rFFT of the sliding input window, a spectral MAC
against precomputed IR partition spectra carried in state, one irFFT —
sample-exact with zero latency (the same invariant the Gardner stack sums
to, convolution/mod.rs:10-17).  One input FFT serves both engines during a
crossfade, and once the fade has finished the old-IR branch is skipped
entirely (``lax.cond``), so steady-state cost is a single spectral MAC.

Engines are sized from the published IR (reference
convolution/mod.rs:257-306 builds engines from the IR at prepare time):
over-capacity swaps *grow* the partition count to the next power of two —
a one-time retrace per capacity class — instead of truncating.  Swaps
within capacity are pure functional state replacement (no retrace).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import AudioAsset
from ..core.types import SampleRate, asset, stream
from ..graph.node import Node
from ..ops.conv import BlockConvolver

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
    def _initial_ir_buffer(self, cap: int) -> np.ndarray:
        ir = np.zeros((cap, self.channels), np.float32)
        if self._initial_ir is not None:
            ir[:len(self._initial_ir), :] = self._initial_ir[:, None]
        return ir

    def init_state(self, sr: SampleRate):
        cap, C = self.capacity, self.channels
        fade_len = self._fade_len(sr)
        return {
            "past": jnp.zeros((cap, C), jnp.float32),  # chronological
            "ir_cur": jnp.asarray(self._initial_ir_buffer(cap)),
            "ir_old": jnp.zeros((cap, C), jnp.float32),
            "fade_pos": jnp.int32(fade_len),  # >= fade_len: not fading
        }

    def _engine(self, block_len: int, cap: int) -> BlockConvolver:
        return BlockConvolver(block_len, cap)

    def init_block_state(self, sr: SampleRate, block_len: int):
        """FDL extension of the state (block mode only): input-spectrum
        delay line + precomputed IR partition spectra.  Overrides the
        time-domain buffers to the engine's partition-aligned capacity:
        ``past`` keeps (P+1)·B samples so the FDL can be rebuilt exactly
        after a ragged (non-B) block."""
        eng = self._engine(block_len, self.capacity)
        C = self.channels
        cap = eng.partitions * eng.block
        ir = self._initial_ir_buffer(cap)
        h_cur = jnp.asarray(eng.ir_spectra(ir))
        return {
            "past": jnp.zeros((cap + eng.block, C), jnp.float32),
            "ir_cur": jnp.asarray(ir),
            "ir_old": jnp.zeros((cap, C), jnp.float32),
            "fdl": jnp.zeros((eng.partitions, eng.nbins, C),
                             jnp.complex64),
            "h_cur": h_cur,
            "h_old": jnp.zeros_like(h_cur),
        }

    def _fade_len(self, sr: SampleRate) -> int:
        return max(int(round(CROSSFADE_SECONDS * sr.hz)), 1)

    # ------------------------------------------------------------------ #
    def asset_consume(self, state, a: AudioAsset, sr: SampleRate):
        """Live IR swap: fade from the outgoing engine to the new one
        (reference process(), convolution/mod.rs:534-573).  Channel
        mapping per MultiConvolverEngine::from_asset (:323-351).  IRs
        longer than the current capacity grow the engine (pow2 capacity
        classes) — never truncate."""
        C = self.channels
        ir_len = max(len(a.channel(0)), 1)
        B = None
        if "fdl" in state:
            B = int(state["fdl"].shape[1]) - 1  # nbins = B + 1
            P = int(state["fdl"].shape[0])
            cap = P * B
            if ir_len > cap:
                P = _next_pow2(-(-ir_len // B))
                cap = P * B
        else:
            cap = int(state["past"].shape[0])
            if ir_len > cap:
                cap = _next_pow2(ir_len)

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

        # past keeps cap samples (sample mode) / cap+B samples (block mode)
        past_len = cap if B is None else cap + B
        old_past_len = int(state["past"].shape[0])
        old_cap = int(state["ir_cur"].shape[0])
        past = state["past"]
        if past_len > old_past_len:
            # history is chronological (past[-1] = newest): pad oldest end
            past = jnp.concatenate(
                [jnp.zeros((past_len - old_past_len, C), jnp.float32),
                 past], axis=0)
        if cap > old_cap:
            ir_old = jnp.concatenate(
                [state["ir_cur"],
                 jnp.zeros((cap - old_cap, C), jnp.float32)], axis=0)
        else:
            ir_old = state["ir_cur"]

        new = {**state,
               "past": past,
               "ir_old": ir_old,
               "ir_cur": jnp.asarray(ir),
               "fade_pos": jnp.int32(0)}
        if "fdl" in state:
            eng = self._engine(B, cap)
            new["h_cur"] = jnp.asarray(eng.ir_spectra(ir))
            new["h_old"] = jnp.asarray(eng.ir_spectra(np.asarray(ir_old)))
            fdl = state["fdl"]
            if eng.partitions > fdl.shape[0]:
                fdl = jnp.concatenate(
                    [fdl, jnp.zeros((eng.partitions - fdl.shape[0],
                                     eng.nbins, C), jnp.complex64)],
                    axis=0)
            new["fdl"] = fdl
        return new

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
        n = block_len
        P = int(state["fdl"].shape[0])
        Bf = int(state["fdl"].shape[1]) - 1  # FDL partition block size
        cap = P * Bf
        past_len = int(state["past"].shape[0])  # == cap + Bf
        x = self._expand(jnp.asarray(ins["input"]))  # [n, C]
        eng = self._engine(Bf, cap)
        fade_len = self._fade_len(sr)
        past = jnp.concatenate([state["past"], x], axis=0)[-past_len:]

        if n == Bf:
            # steady path: roll the FDL, one input FFT serves both engines
            fdl_state = {"fdl": state["fdl"],
                         "prev": state["past"][-Bf:]}
            fdl_state, fdl = eng.spectral_mac(fdl_state, x)
            y_new = eng.apply(fdl, state["h_cur"])
            new_fdl = fdl_state["fdl"]

            def fading(_):
                y_old = eng.apply(fdl, state["h_old"])
                pos = state["fade_pos"] + jnp.arange(n, dtype=jnp.int32)
                g = jnp.clip(pos.astype(jnp.float32) / fade_len,
                             0.0, 1.0)[:, None]
                return (y_new * jnp.sin(g * (math.pi / 2.0))
                        + y_old * jnp.cos(g * (math.pi / 2.0)))

            out = jax.lax.cond(state["fade_pos"] < fade_len, fading,
                               lambda _: y_new, operand=None)
        else:
            # ragged block (offline-render tail): exact direct conv over
            # the time-domain window, then rebuild the FDL from history so
            # subsequent full blocks stay aligned.
            window = jnp.concatenate([state["past"][-cap:], x], axis=0)
            L = _next_pow2(cap + n)
            S = jnp.fft.rfft(window, n=L, axis=0)

            def conv_with(ir):
                H = jnp.fft.rfft(ir, n=L, axis=0)
                y = jnp.fft.irfft(S * H, n=L, axis=0)
                return jax.lax.slice_in_dim(y, cap, cap + n, axis=0) \
                    .astype(jnp.float32)

            y_new = conv_with(state["ir_cur"])
            y_old = conv_with(state["ir_old"])
            pos = state["fade_pos"] + jnp.arange(n, dtype=jnp.int32)
            g = jnp.clip(pos.astype(jnp.float32) / fade_len,
                         0.0, 1.0)[:, None]
            out = y_new * jnp.sin(g * (math.pi / 2.0)) \
                + y_old * jnp.cos(g * (math.pi / 2.0))
            # rebuild: fdl[p] = rfft of the (p+1)-to-p trailing B-blocks
            blocks = jnp.reshape(past, (P + 1, Bf) + past.shape[1:])
            wins = jnp.concatenate([blocks[:-1], blocks[1:]], axis=1)
            spectra = jnp.fft.rfft(wins, axis=1).astype(jnp.complex64)
            new_fdl = spectra[::-1]

        fade_pos = jnp.minimum(state["fade_pos"] + n, fade_len)
        return ({**state, "past": past, "fdl": new_fdl,
                 "fade_pos": jnp.int32(fade_pos)},
                {"output": self._squeeze(out)})

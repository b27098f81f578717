"""Stateless / near-stateless utility nodes.

Counterparts of the reference's small nodes: Gain (gain/mod.rs), Value
(value.rs), AudioInput (graph/audio_input.rs), plus the example-local
HardClip (examples/oversampled-saturator/src/main.rs:31-62), Mixer,
Crossfade, AddValue (examples/fm-synth/src/nodes/), Tremolo
(examples/electric-piano/src/tremolo.rs) and FmOperator
(examples/fm-synth/src/nodes/fm_operator.rs).

Stateless nodes vectorize trivially over the block (the default scan is
bypassed by a direct broadcast implementation).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core.types import SampleRate, stream, value
from ..graph.node import Node
from ..ops.scan import exact_wrapped_phase

TAU = 2.0 * math.pi


class _StatelessNode(Node):
    """Nodes whose tick is a pure function of inputs: the block impl simply
    applies the tick math to whole ``[B]`` arrays."""

    def init_state(self, sr: SampleRate):
        return {}

    def process_block(self, state, ins, events, sr, block_len):
        return self.tick(state, ins, sr)


class Gain(_StatelessNode):
    """``out = in * gain`` (reference gain/mod.rs)."""

    INPUTS = (stream("input", 0.0), stream("gain", 1.0))
    OUTPUTS = (stream("output"),)

    def __init__(self, initial_gain: float = 1.0):
        self.INPUTS = (stream("input", 0.0), stream("gain", float(initial_gain)))

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"] * ins["gain"]}


class Vca(_StatelessNode):
    """Voltage-controlled amplifier: ``out = in * control`` (stream ×
    stream), used to apply envelope modulation to audio signals
    (reference examples/pivot/src/vca.rs:31-36)."""

    INPUTS = (stream("input", 0.0), stream("control", 1.0))
    OUTPUTS = (stream("output"),)

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"] * ins["control"]}


class Value(_StatelessNode):
    """Pass-through parameter holder (reference value.rs)."""

    INPUTS = (value("input", 0.0),)
    OUTPUTS = (value("output"),)

    def __init__(self, initial_value: float = 0.0):
        self.INPUTS = (value("input", float(initial_value)),)

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"]}


class AudioInput(_StatelessNode):
    """value→stream bridge (reference graph/audio_input.rs)."""

    INPUTS = (value("input_value", 0.0),)
    OUTPUTS = (stream("output"),)

    def tick(self, state, ins, sr):
        return state, {"output": ins["input_value"]}


class HardClip(_StatelessNode):
    """Drive-then-clip nonlinearity (reference oversampled-saturator
    main.rs:31-62): ``out = clamp(in * 1.5, -0.7, 0.7)``."""

    INPUTS = (stream("input", 0.0),)
    OUTPUTS = (stream("output"),)

    def tick(self, state, ins, sr):
        return state, {"output": jnp.clip(ins["input"] * 1.5, -0.7, 0.7)}


class Mixer(_StatelessNode):
    """Two-input adder (reference fm-synth nodes/mixer.rs)."""

    INPUTS = (stream("input_a", 0.0), stream("input_b", 0.0))
    OUTPUTS = (stream("output"),)

    def tick(self, state, ins, sr):
        return state, {"output": ins["input_a"] + ins["input_b"]}


class Crossfade(_StatelessNode):
    """Splits input between two outputs by ``mix`` (fm-synth
    nodes/crossfade.rs): a=in*(1-mix), b=in*mix."""

    INPUTS = (stream("input", 0.0), value("mix", 0.0))
    OUTPUTS = (stream("output_a"), stream("output_b"))

    def tick(self, state, ins, sr):
        mix = jnp.clip(ins["mix"], 0.0, 1.0)
        return state, {"output_a": ins["input"] * (1.0 - mix),
                       "output_b": ins["input"] * mix}


class AddValue(_StatelessNode):
    """``out = in + value`` (fm-synth nodes/add_value.rs)."""

    INPUTS = (stream("input", 0.0), value("value", 0.0))
    OUTPUTS = (stream("output"),)

    def __init__(self, v: float = 0.0):
        self.INPUTS = (stream("input", 0.0), value("value", float(v)))

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"] + ins["value"]}


class Tremolo(Node):
    """Mono→stereo constant-power pan LFO (reference
    examples/electric-piano/src/tremolo.rs:8-60)."""

    INPUTS = (stream("input", 0.0), value("rate", 5.0), value("depth", 0.5))
    OUTPUTS = (stream("output", channels=2),)

    def init_state(self, sr: SampleRate):
        return {"phase": jnp.float32(0.0)}

    @staticmethod
    def _pan(x, phase, depth):
        lfo = jnp.sin(phase * TAU)
        pan = 0.5 + lfo * (depth / 3.0)
        return jnp.stack([x * pan, x * (1.0 - pan)], axis=-1)

    def tick(self, state, ins, sr):
        out = self._pan(ins["input"], state["phase"], ins["depth"])
        phase = state["phase"] + ins["rate"] / sr.hz
        phase = phase - jnp.trunc(phase)  # Rust .fract()
        return {"phase": phase}, {"output": out}

    def process_block(self, state, ins, events, sr, block_len):
        dt = ins["rate"] / sr.hz
        before, carry = exact_wrapped_phase(state["phase"], dt)
        out = self._pan(ins["input"], before, ins["depth"])
        return {"phase": carry}, {"output": out}


class FmOperator(Node):
    """Sine operator with phase modulation and self-feedback (reference
    examples/fm-synth/src/nodes/fm_operator.rs).

    The self-feedback term (``prev_output * feedback``) is a one-sample
    nonlinear recurrence; the block path uses the default per-sample scan
    (a fused Pallas kernel is the fast path for voice-parallel synths).
    """

    INPUTS = (value("base_freq", 440.0), value("ratio", 1.0),
              stream("phase_mod", 0.0), value("feedback", 0.0),
              stream("envelope", 1.0), value("level", 1.0))
    OUTPUTS = (stream("output"),)

    def init_state(self, sr: SampleRate):
        return {"phase": jnp.float32(0.0), "prev_output": jnp.float32(0.0)}

    def tick(self, state, ins, sr):
        frequency = ins["base_freq"] * ins["ratio"]
        feedback_mod = state["prev_output"] * ins["feedback"]
        total_pm = ins["phase_mod"] + feedback_mod
        phase_rad = (state["phase"] + total_pm) * TAU
        out = jnp.sin(phase_rad) * ins["envelope"] * ins["level"]
        phase = state["phase"] + frequency / sr.hz
        phase = phase - jnp.trunc(phase)  # Rust .fract()
        return ({"phase": phase, "prev_output": out}, {"output": out})

    def process_block_batched(self, state, ins, events, sr, block_len):
        """All voices through the exact-op-order Pallas kernel
        (ops/pallas/fm.py); the default path is a per-voice 512-step
        while-loop."""
        import jax
        if jax.default_backend() != "tpu":
            return None
        from ..ops.pallas.fm import fm_operator_scan

        dt = ins["base_freq"] * ins["ratio"] / sr.hz  # [C, B]
        tbv = lambda v: jnp.moveaxis(v, 0, 1)  # [C, B] -> [B, C]
        y, phase, prev = fm_operator_scan(
            state["phase"], state["prev_output"], tbv(dt),
            tbv(ins["phase_mod"]), tbv(ins["feedback"]),
            tbv(ins["envelope"]), tbv(ins["level"]))
        return ({"phase": phase, "prev_output": prev},
                {"output": jnp.moveaxis(y, 0, 1)})

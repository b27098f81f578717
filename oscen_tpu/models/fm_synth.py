"""FM synth voice — multi-operator FM with ADSR envelopes and routing.

Rebuild of the reference example's FMVoice graph
(/root/reference/examples/fm-synth/src/fm_voice.rs:6-157): three FmOperators
(OP3 → OP2 → OP1 carrier, with a crossfaded OP3→OP1 route), per-operator
ADSR envelopes, filter envelope with cutoff modulation, TPT filter, output
gain.  ``build_fm_synth`` wraps N voices behind MIDI + voice allocation.
"""

from __future__ import annotations

from ..graph.builder import Graph
from ..nodes.basic import AddValue, Crossfade, FmOperator, Gain, Mixer
from ..nodes.envelope import AdsrEnvelope
from ..nodes.filters import TptFilter
from ..nodes.midi import MidiParser, MidiVoiceHandler
from ..nodes.voice_allocator import VoiceAllocator

OP_DEFAULTS = {
    "op3": dict(ratio=3.0, level=0.5, feedback=0.0, attack=0.01,
                decay=0.1, sustain=0.7, release=0.3),
    "op2": dict(ratio=2.0, level=0.5, feedback=0.0, attack=0.01,
                decay=0.1, sustain=0.7, release=0.3),
    "op1": dict(ratio=1.0, attack=0.01, decay=0.2, sustain=0.8,
                release=0.5),
}


def build_fm_voice() -> Graph:
    g = Graph("FMVoice")
    g.input("frequency", "value", default=440.0)
    g.input("gate", "event")
    for op, d in OP_DEFAULTS.items():
        for k, v in d.items():
            g.input(f"{op}_{k}", "value", default=v)
    g.input("route", "value", default=0.0)
    g.input("filter_cutoff", "value", default=2000.0)
    g.input("filter_resonance", "value", default=0.707)
    for k, v in dict(attack=0.01, decay=0.2, sustain=0.5,
                     release=0.3).items():
        g.input(f"filter_{k}", "value", default=v)
    g.input("filter_env_amount", "value", default=0.0)
    g.output("audio_out", "stream")

    env3 = g.add("env3", AdsrEnvelope(0.01, 0.1, 0.7, 0.3))
    env2 = g.add("env2", AdsrEnvelope(0.01, 0.1, 0.7, 0.3))
    env1 = g.add("env1", AdsrEnvelope(0.01, 0.2, 0.8, 0.5))
    env_f = g.add("env_filter", AdsrEnvelope(0.01, 0.2, 0.5, 0.3))
    f_gain = g.add("filter_env_gain", Gain(0.0))
    cutoff_mod = g.add("cutoff_mod", AddValue(2000.0))
    op3 = g.add("op3_osc", FmOperator())
    op2 = g.add("op2_osc", FmOperator())
    op1 = g.add("op1_osc", FmOperator())
    route = g.add("op3_route", Crossfade())
    mix1 = g.add("op1_mod_mixer", Mixer())
    filt = g.add("filter", TptFilter(2000.0, 0.707))
    out_g = g.add("output_gain", Gain(0.3))

    # gate to all envelopes; per-operator envelope parameters
    for env in (env3, env2, env1):
        g.connect("gate", env.gate)
    g.connect("gate", env_f.gate)
    for env_name, op in (("env3", "op3"), ("env2", "op2"), ("env1", "op1")):
        for k in ("attack", "decay", "sustain", "release"):
            g.connect(f"{op}_{k}", f"{env_name}.{k}")
    for k in ("attack", "decay", "sustain", "release"):
        g.connect(f"filter_{k}", f"env_filter.{k}")

    # filter envelope modulation: env -> gain(amount) -> add(cutoff)
    g.connect(env_f.output, f_gain.input)
    g.connect("filter_env_amount", f_gain.gain)
    g.connect(f_gain.output, cutoff_mod.input)
    g.connect("filter_cutoff", cutoff_mod.value)
    g.connect(cutoff_mod.output, filt.cutoff)

    # OP3 (top modulator)
    g.connect("frequency", op3.base_freq)
    g.connect("op3_ratio", op3.ratio)
    g.connect("op3_feedback", op3.feedback)
    g.connect(env3.output, op3.envelope)
    g.connect("op3_level", op3.level)

    # route crossfade: OP3 -> OP2 (a) or OP1 (b)
    g.connect(op3.output, route.input)
    g.connect("route", route.mix)
    g.connect(route.output_a, op2.phase_mod)

    # OP2 (middle modulator)
    g.connect("frequency", op2.base_freq)
    g.connect("op2_ratio", op2.ratio)
    g.connect("op2_feedback", op2.feedback)
    g.connect(env2.output, op2.envelope)
    g.connect("op2_level", op2.level)

    # mix OP2 + routed OP3 into OP1's phase mod
    g.connect(op2.output, mix1.input_a)
    g.connect(route.output_b, mix1.input_b)
    g.connect(mix1.output, op1.phase_mod)

    # OP1 (carrier)
    g.connect("frequency", op1.base_freq)
    g.connect("op1_ratio", op1.ratio)
    g.connect(env1.output, op1.envelope)
    g.connect(op1.output, filt.input)

    g.connect("filter_resonance", filt.q)
    g.connect(filt.output, out_g.input)
    g.connect(out_g.output, "audio_out")
    return g


def build_fm_synth(num_voices: int = 8) -> Graph:
    """Polyphonic FM synth: MIDI → allocator → N FMVoice subgraphs →
    fan-in mix (the reference app runs 8 voices)."""
    g = Graph(f"FMSynth{num_voices}")
    g.input("midi_in", "event")
    g.input("route", "value", default=0.0)
    g.input("filter_cutoff", "value", default=2000.0)
    g.output("audio_out", "stream")

    parser = g.add("parser", MidiParser())
    alloc = g.add("alloc", VoiceAllocator(num_voices))
    handlers = g.add("handlers", MidiVoiceHandler(), count=num_voices)
    voices = g.add("voices", build_fm_voice(), count=num_voices)

    g.connect("midi_in", parser.midi_in)
    g.connect(parser.note_on, alloc.note_on)
    g.connect(parser.note_off, alloc.note_off)
    g.connect(alloc.voices, handlers.note_on)
    g.connect(alloc.voices, handlers.note_off)
    g.connect(handlers.frequency, voices.frequency)
    g.connect(handlers.gate, voices.gate)
    g.connect("route", voices.route)
    g.connect("filter_cutoff", voices.filter_cutoff)
    g.connect(voices.audio_out, "audio_out")
    return g

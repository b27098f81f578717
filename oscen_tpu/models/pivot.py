"""Pivot — the reference's flagship 8-voice FM synth app.

Rebuild of /root/reference/examples/pivot/: a 3-operator FM voice with a
routing crossfade (`pivot_voice.rs:1-174`), wrapped in MIDI + LRU voice
allocation (`main.rs:59-168`).

Structurally the pivot voice differs from the fm-synth voice
(`examples/fm-synth/src/fm_voice.rs`) in where envelopes apply: pivot's
FmOperator (`examples/pivot/src/fm_operator.rs:48-69`) has no
envelope/level inputs — the raw sine feeds the operator's own
self-feedback, and envelope × level are applied *outside* through Vca
(stream × stream, `vca.rs:31-36`) and Gain nodes before the routing
crossfade.  This changes both the feedback timbre and the modulation
depth curve, so it is modeled as its own graph, not a parameterization of
FMVoice.

Signal flow per voice (pivot_voice.rs:94-173):

    op3 ──▶ vca(env3) ──▶ gain(op3_level) ──▶ crossfade(route)
                                              │ a → op2.phase_mod
                                              │ b ─┐
    op2 ──▶ vca(env2) ──▶ gain(op2_level) ────────┼─▶ mixer ─▶ op1.phase_mod
                                                  ┘
    op1 ──▶ vca(env1) ──▶ TptFilter(cutoff + env_filter·amount) ─▶ gain(0.3)
"""

from __future__ import annotations

from ..graph.builder import Graph
from ..nodes.basic import AddValue, Crossfade, FmOperator, Gain, Mixer, Vca
from ..nodes.envelope import AdsrEnvelope
from ..nodes.filters import TptFilter
from ..nodes.midi import MidiParser, MidiVoiceHandler
from ..nodes.voice_allocator import VoiceAllocator

# pivot_voice.rs:14-52 input defaults
OP_DEFAULTS = {
    "op3": dict(ratio=3.0, level=0.5, feedback=0.0, attack=0.01,
                decay=0.1, sustain=0.7, release=0.3),
    "op2": dict(ratio=2.0, level=0.5, feedback=0.0, attack=0.01,
                decay=0.1, sustain=0.7, release=0.3),
    "op1": dict(ratio=1.0, attack=0.01, decay=0.2, sustain=0.8,
                release=0.5),
}
FILTER_DEFAULTS = dict(attack=0.01, decay=0.2, sustain=0.5, release=0.3)


def build_pivot_voice() -> Graph:
    """One PivotVoice graph (pivot_voice.rs:10-174)."""
    g = Graph("PivotVoice")
    g.input("frequency", "value", default=440.0)
    g.input("gate", "event")
    for op, d in OP_DEFAULTS.items():
        for k, v in d.items():
            g.input(f"{op}_{k}", "value", default=v)
    g.input("route", "value", default=0.0)
    g.input("cutoff", "value", default=2000.0)
    g.input("resonance", "value", default=0.707)
    for k, v in FILTER_DEFAULTS.items():
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

    # envelope VCAs (stream x stream) + level gains — pivot_voice.rs:72-79
    vca3 = g.add("op3_env_vca", Vca())
    vca2 = g.add("op2_env_vca", Vca())
    vca1 = g.add("op1_env_vca", Vca())
    lvl3 = g.add("op3_level_gain", Gain(0.5))
    lvl2 = g.add("op2_level_gain", Gain(0.5))

    route = g.add("op3_route", Crossfade())
    mix1 = g.add("op1_mod_mixer", Mixer())
    filt = g.add("filter", TptFilter(2000.0, 0.707))
    out_g = g.add("output_gain", Gain(0.3))

    # gate to all envelopes (:96-99); per-stage envelope params (:102-123)
    for env in (env3, env2, env1):
        g.connect("gate", env.gate)
    g.connect("gate", env_f.gate)
    for env_name, op in (("env3", "op3"), ("env2", "op2"), ("env1", "op1")):
        for k in ("attack", "decay", "sustain", "release"):
            g.connect(f"{op}_{k}", f"{env_name}.{k}")
    for k in ("attack", "decay", "sustain", "release"):
        g.connect(f"filter_{k}", f"env_filter.{k}")

    # filter env modulation: env -> gain(amount) -> add(cutoff) (:126-130)
    g.connect(env_f.output, f_gain.input)
    g.connect("filter_env_amount", f_gain.gain)
    g.connect(f_gain.output, cutoff_mod.input)
    g.connect("cutoff", cutoff_mod.value)
    g.connect(cutoff_mod.output, filt.cutoff)

    # OP3: osc -> env_vca -> level_gain -> crossfade (:132-139)
    g.connect("frequency", op3.base_freq)
    g.connect("op3_ratio", op3.ratio)
    g.connect("op3_feedback", op3.feedback)
    g.connect(op3.output, vca3.input)
    g.connect(env3.output, vca3.control)
    g.connect(vca3.output, lvl3.input)
    g.connect("op3_level", lvl3.gain)

    # route crossfade (:141-144)
    g.connect(lvl3.output, route.input)
    g.connect("route", route.mix)
    g.connect(route.output_a, op2.phase_mod)

    # OP2 (:146-153)
    g.connect("frequency", op2.base_freq)
    g.connect("op2_ratio", op2.ratio)
    g.connect("op2_feedback", op2.feedback)
    g.connect(op2.output, vca2.input)
    g.connect(env2.output, vca2.control)
    g.connect(vca2.output, lvl2.input)
    g.connect("op2_level", lvl2.gain)

    # OP1 phase-mod mix (:155-158)
    g.connect(lvl2.output, mix1.input_a)
    g.connect(route.output_b, mix1.input_b)
    g.connect(mix1.output, op1.phase_mod)

    # OP1 carrier -> vca -> filter (:160-165)
    g.connect("frequency", op1.base_freq)
    g.connect("op1_ratio", op1.ratio)
    g.connect(op1.output, vca1.input)
    g.connect(env1.output, vca1.control)
    g.connect(vca1.output, filt.input)

    g.connect("resonance", filt.q)
    g.connect(filt.output, out_g.input)
    g.connect(out_g.output, "audio_out")
    return g


def build_pivot(num_voices: int = 8) -> Graph:
    """The PivotGraph app: MIDI -> allocator -> 8 PivotVoices -> fan-in
    (main.rs:59-168; the reference runs 8 voices)."""
    g = Graph(f"Pivot{num_voices}")
    g.input("midi_in", "event")
    for op, d in OP_DEFAULTS.items():
        for k, v in d.items():
            g.input(f"{op}_{k}", "value", default=v)
    g.input("route", "value", default=0.0)
    g.input("cutoff", "value", default=2000.0)
    g.input("resonance", "value", default=0.707)
    for k, v in FILTER_DEFAULTS.items():
        g.input(f"filter_{k}", "value", default=v)
    g.input("filter_env_amount", "value", default=0.0)
    g.output("audio_out", "stream")

    parser = g.add("parser", MidiParser())
    alloc = g.add("alloc", VoiceAllocator(num_voices))
    handlers = g.add("handlers", MidiVoiceHandler(), count=num_voices)
    voices = g.add("voices", build_pivot_voice(), count=num_voices)

    g.connect("midi_in", parser.midi_in)
    g.connect(parser.note_on, alloc.note_on)
    g.connect(parser.note_off, alloc.note_off)
    g.connect(alloc.voices, handlers.note_on)
    g.connect(alloc.voices, handlers.note_off)
    g.connect(handlers.frequency, voices.frequency)
    g.connect(handlers.gate, voices.gate)
    # broadcast every UI parameter to all voices (main.rs:128-163)
    for op, d in OP_DEFAULTS.items():
        for k in d:
            g.connect(f"{op}_{k}", f"voices.{op}_{k}")
    for name in ("route", "cutoff", "resonance", "filter_env_amount"):
        g.connect(name, f"voices.{name}")
    for k in FILTER_DEFAULTS:
        g.connect(f"filter_{k}", f"voices.filter_{k}")
    g.connect(voices.audio_out, "audio_out")
    return g

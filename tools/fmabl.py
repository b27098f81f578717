"""Ablation: where do the fm_synth model's us/block go at bench config?

Variants (256 voices, B from FMABL_B env default 4096, interleaved):
  full    : build_fm_synth bench config — AdsrBank + chain + f_gain +
            cutoff_mod + TPT + out gain
  nomod   : minus the filter-env cutoff modulation (cutoff straight to
            TPT) — prices f_gain + cutoff_mod + the [C,B] cutoff plane
  nofilt  : chain + AdsrBank only (chain output -> audio_out)
  noenv   : chain fed constant 1.0 streams (Value nodes) instead of the
            AdsrBank — prices the AdsrBank kernel + its glue
"""
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variant(which, num_voices):
    from oscen_tpu.graph.builder import Graph
    from oscen_tpu.nodes.basic import AddValue, Gain, Value
    from oscen_tpu.nodes.envelope import AdsrBank
    from oscen_tpu.nodes.filters import TptFilter
    from oscen_tpu.nodes.midi import MidiParser, MidiVoiceHandler
    from oscen_tpu.nodes.voice_allocator import VoiceAllocator
    from oscen_tpu.models.fm_synth import OP_DEFAULTS, FmOperatorChain

    v = Graph("FV")
    v.input("frequency", "value", default=440.0)
    v.input("gate", "event")
    for op, d in OP_DEFAULTS.items():
        for k, val in d.items():
            v.input(f"{op}_{k}", "value", default=val)
    v.input("route", "value", default=0.0)
    v.input("cutoff", "value", default=2000.0)
    v.input("resonance", "value", default=0.707)
    for k, val in dict(attack=0.01, decay=0.2, sustain=0.5,
                       release=0.3).items():
        v.input(f"filter_{k}", "value", default=val)
    v.input("filter_env_amount", "value", default=0.0)
    v.output("audio_out", "stream")

    chain = v.add("ops", FmOperatorChain())
    if which == "noenv":
        const = v.add("env_const", Value(1.0))
        for e in ("env3", "env2", "env1"):
            v.connect(const.output, f"ops.{e}")
    else:
        envs = v.add("envs", AdsrBank([
            ("op3", 0.01, 0.1, 0.7, 0.3),
            ("op2", 0.01, 0.1, 0.7, 0.3),
            ("op1", 0.01, 0.2, 0.8, 0.5),
            ("filt", 0.01, 0.2, 0.5, 0.3),
        ]))
        v.connect("gate", envs.gate)
        for op in ("op3", "op2", "op1"):
            for k in ("attack", "decay", "sustain", "release"):
                v.connect(f"{op}_{k}", f"envs.{op}_{k}")
        for k in ("attack", "decay", "sustain", "release"):
            v.connect(f"filter_{k}", f"envs.filt_{k}")
        v.connect(envs.op3, chain.env3)
        v.connect(envs.op2, chain.env2)
        v.connect(envs.op1, chain.env1)

    v.connect("frequency", chain.base_freq)
    for i in (3, 2):
        v.connect(f"op{i}_ratio", f"ops.op{i}_ratio")
        v.connect(f"op{i}_level", f"ops.op{i}_level")
        v.connect(f"op{i}_feedback", f"ops.op{i}_feedback")
    v.connect("op1_ratio", chain.op1_ratio)
    v.connect("route", chain.route)

    if which == "nofilt":
        v.connect(chain.output, "audio_out")
    else:
        filt = v.add("filter", TptFilter(2000.0, 0.707))
        out_g = v.add("output_gain", Gain(0.3))
        if which in ("full",):
            f_gain = v.add("filter_env_gain", Gain(0.0))
            cutoff_mod = v.add("cutoff_mod", AddValue(2000.0))
            v.connect(envs.filt, f_gain.input)
            v.connect("filter_env_amount", f_gain.gain)
            v.connect(f_gain.output, cutoff_mod.input)
            v.connect("cutoff", cutoff_mod.value)
            v.connect(cutoff_mod.output, filt.cutoff)
        else:  # nomod / noenv
            v.connect("cutoff", filt.cutoff)
        v.connect("resonance", filt.q)
        v.connect(chain.output, filt.input)
        v.connect(filt.output, out_g.input)
        v.connect(out_g.output, "audio_out")

    g = Graph("FmAbl")
    g.input("midi_in", "event")
    g.output("out", "stream")
    parser = g.add("midi_parser", MidiParser())
    alloc = g.add("voice_allocator", VoiceAllocator(num_voices))
    handlers = g.add("voice_handlers", MidiVoiceHandler(), count=num_voices)
    voices = g.add("voices", v, count=num_voices)
    g.connect("midi_in", parser.midi_in)
    g.connect(parser.note_on, alloc.note_on)
    g.connect(parser.note_off, alloc.note_off)
    g.connect(alloc.voices, handlers.note_on)
    g.connect(alloc.voices, handlers.note_off)
    g.connect(handlers.frequency, voices.frequency)
    g.connect(handlers.gate, voices.gate)
    g.connect(voices.audio_out, "out")
    return g


def main():
    import jax
    from oscen_tpu import raw_midi_event

    V = int(os.environ.get("FMABL_V", "256"))
    B = int(os.environ.get("FMABL_B", "4096"))
    n_small, n_large = 32, 256
    synths = {}
    for which in ("full", "nomod", "nofilt", "noenv"):
        t0 = time.time()
        g = build_variant(which, V)
        s = g.compile(sample_rate=48000.0, block_size=B, mode="block")
        for i in range(V):
            s.queue_event("midi_in", 0,
                          raw_midi_event([0x90, 36 + (i % 64), 100]))
        out = s.process_block()
        jax.block_until_ready([x for x in out.values()
                               if hasattr(x, "shape")])
        for n in (n_small, n_large):
            s.steady_checksum(n)
        synths[which] = s
        print(f"[compiled {which} in {time.time()-t0:.0f}s]", flush=True)

    def window(s):
        def span(n):
            t0 = time.perf_counter()
            s.steady_checksum(n)
            return time.perf_counter() - t0
        diffs = sorted(span(n_large) - span(n_small) for _ in range(5))
        return diffs[2] / (n_large - n_small) * 1e6

    res = {k: [] for k in synths}
    for rep in range(5):
        for k, s in synths.items():
            res[k].append(window(s))
    print(f"B={B} V={V}")
    base = sorted(res["full"])[2]
    for k, v in res.items():
        v = sorted(v)
        print(f"{k:7s}: med {v[2]:7.2f} min {v[0]:7.2f}  "
              f"(dmed {v[2]-base:+.2f})  all={[round(x,2) for x in v]}")


if __name__ == "__main__":
    main()

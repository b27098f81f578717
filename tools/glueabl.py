"""Ablation round 3d: attribute the ~3.4 us of per-block time OUTSIDE the
additive Pallas kernel on the flagship steady path (bench total 24.9 us
vs kernel-only 21.4 us at the same chip state).

Variants (all measured with the RTT-cancelling two-span differential):
  full     : build_electric_piano(256) steady_checksum (the bench path)
  notrem   : same graph minus Tremolo (mix goes straight to the output)
  sub64    : full, with OSCEN_ADDITIVE_SUB=64 (halved subgroup boundary
             costs in the kernel; parity must be re-checked separately)

Kernel-only reference (tools/kabl5.py v3b): measured separately in the
same session; full - notrem prices the tremolo + stereo pad, notrem -
kernel prices the mix/checksum/scan glue.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_no_tremolo(num_voices):
    from oscen_tpu.graph.builder import Graph
    from oscen_tpu.nodes.midi import MidiParser, MidiVoiceHandler
    from oscen_tpu.nodes.voice_allocator import VoiceAllocator
    from oscen_tpu.nodes.electric_piano import ElectricPianoVoice

    g = Graph(f"EPNoTrem{num_voices}")
    g.input("midi_in", "event")
    g.output("out", "stream")
    parser = g.add("midi_parser", MidiParser())
    alloc = g.add("voice_allocator", VoiceAllocator(num_voices))
    handlers = g.add("voice_handlers", MidiVoiceHandler(), count=num_voices)
    voices = g.add("voices", ElectricPianoVoice(), count=num_voices)
    g.connect("midi_in", parser.midi_in)
    g.connect(parser.note_on, alloc.note_on)
    g.connect(parser.note_off, alloc.note_off)
    g.connect(alloc.voices, handlers.note_on)
    g.connect(alloc.voices, handlers.note_off)
    g.connect(handlers.frequency, voices.frequency)
    g.connect(handlers.gate, voices.gate)
    g.connect(voices.output, "out")
    return g


def measure(synth, n_small=256, n_large=2048):
    import jax
    for n in (n_small, n_large):
        synth.steady_checksum(n)

    def span(n):
        t0 = time.perf_counter()
        synth.steady_checksum(n)
        return time.perf_counter() - t0

    def window():
        diffs = sorted(span(n_large) - span(n_small) for _ in range(5))
        return max(diffs[2], 1e-9)

    w = sorted(window() for _ in range(3))
    return w[0] / (n_large - n_small) * 1e6  # us/block, best window


def main():
    import jax
    from oscen_tpu.models.electric_piano import build_electric_piano
    from oscen_tpu import raw_midi_event

    V, SR, B = 256, 48_000.0, 1024
    results = {}

    def run(name, graph_builder, env_sub=None):
        if env_sub is not None:
            os.environ["OSCEN_ADDITIVE_SUB"] = str(env_sub)
        elif "OSCEN_ADDITIVE_SUB" in os.environ:
            del os.environ["OSCEN_ADDITIVE_SUB"]
        # SUB is read at trace time inside the jitted kernel wrapper;
        # drop the cached trace so the env change takes effect
        from oscen_tpu.ops.pallas.additive import additive_voice_block
        additive_voice_block.clear_cache()
        g = graph_builder(V)
        synth = g.compile(sample_rate=SR, block_size=B, mode="block")
        for i in range(V):
            synth.queue_event("midi_in", 0,
                              raw_midi_event([0x90, 36 + (i % 64), 100]))
        out = synth.process_block()
        jax.block_until_ready([v for v in out.values()
                               if hasattr(v, "shape")])
        t0 = time.time()
        us = measure(synth)
        results[name] = us
        print(f"{name:8s}: {us:7.2f} us/block  [measured in "
              f"{time.time()-t0:.0f}s]", flush=True)

    run("full", build_electric_piano)
    run("notrem", build_no_tremolo)
    run("sub64", build_electric_piano, env_sub=64)
    base = results["full"]
    for k, v in results.items():
        print(f"{k:8s}: {v:7.2f} us/block  (delta {v-base:+.2f})")


if __name__ == "__main__":
    main()

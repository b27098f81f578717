"""Characterize the mono-graph configs (saturator / simple_echo):
what bounds 500-600x RT?  Times a ladder of graph variants with the
RTT-cancelling steady_checksum methodology, one process (comparable
chip state).

Variants:
  readme    : osc -> TPT (the 1190x mono baseline)
  osc4      : osc alone inside a 4x region, latch down (multirate
              machinery without sinc FIRs)
  sat1      : osc -> clip, no oversampling
  sat4      : the real 4x saturator (sinc FIR boundary)
  sat4_iir  : same with the IIR-halfband (allpass scan) boundary
  echo      : simple_echo (dissolved feedback island)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variants():
    from oscen_tpu import Graph, HardClip, PolyBlepOscillator
    from oscen_tpu.models.simple import (build_simple_synth,
                                         build_simple_echo,
                                         build_saturator)

    def osc4():
        g = Graph("Osc4")
        g.output("audio_out", "stream")
        osc = g.add("osc", PolyBlepOscillator.saw(2000.0, 0.6), rate=4)
        g.connect(osc.output, "audio_out", policy="latch")
        return g

    def sat1():
        g = Graph("Sat1")
        g.output("audio_out", "stream")
        osc = g.add("osc", PolyBlepOscillator.saw(2000.0, 0.6))
        clip = g.add("clip", HardClip())
        g.connect(osc.output, clip.input)
        g.connect(clip.output, "audio_out")
        return g

    def sat4_iir():
        g = Graph("Sat4iir")
        g.output("audio_out", "stream")
        osc = g.add("osc", PolyBlepOscillator.saw(2000.0, 0.6), rate=4)
        clip = g.add("clip", HardClip(), rate=4)
        g.connect(osc.output, clip.input)
        g.connect(clip.output, "audio_out", policy="sinc_iir")
        return g

    def sat4_conv():
        # same graph as sat4; traced with OSCEN_FIR_CONV=1 (one
        # lax.conv per halfband stage instead of 23 fused slice+FMAs)
        return build_saturator(4)

    return {
        "readme": build_simple_synth,
        "osc4": osc4,
        "sat1": sat1,
        "sat4": lambda: build_saturator(4),
        "sat4_conv": sat4_conv,
        "sat4_iir": sat4_iir,
        "echo": lambda: build_simple_echo(0.02, 48000.0, min_delay=True),
    }


def main():
    import jax

    B = 1024
    names = sys.argv[1:] or list(build_variants())
    variants = build_variants()
    synths = {}
    for name in names:
        t0 = time.perf_counter()
        os.environ["OSCEN_FIR_CONV"] = "1" if name == "sat4_conv" else "0"
        c = variants[name]().compile(48000.0, block_size=B, mode="block")
        if name == "echo":
            c.set_value("feedback", 0.5)
        c.process_block()
        for n in (64, 512):
            c.steady_checksum(n)
        print(f"[compiled {name} in {time.perf_counter()-t0:.0f}s]",
              file=sys.stderr, flush=True)
        synths[name] = c

    def span(c, n):
        t0 = time.perf_counter()
        c.steady_checksum(n)
        return time.perf_counter() - t0

    results = {n: [] for n in synths}
    for _ in range(3):
        for name, c in synths.items():
            diffs = sorted(span(c, 512) - span(c, 64) for _ in range(5))
            results[name].append(max(diffs[2], 1e-9))
    for name, ws in results.items():
        us = min(ws) / (512 - 64) * 1e6
        print(f"{name:9s}: {us:6.2f} us/block ({B/48000/us*1e6:5.0f}x RT)")


if __name__ == "__main__":
    main()

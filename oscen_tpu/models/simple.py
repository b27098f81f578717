"""Small reference example configurations.

- :func:`build_simple_synth` — the simple_synth graph
  (/root/reference/examples/src/bin/simple_synth.rs:5-19): PolyBLEP saw →
  TPT filter.
- :func:`build_simple_echo` — the simple-echo per-channel chain
  (/root/reference/examples/simple-echo/src/lib.rs): delay → filter with
  tanh-soft-clipped feedback from the filter output, dry/wet mix.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph.builder import Graph, call
from ..nodes.delay import Delay
from ..nodes.filters import TptFilter
from ..nodes.oscillators import PolyBlepOscillator


def build_simple_synth() -> Graph:
    g = Graph("SynthGraph")
    g.output("out", "stream")
    osc = g.add("osc", PolyBlepOscillator.saw(440.0, 0.6))
    filt = g.add("filter", TptFilter(4000.0, 0.707))
    g.connect(osc.output, filt.input)
    g.connect(filt.output, "out")
    return g


def build_simple_echo(delay_seconds: float = 0.25,
                      sample_rate: float = 48_000.0) -> Graph:
    g = Graph("SimpleEcho")
    x = g.input("x", "stream")
    fb = g.input("feedback", "value", default=0.5)
    g.input("filter_cutoff", "value", default=4000.0)
    mix = g.input("mix", "value", default=0.5)
    g.output("out", "stream")
    d = g.add("delay", Delay(delay_seconds * sample_rate, 0.0))
    f = g.add("filter", TptFilter(4000.0, 0.7))
    # delay input = tanh(x + filter.output * feedback): the feedback leg
    # reads the filter's previous sample (cycle broken at the Delay)
    g.connect(call(jnp.tanh, x + f.output * fb), d.input, feedback=True)
    g.connect(d.output, f.input)
    g.connect("filter_cutoff", f.cutoff)
    g.connect(x * (1.0 - mix) + f.output * mix, "out")
    return g

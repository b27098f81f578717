"""Twin Peaks filter — difference of two resonant 3-pole lowpasses.

Rebuild of the reference's nih-twin-peaks plugin graph
(/root/reference/examples/nih-twin-peaks/src/lib.rs:15-48): one audio input
feeds two LP18 (Hordijk-style) filters at different cutoffs; the output is
their difference (a movable band of resonant peaks).  Param specs mirror
the plugin's skewed ranges (the nih_params equivalent is
``Graph.param_specs``).
"""

from __future__ import annotations

from ..core.types import ParamSpec
from ..graph.builder import Graph
from ..nodes.filters import LP18Filter

OUTPUT_GAIN = 5.0  # applied by the host outside the graph (lib.rs:12)


def build_twin_peaks() -> Graph:
    g = Graph("TwinPeaksGraph")
    g.input("audio_in", "stream")
    g.input("cutoff_a", "value", default=1000.0,
            spec=ParamSpec(min=20.0, max=14500.0, log=True, unit="Hz"))
    g.input("cutoff_b", "value", default=1900.0,
            spec=ParamSpec(min=20.0, max=14500.0, log=True, unit="Hz"))
    g.input("resonance", "value", default=0.54,
            spec=ParamSpec(min=0.0, max=0.99))
    g.output("audio_out", "stream")

    fa = g.add("filter_a", LP18Filter(1000.0, 0.54))
    fb = g.add("filter_b", LP18Filter(1900.0, 0.54))
    g.connect("audio_in", fa.input)
    g.connect("audio_in", fb.input)
    g.connect("cutoff_a", fa.cutoff)
    g.connect("cutoff_b", fb.cutoff)
    g.connect("resonance", fa.resonance)
    g.connect("resonance", fb.resonance)
    # twin peaks: the difference of the two filters
    g.connect(fa.output - fb.output, "audio_out")
    return g

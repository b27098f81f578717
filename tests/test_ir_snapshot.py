"""IR structure snapshots — the analogue of the reference's token-stream
snapshot tests (oscen-graph-compiler/tests/codegen_snapshot.rs): a
canonical graph's lowered IR is pinned literally, so any change to
lowering (kind inference, rate analysis, kernel refinement, via
expansion, toposort, fanout shapes) shows up as a reviewable diff here.
"""

from oscen_tpu import (Delay, Gain, Graph, HardClip, PolyBlepOscillator,
                       TptFilter, VoiceAllocator, MidiVoiceHandler,
                       AdsrEnvelope, MidiParser, Oscillator)
from oscen_tpu.graph.ir import EdgeKernel, EndpointRef, Fanout


def edge_sig(e):
    src = e.source
    s = (f"{src.node}.{src.endpoint}" if isinstance(src, EndpointRef)
         else type(src).__name__)
    return (s, f"{e.dst_node}.{e.dst_endpoint}", e.kernel, e.fanout,
            e.is_feedback, e.src_reads_state)


def test_snapshot_multirate_via_graph():
    """Oversampled region + named delay via + fan-in accumulate."""
    g = Graph("Snap")
    g.input("cutoff", "value", default=1200.0)
    g.input("gate", "event")
    g.output("out", "stream")
    o = g.add("osc", PolyBlepOscillator.saw(440.0, 0.5), rate=2)
    c = g.add("clip", HardClip(), rate=2)
    f = g.add("filt", TptFilter(1200.0, 0.707))
    mix = g.add("mix", Gain(1.0))
    echo = g.add("echo", Delay(64.0, 0.0))
    g.connect(o.output, c.input)
    g.connect(c.output, f.input, policy="sinc")
    g.connect("cutoff", f.cutoff)
    g.connect(f.output, mix.input)
    g.connect(mix.output * 0.5, mix.input, via="echo")
    g.connect(mix.output, "out")
    ir = g.lower()

    assert ir.order == ["osc", "clip", "filt", "mix", "echo"]
    assert [edge_sig(e) for e in ir.edges] == [
        ("osc.output", "clip.input", EdgeKernel.NONE, Fanout.SCALAR,
         False, False),
        # oversampled boundary: stream Default -> sinc DOWN kernel
        ("clip.output", "filt.input", EdgeKernel.DOWN, Fanout.SCALAR,
         False, False),
        (".cutoff", "filt.cutoff", EdgeKernel.NONE, Fanout.SCALAR,
         False, False),
        ("filt.output", "mix.input", EdgeKernel.NONE, Fanout.SCALAR,
         False, False),
        # via expansion: expr -> echo.input (forward) ...
        ("BinOp", "echo.input", EdgeKernel.NONE, Fanout.SCALAR,
         False, False),
        # ... + echo.output -> mix.input (feedback, stale read)
        ("echo.output", "mix.input", EdgeKernel.NONE, Fanout.SCALAR,
         True, True),
    ]
    down = [e for e in ir.edges if e.kernel == EdgeKernel.DOWN]
    assert down[0].rate_factor == 2
    # dead nodes pruned, inputs/outputs preserved
    assert {i.name for i in ir.inputs} == {"cutoff", "gate"}
    assert [o_.name for o_ in ir.outputs] == ["out"]


def test_snapshot_polyphonic_fanout_shapes():
    """Voice-array demux + broadcast + fan-in shapes."""
    N = 4
    g = Graph("Poly")
    g.input("midi_in", "event")
    g.input("amp", "value", default=0.5)
    g.output("out", "stream")
    parser = g.add("parser", MidiParser())
    alloc = g.add("alloc", VoiceAllocator(N))
    handlers = g.add("handlers", MidiVoiceHandler(), count=N)
    envs = g.add("envs", AdsrEnvelope(0.01, 0.1, 0.7, 0.1), count=N)
    oscs = g.add("oscs", Oscillator.sine(440.0, 1.0), count=N)
    mix = g.add("mix", Gain(1.0))
    g.connect("midi_in", parser.midi_in)
    g.connect(parser.note_on, alloc.note_on)
    g.connect(parser.note_off, alloc.note_off)
    g.connect(alloc.voices, handlers.note_on)
    g.connect(handlers.gate, envs.gate)
    g.connect(handlers.frequency, oscs.frequency)
    g.connect("amp", oscs.amplitude)
    g.connect(oscs.output * envs.output, mix.input)
    g.connect(mix.output, "out")
    ir = g.lower()

    shapes = {(edge_sig(e)[0], edge_sig(e)[1]): e.fanout
              for e in ir.edges}
    # allocator (single node, array-valued event output) -> handler
    # array: classified broadcast; the host pre-pass demuxes per index
    assert shapes[("alloc.voices", "handlers.note_on")] == Fanout.BROADCAST
    # array -> array: parallel copy ([EventOutput;N] -> [EventInput;N])
    assert shapes[("handlers.gate", "envs.gate")] == Fanout.PARALLEL
    # scalar graph input -> array input: broadcast
    assert shapes[(".amp", "oscs.amplitude")] == Fanout.BROADCAST
    # array expr -> scalar input: fan-in sum
    assert shapes[("BinOp", "mix.input")] == Fanout.FAN_IN
    # host/device split: control nodes host-side, DSP device-side
    from oscen_tpu.graph.compile import _Program
    prog = _Program(ir, 48000.0)
    assert set(prog.host_nodes) == {"parser", "alloc", "handlers"}
    assert set(prog.device_nodes) == {"envs", "oscs", "mix"}

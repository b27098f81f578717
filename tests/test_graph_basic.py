"""End-to-end graph tests: the README `Synth` graph and graph semantics
(toposort, fan-in summing, dead-node pruning, connection expressions).

Mirrors the reference's macro integration tests
(/root/reference/oscen-lib/tests/): block==per-sample structure, stream
fan-in summing (tests/stream_fanin.rs), connection expressions
(tests/connection_expr_*.rs).
"""

import numpy as np
import pytest

from oscen_tpu import (Gain, Graph, GraphError, Oscillator,
                       PolyBlepOscillator, TptFilter, Value)


def build_readme_synth():
    """The README example graph (reference README.md:24-53)."""
    g = Graph("Synth")
    mod_freq = g.input("mod_freq", "value", default=5.0)
    mod_depth = g.input("mod_depth", "value", default=0.2)
    carrier_freq = g.input("carrier_freq", "value", default=440.0)
    cutoff = g.input("cutoff", "value", default=1200.0)
    g.output("audio_out", "stream")

    modulator = g.add("modulator", PolyBlepOscillator.sine(5.0, 0.2))
    carrier = g.add("carrier", PolyBlepOscillator.saw(440.0, 0.5))
    filt = g.add("filter", TptFilter(1200.0, 0.707))

    g.connect(mod_freq, modulator.frequency)
    g.connect(mod_depth, modulator.amplitude)
    g.connect(carrier_freq, carrier.frequency)
    g.connect(cutoff, filt.cutoff)
    g.connect(modulator.output, carrier.frequency_mod)
    g.connect(carrier.output, filt.input)
    g.connect(filt.output, "audio_out")
    return g


def test_readme_synth_renders():
    g = build_readme_synth()
    c = g.compile(sample_rate=44100.0, block_size=256)
    out = c.render_mono(4410)  # 100 ms
    assert out.shape == (4410,)
    assert np.all(np.isfinite(out))
    # audible signal after the filter settles
    assert np.abs(out[2000:]).max() > 0.01
    # lowpassed saw stays well-bounded
    assert np.abs(out).max() < 1.5


def test_readme_synth_block_size_invariance():
    """Block processing must be bit-identical regardless of block size
    (tests/block_processing_test.rs semantics)."""
    g1 = build_readme_synth()
    c1 = g1.compile(44100.0, block_size=512)
    a = c1.render_mono(1024)
    g2 = build_readme_synth()
    c2 = g2.compile(44100.0, block_size=128)
    b = c2.render_mono(1024)
    np.testing.assert_array_equal(a, b)


def test_value_setter_changes_output():
    g = build_readme_synth()
    c = g.compile(44100.0, block_size=128)
    _ = c.process_block()
    c.set_value("carrier_freq", 880.0)
    out = c.process_block()
    assert np.all(np.isfinite(np.asarray(out["audio_out"])))


def test_stream_fanin_sums():
    """Two oscillators into one gain input: fan-in sums
    (tests/stream_fanin.rs)."""
    g = Graph("FanIn")
    g.output("out", "stream")
    a = g.add("a", Oscillator.sine(100.0, 0.5))
    b = g.add("b", Oscillator.sine(100.0, 0.25))
    gn = g.add("g", Gain(1.0))
    g.connect(a.output, gn.input)
    g.connect(b.output, gn.input)
    g.connect(gn.output, "out")
    c = g.compile(48000.0, block_size=64)
    summed = c.render_mono(64)

    # compare against a single osc at 0.75 amplitude (same phase math)
    g2 = Graph("Single")
    g2.output("out", "stream")
    s = g2.add("s", Oscillator.sine(100.0, 0.75))
    g2.connect(s.output, "out")
    ref = g2.compile(48000.0, block_size=64).render_mono(64)
    np.testing.assert_allclose(summed, ref, atol=1e-6)


def test_connection_expression():
    """Compound sources: `a.output * 0.5 + b.output`
    (tests/connection_expr_*.rs)."""
    g = Graph("Expr")
    g.output("out", "stream")
    a = g.add("a", Oscillator.sine(100.0, 1.0))
    b = g.add("b", Oscillator.sine(100.0, 1.0))
    g.connect(a.output * 0.5 + b.output * 0.25, "out")
    c = g.compile(48000.0, block_size=64)
    out = c.render_mono(64)

    g2 = Graph("Ref")
    g2.output("out", "stream")
    s = g2.add("s", Oscillator.sine(100.0, 0.75))
    g2.connect(s.output, "out")
    ref = g2.compile(48000.0, block_size=64).render_mono(64)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_dead_node_pruned():
    g = Graph("Dead")
    g.output("out", "stream")
    a = g.add("a", Oscillator.sine(100.0, 1.0))
    g.add("unused", Oscillator.sine(5.0, 1.0))
    g.connect(a.output, "out")
    ir = g.lower()
    assert "unused" not in ir.nodes
    assert ir.order == ["a"]


def test_cycle_without_via_rejected():
    g = Graph("Cycle")
    g.output("out", "stream")
    a = g.add("a", Gain(1.0))
    b = g.add("b", Gain(1.0))
    g.connect(a.output, b.input)
    g.connect(b.output, a.input)
    g.connect(b.output, "out")
    with pytest.raises(GraphError, match="cycle"):
        g.lower()


def test_unknown_endpoint_rejected():
    g = Graph("Bad")
    a = g.add("a", Gain(1.0))
    with pytest.raises(GraphError, match="no endpoint"):
        g.connect(a.output, "a.nonexistent")


def test_kind_mismatch_rejected():
    """Event->stream connection rejected (lower.rs:1099-1165)."""
    from oscen_tpu import AdsrEnvelope
    g = Graph("Kind")
    g.output("out", "stream")
    env = g.add("env", AdsrEnvelope())
    gn = g.add("g", Gain(1.0))
    g.connect(gn.output, env.gate)
    g.connect(gn.output, "out")
    with pytest.raises(GraphError, match="cannot connect"):
        g.lower()


def test_diagnostics_accumulate():
    """Graph.check() reports every error, not just the first
    (reference Diagnostics accumulation, diagnostics.rs:40-107)."""
    from oscen_tpu import AdsrEnvelope
    g = Graph("Multi")
    g.output("out", "stream")
    env = g.add("env", AdsrEnvelope())
    a = g.add("a", Gain(1.0))
    b = g.add("b", Gain(1.0))
    g.connect(a.output, env.gate)     # error 1: stream -> event
    g.connect(b.output, env.gate)     # error 2: stream -> event
    g.connect(env.output, "out")
    errs = g.check()
    assert len(errs) >= 2, errs
    assert all("cannot connect" in e for e in errs[:2])
    # lower() without collect still raises (combined)
    with pytest.raises(GraphError, match="cannot connect"):
        g.lower()


def test_init_at_new_sample_rate_reprepares():
    """init(sample_rate) re-prepares every node: rate-derived state
    (filter coefficients, delay buffer sizes) recomputes (the generated
    set_sample_rate + prepare lifecycle, SURVEY §3.2)."""
    g = build_readme_synth()
    c = g.compile(44100.0, block_size=128)
    a44 = c.render_mono(512)
    c.init(sample_rate=48000.0)
    a48 = c.render_mono(512)
    # same graph at a different rate: pitch/coefficients shift, output
    # differs but stays sane
    assert a44.shape == a48.shape
    assert np.abs(a48).max() < 1.5
    assert not np.allclose(a44, a48)
    # and init() alone resets state reproducibly
    c.init()
    b48 = c.render_mono(512)
    np.testing.assert_array_equal(a48, b48)

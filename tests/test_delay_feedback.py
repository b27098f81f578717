"""Delay, feedback vias, and the simple-echo configuration.

Mirrors: reference Delay semantics (delay/mod.rs:72-82 — read then push),
simple-echo's osc→delay→filter feedback topology
(examples/simple-echo/src/lib.rs), and the `-> [N] ->` inline delay via
(ir/lower.rs:575-655).
"""

import numpy as np
import pytest

from oscen_tpu import Delay, Gain, Graph, GraphError, Oscillator, TptFilter


def test_delay_line_delays():
    """An impulse comes out exactly delay_samples later with feedback
    echoes at multiples, scaled by feedback^k."""
    g = Graph("D")
    g.input("x", "stream")
    g.output("out", "stream")
    d = g.add("d", Delay(16.0, 0.5))
    g.connect("x", d.input)
    g.connect(d.output, "out")
    c = g.compile(48000.0, block_size=64)
    x = np.zeros(64, np.float32)
    x[0] = 1.0
    out = np.asarray(c.process_block(stream_inputs={"x": x})["out"])
    # reference: output = buf.get(16) BEFORE push, so the impulse pushed at
    # t=0 is read at t=17 (get(16) reads 17 pushes back: write_pos-16-1)
    nz = np.nonzero(np.abs(out) > 1e-9)[0]
    assert nz[0] == 17, nz[:4]
    assert abs(out[17] - 1.0) < 1e-6
    assert abs(out[34] - 0.5) < 1e-6  # first feedback echo
    assert abs(out[51] - 0.25) < 1e-6


def test_delay_block_size_invariance():
    def run(bs):
        g = Graph("D")
        g.input("x", "stream")
        g.output("out", "stream")
        d = g.add("d", Delay(100.0, 0.7))
        g.connect("x", d.input)
        g.connect(d.output, "out")
        c = g.compile(48000.0, block_size=bs)
        rng = np.random.default_rng(3)
        x = rng.standard_normal(1024).astype(np.float32)
        return c.render_mono(1024, stream_inputs={"x": x})
    np.testing.assert_array_equal(run(512), run(64))


def test_feedback_via_samples():
    """`src -> [N] -> dst` synthesizes an inline Delay and breaks the
    cycle: a feedback loop around a gain must be stable and produce
    repeating echoes."""
    g = Graph("FB")
    g.input("x", "stream")
    g.output("out", "stream")
    mix = g.add("mix", Gain(1.0))
    fb_gain = g.add("fb", Gain(0.5))
    g.connect("x", mix.input)
    g.connect(mix.output, fb_gain.input)
    # feedback: fb -> [32] -> mix.input (cycle broken by inline delay)
    g.connect(fb_gain.output, mix.input, via=32)
    g.connect(mix.output, "out")
    c = g.compile(48000.0, block_size=256)
    x = np.zeros(256, np.float32)
    x[0] = 1.0
    out = np.asarray(c.process_block(stream_inputs={"x": x})["out"])
    nz = np.nonzero(np.abs(out) > 1e-6)[0]
    assert nz[0] == 0
    # echoes every 33-34 samples at halving amplitude
    assert len(nz) >= 4
    assert abs(out[nz[1]] - 0.5) < 1e-6
    assert abs(out[nz[2]] - 0.25) < 1e-6


def test_simple_echo_topology():
    """The simple-echo per-channel chain: (input + filter.output*feedback)
    -> delay -> filter, mixed dry/wet (examples/simple-echo/src/lib.rs).
    The feedback reads the filter's previous-sample output (the reference
    reads `self.filter.output` before processing)."""
    import jax.numpy as jnp

    from oscen_tpu import call

    g = Graph("Echo")
    x = g.input("x", "stream")
    fb = g.input("feedback", "value", default=0.5)
    g.output("out", "stream")
    d = g.add("d", Delay(2400.0, 0.0))
    f = g.add("f", TptFilter(4000.0, 0.7))
    # delay input = tanh(x + filter.output * feedback); the feedback edge
    # closes a cycle broken at the Delay (AllowsFeedback), reading the
    # filter's previous-sample output like the reference does.
    g.connect(call(jnp.tanh, x + f.output * fb), d.input, feedback=True)
    g.connect(d.output, f.input)
    g.connect(x * 0.5 + f.output * 0.5, "out")
    c = g.compile(48000.0, block_size=512)
    x = np.zeros(4800, np.float32)
    x[0] = 1.0
    out = c.render_mono(4800, stream_inputs={"x": x})
    assert np.all(np.isfinite(out))
    # dry impulse at t=0, wet echo ~2400 samples later
    assert abs(out[0] - 0.5) < 1e-5
    assert np.abs(out[2390:2420]).max() > 0.05


def test_via_node_requires_feedback_capable():
    g = Graph("BadVia")
    g.output("out", "stream")
    a = g.add("a", Gain(1.0))
    b = g.add("b", Gain(1.0))
    g.connect(a.output, "out")
    with pytest.raises(GraphError, match="feedback"):
        g.connect(b.output, a.input, via="b")
        g.lower()


def test_via_node_named_delay():
    """`src -> [delay_node] -> dst` routes through a declared Delay."""
    g = Graph("ViaNode")
    g.input("x", "stream")
    g.output("out", "stream")
    mix = g.add("mix", Gain(1.0))
    echo = g.add("echo", Delay(50.0, 0.0))
    g.connect("x", mix.input)
    g.connect(mix.output * 0.5, mix.input, via="echo")
    g.connect(mix.output, "out")
    c = g.compile(48000.0, block_size=256)
    x = np.zeros(256, np.float32)
    x[0] = 1.0
    out = np.asarray(c.process_block(stream_inputs={"x": x})["out"])
    nz = np.nonzero(np.abs(out) > 1e-6)[0]
    assert nz[0] == 0 and len(nz) >= 3
    assert abs(out[nz[1]] - 0.5) < 1e-6


def test_chunked_delay_matches_scan():
    """Delay(min_delay=N) unlocks the chunked block path; it must equal
    the per-sample scan bit-for-bit (same reads, same op order)."""
    def run(mode, min_delay):
        g = Graph("CD")
        g.input("x", "stream")
        g.output("out", "stream")
        d = g.add("d", Delay(150.0, 0.6, min_delay=min_delay))
        g.connect("x", d.input)
        g.connect(d.output, "out")
        c = g.compile(48000.0, block_size=256, mode=mode)
        rng = np.random.default_rng(7)
        x = rng.standard_normal(1024).astype(np.float32)
        return c.render_mono(1024, stream_inputs={"x": x})

    a = run("sample", 0)        # per-sample reference
    b = run("block", 64)        # chunked (chunk = 60)
    np.testing.assert_allclose(a, b, atol=1e-6)
    c = run("block", 0)         # scan fallback
    np.testing.assert_array_equal(a, c)


def test_chunked_delay_fractional():
    """Fractional delays interpolate identically through the chunked
    path (Catmull-Rom margin honored)."""
    def run(mode, min_delay):
        g = Graph("CDF")
        g.input("x", "stream")
        g.output("out", "stream")
        d = g.add("d", Delay(77.25, 0.4, min_delay=min_delay))
        g.connect("x", d.input)
        g.connect(d.output, "out")
        c = g.compile(48000.0, block_size=128, mode=mode)
        rng = np.random.default_rng(8)
        x = rng.standard_normal(512).astype(np.float32)
        return c.render_mono(512, stream_inputs={"x": x})

    np.testing.assert_allclose(run("sample", 0), run("block", 40),
                               atol=1e-6)


def test_lowering_is_idempotent_with_named_via():
    """check() then compile(), or compiling twice, must not raise a
    spurious 'via node used by more than one connection' error
    (lowering state must not leak across lower() calls)."""
    def build():
        g = Graph("ViaTwice")
        g.input("x", "stream")
        g.output("out", "stream")
        mix = g.add("mix", Gain(1.0))
        echo = g.add("echo", Delay(50.0, 0.0))
        g.connect("x", mix.input)
        g.connect(mix.output * 0.5, mix.input, via="echo")
        g.connect(mix.output, "out")
        return g

    g = build()
    assert g.check() == []
    c1 = g.compile(48000.0, block_size=64)
    c2 = g.compile(48000.0, block_size=64)
    x = np.zeros(64, np.float32)
    x[0] = 1.0
    a = np.asarray(c1.process_block(stream_inputs={"x": x})["out"])
    b = np.asarray(c2.process_block(stream_inputs={"x": x})["out"])
    np.testing.assert_array_equal(a, b)

    # inline-sample vias synthesize nodes: names must be deterministic
    # across lower() calls (checkpoint key stability)
    g2 = Graph("InlineTwice")
    g2.output("out", "stream")
    from oscen_tpu import Oscillator
    o = g2.add("o", Oscillator.sine(220.0, 0.5))
    m = g2.add("m", Gain(1.0))
    g2.connect(o.output, m.input)
    g2.connect(m.output * 0.25, m.input, via=16)
    g2.connect(m.output, "out")
    ir1 = g2.lower()
    ir2 = g2.lower()
    assert set(ir1.nodes) == set(ir2.nodes)


def test_echo_island_dissolution_matches_scan():
    """A feedback island whose cycles all pass a Delay with a static
    min_delay >= block dissolves into vectorized block phases; output
    must match the per-sample island scan."""
    from oscen_tpu.models.simple import build_simple_echo

    rng = np.random.default_rng(3)
    x = rng.standard_normal(4096).astype(np.float32) * 0.3

    def run(min_delay, bs=512):
        g = build_simple_echo(0.02, 48000.0, min_delay=min_delay)
        c = g.compile(48000.0, block_size=bs, mode="block")
        c.set_value("feedback", 0.6)
        return c.render_mono(4096, stream_inputs={"x": x})

    a = run(False)          # island scan (no promise)
    b = run(True)           # dissolved
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert np.abs(a).max() > 0.05

    # block-size invariance of the dissolved path
    c1 = run(True, bs=512)
    c2 = run(True, bs=128)
    np.testing.assert_array_equal(c1, c2)

    # a delay too short for the promise at this block size still works
    # (falls back to the scan island inside the compiler)
    g = build_simple_echo(0.001, 48000.0, min_delay=True)  # 48 samples
    c = g.compile(48000.0, block_size=512, mode="block")
    out = c.render_mono(1024, stream_inputs={"x": x[:1024]})
    assert np.isfinite(out).all()


def test_out_of_range_params_clamp_cadence_mode_equivalence():
    """The reference clamps delay/feedback only every 32nd frame and
    passes raw values between updates (delay/mod.rs:47-55).  With
    out-of-range params (feedback > 0.99, delay beyond the promise) the
    chunked and dissolved block paths must replay that cadence and match
    the per-sample scan exactly."""
    def run(mode, min_delay, bs=256):
        g = Graph("OOR")
        g.input("x", "stream")
        g.input("fb", "value", default=1.5)       # beyond the 0.99 clamp
        g.input("dly", "value", default=90.0)
        g.output("out", "stream")
        d = g.add("d", Delay(90.0, 0.0, min_delay=min_delay))
        g.connect("x", d.input)
        g.connect("fb", d.feedback)
        g.connect("dly", d.delay_samples)
        g.connect(d.output, "out")
        c = g.compile(48000.0, block_size=bs, mode=mode)
        rng = np.random.default_rng(11)
        x = (rng.standard_normal(1024) * 0.1).astype(np.float32)
        return c.render_mono(1024, stream_inputs={"x": x})

    a = run("sample", 0)
    b = run("block", 64)     # chunked path
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
    c = run("block", 0)      # scan fallback
    np.testing.assert_array_equal(a, c)

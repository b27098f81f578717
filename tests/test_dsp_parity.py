"""DSP parity details: ring buffer interpolation, frame (channel-axis)
streams, offline render tail, naive oscillator waveshapes.

Mirrors: reference ring_buffer/tests.rs (wrap + interpolation + near-
integer snap), tests/frame_streams.rs / stereo_render.rs (multi-channel
edges), graph/offline.rs (BlockRender input padding + tail), and the
Oscillator waveform formulas (oscillators/mod.rs:36-61).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oscen_tpu import Frame, Gain, Graph, Oscillator, TptFilter, Tremolo
from oscen_tpu.ops.ringbuffer import rb_get, rb_get_linear, rb_new, rb_push


def _filled_rb(values):
    buf, wp = rb_new(len(values))
    for v in values:
        buf, wp = rb_push(buf, wp, jnp.float32(v))
    return buf, wp


def test_ringbuffer_integer_reads():
    buf, wp = _filled_rb([1.0, 2.0, 3.0, 4.0])
    # offset 0 = most recent (reference ring_buffer/mod.rs:166-201)
    assert float(rb_get(buf, wp, jnp.float32(0.0))) == 4.0
    assert float(rb_get(buf, wp, jnp.float32(3.0))) == 1.0


def test_ringbuffer_wraparound():
    buf, wp = rb_new(4)
    for v in range(1, 7):  # capacity 4: values 3..6 remain
        buf, wp = rb_push(buf, wp, jnp.float32(v))
    assert float(rb_get(buf, wp, jnp.float32(0.0))) == 6.0
    assert float(rb_get(buf, wp, jnp.float32(3.0))) == 3.0


def test_ringbuffer_near_integer_snap():
    """Offsets within 1e-6 of an integer return the exact sample."""
    buf, wp = _filled_rb([1.0, 2.0, 3.0, 4.0])
    assert float(rb_get(buf, wp, jnp.float32(1.0 + 4e-7))) == 3.0
    assert float(rb_get(buf, wp, jnp.float32(2.0 - 4e-7))) == 2.0


def test_ringbuffer_cubic_between_samples():
    """Catmull-Rom through a linear ramp reproduces the line exactly."""
    buf, wp = _filled_rb(np.arange(16, dtype=np.float32))
    v = float(rb_get(buf, wp, jnp.float32(2.5)))
    assert abs(v - 12.5) < 1e-5
    v = float(rb_get_linear(buf, wp, jnp.float32(2.5)))
    assert abs(v - 12.5) < 1e-5


def test_frame_ctor_stereo_edge():
    """Frame(a, b) builds a 2-channel edge (tests/frame_streams.rs)."""
    g = Graph("F")
    g.output("out", "stream", channels=2)
    a = g.add("a", Oscillator.sine(100.0, 1.0))
    b = g.add("b", Oscillator.sine(200.0, 1.0))
    g.connect(Frame(a.output, b.output), "out")
    c = g.compile(48000.0, block_size=64)
    out = c.render(64)["out"]
    assert out.shape == (64, 2)
    # channels carry the different frequencies (no bleed)
    assert not np.allclose(out[:, 0], out[:, 1])


def test_stereo_filter_through_graph():
    """TptFilter<Frame<2>> equivalent: stereo edges through a channels=2
    filter stay independent (tests/stereo_render.rs)."""
    g = Graph("St")
    g.input("x", "stream", channels=2)
    g.output("out", "stream", channels=2)
    f = g.add("f", TptFilter(2000.0, 0.707, channels=2))
    g.connect("x", f.input)
    g.connect(f.output, "out")
    c = g.compile(48000.0, block_size=64)
    x = np.zeros((64, 2), np.float32)
    x[0, 0] = 1.0
    out = c.render(64, stream_inputs={"x": x})["out"]
    assert np.abs(out[:, 0]).max() > 0.01
    np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-7)


def test_tremolo_stereo_pan():
    g = Graph("T")
    g.input("x", "stream")
    g.output("out", "stream", channels=2)
    t = g.add("t", Tremolo())
    g.connect("x", t.input)
    g.connect(t.output, "out")
    c = g.compile(48000.0, block_size=480)
    x = np.ones(4800, np.float32)
    out = c.render(4800, stream_inputs={"x": x})["out"]
    # constant-power-ish pan: L+R stays 1 (pan + (1-pan) == 1)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)
    # and both channels oscillate at the LFO rate
    assert out[:, 0].std() > 0.05


def test_offline_render_pads_and_tails():
    """render pads short inputs with silence and appends tail
    (graph/offline.rs:46-90)."""
    g = Graph("O")
    g.input("x", "stream")
    g.output("out", "stream")
    gn = g.add("g", Gain(2.0))
    g.connect("x", gn.input)
    g.connect(gn.output, "out")
    c = g.compile(48000.0, block_size=64)
    x = np.ones(100, np.float32)  # shorter than 150 frames requested
    out = c.render_mono(150, stream_inputs={"x": x}, tail=30)
    assert out.shape == (180,)
    np.testing.assert_allclose(out[:100], 2.0, atol=1e-7)
    np.testing.assert_allclose(out[100:], 0.0, atol=1e-7)


def test_naive_oscillator_square_and_saw():
    for wf, check in [
        ("square", lambda o: set(np.round(np.unique(o), 5)) <= {-1.0, 1.0}),
        ("saw", lambda o: np.abs(o).max() <= 1.01),
    ]:
        g = Graph("W")
        g.output("out", "stream")
        o = g.add("o", Oscillator(100.0, 1.0, wf))
        g.connect(o.output, "out")
        out = g.compile(48000.0, block_size=480).render_mono(960)
        assert check(out), wf


def test_audio_input_and_value_nodes():
    from oscen_tpu import AudioInput, Value
    g = Graph("AV")
    g.input("level", "value", default=0.25)
    g.output("out", "stream")
    v = g.add("v", Value(0.0))
    ai = g.add("ai", AudioInput())
    g.connect("level", v.input)
    g.connect(v.output, ai.input_value)
    g.connect(ai.output, "out")
    out = g.compile(48000.0, block_size=32).render_mono(32)
    np.testing.assert_allclose(out, 0.25, atol=1e-7)

"""Block-mode compiler: equivalence against sample mode (the parity path).

Sample mode replays the reference per-sample schedule exactly; block mode
is the vectorized fast path (cumsum phases, associative scans, closed-form
envelopes, scan islands for feedback).  These tests pin the two together.
"""

import numpy as np
import pytest

from oscen_tpu import Delay, Gain, Graph, raw_midi_event
from oscen_tpu.models.poly_synth import build_poly_synth


def test_readme_synth_modes_agree():
    import sys
    sys.path.insert(0, "tests")
    from test_graph_basic import build_readme_synth

    a = build_readme_synth().compile(44100.0, block_size=256,
                                     mode="sample").render_mono(2048)
    b = build_readme_synth().compile(44100.0, block_size=256,
                                     mode="block").render_mono(2048)
    rms = np.sqrt(np.mean((a - b) ** 2))
    assert rms < 1e-4, rms


def test_adsr_block_closed_form_matches_scan():
    from oscen_tpu import AdsrEnvelope

    def run(mode, gate_events):
        g = Graph("Env")
        g.input("gate", "event")
        g.output("out", "stream")
        env = g.add("env", AdsrEnvelope(0.004, 0.03, 0.6, 0.05))
        g.connect("gate", env.gate)
        g.connect(env.output, "out")
        c = g.compile(48000.0, block_size=512, mode=mode)
        outs = []
        for block_evs in gate_events:
            for off, v in block_evs:
                c.queue_event("gate", off, v)
            outs.append(np.asarray(c.process_block()["out"]))
        return np.concatenate(outs)

    # attack spans blocks; release mid-block; retrigger while decaying
    evs = [[(100, 1.0)], [], [(37, 0.0)], [(200, 0.8), (400, 0.0)], []]
    a = run("sample", evs)
    b = run("block", evs)
    assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()


def test_poly_synth_modes_agree_with_events():
    def run(mode):
        s = build_poly_synth(4).compile(48000.0, block_size=256, mode=mode)
        for note in (60, 64, 67):
            s.queue_event("midi_in", 10, raw_midi_event([0x90, note, 100]))
        first = np.asarray(s.process_block()["audio_out"])
        s.queue_event("midi_in", 0, raw_midi_event([0x80, 64, 0]))
        rest = [np.asarray(s.process_block()["audio_out"])
                for _ in range(4)]
        return np.concatenate([first] + rest)

    a = run("sample")
    b = run("block")
    rms = np.sqrt(np.mean((a - b) ** 2))
    assert rms < 2e-3, rms


def test_feedback_island_matches_sample_mode():
    """A feedback loop (gain -> inline delay -> gain) forces a scan
    island in block mode; both modes must agree closely."""
    def run(mode):
        g = Graph("FB")
        g.input("x", "stream")
        g.output("out", "stream")
        mix = g.add("mix", Gain(1.0))
        fb = g.add("fb", Gain(0.6))
        g.connect("x", mix.input)
        g.connect(mix.output, fb.input)
        g.connect(fb.output, mix.input, via=24)
        g.connect(mix.output, "out")
        c = g.compile(48000.0, block_size=128, mode=mode)
        x = np.zeros(512, np.float32)
        x[0] = 1.0
        x[200] = -0.5
        return c.render_mono(512, stream_inputs={"x": x})

    a = run("sample")
    b = run("block")
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_delay_feedback_node_block_mode():
    """Delay's internal feedback is node-internal state: block mode uses
    its (scan-based) block impl; must match sample mode exactly."""
    def run(mode):
        g = Graph("D")
        g.input("x", "stream")
        g.output("out", "stream")
        d = g.add("d", Delay(16.0, 0.5))
        g.connect("x", d.input)
        g.connect(d.output, "out")
        c = g.compile(48000.0, block_size=64, mode=mode)
        x = np.zeros(192, np.float32)
        x[0] = 1.0
        return c.render_mono(192, stream_inputs={"x": x})

    np.testing.assert_array_equal(run("sample"), run("block"))
